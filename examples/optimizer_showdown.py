"""Optimizer showdown on one VQE: Adam vs SGD-momentum vs QNG vs L-BFGS.

Reference role: the reference's optimizer-comparison family
(``examples/optperformance_comparison.py`` and the whitepaper's optimizer
studies) — identical ansatz, identical initialization, four optimization
strategies:

  * Adam (optax),
  * SGD + momentum (optax),
  * quantum natural gradient (QFI-preconditioned, via
    ``experimental.qng``),
  * L-BFGS-B (scipy through ``tc.interfaces.scipy_interface``).

Validation: every method must converge below 99% of the exact N=6
TFIM ground energy; QNG must reach 99% of the ground energy in fewer
iterations than vanilla SGD (the standard QNG claim, checked, not
asserted blindly: the margin is required to be >= 2x).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax
from scipy.optimize import minimize

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import experimental

tc.set_backend("jax")

n, L = 6, 3
pairs = [(i, i + 1) for i in range(n - 1)]


def state_fn(params):
    c = tc.Circuit(n)
    c.h_layer()
    for l in range(L):
        c.zzrx_layer(pairs, params[l, 0, : n - 1], params[l, 1])
    return c.state()


def energy(params):
    c = tc.Circuit(n)
    c.h_layer()
    for l in range(L):
        c.zzrx_layer(pairs, params[l, 0, : n - 1], params[l, 1])
    return jnp.real(c.expectation_zzx_energy(pairs, 1.0, -1.0))


codes = [[3 if k in (a, b) else 0 for k in range(n)] for a, b in pairs]
codes += [[1 if k == i else 0 for k in range(n)] for i in range(n)]
h = tc.quantum.PauliStringSum2Dense(codes, weight=[1.0] * len(pairs) + [-1.0] * n)
e_exact = float(np.linalg.eigvalsh(np.asarray(h))[0])
target99 = e_exact * 0.99  # energies are negative: reached when E <= target

rng = np.random.default_rng(7)
p0 = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.1, jnp.float32)
vg = jax.jit(jax.value_and_grad(energy))


def run_optax(opt, iters=800):
    p, state = p0, opt.init(p0)
    hit, best = None, np.inf
    for it in range(iters):
        v, g = vg(p)
        best = min(best, float(v))
        if hit is None and float(v) <= target99:
            hit = it
        upd, state = opt.update(g, state)
        p = optax.apply_updates(p, upd)
    return best, hit


results = {}
results["adam"] = run_optax(optax.adam(0.05))
results["sgd+mom"] = run_optax(optax.sgd(0.02, momentum=0.9))

# --- QNG: QFI-preconditioned gradient flow ------------------------------
qfi_fn = jax.jit(experimental.qng(lambda q: state_fn(jnp.reshape(q, p0.shape))))


@jax.jit
def qng_step(q):
    v, g = jax.value_and_grad(lambda x: energy(jnp.reshape(x, p0.shape)))(q)
    fim = qfi_fn(q)
    g_nat = jnp.linalg.solve(fim + 1e-3 * jnp.eye(fim.shape[0]), g)
    return v, q - 0.15 * g_nat


q, hit, best = jnp.ravel(p0), None, np.inf
for it in range(400):
    v, q = qng_step(q)
    v = float(v)
    best = min(best, v)
    if hit is None and v <= target99:
        hit = it
results["qng"] = (best, hit)

# --- scipy L-BFGS-B -------------------------------------------------------
f_sp = tc.interfaces.scipy_interface(energy, shape=tuple(p0.shape), jit=True,
                                     gradient=True)
res = minimize(f_sp, np.asarray(p0).ravel(), method="L-BFGS-B", jac=True,
               options={"maxiter": 400})
results["l-bfgs-b"] = (float(res.fun), res.nit)

print(f"exact E0 = {e_exact:.5f}")
for name, (best, hit) in results.items():
    tag = "total nit" if name == "l-bfgs-b" else "99%-reached @"
    print(f"{name:9s} best E = {best:.5f}   {tag} {hit}")
    assert best < e_exact * 0.99, (name, best, e_exact)

it_sgd = results["sgd+mom"][1]
it_qng = results["qng"][1]
assert it_qng is not None and it_sgd is not None
assert it_qng * 2 <= it_sgd, (
    f"QNG ({it_qng}) not >=2x faster than SGD ({it_sgd})")
print("OK")
