"""Second-order VQE: scipy L-BFGS-B through the scipy interface.

Reference role: ``examples/optperformance_comparison.py`` /
``interfaces/scipy.py`` usage — wrap a jitted energy+gradient in
``tc.interfaces.scipy_interface`` and hand it to ``scipy.optimize.minimize``
so a quasi-Newton optimizer drives the quantum circuit, then compare the
trajectory against plain Adam on the identical ansatz.

Validation: L-BFGS-B must converge to the exact N=8 TFIM ground energy
(dense diagonalization) to 5e-4 relative (f32 ansatz at this depth), in far fewer energy evaluations
than Adam needs iterations for the same accuracy.
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

tc.set_backend("jax")

n, L = 8, 4
pairs = [(i, i + 1) for i in range(n - 1)]


def energy(params):
    c = tc.Circuit(n)
    c.h_layer()
    for l in range(L):
        c.zzrx_layer(pairs, params[l, 0, : n - 1], params[l, 1])
    return jnp.real(c.expectation_zzx_energy(pairs, 1.0, -1.0))


# exact ground energy from the dense Hamiltonian
h = tc.quantum.PauliStringSum2Dense(
    [[3 if k in (a, b) else 0 for k in range(n)] for a, b in pairs]
    + [[1 if k == i else 0 for k in range(n)] for i in range(n)],
    weight=[1.0] * len(pairs) + [-1.0] * n,
)
e_exact = float(np.linalg.eigvalsh(np.asarray(h))[0])

rng = np.random.default_rng(42)
p0 = rng.normal(size=(L, 2, n)).astype(np.float32) * 0.1

# --- scipy quasi-Newton through the interface -------------------------
f_scipy = tc.interfaces.scipy_interface(energy, shape=p0.shape, jit=True, gradient=True)
neval = {"count": 0}


def counted(x):
    neval["count"] += 1
    return f_scipy(x)


res = minimize(counted, p0.ravel(), method="L-BFGS-B", jac=True,
               options={"maxiter": 200})
e_lbfgs = float(res.fun)
print(f"L-BFGS-B: E = {e_lbfgs:.6f} (exact {e_exact:.6f}) "
      f"in {neval['count']} evaluations")
assert abs(e_lbfgs - e_exact) < 5e-4 * abs(e_exact), (e_lbfgs, e_exact)

# --- Adam baseline on the identical ansatz -----------------------------
vg = jax.jit(jax.value_and_grad(energy))
opt = optax.adam(0.05)
p = jnp.asarray(p0)
state = opt.init(p)
adam_iters = None
for it in range(2000):
    v, g = vg(p)
    if abs(float(v) - e_exact) < 5e-4 * abs(e_exact):
        adam_iters = it
        break
    upd, state = opt.update(g, state)
    p = optax.apply_updates(p, upd)
print(f"Adam reaches the same accuracy in "
      f"{adam_iters if adam_iters is not None else '>2000'} iterations")
assert adam_iters is None or neval["count"] < adam_iters, (
    "quasi-Newton should need fewer evaluations than Adam iterations")
print("OK")
