"""VQE pre-training on a truncated Pauli-propagation surrogate.

Reference role: ``examples/spps_pauli_path_vqe.py`` — use a cheap
Heisenberg-picture Pauli-path energy estimate to drive the early
optimization steps, then hand off to the exact engine.

The repo's :class:`PauliPropagationEngine` (k-local weight truncation,
one gather/scatter per gate) gives a surrogate energy whose cost is
independent of 2^n.  Gates must be concrete, so surrogate gradients use
the exact parameter-shift rule (every ansatz gate is a pi-periodic
rotation) rather than AD.  Flow: 30 parameter-shift steps on the k=2
surrogate, then 30 AD steps on the exact statevector engine.

The truncated propagation is LINEAR in the observable, so the whole
TFIM energy propagates as ONE summed coefficient vector per evaluation
(29 strings -> 1 propagation), and the surrogate optimizer is SPSA
(2 evaluations per step) — a few hundred gather/scatter gate
applications total.

Self-checks: (1) surrogate == exact at theta=0 (Clifford prefix keeps
weights <= 2 exactly); (2) surrogate tracks exact within 0.1 at the
small-angle start; (3) surrogate pre-training alone already lowers the
EXACT energy substantially; (4) the fine-tuned energy lands within 2% of
the true ground state.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu
from tensorcircuit_ng_tpu.models.pauliprop import PauliPropagationEngine

n, nlayers = 10, 2
NP = nlayers * (2 * n - 1)
ENG = PauliPropagationEngine(n, k=2)


def build(params):
    params = np.asarray(params)
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    idx = 0
    for _ in range(nlayers):
        for i in range(n - 1):
            c.rzz(i, i + 1, theta=float(params[idx])); idx += 1
        for i in range(n):
            c.rx(i, theta=float(params[idx])); idx += 1
    return c


def _h_vector():
    """Summed coefficient vector of -sum ZZ - sum X (propagation is linear)."""
    import jax.numpy as _jnp
    v = 0.0
    for i in range(n - 1):
        ps = [0] * n
        ps[i] = ps[i + 1] = 3
        v = v - ENG.observable_vector(ps)
    for i in range(n):
        ps = [0] * n
        ps[i] = 1
        v = v - ENG.observable_vector(ps)
    return v


H_VEC = _h_vector()


def surrogate_energy(params):
    c = build(params)
    coeffs = H_VEC
    for item in reversed(list(c.to_qir())):
        g = item["gate"]
        tensor = g.tensor if hasattr(g, "tensor") else g
        coeffs = ENG.apply_gate(coeffs, np.asarray(tensor), item["index"])
    return float(ENG.expectation_zero_state(coeffs))


@jax.jit
def exact_energy(params):
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    idx = 0
    for _ in range(nlayers):
        for i in range(n - 1):
            c.rzz(i, i + 1, theta=params[idx]); idx += 1
        for i in range(n):
            c.rx(i, theta=params[idx]); idx += 1
    e = 0.0
    for i in range(n - 1):
        e = e - jnp.real(c.expectation_ps(z=[i, i + 1], reuse=True))
    for i in range(n):
        e = e - jnp.real(c.expectation_ps(x=[i], reuse=True))
    return e


def main():
    rng = np.random.default_rng(9)
    params = rng.normal(size=NP) * 0.08

    # check 1: theta=0 -> Clifford circuit, k=2 exact
    z = np.zeros(NP)
    s0, e0 = surrogate_energy(z), float(exact_energy(jnp.asarray(z, jnp.float32)))
    assert abs(s0 - e0) < 1e-4, (s0, e0)
    # check 2: small-angle agreement
    s1, e1 = surrogate_energy(params), float(exact_energy(jnp.asarray(params, jnp.float32)))
    print(f"theta=0: surrogate {s0:.5f} == exact {e0:.5f}; "
          f"small-angle: surrogate {s1:.4f} vs exact {e1:.4f}")
    assert abs(s1 - e1) < 0.1

    e_init = e1
    rng2 = np.random.default_rng(31)
    for k in range(60):  # surrogate pre-training (SPSA: 2 evals/step)
        ck = 0.2 / (k + 1) ** 0.101
        ak = 0.25 / (k + 1) ** 0.602
        delta = rng2.choice([-1.0, 1.0], size=NP)
        ep = surrogate_energy(params + ck * delta)
        em = surrogate_energy(params - ck * delta)
        params = params - ak * (ep - em) / (2 * ck) * delta
    e_pre = float(exact_energy(jnp.asarray(params, jnp.float32)))

    p = jnp.asarray(params, jnp.float32)
    opt = optax.adam(0.05)
    state = opt.init(p)
    vg = jax.jit(jax.value_and_grad(exact_energy))
    for k in range(150):  # exact fine-tune
        v, g = vg(p)
        upd, state = opt.update(g, state)
        p = optax.apply_updates(p, upd)
    e_fin = float(exact_energy(p))

    h = np.asarray(qu.PauliStringSum2Dense(
        [[3 if q in (i, i + 1) else 0 for q in range(n)] for i in range(n - 1)]
        + [[1 if q == i else 0 for q in range(n)] for i in range(n)],
        [-1.0] * (n - 1) + [-1.0] * n,
    ))
    e_gs = float(np.linalg.eigvalsh(h)[0])
    print(f"exact energy: init {e_init:.4f} -> surrogate-pretrained {e_pre:.4f} "
          f"-> fine-tuned {e_fin:.4f} (GS {e_gs:.4f})")
    assert e_pre < e_init - 1.0, (e_init, e_pre)  # surrogate steps really help
    assert (e_fin - e_gs) / abs(e_gs) < 0.02
    print("OK")


if __name__ == "__main__":
    main()
