"""Imaginary-time ParallelTEBD: TFIM ground state to machine precision.

Demonstrates the batched Vidal-form engine (``tc.ParallelTEBD``) doing
what DMRG usually does — but with all same-parity bonds updating in one
vmapped batch per half-step, which is the layout TPUs want (on TPU the
truncation runs in the Pallas one-sided Jacobi kernel,
``core/kernels_jacobi.py``).

Three things matter for exactness, all shown here:
- per-bond gate stacks with boundary-corrected bond Hamiltonians (a
  uniform bond gate undercounts the edge fields on open chains),
- a second-order Trotter splitting (half-even, odd, half-even),
- periodic :meth:`canonicalize` during non-unitary evolution.

Validated: n=10, chi=16 reaches the exact diagonalization energy to ~1e-6.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.linalg as sl

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
import tensorcircuit_ng_tpu.quantum as qu

n, chi, g = 10, 16, 1.0
X = np.array([[0, 1], [1, 0.0]])
Z = np.diag([1.0, -1.0])


def hbond(i: int) -> np.ndarray:
    """Bond Hamiltonian with single-site fields split across bonds."""
    h = -np.kron(Z, Z) - g * 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
    if i == 0:
        h += -g * 0.5 * np.kron(X, np.eye(2))
    if i == n - 2:
        h += -g * 0.5 * np.kron(np.eye(2), X)
    return h


def gate_stack(parity: int, tau: float) -> np.ndarray:
    return np.stack(
        [sl.expm(-tau * hbond(i)).astype(np.complex64) for i in range(parity, n - 1, 2)]
    )


eng = tc.ParallelTEBD(n, chi, initial="zeros")
for tau, steps in ((0.2, 100), (0.05, 150), (0.01, 300)):
    half_even = gate_stack(0, tau / 2)
    full_odd = gate_stack(1, tau)
    for k in range(steps):
        eng.apply_two_site_layer(half_even, 0)
        eng.apply_two_site_layer(full_odd, 1)
        eng.apply_two_site_layer(half_even, 0)
        if k % 20 == 19:
            eng.canonicalize()
eng.canonicalize()

energy = sum(
    float(jnp.real(eng.expectation_two_site(hbond(i), i))) for i in range(n - 1)
)

# exact reference
terms, weights = [], []
for i in range(n - 1):
    l = [0] * n
    l[i] = 3
    l[i + 1] = 3
    terms.append(l)
    weights.append(-1.0)
for i in range(n):
    l = [0] * n
    l[i] = 1
    terms.append(l)
    weights.append(-g)
H = np.asarray(
    qu.PauliStringSum2Dense(
        jnp.asarray(np.array(terms), dtype=jnp.int32),
        jnp.asarray(np.array(weights), dtype=jnp.float32),
    )
).real
e_exact = float(np.linalg.eigvalsh(H)[0])

print(f"TEBD energy:  {energy:.6f}")
print(f"exact energy: {e_exact:.6f}")
print(f"error:        {abs(energy - e_exact):.2e}")
print(f"mid-bond entanglement entropy: {float(eng.entanglement_entropy(n // 2)):.4f}")
