"""Particle-number-conserving dynamics in the U(1) sector
(reference ``u1circuit.py`` role).

An XXZ quench conserves total Sz, so the state never leaves the k-particle
sector: ``U1Circuit`` stores only the C(n,k) amplitudes.  Cross-checked
against the full 2^n simulator, with the sector sizes printed to show the
compression.
"""

import os
import sys
from math import comb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc

n, k, steps = 12, 6, 5
print(f"n={n}, k={k}: sector dim {comb(n, k)} vs full 2^n = {2**n}")

u1 = tc.U1Circuit(n, filled=list(range(0, n, 2)))
full = tc.Circuit(n)
for q in range(0, n, 2):
    full.x(q)

import scipy.linalg as sl

X = np.array([[0, 1], [1, 0.0]])
Y = np.array([[0, -1j], [1j, 0]])
Z = np.diag([1.0, -1.0])
theta, delta = 0.37, 0.5
hb = 0.5 * theta * (np.kron(X, X) + np.kron(Y, Y)) + delta * np.kron(Z, Z)
bond = sl.expm(-0.5j * hb).astype(np.complex64)  # number-conserving XXZ gate
for _ in range(steps):
    for parity in (0, 1):
        for i in range(parity, n - 1, 2):
            u1.any(i, i + 1, unitary=bond)
            full.any(i, i + 1, unitary=bond)

for site in (0, n // 2):
    zu = float(np.real(np.asarray(u1.expectation_z(site))))
    zf = float(np.real(np.asarray(full.expectation_ps(z=[site]))))
    print(f"<Z_{site}>: U1 sector {zu:+.6f} vs full {zf:+.6f}")
    assert abs(zu - zf) < 1e-4

probs_u1 = np.asarray(u1.probability_full())
probs_full = np.abs(np.asarray(full.state())) ** 2
print(f"full-basis probability max diff: {np.abs(probs_u1 - probs_full).max():.2e}")
assert np.abs(probs_u1 - probs_full).max() < 1e-5
print(f"sector simulation exact with {comb(n,k)/2**n:.1%} of the amplitudes")
