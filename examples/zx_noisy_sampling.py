"""Exact conditional sampling of a noisy Clifford+T circuit via ZX
(reference ``zx/stabilizertcircuit.py`` tsim role).

Pauli noise is reduced to an f-basis of independent error bits; outcomes
are drawn by chain rule, so every sample is EXACT (no trajectory
truncation).  The sampled bit statistics match the density-matrix
simulation of the same noisy program.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.zx import StabilizerTCircuit

n, p = 3, 0.1

stc = StabilizerTCircuit(n)
stc.h(0)
stc.cnot(0, 1)
stc.t(1)
stc.cnot(1, 2)
stc.x_error(1, p=p)
stc.h(2)
stc.m(0, 1, 2)

shots = 4000
samples = stc.sample_measurements(shots, seed=7)
freq = np.asarray(samples).mean(axis=0)
print(f"sampled P(m_i=1) over {shots} shots: {np.round(freq, 3)}")

# reference: exact density-matrix of the same program
dm = tc.DMCircuit(n)
dm.h(0)
dm.cnot(0, 1)
dm.t(1)
dm.cnot(1, 2)
dm.apply_general_kraus(
    [np.sqrt(1 - p) * np.eye(2), np.sqrt(p) * np.array([[0, 1], [1, 0.0]])], [1]
)
dm.h(2)
probs = np.real(np.asarray(dm.probability()))
pr = probs.reshape([2] * n)
marg = [pr.sum(axis=tuple(j for j in range(n) if j != i))[1] for i in range(n)]
print(f"exact DM marginals:            {np.round(marg, 3)}")
assert np.abs(freq - np.asarray(marg)).max() < 0.04

# parity m0 XOR m1 is sensitive to the X error (flips the GHZ correlation)
par_s = float(np.mean(np.asarray(samples)[:, 0] != np.asarray(samples)[:, 1]))
par_dm = float(pr[0, 1, :].sum() + pr[1, 0, :].sum())
print(f"P(m0 != m1): sampled {par_s:.3f} vs exact {par_dm:.3f} (= error rate p={p})")
assert abs(par_s - par_dm) < 0.03
print("exact conditional ZX sampling matches the density matrix")
