"""Stabilizer workflow: random Clifford dynamics + entropy + sampling.

Reference ``clifford_optimization.py`` / stim-adjacent roles on the
C++-bit-packed tableau engine (``core/native_tableau.py``): evolve a random
Clifford circuit, track stabilizer Rényi entropy of subsystems, and
cross-check sampling statistics against the dense simulator.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc

n, depth, seed = 12, 60, 3
rng = np.random.default_rng(seed)

sc = tc.StabilizerCircuit(n)
dc = tc.Circuit(n)
for _ in range(depth):
    q = int(rng.integers(n))
    gate = rng.choice(["h", "s", "cnot"])
    if gate == "cnot":
        p = int(rng.integers(n))
        if p == q:
            p = (q + 1) % n
        sc.cnot(q, p)
        dc.cnot(q, p)
    else:
        getattr(sc, gate)(q)
        getattr(dc, gate)(q)

# entanglement entropy of the left half from the tableau (exact for
# stabilizer states) vs the dense reduced density matrix
ent_tab = float(sc.entanglement_entropy(list(range(n // 2))))
rho = np.asarray(tc.quantum.reduced_density_matrix(dc.state(), [i for i in range(n // 2, n)]))
evals = np.linalg.eigvalsh(rho)
evals = evals[evals > 1e-12]
ent_dense = float(-(evals * np.log(evals)).sum())  # nats, matching the tableau convention
print(f"left-half entropy: tableau {ent_tab:.4f} vs dense {ent_dense:.4f}")
assert abs(ent_tab - ent_dense) < 1e-4

# sampling statistics agree
shots = 4000
samples = sc.sample(batch=shots, format="sample_bin")
marg_tab = np.mean(np.asarray(samples)[:, 0])
probs = np.abs(np.asarray(dc.state())) ** 2
marg_dense = probs.reshape(2, -1).sum(axis=1)[1]
print(f"P(q0=1): tableau {marg_tab:.3f} vs dense {marg_dense:.3f} ({shots} shots)")
assert abs(marg_tab - marg_dense) < 0.05
print("tableau engine agrees with dense simulation")
