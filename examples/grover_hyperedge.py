"""Grover search with k-qubit CZ hyperedges (reference ``grover_hyperedge.py`` role).

The oracle and the diffusion reflection both use ``multicz`` — a diagonal
sign flip recorded as a single hyperedge item (one elementwise pass on the
flat state, never a 2^k matrix).  Finds the marked item |111...1⟩ with the
textbook success probability.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc

n = 7
iterations = int(round(math.pi / 4 * math.sqrt(2**n)))

c = tc.Circuit(n)
c.h_layer()
for _ in range(iterations):
    # oracle: flip the phase of |11...1> (a pure hyperedge)
    c.multicz(list(range(n)))
    # diffusion: H X (multicz) X H
    for q in range(n):
        c.h(q)
        c.x(q)
    c.multicz(list(range(n)))
    for q in range(n):
        c.x(q)
        c.h(q)

probs = np.abs(np.asarray(c.state())) ** 2
marked = 2**n - 1
print(f"n={n}, {iterations} Grover iterations")
print(f"P(marked |1...1>) = {probs[marked]:.4f}  (uniform would be {1/2**n:.4f})")
print(f"runner-up prob    = {np.sort(probs)[-2]:.6f}")
assert probs[marked] > 0.9
print("marked state amplified")
