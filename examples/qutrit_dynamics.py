"""Qutrit (d=3) circuit dynamics (reference ``quditcircuit.py`` role).

A three-level GHZ analog built from generalized Hadamard + SUM gates,
verified against the explicit state; then parameterized qutrit rotations
trained by AD to maximize a target population.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

n, d = 3, 3

# GHZ_3: H_3 on wire 0, then SUM cascades
c = tc.QuditCircuit(n, dim=d)
c.h(0)
c.csum(0, 1)
c.csum(1, 2)
state = np.asarray(c.state())
amp0 = state[0]
amp1 = state[int("111", d)] if d <= 10 else None
amp2 = state[int("222", d)]
print(f"qutrit GHZ amplitudes: |000> {abs(amp0):.4f}, |111> {abs(amp1):.4f}, |222> {abs(amp2):.4f}")
assert abs(abs(amp0) - 1 / np.sqrt(3)) < 1e-5
assert abs(abs(amp1) - 1 / np.sqrt(3)) < 1e-5
assert abs(abs(amp2) - 1 / np.sqrt(3)) < 1e-5

# trainable qutrit rotation: drive |0> population of wire 0 into |2>
def pop2(theta):
    cc = tc.QuditCircuit(1, dim=d)
    cc.rx(0, theta=theta, j=0, k=2)  # rx rotation in the (0,2) subspace
    s = cc.state()
    return jnp.abs(s[2]) ** 2


g = jax.grad(pop2)
theta = jnp.asarray(0.3)
for _ in range(60):
    theta = theta + 0.3 * g(theta)
print(f"optimized theta: {float(theta):.4f}, P(|2>) = {float(pop2(theta)):.6f}")
assert float(pop2(theta)) > 0.999
print("qutrit gates differentiate and train")
