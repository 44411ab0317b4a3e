"""Light-cone simplification (reference ``lightcone_simplify.py`` role).

For a local observable only the causal cone of gates matters.  With
``enable_lightcone=True`` the engine prunes the QIR to the observable's
cone before contracting — same value, far less work on shallow circuits.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

n, layers = 24, 3


def build(params):
    c = tc.Circuit(n)
    for l in range(layers):
        for q in range(n):
            c.ry(q, theta=params[l, q])
        for q in range(l % 2, n - 1, 2):
            c.cnot(q, q + 1)
    return c


rng = np.random.default_rng(1)
params = jnp.asarray(rng.normal(size=(layers, n)) * 0.3, dtype=jnp.float32)

c = build(params)
z = np.diag([1.0, -1.0]).astype(np.complex64)

t0 = time.time()
full = complex(np.asarray(c.expectation((z, [n // 2]))))
t_full = time.time() - t0

c2 = build(params)
t0 = time.time()
cone = complex(np.asarray(c2.expectation((z, [n // 2]), enable_lightcone=True)))
t_cone = time.time() - t0

print(f"<Z_{n//2}> full state: {full.real:+.6f}  ({t_full*1000:.0f} ms)")
print(f"<Z_{n//2}> light-cone: {cone.real:+.6f}  ({t_cone*1000:.0f} ms)")
# f32 accumulation noise at 2^24 amplitudes is ~1e-4 (f64 agrees to 3e-15)
assert abs(full - cone) < 1e-3
print("identical value; cone contraction touches only",
      f"~{2*layers+1} qubits of {n}")
