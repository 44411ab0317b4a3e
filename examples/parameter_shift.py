"""Parameter-shift gradients vs autodiff (reference ``parameter_shift.py`` role).

Hardware backends can't autodiff — the parameter-shift rule evaluates the
same circuit at θ±π/2 instead.  ``experimental.parameter_shift_grad`` must
agree with ``jax.grad`` exactly for standard rotation gates.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.experimental import parameter_shift_grad

n, layers = 5, 2


def energy(params):
    c = tc.Circuit(n)
    for l in range(layers):
        for q in range(n):
            c.rx(q, theta=params[l, 0, q])
        for q in range(n - 1):
            c.rzz(q, q + 1, theta=params[l, 1, q])
    return jnp.real(c.expectation_ps(z=[0, 1]))


rng = np.random.default_rng(0)
p0 = jnp.asarray(rng.normal(size=(layers, 2, n)) * 0.4, dtype=jnp.float32)

g_ad = jax.grad(energy)(p0)
g_ps = parameter_shift_grad(energy)(p0)

diff = float(jnp.abs(g_ad - g_ps).max())
print(f"autodiff grad norm:        {float(jnp.linalg.norm(g_ad)):.6f}")
print(f"parameter-shift grad norm: {float(jnp.linalg.norm(g_ps)):.6f}")
print(f"max |difference|:          {diff:.2e}")
assert diff < 1e-4
print("parameter-shift matches autodiff")
