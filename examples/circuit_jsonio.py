"""Circuit persistence round-trips (reference ``jsonio.py`` role).

JSON and OpenQASM 2 both reproduce the exact state; JSON also preserves
parameterized-gate metadata so the reloaded circuit stays differentiable.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

c = tc.Circuit(4)
c.h(0)
c.cnot(0, 1)
c.rx(2, theta=0.37)
c.rzz(2, 3, theta=-0.8)
c.cz(1, 2)

# JSON round trip
js = c.to_json()
c2 = tc.Circuit.from_json(js)
ov = abs(np.vdot(np.asarray(c.state()), np.asarray(c2.state())))
print(f"JSON round trip overlap: {ov:.8f} ({len(js)} bytes)")
assert ov > 1 - 1e-6

# OpenQASM round trip
qasm = c.to_openqasm()
c3 = tc.Circuit.from_openqasm(qasm)
ov3 = abs(np.vdot(np.asarray(c.state()), np.asarray(c3.state())))
print(f"QASM round trip overlap: {ov3:.8f}")
assert ov3 > 1 - 1e-6

# the reloaded JSON circuit still differentiates
def e(theta):
    cc = tc.Circuit.from_json(js)
    cc.rx(3, theta=theta)
    return jnp.real(cc.expectation_ps(z=[3]))

g = float(jax.grad(e)(jnp.asarray(0.2)))
print(f"grad through reloaded circuit: {g:+.6f}")
print("round trips exact")
