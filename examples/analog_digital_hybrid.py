"""Digital-analog hybrid circuit (reference ``analog_evolution_jax.py`` role).

``AnalogCircuit`` interleaves digital gates with ODE-integrated analog
Hamiltonian blocks (time-dependent drive); gradients flow through the ODE
solve, so the analog ramp time is directly optimizable.
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

n = 4
terms, ws = [], []
for i in range(n - 1):
    l = [0] * n
    l[i] = 3
    l[i + 1] = 3
    terms.append(l)
    ws.append(1.0)
for i in range(n):
    l = [0] * n
    l[i] = 1
    terms.append(l)
    ws.append(-1.0)
# static numpy pieces; the time dependence enters as a traced scalar mix
Hzz = np.asarray(qu.PauliStringSum2Dense(
    jnp.asarray(np.array(terms[: n - 1]), dtype=jnp.int32),
    jnp.asarray(np.array(ws[: n - 1]), dtype=jnp.float32)))
Hx = np.asarray(qu.PauliStringSum2Dense(
    jnp.asarray(np.array(terms[n - 1 :]), dtype=jnp.int32),
    jnp.asarray(np.array(ws[n - 1 :]), dtype=jnp.float32)))


def fidelity_to_ghz(amp):
    def hfun(t):
        # ramped TFIM drive, amplitude `amp` is the trainable knob
        return jnp.asarray(Hzz) + amp * jnp.sin(t) ** 2 * jnp.asarray(Hx)

    c = tc.AnalogCircuit(n)
    c.h(0)                      # digital
    for i in range(n - 1):
        c.cnot(i, i + 1)        # digital GHZ prep
    c.add_analog_block(hfun, 0.6)  # analog evolution for fixed duration
    s = c.state()
    ghz = np.zeros(2**n); ghz[0] = ghz[-1] = 1 / np.sqrt(2)
    return jnp.abs(jnp.vdot(jnp.asarray(ghz, dtype=s.dtype), s)) ** 2


f0 = float(fidelity_to_ghz(jnp.asarray(0.01)))
f1 = float(fidelity_to_ghz(jnp.asarray(1.5)))
g = float(jax.grad(fidelity_to_ghz)(jnp.asarray(0.7)))
print(f"GHZ fidelity: amp=0.01 -> {f0:.5f}, amp=1.5 -> {f1:.5f}")
print(f"d fidelity / d amp at 0.7: {g:+.5f} (AD through the ODE solve)")
assert f0 > 0.9 and f1 < f0
assert abs(g) > 1e-4
print("analog block integrates and differentiates")
