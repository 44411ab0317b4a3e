"""NoiseConf: one noise description, two execution engines
(reference ``noisemodel.py`` role).

The same gate-attached noise model runs (a) exactly on the density-matrix
simulator and (b) as vmapped Monte-Carlo trajectories on the statevector
simulator (jittable: all randomness enters via the ``status`` tensor).
The MC mean converges to the exact value.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

n = 4


def build(c):
    for q in range(n):
        c.h(q)
    for q in range(n - 1):
        c.cnot(q, q + 1)
    for q in range(n):
        c.rz(q, theta=0.4)
        c.h(q)
    return c


noise = tc.NoiseConf()
noise.add_noise("cnot", tc.channels.depolarizingchannel(0.02, 0.02, 0.02))
noise.add_noise("h", tc.channels.phasedampingchannel(0.01))

# exact: the SAME noise model replayed on the density-matrix simulator
dmc = build(tc.DMCircuit(n))
e_exact = float(np.real(np.asarray(
    dmc.expectation_ps(z=[0, 1], noise_conf=noise)
)))
c = build(tc.Circuit(n))

# Monte-Carlo trajectories (vmapped over status)
nmc = 2000
key = jax.random.PRNGKey(0)
status = jax.random.uniform(key, (nmc, 14))  # one uniform per noisy gate site
e_mc = float(np.real(np.asarray(
    c.expectation_ps(z=[0, 1], noise_conf=noise, nmc=nmc, status=status)
)))

# noiseless for contrast
e_clean = float(np.real(np.asarray(build(tc.Circuit(n)).expectation_ps(z=[0, 1]))))

print(f"noiseless:        {e_clean:+.5f}")
print(f"exact (DM):       {e_exact:+.5f}")
print(f"MC ({nmc} traj):  {e_mc:+.5f}")
assert abs(e_mc - e_exact) < 0.05
print("trajectory average matches the exact channel evolution")
