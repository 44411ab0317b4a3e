"""Classical shadows: Pauli-basis snapshots → observable estimation
(reference shadows examples' role).

Random-Pauli measurement snapshots of a GHZ-like state reconstruct local
expectation values and 2-local correlators with the standard shadow
estimator; vmapped snapshot generation keeps everything in one jit.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import shadows

n, nshots = 4, 12000

c = tc.Circuit(n)
c.h(0)
for i in range(n - 1):
    c.cnot(i, i + 1)
c.rx(1, theta=0.35)
psi = c.state()

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
pauli_strings = jax.random.randint(k1, (nshots, n), 0, 3)
status = jax.random.uniform(k2, (nshots, n))
snapshots = shadows.shadow_snapshots(psi, pauli_strings, status)

# exact values from the dense state
exact_z01 = float(np.real(np.asarray(c.expectation_ps(z=[0, 1]))))
exact_x_all = float(np.real(np.asarray(c.expectation_ps(x=list(range(n))))))

ps_z01 = [3, 3, 0, 0]
ps_x_all = [1] * n
est_z01 = float(np.real(np.asarray(shadows.expectation_ps_shadow(snapshots, pauli_strings, ps=ps_z01, k=9)[0])))
est_x = float(np.real(np.asarray(shadows.expectation_ps_shadow(snapshots, pauli_strings, ps=ps_x_all, k=9)[0])))

print(f"<Z0 Z1>: shadow {est_z01:+.3f} vs exact {exact_z01:+.3f}")
print(f"<X⊗X⊗X⊗X>: shadow {est_x:+.3f} vs exact {exact_x_all:+.3f}")
assert abs(est_z01 - exact_z01) < 0.15
assert abs(est_x - exact_x_all) < 0.25  # var(3-design shadow) ~ 3^4 per snapshot
print(f"{nshots} snapshots estimate both observables within shot noise")
