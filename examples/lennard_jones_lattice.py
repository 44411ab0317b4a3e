"""Differentiable lattice geometry: Lennard-Jones lattice-constant optimization.

Reference role: ``examples/lennard_jones_optimization.py`` — find the
equilibrium lattice constant of a 2D square crystal by minimizing the total
Lennard-Jones energy with automatic differentiation.

TPU-native formulation: the lattice STRUCTURE (which pairs exist, the
minimum-image topology) is static numpy built once by the lattice template;
the SCALE rides the trace.  For a uniformly scaled lattice the distance
matrix is ``a * D0`` with ``D0`` the unit-constant matrix, so the whole
geometry stays differentiable through one traced scalar — no dynamic shapes,
one jit, XLA fuses the pair sums.  The optimized constant is validated
against the analytic LJ minimum of the same pair sum.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

import tensorcircuit_ng_tpu as tc

EPS, SIGMA = 0.5, 1.0

# static structure: unit-constant periodic square lattice
lat = tc.templates.lattice.SquareLattice((4, 4), lattice_constant=1.0, pbc=True)
d0 = np.asarray(lat.distance_matrix())
mask = 1.0 - np.eye(lat.num_sites)
d0 = jnp.asarray(np.where(d0 > 1e-9, d0, 1.0))
mask = jnp.asarray(mask)


def potential(log_a):
    d = jnp.exp(log_a) * d0  # differentiable geometry: traced scale
    t6 = (SIGMA / d) ** 6
    return jnp.sum(mask * 4.0 * EPS * (t6 * t6 - t6)) / 2.0


vg = jax.jit(jax.value_and_grad(potential))
opt = optax.adam(0.01)
log_a = jnp.log(jnp.asarray(2.0))
state = opt.init(log_a)
t0 = time.time()
for i in range(400):
    e, g = vg(log_a)
    upd, state = opt.update(g, state)
    log_a = optax.apply_updates(log_a, upd)
    if (i + 1) % 100 == 0:
        print(f"iter {i+1}: E = {float(e):.6f}, a = {float(jnp.exp(log_a)):.6f}")
a_opt = float(jnp.exp(log_a))
e_opt = float(potential(log_a))
print(f"optimized a = {a_opt:.6f}, E = {e_opt:.6f}  ({time.time()-t0:.1f}s)")

# validation: dense scan of the same energy curve
a_grid = np.linspace(0.8, 1.6, 4001)
e_grid = jax.vmap(potential)(jnp.log(jnp.asarray(a_grid)))
i_min = int(jnp.argmin(e_grid))
a_scan, e_scan = float(a_grid[i_min]), float(e_grid[i_min])
print(f"scan minimum  a = {a_scan:.6f}, E = {e_scan:.6f}")
assert abs(a_opt - a_scan) < 2e-3, (a_opt, a_scan)
assert e_opt <= e_scan + 1e-6
# gradient at the optimum vanishes
assert abs(float(vg(log_a)[1])) < 1e-4
print("OK: AD optimization matches the dense energy-curve minimum")
