"""Adiabatic VQNHE: dissociation-style curve with warm-started joint training.

Reference role: ``examples/adiabatic_vqnhe.py`` — sweep a family of
Hamiltonians (the reference walks LiH bond lengths loaded from disk) and run
the variational quantum-neural hybrid eigensolver at each point, seeding
every new point from the best parameters of the previous one ("adiabatic"
initialization).  The reference's molecular integrals come from a data file
that is not shipped; this port sweeps the 4-qubit transverse-field Ising
coupling — a curve with the same level-crossing structure — and validates
every point against exact diagonalization, plus checks that warm starts
converge in fewer iterations than cold starts at the hardest point.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.applications.vqes import VQNHE, construct_matrix

n = 4


def tfim_rows(g):
    """Hamiltonian rows [w, code_1..code_n]: -sum ZZ - g sum X."""
    rows = []
    for i in range(n - 1):
        code = [0] * n
        code[i] = code[i + 1] = 3
        rows.append([-1.0] + code)
    for i in range(n):
        code = [0] * n
        code[i] = 1
        rows.append([-float(g)] + code)
    return rows


def run_point(g, warm=None, maxiter=250):
    inst = VQNHE(n, tfim_rows(g), model_type="real", nlayers=2, units=12)
    if warm is not None:
        inst.assign(cparams=warm[0], mparams=warm[1])
    e, cp, mp = inst.training(maxiter=maxiter)
    return e, (cp, mp), inst


# sweep from the paramagnetic (easy, product-like) side DOWN into the
# ferromagnetic phase — the adiabatic point of the exercise: a cold start
# at g=0.4 gets stuck in a symmetric-sector local minimum (err ~2e-2 for
# every model type/width we tried), while the warm chain walks through it
gs = [1.6, 1.3, 1.0, 0.7, 0.4]
warm = None
history = []
print("adiabatic sweep (warm-started, paramagnetic -> ferromagnetic):")
for g in gs:
    e, warm, inst = run_point(g, warm, maxiter=600 if warm is None else 300)
    e_exact = float(np.linalg.eigvalsh(construct_matrix(tfim_rows(g))).min())
    err = e - e_exact
    history.append((g, e, e_exact))
    print(f"  g={g:.1f}: E = {e:.6f} (exact {e_exact:.6f}, err {err:.2e})")
    assert err < 5e-3, (g, err)

# the control: a cold start at the hardest point with MORE iterations
# still lands in the local minimum the adiabatic chain avoided
g_hard = 0.4
e_cold, _, _ = run_point(g_hard, warm=None, maxiter=900)
e_warm = history[-1][1]
e_exact = history[-1][2]
print(f"g={g_hard}: warm {e_warm:.6f} vs cold(900 iters) {e_cold:.6f} "
      f"(exact {e_exact:.6f})")
assert e_warm < e_cold - 1e-3, (e_warm, e_cold)
print("OK: the adiabatic chain tracks the exact curve; cold start is trapped")
