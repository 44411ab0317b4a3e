"""VQNHE on a 4-qubit TFIM: neural post-processing beats the bare circuit.

Reference ``adiabatic_vqnhe.py`` role (arXiv:2106.05105), JAX-native joint
optimization of circuit + neural wavefunction factors.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from tensorcircuit_ng_tpu.applications.vqes import VQNHE

n = 4
ham = []
for i in range(n - 1):
    row = [1.0] + [0] * n
    row[1 + i] = 3
    row[2 + i] = 3
    ham.append(row)
for i in range(n):
    row = [-1.0] + [0] * n
    row[1 + i] = 1
    ham.append(row)

if __name__ == "__main__":
    v = VQNHE(n, ham, model_type="real", nlayers=2, units=16, seed=1)
    e0 = v.plain_evaluation()
    best, _, _ = v.training(maxiter=300, verbose=False)
    eh, ep = v.evaluation()
    print(f"initial circuit energy: {e0:.6f}")
    print(f"trained hybrid energy:  {eh:.6f} (plain circuit part {ep:.6f})")
