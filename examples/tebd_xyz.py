"""MPS TEBD for the XYZ chain (mirrors reference examples/xyzmodel_tebd)."""


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.models.mpscircuit import MPSCircuit

n, chi, dt, steps = 24, 32, 0.05, 10
jx, jy, jz = 1.0, 0.8, 0.5


def trotter_step(m, dt):
    for parity in (0, 1):
        for i in range(parity, n - 1, 2):
            m.rxx(i, i + 1, theta=2 * jx * dt)
            m.ryy(i, i + 1, theta=2 * jy * dt)
            m.rzz(i, i + 1, theta=2 * jz * dt)
    return m


if __name__ == "__main__":
    m = MPSCircuit(n, split={"max_singular_values": chi})
    for i in range(0, n, 2):
        m.x(i)  # Néel start
    for s in range(steps):
        trotter_step(m, dt)
        zz = float(np.real(np.asarray(m.expectation_ps(z=[n // 2, n // 2 + 1]))))
        print(f"step {s}: <Z Z>_mid = {zz:.4f}, max bond = {max(m.get_bond_dimensions())}")
