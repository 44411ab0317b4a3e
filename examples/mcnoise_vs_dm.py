"""Monte-Carlo trajectory noise vs exact density matrix (mirrors examples/mcnoise_boost.py)."""


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

n, px = 4, 0.02


def make(c, status=None):
    k = 0
    for i in range(n):
        c.h(i)
    for i in range(n - 1):
        c.cnot(i, i + 1)
        if isinstance(c, tc.Circuit):
            c.depolarizing(i + 1, px=px, py=px, pz=px, status=status[k] if status is not None else None)
            k += 1
        else:
            c.depolarizing(i + 1, px=px, py=px, pz=px)
    return c


if __name__ == "__main__":
    dm = make(tc.DMCircuit(n))
    exact = float(np.real(np.asarray(dm.expectation_ps(z=[0, n - 1]))))

    nmc = 10000
    status = jnp.asarray(np.random.default_rng(1).uniform(size=(nmc, n - 1)))

    @jax.jit
    @jax.vmap
    def traj(st):
        c = make(tc.Circuit(n), status=st)
        return jnp.real(c.expectation_ps(z=[0, n - 1]))

    mc = float(jnp.mean(traj(status)))
    print(f"exact DM: {exact:.6f}   MC ({nmc} traj): {mc:.6f}")
