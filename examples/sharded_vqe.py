"""Term-sharded VQE over a device mesh (mirrors examples/ng_whitepaper/VIA_sharding_vqe.py).

Run on CPU with: XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/sharded_vqe.py
"""


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.parallel import term_sharded_expectation

n, nlayers = 10, 2
ndev = len(jax.devices())

ls, ws = [], []
for i in range(n - 1):
    l = [0] * n
    l[i] = 3
    l[i + 1] = 3
    ls.append(l)
    ws.append(1.0)
for i in range(n):
    l = [0] * n
    l[i] = 1
    ls.append(l)
    ws.append(-1.0)
while len(ls) % ndev:
    ls.append([0] * n)
    ws.append(0.0)


def state_fn(params):
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for l in range(nlayers):
        for i in range(n - 1):
            c.rzz(i, i + 1, theta=params[l, 0, i])
        for i in range(n):
            c.rx(i, theta=params[l, 1, i])
    return c.state()


if __name__ == "__main__":
    energy = term_sharded_expectation(state_fn, np.array(ls), np.array(ws))
    params = jnp.asarray(np.random.default_rng(0).normal(size=(nlayers, 2, n)) * 0.1, dtype=jnp.float32)
    print("sharded energy over", ndev, "devices:", float(energy(params)))
    g = jax.grad(lambda p: energy(p))(params)
    print("grad norm:", float(jnp.linalg.norm(g)))
