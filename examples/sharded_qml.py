"""Data-sharded QML over a device mesh (mirrors reference VIA_sharding_qml.py).

Run on CPU: XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/sharded_qml.py
"""


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import tensorcircuit_ng_tpu as tc

n, nlayers, batch = 8, 2, 64


def model(params, x):
    c = tc.Circuit(n)
    for i in range(n):
        c.rx(i, theta=x[i])
    for l in range(nlayers):
        for i in range(n - 1):
            c.cnot(i, i + 1)
        for i in range(n):
            c.ry(i, theta=params[l, i])
    return jnp.real(c.expectation_ps(z=[0]))


def loss(params, xs, ys):
    preds = jax.vmap(model, in_axes=(None, 0))(params, xs)
    return jnp.mean((preds - ys) ** 2)


if __name__ == "__main__":
    mesh = Mesh(np.array(jax.devices()), ("data",))
    x_shard = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())
    rng = np.random.default_rng(0)
    xs = jax.device_put(jnp.asarray(rng.normal(size=(batch, n)), dtype=jnp.float32), x_shard)
    ys = jax.device_put(jnp.asarray(rng.integers(0, 2, size=batch) * 2.0 - 1.0, dtype=jnp.float32), NamedSharding(mesh, P("data")))
    params = jax.device_put(jnp.asarray(rng.normal(size=(nlayers, n)) * 0.1, dtype=jnp.float32), rep)
    vg = jax.jit(jax.value_and_grad(loss), out_shardings=(rep, rep))
    for step in range(20):
        v, g = vg(params, xs, ys)
        params = params - 0.1 * g
    print("final loss (data sharded over", len(jax.devices()), "devices):", float(v))
