"""N=20 TFIM VQE with scan-layered ansatz (mirrors reference examples/vqetfim_benchmark.py)."""


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import experimental

n, nlayers, steps = 20, 4, 30


def layer(c, p):
    for i in range(n - 1):
        c.rzz(i, i + 1, theta=p[0, i])
    for i in range(n):
        c.rx(i, theta=p[1, i])


def energy(params):
    c0 = tc.Circuit(n)
    for i in range(n):
        c0.h(i)
    c = experimental.scan_circuit_layers(c0, layer, params)
    pairs = [(i, i + 1) for i in range(n - 1)]
    return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()


if __name__ == "__main__":
    import optax

    params = jnp.asarray(np.random.default_rng(0).normal(size=(nlayers, 2, n)) * 0.1, dtype=jnp.float32)
    opt = optax.adam(2e-2)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(energy))
    for step in range(steps):
        v, g = vg(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        if step % 10 == 0:
            print(f"step {step}: E = {float(v):.6f}")
