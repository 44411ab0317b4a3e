"""Batched-parameter QAOA on MaxCut (mirrors reference examples/qaoa_parallel_opt.py)."""


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.applications import graphdata
from tensorcircuit_ng_tpu.templates import blocks

g = graphdata.graph1()
n = g.number_of_nodes()
nlayers = 3


def loss(params):
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for l in range(nlayers):
        blocks.QAOA_block(c, g, params[2 * l], params[2 * l + 1])
    e = sum(jnp.real(c.expectation_ps(z=[a, b])) for a, b in g.edges)
    return e


if __name__ == "__main__":
    batch = 8
    params = jnp.asarray(np.random.default_rng(0).uniform(0, 0.5, size=(batch, 2 * nlayers)), dtype=jnp.float32)
    vvag = tc.backend.vectorized_value_and_grad(loss, argnums=0, vectorized_argnums=0)
    vals, grads = jax.jit(vvag)(params)
    print("batched losses:", np.asarray(vals))
