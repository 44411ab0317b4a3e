"""Slice-parallel VQE over a device mesh (reference
``distributed_interface_vqe.py`` role).

``DistributedContractor`` slices the expectation network's largest indices,
shards the slices over all devices with ``NamedSharding``, scans each
device's slice set, and AllReduces — path found once, checkpointable to
disk.  Runs here on 8 virtual CPU devices; the identical code targets a
TPU pod's ICI mesh.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.parallel import DistributedContractor

n, layers = 10, 2


def build(params):
    c = tc.Circuit(n)
    c.h_layer()
    idx = 0
    for _ in range(layers):
        for q in range(n - 1):
            c.rzz(q, q + 1, theta=params[idx]); idx += 1
        for q in range(n):
            c.rx(q, theta=params[idx]); idx += 1
    return c


def ir_fn(params):
    c = build(params)
    return c.expectation_before((tc.gates.z(), [n // 2 - 1]), (tc.gates.z(), [n // 2]))


nparams = layers * (2 * n - 1)
params = jnp.asarray(np.random.default_rng(0).normal(size=nparams) * 0.1, dtype=jnp.float32)

dc = DistributedContractor(ir_fn, params, options={"target_size": 2**8})
rep = dc.report()
print(f"devices: {rep['devices']}, slices: {rep.get('num_slices', '?')}")

lr = 0.08
for step in range(40):
    v, g = dc.value_and_grad(params)
    params = params - lr * g
    if step % 10 == 0:
        print(f"step {step:2d}: <Z Z> = {float(v):+.5f}")

v_final, _ = dc.value_and_grad(params)
dense = float(np.real(np.asarray(build(params).expectation_ps(z=[n // 2 - 1, n // 2]))))
print(f"final distributed value {float(v_final):+.5f} vs dense {dense:+.5f}")
assert abs(float(v_final) - dense) < 1e-4
print("sliced mesh contraction = dense result, gradients included")
