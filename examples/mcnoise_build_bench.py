"""general_kraus Monte-Carlo build-time benchmark.

Reference claim (reference ``circuit.py:520-528`` comment): jit build of a
12-qubit x 5-layer general_kraus trajectory circuit takes ~100 s (370 s for
14x7) on an NVIDIA T4; run 0.35 s.  This harness measures the same shape on
TPU with the status-tensor trajectory engine.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.ops import channels as CH


def run(n, nlayers):
    kraus = CH.depolarizingchannel(0.01, 0.01, 0.01)

    def trajectory(params, status):
        c = tc.Circuit(n)
        k = 0
        for l in range(nlayers):
            for i in range(n):
                c.rx(i, theta=params[l, i])
            for i in range(n - 1):
                c.cnot(i, i + 1)
            for i in range(n):
                c.general_kraus(kraus, i, status=status[k])
                k += 1
        return jnp.real(c.expectation_ps(z=[0, n - 1]))

    nstat = nlayers * n
    f = jax.jit(trajectory)
    params = jnp.asarray(
        np.random.default_rng(0).normal(size=(nlayers, n)) * 0.2, dtype=jnp.float32
    )
    status = jnp.asarray(np.random.default_rng(1).uniform(size=(nstat,)), dtype=jnp.float32)
    t0 = time.time()
    v = float(f(params, status))
    build = time.time() - t0
    t0 = time.time()
    reps = 20
    for r in range(reps):
        v = float(f(params + 1e-6 * r, status))
    runt = (time.time() - t0) / reps
    print(
        f"n={n} layers={nlayers}: jit build {build:.1f}s "
        f"(reference T4: ~100s @12x5, 370s @14x7), run {runt*1000:.1f} ms/trajectory"
    )


if __name__ == "__main__":
    run(12, 5)
    run(14, 7)
