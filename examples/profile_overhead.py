"""Pin down the fixed per-iteration cost in the VQE scan body."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

n = 20
K = 50
rng = np.random.default_rng(42)


def timed(tag, body):
    def fk(p):
        out, _ = jax.lax.scan(lambda c, _: (body(c), None), p, None, length=K)
        return jnp.sum(out)

    f = jax.jit(fk)
    p0 = jnp.asarray(rng.normal(size=(n,)) * 0.1, dtype=jnp.float32)
    t0 = time.time()
    float(f(p0))
    ct = time.time() - t0
    best = float("inf")
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=(n,)) * 0.1, dtype=jnp.float32)
        t0 = time.time()
        float(f(p))
        best = min(best, (time.time() - t0) / K)
    print(f"{tag:30s} {best*1000:8.3f} ms/iter (compile {ct:.1f}s)")


if __name__ == "__main__":
    from tensorcircuit_ng_tpu.core import statevec as sv

    timed("nothing", lambda p: p * 1.0000001)

    def init_only(p):
        s = sv.init_state(n)
        return p + 1e-9 * jnp.real(s[0])
    timed("init_state", init_only)

    def h_only(p):
        c = tc.Circuit(n)
        c.h_layer()
        return p + 1e-9 * jnp.real(c.state()[0])
    timed("init + h_layer", h_only)

    def rx_nohl(p):
        c = tc.Circuit(n)
        c.rx_layer(p)
        return p + 1e-9 * jnp.real(c.state()[0])
    timed("init + rx_layer", rx_nohl)

    def readout_only(p):
        c = tc.Circuit(n)
        pairs = [(i, i + 1) for i in range(n - 1)]
        e = jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()
        return p + 1e-9 * e
    timed("init + energy readout", readout_only)
