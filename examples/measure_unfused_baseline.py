"""Record the UNFUSED per-gate engine step time for BENCH_BASELINE.json.

This is the architecture-equivalent of the reference's per-gate contraction
(one einsum per gate, one expectation contraction per Hamiltonian term) run
on the same TPU chip.  The scanned AD program OOMs the axon compile helper
for K>=10, so this measures K=1 (single step per dispatch); subtract the
~40ms tunnel dispatch floor when comparing to scan-based numbers.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

n = 20
nlayers = 4
K = 1


def energy(params):
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for l in range(nlayers):
        for i in range(n - 1):
            c.rzz(i, i + 1, theta=params[l, 0, i])
        for i in range(n):
            c.rx(i, theta=params[l, 1, i])
    e = sum(jnp.real(c.expectation_ps(z=[i, i + 1])) for i in range(n - 1))
    e -= sum(jnp.real(c.expectation_ps(x=[i])) for i in range(n))
    return e


vg = jax.value_and_grad(energy)


def body(p, _):
    v, g = vg(p)
    return p - 0.01 * g, v


fk = jax.jit(lambda p: jax.lax.scan(body, p, None, length=K))

rng = np.random.default_rng(42)
p0 = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, dtype=jnp.float32)
t0 = time.time()
out = fk(p0)
e = float(out[1][-1])
print(f"compile+first: {time.time()-t0:.1f}s, E={e:.4f}")
best = float("inf")
for _ in range(3):
    p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, dtype=jnp.float32)
    t0 = time.time()
    out = fk(p)
    _ = float(out[1][-1])
    best = min(best, (time.time() - t0) / K)
print(json.dumps({"unfused_step_ms": best * 1000.0, "K": K}))
