"""Kernel-INTERIOR anatomy of the N=20 L=4 fused VQE step.

The round-4 stage ceiling (examples/ab_stack_stage_ceiling.py) put the
kernel-only floor at 1.34 ms of a 1.58 step; this probe decomposes the
floor itself by stubbing stages INSIDE the Pallas zzrx kernels (WRONG
math, right memory traffic):

  full      production (after the _butterfly_rx specialization)
  nozz      zz expo dot + cos/sin + phase mul skipped, fwd AND bwd
  nograds   per-qubit dθ reductions and dzz accumulation skipped (bwd)
  norolls   the roll-butterfly chains skipped, fwd AND bwd
  shell     all of the above: HBM traffic + lane matmuls + dispatch only

The deltas bound what any further interior optimization can win (roofline
0.287 ms; VERDICT r4 task: <=1.2 ms/step or prove the floor).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import kernels_rowlayer as krl

n, nlayers, K = 20, 4, 250
pairs = [(i, i + 1) for i in range(n - 1)]
rng = np.random.default_rng(42)


def energy(p):
    c = tc.Circuit(n)
    c.h_layer()
    for l in range(nlayers):
        c.zzrx_layer(pairs, p[l, 0, : n - 1], p[l, 1])
    return c.expectation_zzx_energy(pairs, 1.0, -1.0)


def stepper():
    # FRESH closure per mode: jit of the same function object would reuse
    # the previous mode's executable (CLAUDE.md round-4 pjit-cache lesson)
    vg = jax.value_and_grad(lambda q: energy(q))

    def body(p, _):
        v, g = vg(p)
        return p - 0.01 * g, v

    return jax.jit(lambda p: jax.lax.scan(body, p, None, length=K))


def timed(tag, fk):
    p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
    t0 = time.time()
    float(fk(p)[1][-1])
    ct = time.time() - t0
    best = float("inf")
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
        t0 = time.time()
        out = fk(p)
        _ = float(out[1][-1])
        best = min(best, (time.time() - t0) / K)
    print(f"{tag:8s} {best*1000:7.3f} ms/step  (compile {ct:.0f}s)", flush=True)
    return best * 1000


def main():
    full = timed("full", stepper())
    krl._SKIP_ZZ = True
    nozz = timed("nozz", stepper())
    krl._SKIP_ZZ = False
    krl._BWD_SKIP_GRADS = True
    nograds = timed("nograds", stepper())
    krl._BWD_SKIP_GRADS = False
    krl._SKIP_ROLLS = True
    norolls = timed("norolls", stepper())
    krl._SKIP_ZZ = True
    krl._BWD_SKIP_GRADS = True
    shell = timed("shell", stepper())
    krl._SKIP_LANE_DOTS = True
    husk = timed("husk", stepper())
    print(
        f"zz stage {full-nozz:.3f} ms/step; grad reductions "
        f"{full-nograds:.3f}; roll chains {full-norolls:.3f}; "
        f"shell (traffic+lane+dispatch) {shell:.3f}; "
        f"husk (traffic+dispatch only) {husk:.3f}"
    )


if __name__ == "__main__":
    main()
