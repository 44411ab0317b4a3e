"""A/B: lane matmul fused INTO the Pallas zzrx kernels vs the XLA lane stage.

Runs the N=20 L=4 fused-energy VQE step both ways in ONE process (same
calibration rules as examples/ab_stack_stage_ceiling.py: K steps inside one
jit via lax.scan, fresh inputs per call, forced host fetch).  The fused
variant saves one full state read+write per layer per direction — the
predicted ceiling from the stage-skip probe; this measures the real thing.

Flip ``kernels_stack.FUSE_LANE`` to the winner afterwards (it gates the
production path used by bench.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import kernels_stack as kst

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
    vg = jax.value_and_grad(energy)

    def body(p, _):
        v, g = vg(p)
        return p - 0.01 * g, v

    return jax.jit(lambda p: jax.lax.scan(body, p, None, length=K))


def timed(tag, fk):
    p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
    t0 = time.time()
    e0 = float(fk(p)[1][-1])
    ct = time.time() - t0
    best = float("inf")
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
        t0 = time.time()
        out = fk(p)
        _ = float(out[1][-1])
        best = min(best, (time.time() - t0) / K)
    print(f"{tag:8s} {best*1000:7.3f} ms/step  (compile {ct:.0f}s, E0={e0:.4f})",
          flush=True)
    return best * 1000, e0


def check_parity():
    """Same params through both paths: energies must agree to f32 noise.

    NOTE: each mode gets a FRESH value_and_grad closure — jax.jit wrappers
    of the SAME function object share the pjit cache, so re-wrapping after
    a flag flip silently reuses the old executable (the parity would then
    trivially report 0).
    """
    p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
    kst.FUSE_LANE = False
    v0, g0 = jax.jit(jax.value_and_grad(lambda q: energy(q)))(p)
    v0 = float(v0)
    g0 = np.asarray(g0)
    kst.FUSE_LANE = True
    v1, g1 = jax.jit(jax.value_and_grad(lambda q: energy(q)))(p)
    dv = abs(float(v1) - v0)
    dg = float(np.abs(np.asarray(g1) - g0).max())
    print(f"parity: |dE|={dv:.2e} |dgrad|max={dg:.2e}", flush=True)
    assert dv < 1e-2 and dg < 1e-2, "fused path DISAGREES — do not flip"


def main():
    check_parity()
    kst.FUSE_LANE = False
    base, _ = timed("unfused", stepper())
    kst.FUSE_LANE = True
    fused, _ = timed("fused", stepper())
    print(f"lane fusion saves {base - fused:.3f} ms/step "
          f"({base:.3f} -> {fused:.3f})")


if __name__ == "__main__":
    main()
