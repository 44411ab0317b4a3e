"""A/B: grand-fused one-kernel L-layer BACKWARD vs per-layer adjoint chain.

N=20 L=4 fused-energy VQE step (the bench program), ONE process, fresh
value_and_grad closure per mode (pjit-cache lesson).  The forward is the
per-layer production chain in both modes; only the backward differs:

  off  per-layer bwd kernels + XLA outer-stage adjoint (production)
  on   ONE pallas call over an (L, G) grid: cotangent VMEM-resident across
       layers, dθ_outer computed in-kernel against the resident residual,
       scalar grads ride one-hot lanes of a (L, 8, P) grads block
       (kernels_grand.grand_zzrx_bwd; theta-level custom-vjp boundary
       kernels_stack.zzrx_stack_energy_theta)

This is the "+bwd" sub-step of VERDICT r4 #1 that FUSE_GRAND (forward-only,
refuted 1.404 -> 1.450) never tried.  The backward has no residual
double-write penalty: it reads ks (residuals) and writes only the cotangent
ping-pong, so the grand version strictly removes dispatches and HBM round
trips.  Parity: hardware smoke 2026-08-20 (n=18 L=2): dE bit-exact,
|dgrad|max 1.6e-3 (documented f32 band).  Flip kernels_stack.FUSE_GRAND_BWD
if this wins, then re-run bench.py.
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
    vg = jax.value_and_grad(lambda q: energy(q))  # fresh closure per mode

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
    print(f"{tag:6s} {best*1000:7.3f} ms/step  (compile {ct:.0f}s)", flush=True)
    return best * 1000


def check_parity():
    p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
    kst.FUSE_GRAND_BWD = False
    v0, g0 = jax.jit(jax.value_and_grad(lambda q: energy(q)))(p)
    v0 = float(v0)
    g0 = np.asarray(g0)
    kst.FUSE_GRAND_BWD = True
    v1, g1 = jax.jit(jax.value_and_grad(lambda q: energy(q)))(p)
    dv = abs(float(v1) - v0)
    dg = float(np.abs(np.asarray(g1) - g0).max())
    print(f"parity: |dE|={dv:.2e} |dgrad|max={dg:.2e}", flush=True)
    assert dv < 2e-2 and dg < 2e-2  # documented cross-path f32 band


def main():
    kst.FUSE_GRAND_BWD = False
    t_off = timed("off", stepper())
    kst.FUSE_GRAND_BWD = True
    t_on = timed("on", stepper())
    print(f"grand bwd: {t_off:.3f} -> {t_on:.3f} ms/step "
          f"({t_off/t_on:.3f}x)", flush=True)
    check_parity()


if __name__ == "__main__":
    main()
