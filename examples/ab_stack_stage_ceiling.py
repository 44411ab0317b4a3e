"""Timing ceiling probe: what would fusing the lane/outer stages into the
Pallas kernels save?

Runs the N=20 L=4 fused-energy VQE step three ways in ONE process:
  full      the production path (kernel + outer + lane, fused readout)
  nolane    lane stage skipped in fwd AND bwd (WRONG math, right traffic)
  noglue    lane AND outer stages skipped (kernel-only ceiling)

The delta bounds the achievable saving of in-kernel stage fusion before any
kernel surgery is attempted.
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

SKIP_LANE = {"v": False}
SKIP_OUTER = {"v": False}

_orig_lane_apply = kst._lane_apply
_orig_lane_walk = kst._lane_walk
_orig_outer_apply = kst._outer_apply
_orig_outer_walk = kst._outer_walk


def _lane_apply(mr, mi, xr, xi):
    if SKIP_LANE["v"]:
        return xr, xi
    return _orig_lane_apply(mr, mi, xr, xi)


def _lane_walk(mr, mi, cr, ci):
    if SKIP_LANE["v"]:
        return cr, ci
    return _orig_lane_walk(mr, mi, cr, ci)


def _outer_apply(mr, mi, xr, xi):
    if SKIP_OUTER["v"]:
        return xr, xi
    return _orig_outer_apply(mr, mi, xr, xi)


def _outer_walk(mr, mi, cr, ci):
    if SKIP_OUTER["v"]:
        return cr, ci
    return _orig_outer_walk(mr, mi, cr, ci)


kst._lane_apply = _lane_apply
kst._lane_walk = _lane_walk
kst._outer_apply = _outer_apply
kst._outer_walk = _outer_walk


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
    SKIP_LANE["v"] = True
    nolane = timed("nolane", stepper())
    SKIP_OUTER["v"] = True
    noglue = timed("noglue", stepper())
    print(f"lane stage cost {full-nolane:.3f} ms/step; outer adds "
          f"{nolane-noglue:.3f}; kernel-only floor {noglue:.3f}")


if __name__ == "__main__":
    main()
