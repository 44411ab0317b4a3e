"""Micro-benchmarks de-risking the grand L-layer kernel fusion.

The husk anatomy (examples/ab_kernel_interior.py) showed the N=20 L=4 VQE
step is glue-bound: traffic + dispatch + XLA outer = 1.02 of 1.44 ms.  A
grand fusion (ONE fwd kernel, grid (L, G), whole-state VMEM residency,
outer stage as a D=8 leading-axis dot on the resident buffer) could kill
the inter-layer round trips and dispatches — IF Mosaic handles three
unknowns efficiently:

  m1  whole-state resident refs + per-(l,j) dynamic block slice/write
      (pure data movement: the fusion's skeleton)
  m2  + the 10 static-roll butterflies and the in-kernel lane MXU dot
      per block (the real per-layer compute, on the skeleton)
  m3  + the outer stage at the end of each layer as ONE complex
      (D,D)x(D,rb,lanes) leading-axis dot_general on the resident state

Reference comparison: the production fwd path (4 kernel dispatches + XLA
outer) measured via its own K-scan.  All timings one process, fresh
inputs, host fetch (axon rules).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import kernels_rowlayer as krl

n, L, K = 20, 4, 250
NROW, LANES = 13, 128  # 2^13 x 128 = 2^20
R_TOT = 2**NROW
RB = 1024  # kernel block rows (10 row qubits)
G = R_TOT // RB  # 8 grid blocks = 3 outer qubits
D = G

rng = np.random.default_rng(0)


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)


def _micro_kernel(level):
    """grid (L, G); whole-state in/out refs; scratch ping-pong buffer."""

    def kernel(cs_ref, mlr_ref, mli_ref, mor_ref, moi_ref,
               sr_ref, si_ref, or_ref, oi_ref, ar, ai):
        l = pl.program_id(0)
        j = pl.program_id(1)

        # ping-pong: even layers read (input if l==0 else OUT) write SCRATCH,
        # odd layers read SCRATCH write OUT — even L ends in OUT.
        def body(read_in, read_out, write_scratch):
            if read_in:
                xr = sr_ref[pl.ds(j * RB, RB), :]
                xi = si_ref[pl.ds(j * RB, RB), :]
            elif read_out:
                xr = or_ref[pl.ds(j * RB, RB), :]
                xi = oi_ref[pl.ds(j * RB, RB), :]
            else:
                xr = ar[pl.ds(j * RB, RB), :]
                xi = ai[pl.ds(j * RB, RB), :]
            if level >= 2:
                rows = jax.lax.broadcasted_iota(jnp.int32, (RB, LANES), 0)
                for ql in range(10):
                    s = RB >> (ql + 1)
                    c = cs_ref[l, ql, 0]
                    sn = cs_ref[l, ql, 1]
                    xr, xi = krl._butterfly_rx(xr, xi, rows, s, c, -sn)
                mlr = mlr_ref[0]
                mli = mli_ref[0]
                f32 = jnp.float32
                yr = jnp.dot(xr, mlr, preferred_element_type=f32) - jnp.dot(
                    xi, mli, preferred_element_type=f32)
                yi = jnp.dot(xr, mli, preferred_element_type=f32) + jnp.dot(
                    xi, mlr, preferred_element_type=f32)
                xr, xi = yr, yi
            if write_scratch:
                ar[pl.ds(j * RB, RB), :] = xr
                ai[pl.ds(j * RB, RB), :] = xi
            else:
                or_ref[pl.ds(j * RB, RB), :] = xr
                oi_ref[pl.ds(j * RB, RB), :] = xi

        @pl.when(l == 0)
        def _():
            body(True, False, True)   # IN -> SCRATCH

        @pl.when((l % 2 == 0) & (l > 0))
        def _():
            body(False, True, True)   # OUT -> SCRATCH

        @pl.when(l % 2 == 1)
        def _():
            body(False, False, False)  # SCRATCH -> OUT

        if level >= 3:
            # outer stage at the END of each layer: one complex leading-axis
            # dot on the just-written whole-state buffer, written back in place
            @pl.when(j == G - 1)
            def _():
                for tgt in (0, 1):  # 0: scratch (even layers), 1: out (odd)
                    @pl.when(l % 2 == tgt)
                    def _():
                        dst_r = or_ref if tgt else ar
                        dst_i = oi_ref if tgt else ai
                        x3r = jnp.reshape(dst_r[:], (D, RB, LANES))
                        x3i = jnp.reshape(dst_i[:], (D, RB, LANES))
                        mr = mor_ref[l]
                        mi = moi_ref[l]
                        cdim = (((1,), (0,)), ((), ()))
                        f32 = jnp.float32
                        zr = jax.lax.dot_general(mr, x3r, cdim, preferred_element_type=f32) \
                            - jax.lax.dot_general(mi, x3i, cdim, preferred_element_type=f32)
                        zi = jax.lax.dot_general(mr, x3i, cdim, preferred_element_type=f32) \
                            + jax.lax.dot_general(mi, x3r, cdim, preferred_element_type=f32)
                        dst_r[:] = jnp.reshape(zr, (R_TOT, LANES))
                        dst_i[:] = jnp.reshape(zi, (R_TOT, LANES))

    return kernel


def run_micro(level):
    cs = jnp.asarray(rng.normal(size=(L, 10, 2)), jnp.float32)
    mlr = jnp.asarray(rng.normal(size=(L, LANES, LANES)) * 0.05, jnp.float32)
    mli = jnp.asarray(rng.normal(size=(L, LANES, LANES)) * 0.05, jnp.float32)
    mor = jnp.asarray(rng.normal(size=(L, D, D)) * 0.2, jnp.float32)
    moi = jnp.asarray(rng.normal(size=(L, D, D)) * 0.2, jnp.float32)

    def one(sr, si):
        return pl.pallas_call(
            _micro_kernel(level),
            grid=(L, G),
            out_shape=(jax.ShapeDtypeStruct((R_TOT, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((R_TOT, LANES), jnp.float32)),
            in_specs=[
                pl.BlockSpec((L, 10, 2), lambda l, j: (0, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, LANES, LANES), lambda l, j: (l, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LANES, LANES), lambda l, j: (l, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, D, D), lambda l, j: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, D, D), lambda l, j: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R_TOT, LANES), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R_TOT, LANES), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((R_TOT, LANES), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R_TOT, LANES), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((R_TOT, LANES), jnp.float32),
                            pltpu.VMEM((R_TOT, LANES), jnp.float32)],
            compiler_params=_params(),
        )(cs, mlr, mli, mor, moi, sr, si)

    def scan_run(sr, si):
        def step(carry, _):
            a, b = carry
            a, b = one(a, b)
            return (a, b), a[0, 0]

        carry, ys = jax.lax.scan(step, (sr, si), None, length=K)
        return ys[-1]

    fk = jax.jit(scan_run)
    sr = jnp.asarray(rng.normal(size=(R_TOT, LANES)) * 1e-3, jnp.float32)
    si = jnp.asarray(rng.normal(size=(R_TOT, LANES)) * 1e-3, jnp.float32)
    t0 = time.time()
    _ = float(fk(sr, si))
    ct = time.time() - t0
    best = float("inf")
    for k in range(1, 4):
        t0 = time.time()
        _ = float(fk(sr + 1e-6 * k, si))
        best = min(best, (time.time() - t0) / K)
    print(f"m{level}: {best*1000:7.3f} ms/call (L={L} layers; compile {ct:.0f}s)",
          flush=True)
    return best * 1000


def main():
    for level in (1, 2, 3):
        run_micro(level)
    print("reference: production fwd-only ~0.53 ms + outer share "
          "(ab_kernel_interior / microbench anatomy)", flush=True)


if __name__ == "__main__":
    main()
