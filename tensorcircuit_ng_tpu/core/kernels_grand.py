"""Grand-fused L-layer zzrx FORWARD: the whole stack in ONE Pallas kernel.

The kernel-interior anatomy (examples/ab_kernel_interior.py, 2026-08-19)
showed the N=20 L=4 VQE step is GLUE-bound: with every in-kernel compute
stage stubbed, the remaining traffic + dispatch + XLA outer stage still
costs 1.02 of the 1.44 ms step.  The micro-bench
(examples/micro_grand_fusion.py) measured the cure: one kernel with grid
``(L, G)``, the whole state RESIDENT in VMEM (ping-pong buffers), per-
block zz/roll/lane stages, and the outer stage as a leading-axis
``(D,D)x(D,RB,LANES)`` dot on the resident buffer at each layer's last
grid step — 0.333 ms for all four layers vs ~0.6 for the production
per-layer dispatch chain (m1 skeleton 0.157, m2 +compute 0.275,
m3 +outer 0.333).

This module implements that forward for the FUSE_LANE, non-ROWM stack
topology.  The backward is UNCHANGED (per-layer kernels): the grand
forward streams out the same per-layer post-lane residual states ``k_l``
the existing adjoint chain consumes, so it drops into
``kernels_stack._stack_fwd_impl`` without touching the custom-VJP
residual structure.

Reference role: the L-layer einsum chain the reference ships to XLA AD
(reference cons.py:937-950) — here hand-fused to one TPU program.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from . import kernels_rowlayer as krl

Tensor = Any

__all__ = ["grand_zzrx_fwd"]


def _grand_fwd_kernel(pairs, n, nkernel, L, G):
    from jax.experimental import pallas as pl

    def kernel(zzp_ref, cs_ref, srow_ref, slane_ref, mlr_ref, mli_ref,
               mor_ref, moi_ref, sr_ref, si_ref,
               ksr_ref, ksi_ref, or_ref, oi_ref, ar, ai):
        l = pl.program_id(0)
        j = pl.program_id(1)
        rb_lanes = ar.shape[-1]
        RB = ar.shape[0] // G
        D = G

        def transform(xr, xi):
            # zz phase: expo = (srow_j * theta_l) @ slane^T (one MXU dot)
            expo = jnp.dot(
                srow_ref[:] * zzp_ref[l][None, :],
                slane_ref[:].T,
                preferred_element_type=jnp.float32,
            )
            pc = jnp.cos(0.5 * expo)
            ps = -jnp.sin(0.5 * expo)
            xr, xi = pc * xr - ps * xi, pc * xi + ps * xr
            rows = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 0)
            for ql in range(nkernel):
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
            return yr, yi

        def body(src):
            # src: 0 = kernel inputs, 1 = OUT refs, 2 = SCRATCH; layer l
            # writes SCRATCH when even, OUT when odd (even L ends in OUT)
            if src == 0:
                xr = sr_ref[pl.ds(j * RB, RB), :]
                xi = si_ref[pl.ds(j * RB, RB), :]
            elif src == 1:
                xr = or_ref[pl.ds(j * RB, RB), :]
                xi = oi_ref[pl.ds(j * RB, RB), :]
            else:
                xr = ar[pl.ds(j * RB, RB), :]
                xi = ai[pl.ds(j * RB, RB), :]
            yr, yi = transform(xr, xi)
            # residual: post-lane (pre-outer) state block for the adjoint
            ksr_ref[0, pl.ds(j * RB, RB), :] = yr
            ksi_ref[0, pl.ds(j * RB, RB), :] = yi
            # ping-pong destination
            @pl.when(l % 2 == 0)
            def _():
                ar[pl.ds(j * RB, RB), :] = yr
                ai[pl.ds(j * RB, RB), :] = yi

            @pl.when(l % 2 == 1)
            def _():
                or_ref[pl.ds(j * RB, RB), :] = yr
                oi_ref[pl.ds(j * RB, RB), :] = yi

        @pl.when(l == 0)
        def _():
            body(0)

        @pl.when((l > 0) & (l % 2 == 0))
        def _():
            body(1)

        @pl.when(l % 2 == 1)
        def _():
            body(2)

        # outer stage at each layer's last grid step: one complex
        # leading-axis dot on the freshly written whole-state buffer
        @pl.when(j == G - 1)
        def _():
            for tgt in (0, 1):
                @pl.when(l % 2 == tgt)
                def _():
                    dst_r = or_ref if tgt else ar
                    dst_i = oi_ref if tgt else ai
                    x3r = jnp.reshape(dst_r[:], (D, RB, rb_lanes))
                    x3i = jnp.reshape(dst_i[:], (D, RB, rb_lanes))
                    mr = mor_ref[l]
                    mi = moi_ref[l]
                    cdim = (((1,), (0,)), ((), ()))
                    f32 = jnp.float32
                    zr = jax.lax.dot_general(
                        mr, x3r, cdim, preferred_element_type=f32
                    ) - jax.lax.dot_general(
                        mi, x3i, cdim, preferred_element_type=f32)
                    zi = jax.lax.dot_general(
                        mr, x3i, cdim, preferred_element_type=f32
                    ) + jax.lax.dot_general(
                        mi, x3r, cdim, preferred_element_type=f32)
                    dst_r[:] = jnp.reshape(zr, dst_r.shape)
                    dst_i[:] = jnp.reshape(zi, dst_i.shape)

    return kernel


def grand_zzrx_fwd(pairs, n, zzth, th, sr, si, mor, moi, mlr, mli):
    """One-kernel L-layer stack fwd.  Returns (yr, yi, ksr, ksi).

    ``sr/si`` (r, lanes) f32 planes; ``zzth`` (L, npairs); ``th``
    (L, nkernel) kernel-row angles; ``mor/moi`` (L, D, D) outer-kron
    planes; ``mlr/mli`` (L, lanes, lanes) lane-kron planes.  ``ksr/ksi``
    are the per-layer post-lane residuals (L, r, lanes) for the existing
    per-layer adjoint chain.  Requires L even (ping-pong parity: the last
    layer must land in the output refs) — callers pad or fall back.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, nkernel = th.shape
    r, lanes = sr.shape
    RB = 2**nkernel
    G = r // RB
    assert L % 2 == 0 and G >= 2
    cs = jnp.stack([jnp.cos(th / 2), jnp.sin(th / 2)], axis=-1)
    zzp, srow, slane = krl._zzrx_sign_inputs(pairs, n, zzth[0], r, lanes)
    # full (L, P) padded theta rows (krl helper pads one row)
    P = zzp.shape[1]
    zzp_all = jnp.zeros((L, P), jnp.float32).at[:, : zzth.shape[1]].set(
        jnp.asarray(zzth, jnp.float32)
    )
    kernel = _grand_fwd_kernel(pairs, n, nkernel, L, G)
    return pl.pallas_call(
        kernel,
        grid=(L, G),
        out_shape=(
            jax.ShapeDtypeStruct((L, r, lanes), jnp.float32),
            jax.ShapeDtypeStruct((L, r, lanes), jnp.float32),
            jax.ShapeDtypeStruct((r, lanes), jnp.float32),
            jax.ShapeDtypeStruct((r, lanes), jnp.float32),
        ),
        in_specs=[
            # full (L, P) block: a (1, P) block violates the tiling rule
            # (last-two dims must be 8/128-aligned or whole) on hardware
            pl.BlockSpec((L, P), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, nkernel, 2), lambda l, j: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, P), lambda l, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, P), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes, lanes), lambda l, j: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes, lanes), lambda l, j: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, G, G), lambda l, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, G, G), lambda l, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, lanes), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, lanes), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, r, lanes), lambda l, j: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, lanes), lambda l, j: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, lanes), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, lanes), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((r, lanes), jnp.float32),
                        pltpu.VMEM((r, lanes), jnp.float32)],
        compiler_params=krl._zzrx_compiler_params(),
        interpret=krl._INTERPRET,
    )(zzp_all, cs, srow, slane, mlr, mli, mor, moi, sr, si)
