"""Pallas row-layer kernels: fused forward AND backward single-qubit sweeps.

The statevector lives as (R, LANES) float32 planes (complex split).  The
forward kernel applies one 2x2 gate per "row" qubit with in-VMEM
roll-butterflies (one HBM round trip for the whole sweep).  The backward
kernel runs the full adjoint walk in VMEM: un-applies gates from the output
state, accumulates per-gate cotangents, and pulls the state cotangent back —
one HBM round trip instead of ~3 passes per qubit.  Lanes are independent of
row butterflies, so both kernels grid over lane blocks; gate-cotangent
accumulation revisits one output block across the (sequential) TPU grid.

Gates must be UNITARY (the backward reconstructs intermediates by
un-application) — which is the quantum-circuit use case.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Tensor = Any

__all__ = ["row_layer", "LANE_BLOCK"]

#: max row-qubits handled inside one kernel block: 2^MAX_KERNEL_QUBITS rows
#: x 128 lanes x f32 must fit twice (state + cotangent) in VMEM
MAX_KERNEL_QUBITS = 11

_INTERPRET = False


def _butterfly(cr, ci, rows, s, m):
    """Apply 2x2 complex matrix m (tuple of 8 scalars) on the stride-s bit."""
    from jax.experimental.pallas import tpu as pltpu

    g00r, g00i, g01r, g01i, g10r, g10i, g11r, g11i = m
    r_total = cr.shape[0]
    bit = (rows // s) % 2
    is_lo = bit == 0
    down_r = pltpu.roll(cr, r_total - s, 0)  # down[r] = cr[r + s]
    down_i = pltpu.roll(ci, r_total - s, 0)
    up_r = pltpu.roll(cr, s, 0)  # up[r] = cr[r - s]
    up_i = pltpu.roll(ci, s, 0)
    pr = jnp.where(is_lo, down_r, up_r)
    pi = jnp.where(is_lo, down_i, up_i)
    lo_r = g00r * cr - g00i * ci + g01r * pr - g01i * pi
    lo_i = g00r * ci + g00i * cr + g01r * pi + g01i * pr
    hi_r = g10r * pr - g10i * pi + g11r * cr - g11i * ci
    hi_i = g10r * pi + g10i * pr + g11r * ci + g11i * cr
    return jnp.where(is_lo, lo_r, hi_r), jnp.where(is_lo, lo_i, hi_i)


def _fwd_kernel(nrow: int):
    def kernel(gr_ref, gi_ref, sr_ref, si_ref, or_ref, oi_ref):
        or_ref[:] = sr_ref[:]
        oi_ref[:] = si_ref[:]
        r_total = or_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, or_ref.shape, 0)
        for q in range(nrow):
            s = r_total >> (q + 1)
            m = (
                gr_ref[q, 0], gi_ref[q, 0], gr_ref[q, 1], gi_ref[q, 1],
                gr_ref[q, 2], gi_ref[q, 2], gr_ref[q, 3], gi_ref[q, 3],
            )
            nr, ni = _butterfly(or_ref[:], oi_ref[:], rows, s, m)
            or_ref[:] = nr
            oi_ref[:] = ni

    return kernel


def _bwd_kernel(nrow: int):
    from jax.experimental import pallas as pl

    def kernel(
        gr_ref, gi_ref, yr_ref, yi_ref, ctr_ref, cti_ref,
        dsr_ref, dsi_ref, dgr_ref, dgi_ref,
        s_r, s_i,
    ):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            for qq in range(dgr_ref.shape[0]):
                for ee in range(4):
                    dgr_ref[qq, ee] = 0.0
                    dgi_ref[qq, ee] = 0.0

        # cur_s lives in scratch; cur_ct walks in the ds output refs
        s_r[:] = yr_ref[:]
        s_i[:] = yi_ref[:]
        dsr_ref[:] = ctr_ref[:]
        dsi_ref[:] = cti_ref[:]
        r_total = s_r.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, s_r.shape, 0)
        for q in range(nrow - 1, -1, -1):
            s = r_total >> (q + 1)
            bit = (rows // s) % 2
            is_lo = bit == 0
            g00r, g00i = gr_ref[q, 0], gi_ref[q, 0]
            g01r, g01i = gr_ref[q, 1], gi_ref[q, 1]
            g10r, g10i = gr_ref[q, 2], gi_ref[q, 2]
            g11r, g11i = gr_ref[q, 3], gi_ref[q, 3]
            # 1) un-apply: cur_s = g^dagger cur_s  (g† = conj-transpose)
            mdag = (g00r, -g00i, g10r, -g10i, g01r, -g01i, g11r, -g11i)
            nsr, nsi = _butterfly(s_r[:], s_i[:], rows, s, mdag)
            s_r[:] = nsr
            s_i[:] = nsi
            # 2) gate cotangent: dg[a,b] = sum_{rows bit=a} ct[r] * s[r|bit=b]
            cr = dsr_ref[:]
            ci = dsi_ref[:]
            from jax.experimental.pallas import tpu as pltpu

            pr = jnp.where(
                is_lo, pltpu.roll(nsr, r_total - s, 0), pltpu.roll(nsr, s, 0)
            )
            pi = jnp.where(
                is_lo, pltpu.roll(nsi, r_total - s, 0), pltpu.roll(nsi, s, 0)
            )
            lo = is_lo.astype(cr.dtype)
            hi = 1.0 - lo
            # complex product ct * s (plain, no conj — JAX linear transpose)
            prod_same_r = cr * nsr - ci * nsi
            prod_same_i = cr * nsi + ci * nsr
            prod_part_r = cr * pr - ci * pi
            prod_part_i = cr * pi + ci * pr
            dgr_ref[q, 0] += jnp.sum(lo * prod_same_r)
            dgi_ref[q, 0] += jnp.sum(lo * prod_same_i)
            dgr_ref[q, 1] += jnp.sum(lo * prod_part_r)
            dgi_ref[q, 1] += jnp.sum(lo * prod_part_i)
            dgr_ref[q, 3] += jnp.sum(hi * prod_same_r)
            dgi_ref[q, 3] += jnp.sum(hi * prod_same_i)
            dgr_ref[q, 2] += jnp.sum(hi * prod_part_r)
            dgi_ref[q, 2] += jnp.sum(hi * prod_part_i)
            # 3) ct walk: cur_ct = g^T cur_ct
            mt = (g00r, g00i, g10r, g10i, g01r, g01i, g11r, g11i)
            ncr, nci = _butterfly(cr, ci, rows, s, mt)
            dsr_ref[:] = ncr
            dsi_ref[:] = nci

    return kernel


def _pallas_row_fwd(gr, gi, sr, si):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = gr.shape[0]
    r, lanes = sr.shape
    rb = 2**nrow  # strides all fit within blocks of 2^nrow rows
    grid = (r // rb,)
    kernel = _fwd_kernel(nrow)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(sr.shape, sr.dtype),
            jax.ShapeDtypeStruct(si.shape, si.dtype),
        ),
        in_specs=[
            pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ),
        input_output_aliases={2: 0, 3: 1},
        interpret=_INTERPRET,
    )(jnp.reshape(gr, (nrow, 4)), jnp.reshape(gi, (nrow, 4)), sr, si)


def _pallas_row_bwd(gr, gi, yr, yi, ctr, cti):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = gr.shape[0]
    r, lanes = yr.shape
    rb = 2**nrow
    grid = (r // rb,)
    kernel = _bwd_kernel(nrow)
    dsr, dsi, dgr, dgi = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(yr.shape, yr.dtype),
            jax.ShapeDtypeStruct(yi.shape, yi.dtype),
            jax.ShapeDtypeStruct((nrow, 4), gr.dtype),
            jax.ShapeDtypeStruct((nrow, 4), gi.dtype),
        ),
        in_specs=[
            pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, lanes), jnp.float32),
            pltpu.VMEM((rb, lanes), jnp.float32),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=_INTERPRET,
    )(
        jnp.reshape(gr, (nrow, 4)),
        jnp.reshape(gi, (nrow, 4)),
        yr, yi, ctr, cti,
    )
    return dsr, dsi, jnp.reshape(dgr, (nrow, 2, 2)), jnp.reshape(dgi, (nrow, 2, 2))


def _row_layer_reference(state2d: Tensor, gates: Tensor) -> Tensor:
    """Unfused fallback on the (R, lanes) complex view.

    Gate k acts on the bit with stride 2^(ng-1-k) (the lowest ng bits)."""
    nrow = gates.shape[0]
    r, lanes = state2d.shape
    psi = state2d
    for q in range(nrow):
        s = (2**nrow) >> (q + 1)
        v = jnp.reshape(psi, (r // (2 * s), 2, s, lanes))
        g = gates[q].astype(psi.dtype)
        v = jnp.einsum("ab,xbsl->xasl", g, v)
        psi = jnp.reshape(v, (r, lanes))
    return psi


@jax.custom_vjp
def row_layer(state2d: Tensor, gates: Tensor) -> Tensor:
    """Apply gates[k] on the k-th of the ng LOWEST row bits of a (R, lanes)
    complex view (gate k stride = 2^(ng-1-k)).  UNITARY gates only (see
    module docstring); ng must be ≤ MAX_KERNEL_QUBITS for the fused path.
    """
    return _row_fwd_impl(state2d, gates)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _row_fwd_impl(state2d: Tensor, gates: Tensor) -> Tensor:
    if not (_on_tpu() or _INTERPRET):
        return _row_layer_reference(state2d, gates)
    sr = jnp.real(state2d).astype(jnp.float32)
    si = jnp.imag(state2d).astype(jnp.float32)
    gr = jnp.real(gates).astype(jnp.float32)
    gi = jnp.imag(gates).astype(jnp.float32)
    orr, oii = _pallas_row_fwd(gr, gi, sr, si)
    return (orr + 1j * oii).astype(state2d.dtype)


def _row_fwd(state2d: Tensor, gates: Tensor):
    y = _row_fwd_impl(state2d, gates)
    return y, (y, gates)


def _row_bwd(res, ct):
    y, gates = res
    if not (_on_tpu() or _INTERPRET):
        return _row_bwd_reference(y, gates, ct)
    gr = jnp.real(gates).astype(jnp.float32)
    gi = jnp.imag(gates).astype(jnp.float32)
    yr = jnp.real(y).astype(jnp.float32)
    yi = jnp.imag(y).astype(jnp.float32)
    ctr = jnp.real(ct).astype(jnp.float32)
    cti = jnp.imag(ct).astype(jnp.float32)
    dsr, dsi, dgr, dgi = _pallas_row_bwd(gr, gi, yr, yi, ctr, cti)
    ds = (dsr + 1j * dsi).astype(y.dtype)
    dg = (dgr + 1j * dgi).astype(gates.dtype)
    return ds, dg


def _row_bwd_reference(y: Tensor, gates: Tensor, ct: Tensor):
    nrow = gates.shape[0]
    r, lanes = y.shape
    cur_s = y
    cur_ct = ct
    dgs = [None] * nrow
    for q in range(nrow - 1, -1, -1):
        s = (2**nrow) >> (q + 1)
        gdag = jnp.conj(gates[q].T)
        v = jnp.reshape(cur_s, (r // (2 * s), 2, s, lanes))
        cur_s = jnp.reshape(jnp.einsum("ab,xbsl->xasl", gdag.astype(v.dtype), v), (r, lanes))
        a_exp = jnp.reshape(cur_ct, (r // (2 * s), 2, s * lanes))
        b_exp = jnp.reshape(cur_s, (r // (2 * s), 2, s * lanes))
        dgs[q] = jnp.einsum("xay,xby->ab", a_exp, b_exp)
        v = jnp.reshape(cur_ct, (r // (2 * s), 2, s, lanes))
        cur_ct = jnp.reshape(
            jnp.einsum("ab,xbsl->xasl", gates[q].T.astype(v.dtype), v), (r, lanes)
        )
    return cur_ct, jnp.stack(dgs)


row_layer.defvjp(_row_fwd, _row_bwd)
