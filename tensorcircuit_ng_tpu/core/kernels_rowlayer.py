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

__all__ = ["row_layer", "row_layer_lane"]

#: max row-qubits handled inside one kernel block: 2^MAX_KERNEL_QUBITS rows
#: x 128 lanes x f32 must fit twice (state + cotangent) in VMEM
MAX_KERNEL_QUBITS = 11
#: the lane-fused backward additionally keeps un-laned state + walked
#: cotangent + matmul temps live, so its row block is one qubit smaller
MAX_KERNEL_QUBITS_LANE = 10
#: theta-native rotation backward: same reason (y + ct + scratch + temps)
MAX_KERNEL_QUBITS_ROTX = 10

_INTERPRET = False
_BWD_DZZ_FACTORED = False
_BWD_SKIP_GRADS = False  # factored dzz blows Mosaic scoped vmem (23.95M); expo factoring alone is safe
# timing-diagnostic stage stubs for the zzrx kernels (WRONG math, right
# traffic — never in prod; see examples/ab_kernel_interior.py)
_SKIP_ZZ = False
_SKIP_ROLLS = False
_SKIP_LANE_DOTS = False


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


def _butterfly_rx(cr, ci, rows, s, c, b):
    """rx-form butterfly [[c, i·b], [i·b, c]] on the stride-s bit.

    The matrix is SYMMETRIC with equal diagonal, so the lo- and hi-half
    output expressions coincide: out = c·x + i·b·partner for EVERY row —
    no per-half select of the result, and no mul-by-literal-zero terms to
    hope the compiler folds (the generic :func:`_butterfly` emits both
    halves plus a final where; on the VPU-throughput-bound zzrx kernels
    that is ~2x the arithmetic of this form).  fwd rx uses b=-sin(θ/2),
    the adjoint b=+sin(θ/2)."""
    from jax.experimental.pallas import tpu as pltpu

    r_total = cr.shape[0]
    bit = (rows // s) % 2
    is_lo = bit == 0
    down_r = pltpu.roll(cr, r_total - s, 0)
    down_i = pltpu.roll(ci, r_total - s, 0)
    up_r = pltpu.roll(cr, s, 0)
    up_i = pltpu.roll(ci, s, 0)
    pr = jnp.where(is_lo, down_r, up_r)
    pi = jnp.where(is_lo, down_i, up_i)
    return c * cr - b * pi, c * ci + b * pr


def _lane_fwd_epilogue(cr, ci, mr_ref, mi_ref, or_ref, oi_ref):
    """y = psi @ M (complex, planes) — MXU matmul fused in-kernel.

    Shared by every with_lane forward kernel (single-layer and zzrx)."""
    if _SKIP_LANE_DOTS:  # timing diagnostic: traffic without the MXU dots
        or_ref[:] = cr
        oi_ref[:] = ci
        return
    mr = mr_ref[:]
    mi = mi_ref[:]
    f32 = jnp.float32
    or_ref[:] = jnp.dot(cr, mr, preferred_element_type=f32) - jnp.dot(
        ci, mi, preferred_element_type=f32
    )
    oi_ref[:] = jnp.dot(cr, mi, preferred_element_type=f32) + jnp.dot(
        ci, mr, preferred_element_type=f32
    )


def _lane_bwd_prologue(j, mr_ref, mi_ref, yr_ref, yi_ref, ctr_ref, cti_ref,
                       dsr_ref, dsi_ref, dmr_ref, dmi_ref, s_r, s_i):
    """Un-lane the saved output, accumulate dM over the sequential grid, and
    walk the cotangent through M^T.  Shared by every with_lane backward
    kernel.  REQUIRES a unitary M: psi is reconstructed as y @ conj(M)^T.

    On exit: (s_r, s_i) hold the pre-lane state, (dsr, dsi) the walked
    cotangent.
    """
    from jax.experimental import pallas as pl

    @pl.when(j == 0)
    def _():
        dmr_ref[:] = jnp.zeros_like(dmr_ref)
        dmi_ref[:] = jnp.zeros_like(dmi_ref)

    if _SKIP_LANE_DOTS:  # timing diagnostic: traffic without the MXU dots
        s_r[:] = yr_ref[:]
        s_i[:] = yi_ref[:]
        dsr_ref[:] = ctr_ref[:]
        dsi_ref[:] = cti_ref[:]
        return

    f32 = jnp.float32
    dg_dim = (((1,), (1,)), ((), ()))  # a @ b^T
    dt_dim = (((0,), (0,)), ((), ()))  # a^T @ b
    mr = mr_ref[:]
    mi = mi_ref[:]
    yr = yr_ref[:]
    yi = yi_ref[:]
    ctr0 = ctr_ref[:]
    cti0 = cti_ref[:]
    # psi = y @ M^{-1} = y @ conj(M)^T (M unitary)
    sr0 = (
        jax.lax.dot_general(yr, mr, dg_dim, preferred_element_type=f32)
        + jax.lax.dot_general(yi, mi, dg_dim, preferred_element_type=f32)
    )
    si0 = (
        jax.lax.dot_general(yi, mr, dg_dim, preferred_element_type=f32)
        - jax.lax.dot_general(yr, mi, dg_dim, preferred_element_type=f32)
    )
    # dM += psi^T @ ct (plain transpose, complex product)
    dmr_ref[:] += (
        jax.lax.dot_general(sr0, ctr0, dt_dim, preferred_element_type=f32)
        - jax.lax.dot_general(si0, cti0, dt_dim, preferred_element_type=f32)
    )
    dmi_ref[:] += (
        jax.lax.dot_general(sr0, cti0, dt_dim, preferred_element_type=f32)
        + jax.lax.dot_general(si0, ctr0, dt_dim, preferred_element_type=f32)
    )
    # ct walk: ct_pre = ct @ M^T
    s_r[:] = sr0
    s_i[:] = si0
    dsr_ref[:] = (
        jax.lax.dot_general(ctr0, mr, dg_dim, preferred_element_type=f32)
        - jax.lax.dot_general(cti0, mi, dg_dim, preferred_element_type=f32)
    )
    dsi_ref[:] = (
        jax.lax.dot_general(ctr0, mi, dg_dim, preferred_element_type=f32)
        + jax.lax.dot_general(cti0, mr, dg_dim, preferred_element_type=f32)
    )


def _fwd_kernel(nrow: int, with_lane: bool = False):
    def kernel(*refs):
        if with_lane:
            gr_ref, gi_ref, mr_ref, mi_ref, sr_ref, si_ref, or_ref, oi_ref = refs
        else:
            gr_ref, gi_ref, sr_ref, si_ref, or_ref, oi_ref = refs
        cr = sr_ref[:]
        ci = si_ref[:]
        r_total = cr.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, cr.shape, 0)
        for q in range(nrow):
            s = r_total >> (q + 1)
            m = (
                gr_ref[q, 0], gi_ref[q, 0], gr_ref[q, 1], gi_ref[q, 1],
                gr_ref[q, 2], gi_ref[q, 2], gr_ref[q, 3], gi_ref[q, 3],
            )
            cr, ci = _butterfly(cr, ci, rows, s, m)
        if with_lane:
            _lane_fwd_epilogue(cr, ci, mr_ref, mi_ref, or_ref, oi_ref)
        else:
            or_ref[:] = cr
            oi_ref[:] = ci

    return kernel


def _bwd_kernel(nrow: int, with_lane: bool = False):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        if with_lane:
            (gr_ref, gi_ref, mr_ref, mi_ref, yr_ref, yi_ref, ctr_ref, cti_ref,
             dsr_ref, dsi_ref, dgr_ref, dgi_ref, dmr_ref, dmi_ref,
             s_r, s_i) = refs
        else:
            (gr_ref, gi_ref, yr_ref, yi_ref, ctr_ref, cti_ref,
             dsr_ref, dsi_ref, dgr_ref, dgi_ref,
             s_r, s_i) = refs
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            for qq in range(dgr_ref.shape[0]):
                for ee in range(4):
                    dgr_ref[qq, ee] = 0.0
                    dgi_ref[qq, ee] = 0.0

        if with_lane:
            _lane_bwd_prologue(
                j, mr_ref, mi_ref, yr_ref, yi_ref, ctr_ref, cti_ref,
                dsr_ref, dsi_ref, dmr_ref, dmi_ref, s_r, s_i,
            )
        else:
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
            # 2) gate cotangent: dg[a,b] = sum_{rows bit=a} ct[r] * s[r|bit=b].
            # Roll the COTANGENT once (pct[r] = ct[r^s]); the same rolled
            # values feed the cross dg terms AND the ct transpose walk —
            # 4 rolls/qubit instead of 6 (the substitution r -> r^s turns
            # sum_lo ct[r] s[r^s] into sum_hi pct[r] s[r]).
            cr = dsr_ref[:]
            ci = dsi_ref[:]
            from jax.experimental.pallas import tpu as pltpu

            pct_r = jnp.where(
                is_lo, pltpu.roll(cr, r_total - s, 0), pltpu.roll(cr, s, 0)
            )
            pct_i = jnp.where(
                is_lo, pltpu.roll(ci, r_total - s, 0), pltpu.roll(ci, s, 0)
            )
            lo = is_lo.astype(cr.dtype)
            hi = 1.0 - lo
            # complex products (plain, no conj — JAX linear transpose)
            prod_same_r = cr * nsr - ci * nsi
            prod_same_i = cr * nsi + ci * nsr
            cross_r = pct_r * nsr - pct_i * nsi
            cross_i = pct_r * nsi + pct_i * nsr
            dgr_ref[q, 0] += jnp.sum(lo * prod_same_r)
            dgi_ref[q, 0] += jnp.sum(lo * prod_same_i)
            dgr_ref[q, 1] += jnp.sum(hi * cross_r)
            dgi_ref[q, 1] += jnp.sum(hi * cross_i)
            dgr_ref[q, 3] += jnp.sum(hi * prod_same_r)
            dgi_ref[q, 3] += jnp.sum(hi * prod_same_i)
            dgr_ref[q, 2] += jnp.sum(lo * cross_r)
            dgi_ref[q, 2] += jnp.sum(lo * cross_i)
            # 3) ct walk: cur_ct = g^T cur_ct, reusing the rolled cotangent
            # (same mixing as _butterfly with m = g^T)
            ncr = jnp.where(
                is_lo,
                g00r * cr - g00i * ci + g10r * pct_r - g10i * pct_i,
                g01r * pct_r - g01i * pct_i + g11r * cr - g11i * ci,
            )
            nci = jnp.where(
                is_lo,
                g00r * ci + g00i * cr + g10r * pct_i + g10i * pct_r,
                g01r * pct_i + g01i * pct_r + g11r * ci + g11i * cr,
            )
            dsr_ref[:] = ncr
            dsi_ref[:] = nci

    return kernel


def _pallas_row_fwd(gr, gi, sr, si, mr=None, mi=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = gr.shape[0]
    r, lanes = sr.shape
    rb = 2**nrow  # strides all fit within blocks of 2^nrow rows
    grid = (r // rb,)
    with_lane = mr is not None
    kernel = _fwd_kernel(nrow, with_lane)
    smem = [
        pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
    ]
    lane_specs = (
        [
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        if with_lane
        else []
    )
    state_specs = [
        pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
    ]
    nin = 2 + len(lane_specs)
    args = [jnp.reshape(gr, (nrow, 4)), jnp.reshape(gi, (nrow, 4))]
    if with_lane:
        args += [mr, mi]
    args += [sr, si]
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(sr.shape, sr.dtype),
            jax.ShapeDtypeStruct(si.shape, si.dtype),
        ),
        in_specs=smem + lane_specs + state_specs,
        out_specs=(
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ),
        input_output_aliases={nin: 0, nin + 1: 1},
        interpret=_INTERPRET,
    )(*args)


def _pallas_row_bwd(gr, gi, yr, yi, ctr, cti, mr=None, mi=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = gr.shape[0]
    r, lanes = yr.shape
    rb = 2**nrow
    grid = (r // rb,)
    with_lane = mr is not None
    kernel = _bwd_kernel(nrow, with_lane)
    smem = [
        pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
    ]
    lane_in = (
        [
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        if with_lane
        else []
    )
    state_specs = [
        pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(yr.shape, yr.dtype),
        jax.ShapeDtypeStruct(yi.shape, yi.dtype),
        jax.ShapeDtypeStruct((nrow, 4), gr.dtype),
        jax.ShapeDtypeStruct((nrow, 4), gi.dtype),
    ]
    out_specs = [
        pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((nrow, 4), lambda j: (0, 0), memory_space=pltpu.SMEM),
    ]
    if with_lane:
        out_shapes += [
            jax.ShapeDtypeStruct((lanes, lanes), jnp.float32),
            jax.ShapeDtypeStruct((lanes, lanes), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
    nin = 2 + len(lane_in)  # index of ctr among inputs is nin+2
    args = [jnp.reshape(gr, (nrow, 4)), jnp.reshape(gi, (nrow, 4))]
    if with_lane:
        args += [mr, mi]
    args += [yr, yi, ctr, cti]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shapes),
        in_specs=smem + lane_in + state_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((rb, lanes), jnp.float32),
            pltpu.VMEM((rb, lanes), jnp.float32),
        ],
        input_output_aliases={nin + 2: 0, nin + 3: 1},
        interpret=_INTERPRET,
    )(*args)
    dsr, dsi, dgr, dgi = outs[:4]
    dg = (jnp.reshape(dgr, (nrow, 2, 2)), jnp.reshape(dgi, (nrow, 2, 2)))
    if with_lane:
        return dsr, dsi, dg[0], dg[1], outs[4], outs[5]
    return dsr, dsi, dg[0], dg[1]


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


# ---------------------------------------------------------------------------
# row layer + fused lane matmul: y = (butterflies(psi)) @ M, one HBM pass
# ---------------------------------------------------------------------------


@jax.custom_vjp
def row_layer_lane(state2d: Tensor, gates: Tensor, mlane: Tensor) -> Tensor:
    """Row-qubit butterflies then ``@ mlane`` fused into ONE kernel pass.

    ``mlane`` is the (lanes, lanes) right-multiplication matrix (i.e. the
    transposed kron of the lane gates); both ``gates`` and ``mlane`` must be
    unitary (backward un-applies them).  Falls back to the unfused reference
    off-TPU.
    """
    return _lane_fwd_impl(state2d, gates, mlane)


def _lane_fwd_impl(state2d: Tensor, gates: Tensor, mlane: Tensor) -> Tensor:
    if not (_on_tpu() or _INTERPRET):
        y = _row_layer_reference(state2d, gates)
        return y @ mlane.astype(y.dtype)
    sr = jnp.real(state2d).astype(jnp.float32)
    si = jnp.imag(state2d).astype(jnp.float32)
    gr = jnp.real(gates).astype(jnp.float32)
    gi = jnp.imag(gates).astype(jnp.float32)
    mr = jnp.real(mlane).astype(jnp.float32)
    mi = jnp.imag(mlane).astype(jnp.float32)
    orr, oii = _pallas_row_fwd(gr, gi, sr, si, mr, mi)
    return (orr + 1j * oii).astype(state2d.dtype)


def _lane_fwd(state2d: Tensor, gates: Tensor, mlane: Tensor):
    y = _lane_fwd_impl(state2d, gates, mlane)
    return y, (y, gates, mlane)


def _lane_bwd(res, ct):
    y, gates, mlane = res
    if not (_on_tpu() or _INTERPRET):
        # un-lane, then reuse the reference row backward; dM = psi^T @ ct
        psi = y @ jnp.conj(mlane).T.astype(y.dtype)
        ct_pre = ct @ mlane.T.astype(ct.dtype)
        dmlane = jnp.matmul(psi.T, ct)
        ds, dg = _row_bwd_reference(psi, gates, ct_pre)
        return ds, dg, dmlane
    gr = jnp.real(gates).astype(jnp.float32)
    gi = jnp.imag(gates).astype(jnp.float32)
    mr = jnp.real(mlane).astype(jnp.float32)
    mi = jnp.imag(mlane).astype(jnp.float32)
    yr = jnp.real(y).astype(jnp.float32)
    yi = jnp.imag(y).astype(jnp.float32)
    ctr = jnp.real(ct).astype(jnp.float32)
    cti = jnp.imag(ct).astype(jnp.float32)
    dsr, dsi, dgr, dgi, dmr, dmi = _pallas_row_bwd(gr, gi, yr, yi, ctr, cti, mr, mi)
    ds = (dsr + 1j * dsi).astype(y.dtype)
    dg = (dgr + 1j * dgi).astype(gates.dtype)
    dm = (dmr + 1j * dmi).astype(mlane.dtype)
    return ds, dg, dm


row_layer_lane.defvjp(_lane_fwd, _lane_bwd)


# ---------------------------------------------------------------------------
# theta-native RX layer: backward produces d(theta) directly
# ---------------------------------------------------------------------------
#
# The generic row_layer backward accumulates the FULL 2x2 complex gate
# cotangent (8 masked block reductions per qubit); an RX layer only needs
# the scalar d(theta_q) = -1/2 sin Re(S1) + 1/2 cos Im(S2) with
# S1 = sum ct.psi and S2 = sum pct.psi (plain products, JAX linear-transpose
# convention) — 2 reductions per qubit, ~4x less reduce work, which is the
# dominant backward cost on the N=20 TFIM bench.


def _rotx_fwd_kernel(nrow: int):
    def kernel(cs_ref, sr_ref, si_ref, or_ref, oi_ref):
        cr = sr_ref[:]
        ci = si_ref[:]
        r_total = cr.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, cr.shape, 0)
        for q in range(nrow):
            s = r_total >> (q + 1)
            c = cs_ref[q, 0]
            sn = cs_ref[q, 1]
            # rx = [[c, -i sn], [-i sn, c]]
            cr, ci = _butterfly_rx(cr, ci, rows, s, c, -sn)
        or_ref[:] = cr
        oi_ref[:] = ci

    return kernel


def _rotx_bwd_kernel(nrow: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(
        cs_ref, yr_ref, yi_ref, ctr_ref, cti_ref,
        dsr_ref, dsi_ref, dth_ref,
        s_r, s_i,
    ):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            for qq in range(dth_ref.shape[0]):
                dth_ref[qq] = 0.0

        s_r[:] = yr_ref[:]
        s_i[:] = yi_ref[:]
        dsr_ref[:] = ctr_ref[:]
        dsi_ref[:] = cti_ref[:]
        r_total = s_r.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, s_r.shape, 0)
        for q in range(nrow - 1, -1, -1):
            s = r_total >> (q + 1)
            c = cs_ref[q, 0]
            sn = cs_ref[q, 1]
            bit = (rows // s) % 2
            is_lo = bit == 0
            # un-apply rx^† = [[c, +i sn], [+i sn, c]]
            nsr, nsi = _butterfly_rx(s_r[:], s_i[:], rows, s, c, sn)
            s_r[:] = nsr
            s_i[:] = nsi
            cr = dsr_ref[:]
            ci = dsi_ref[:]
            pct_r = jnp.where(
                is_lo, pltpu.roll(cr, r_total - s, 0), pltpu.roll(cr, s, 0)
            )
            pct_i = jnp.where(
                is_lo, pltpu.roll(ci, r_total - s, 0), pltpu.roll(ci, s, 0)
            )
            # d(theta) = -1/2 sin Re(sum ct.psi) + 1/2 cos Im(sum pct.psi)
            if not _BWD_SKIP_GRADS:  # timing-diagnostic flag, never in prod
                re_s1 = jnp.sum(cr * nsr - ci * nsi)
                im_s2 = jnp.sum(pct_r * nsi + pct_i * nsr)
                dth_ref[q] += -0.5 * sn * re_s1 + 0.5 * c * im_s2
            # ct walk with rx^T = rx (symmetric): new_ct = c ct - i sn pct
            dsr_ref[:] = c * cr + sn * pct_i
            dsi_ref[:] = c * ci - sn * pct_r
        # keep nothing else: ds refs now hold the walked input cotangent

    return kernel


def _pallas_rotx_fwd(th, sr, si):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = th.shape[0]
    r, lanes = sr.shape
    rb = 2**nrow
    grid = (r // rb,)
    cs = jnp.stack([jnp.cos(th / 2), jnp.sin(th / 2)], axis=1)
    return pl.pallas_call(
        _rotx_fwd_kernel(nrow),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(sr.shape, sr.dtype),
            jax.ShapeDtypeStruct(si.shape, si.dtype),
        ),
        in_specs=[
            pl.BlockSpec((nrow, 2), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ),
        input_output_aliases={1: 0, 2: 1},
        interpret=_INTERPRET,
    )(cs, sr, si)


def _pallas_rotx_bwd(th, yr, yi, ctr, cti):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = th.shape[0]
    r, lanes = yr.shape
    rb = 2**nrow
    grid = (r // rb,)
    cs = jnp.stack([jnp.cos(th / 2), jnp.sin(th / 2)], axis=1)
    return pl.pallas_call(
        _rotx_bwd_kernel(nrow),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(yr.shape, yr.dtype),
            jax.ShapeDtypeStruct(yi.shape, yi.dtype),
            jax.ShapeDtypeStruct((nrow,), th.dtype),
        ),
        in_specs=[
            pl.BlockSpec((nrow, 2), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nrow,), lambda j: (0,), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, lanes), jnp.float32),
            pltpu.VMEM((rb, lanes), jnp.float32),
        ],
        input_output_aliases={3: 0, 4: 1},
        interpret=_INTERPRET,
    )(cs, yr, yi, ctr, cti)


@jax.custom_vjp
def rotx_row_layer(state2d: Tensor, thetas: Tensor) -> Tensor:
    """rx(thetas[k]) on the k-th of the nrow LOWEST row bits; dtheta-native VJP."""
    return _rotx_fwd_impl(state2d, thetas)


def _rotx_fwd_impl(state2d: Tensor, thetas: Tensor) -> Tensor:
    if not (_on_tpu() or _INTERPRET):
        gates = _rx_gates(thetas)
        return _row_layer_reference(state2d, gates)
    sr = jnp.real(state2d).astype(jnp.float32)
    si = jnp.imag(state2d).astype(jnp.float32)
    th = jnp.asarray(thetas).astype(jnp.float32)
    orr, oii = _pallas_rotx_fwd(th, sr, si)
    return (orr + 1j * oii).astype(state2d.dtype)


def _rx_gates(thetas: Tensor) -> Tensor:
    c = jnp.cos(thetas / 2)
    s = -1j * jnp.sin(thetas / 2)
    return jnp.stack(
        [jnp.stack([c, s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    ).astype(jnp.complex64)


def _rotx_fwd(state2d: Tensor, thetas: Tensor):
    y = _rotx_fwd_impl(state2d, thetas)
    return y, (y, thetas)


def _rotx_bwd(res, ct):
    y, thetas = res
    if not (_on_tpu() or _INTERPRET):
        gates = _rx_gates(thetas)
        ds, dg = _row_bwd_reference(y, gates, ct)
        # chain dgate -> dtheta: dtheta = Re sum(dU/dtheta * dg) (plain)
        c = jnp.cos(thetas / 2)
        s = jnp.sin(thetas / 2)
        du00 = -0.5 * s
        du01 = -0.5j * c
        dth = jnp.real(
            du00 * (dg[:, 0, 0] + dg[:, 1, 1]) + du01 * (dg[:, 0, 1] + dg[:, 1, 0])
        ).astype(thetas.dtype)
        return ds, dth
    th = jnp.asarray(thetas).astype(jnp.float32)
    yr = jnp.real(y).astype(jnp.float32)
    yi = jnp.imag(y).astype(jnp.float32)
    ctr = jnp.real(ct).astype(jnp.float32)
    cti = jnp.imag(ct).astype(jnp.float32)
    dsr, dsi, dth = _pallas_rotx_bwd(th, yr, yi, ctr, cti)
    return (dsr + 1j * dsi).astype(y.dtype), dth.astype(jnp.asarray(thetas).dtype)


rotx_row_layer.defvjp(_rotx_fwd, _rotx_bwd)


# ---------------------------------------------------------------------------
# constant-gate row layer: backward skips the gate-cotangent reductions
# ---------------------------------------------------------------------------


def _const_bwd_kernel(nrow: int):
    def kernel(gr_ref, gi_ref, ctr_ref, cti_ref, dsr_ref, dsi_ref):
        dsr_ref[:] = ctr_ref[:]
        dsi_ref[:] = cti_ref[:]
        r_total = dsr_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, dsr_ref.shape, 0)
        for q in range(nrow - 1, -1, -1):
            s = r_total >> (q + 1)
            # ct walk only: cur_ct = g^T cur_ct
            mt = (
                gr_ref[q, 0], gi_ref[q, 0], gr_ref[q, 2], gi_ref[q, 2],
                gr_ref[q, 1], gi_ref[q, 1], gr_ref[q, 3], gi_ref[q, 3],
            )
            ncr, nci = _butterfly(dsr_ref[:], dsi_ref[:], rows, s, mt)
            dsr_ref[:] = ncr
            dsi_ref[:] = nci

    return kernel


def _pallas_row_bwd_const(gr, gi, ctr, cti):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = gr.shape[0]
    r, lanes = ctr.shape
    rb = 2**nrow
    grid = (r // rb,)
    return pl.pallas_call(
        _const_bwd_kernel(nrow),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(ctr.shape, ctr.dtype),
            jax.ShapeDtypeStruct(cti.shape, cti.dtype),
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
    )(jnp.reshape(gr, (nrow, 4)), jnp.reshape(gi, (nrow, 4)), ctr, cti)


@jax.custom_vjp
def row_layer_const(state2d: Tensor, gates: Tensor) -> Tensor:
    """row_layer for CONSTANT (non-trainable) gates: the backward does only
    the cotangent transpose walk — no per-gate reduction work (zeros are
    returned for the gate cotangent)."""
    return _row_fwd_impl(state2d, gates)


def _row_const_fwd(state2d: Tensor, gates: Tensor):
    return _row_fwd_impl(state2d, gates), gates


def _row_const_bwd(gates, ct):
    if not (_on_tpu() or _INTERPRET):
        # reference path: transpose-walk with numpy gates
        nrow = gates.shape[0]
        r, lanes = ct.shape
        cur = ct
        for q in range(nrow - 1, -1, -1):
            s = (2**nrow) >> (q + 1)
            v = jnp.reshape(cur, (r // (2 * s), 2, s, lanes))
            cur = jnp.reshape(
                jnp.einsum("ab,xbsl->xasl", gates[q].T.astype(v.dtype), v), (r, lanes)
            )
        return cur, jnp.zeros_like(gates)
    gr = jnp.real(gates).astype(jnp.float32)
    gi = jnp.imag(gates).astype(jnp.float32)
    ctr = jnp.real(ct).astype(jnp.float32)
    cti = jnp.imag(ct).astype(jnp.float32)
    dsr, dsi = _pallas_row_bwd_const(gr, gi, ctr, cti)
    return (dsr + 1j * dsi).astype(ct.dtype), jnp.zeros_like(gates)


row_layer_const.defvjp(_row_const_fwd, _row_const_bwd)


# ---------------------------------------------------------------------------
# fused zz-phase + rx rotation layer: exp(-i/2 Σ θ_k Z_a Z_b) then rx(φ_q)
# on the kernel row qubits — ONE HBM round trip forward, one backward, with
# theta-native dθ for BOTH the zz and rx parameters (the round-1 "next
# lever": the standalone rotx kernel was faster in isolation but lost its
# gain to XLA copies around the separate zz pass; fusing removes the seam).
# ---------------------------------------------------------------------------

MAX_KERNEL_QUBITS_ZZRX = 10  # 11 compiles with the vmem limit lifted to
# v5e's real 128MB, but measured SLOWER end to end (4.81 vs 4.43 ms/step on
# the N=20 bench): the rb=2048 block runs worse than 2x rb=1024 blocks


def _zz_bit_sign(p, rb, lanes, j, row_i, lane_i):
    """Sign vector (1-2·bit_p(idx)) factored by bit region of the layout
    idx = (j·rb + row)·lanes + lane: lane bits live on a (1, lanes) vector,
    row bits on (rb, 1), grid bits on the traced scalar j.  ``row_i`` /
    ``lane_i`` are caller-created iotas (ONE each per kernel — fresh iotas
    per pair blow the Mosaic scoped-vmem stack: (rb,1) pads to (rb,128))."""
    nrow = int(math.log2(rb))
    lane_bits = int(math.log2(lanes))
    if p < lane_bits:
        return "lane", 1.0 - 2.0 * ((lane_i >> p) & 1).astype(jnp.float32)
    if p < lane_bits + nrow:
        return "row", 1.0 - 2.0 * ((row_i >> (p - lane_bits)) & 1).astype(jnp.float32)
    return "j", (1 - 2 * ((j >> (p - lane_bits - nrow)) & 1)).astype(jnp.float32)


def _zz_expo(zzth_ref, pairs, n, rb, lanes, j):
    """(rb, lanes) f32 field Σ_k θ_k z_a z_b, factored by bit region.

    z_a z_b = (1-2·bit_a)(1-2·bit_b), so row-row (and any j-bit) pairs
    accumulate on an (rb, 1) vector, lane-lane pairs on (1, lanes), and only
    row x lane straddles pay a full-block outer product — ~3 full-block ops
    total instead of ~6 per pair (the dominant cost of the original
    iota-per-pair version in the backward kernel).
    """
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    exr = jnp.zeros((rb, 1), jnp.float32)
    exl = jnp.zeros((1, lanes), jnp.float32)
    full = None
    for k, (a, b) in enumerate(pairs):
        ra, sa = _zz_bit_sign(n - 1 - a, rb, lanes, j, row_i, lane_i)
        rb_, sb = _zz_bit_sign(n - 1 - b, rb, lanes, j, row_i, lane_i)
        th = zzth_ref[k]
        regions = {ra, rb_}
        if "lane" not in regions:  # row-row, row-j, j-j: all fold to (rb,1)
            exr = exr + th * sa * sb
        elif "row" not in regions:  # lane-lane, lane-j: fold to (1,lanes)
            exl = exl + th * sa * sb
        else:  # row x lane straddle: rank-1 outer product
            sr = sa if ra == "row" else sb
            sl = sb if ra == "row" else sa
            t = (th * sr) * sl
            full = t if full is None else full + t
    out = exr + exl  # broadcasts to (rb, lanes)
    if full is not None:
        out = out + full
    return jnp.broadcast_to(out, (rb, lanes))


def _zz_pair_sums(h, pairs, n, rb, lanes, j):
    """Per-pair Σ_idx h·z_a z_b via partial reductions (backward dzz).

    Reduces h once over lanes and once over rows; every pair's sum is then
    a small-vector dot except row x lane straddles (one masked lane-reduce
    each) — replacing a full (rb, lanes) mask build + full reduction per
    pair.
    """
    hl = jnp.sum(h, axis=1, keepdims=True)  # (rb, 1)
    hc = jnp.sum(h, axis=0, keepdims=True)  # (1, lanes)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    out = []
    for a, b in pairs:
        ra, sa = _zz_bit_sign(n - 1 - a, rb, lanes, j, row_i, lane_i)
        rb_, sb = _zz_bit_sign(n - 1 - b, rb, lanes, j, row_i, lane_i)
        regions = {ra, rb_}
        if "lane" not in regions:
            out.append(jnp.sum(hl * (sa * sb)))
        elif "row" not in regions:
            out.append(jnp.sum(hc * (sa * sb)))
        else:
            sr = sa if ra == "row" else sb
            sl = sb if ra == "row" else sa
            out.append(jnp.sum(jnp.sum(h * sl, axis=1, keepdims=True) * sr))
    return out


def _rowm_dot(m, x3, transpose_m=False):
    """Σ_j m[i,j]·x3[j,g,c] (or m[j,i] when transposed) as one dot_general.

    The (R, rb//R, lanes) view of an (rb, lanes) block is LAYOUT-FREE (the
    trailing (rb//R, lanes) axes keep whole (8,128) tiles intact), unlike
    the (R, rb//R·lanes) merge which forces a Mosaic relayout — measured
    0.29 ms/step of pure tile shuffling on the 2D formulation."""
    contract = (((0,), (0,)), ((), ())) if transpose_m else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(m, x3, contract, preferred_element_type=jnp.float32)


def _rowm_fwd_stage(cr, ci, m7r, m7i):
    """Left-multiply the top-rmx row bits by the (R, R) rx-kron on the MXU:
    one complex matmul (4 real dots) instead of rmx roll-butterflies
    (4·rmx full-block VMEM shuffles on the VPU)."""
    rb, lanes = cr.shape
    R = m7r.shape[0]
    xr = jnp.reshape(cr, (R, rb // R, lanes))
    xi = jnp.reshape(ci, (R, rb // R, lanes))
    yr = _rowm_dot(m7r, xr) - _rowm_dot(m7i, xi)
    yi = _rowm_dot(m7r, xi) + _rowm_dot(m7i, xr)
    return jnp.reshape(yr, (rb, lanes)), jnp.reshape(yi, (rb, lanes))


def _rowm_bwd_stage(j, m7r_ref, m7i_ref, s_r, s_i, dsr_ref, dsi_ref,
                    dm7r_ref, dm7i_ref):
    """Un-apply the row kron (M† y), accumulate dM7 over the sequential
    grid, and walk the cotangent through M7^T — the left-multiplication
    mirror of :func:`_lane_bwd_prologue`.  REQUIRES a unitary M7."""
    from jax.experimental import pallas as pl

    @pl.when(j == 0)
    def _():
        dm7r_ref[:] = jnp.zeros_like(dm7r_ref)
        dm7i_ref[:] = jnp.zeros_like(dm7i_ref)

    f32 = jnp.float32
    m7r = m7r_ref[:]
    m7i = m7i_ref[:]
    rb, lanes = s_r.shape
    R = m7r.shape[0]
    g = rb // R
    yr = jnp.reshape(s_r[:], (R, g, lanes))
    yi = jnp.reshape(s_i[:], (R, g, lanes))
    cr = jnp.reshape(dsr_ref[:], (R, g, lanes))
    ci = jnp.reshape(dsi_ref[:], (R, g, lanes))
    # x = M7† y  (planes: xr = m7r^T yr + m7i^T yi, xi = m7r^T yi - m7i^T yr)
    xr = _rowm_dot(m7r, yr, True) + _rowm_dot(m7i, yi, True)
    xi = _rowm_dot(m7r, yi, True) - _rowm_dot(m7i, yr, True)
    # dM7 += ct · x^T contracted over (g, lanes) — non-conjugating complex
    # product (module convention).  Mosaic matmuls allow ONE contracting
    # dim, so accumulate g-slices of 2D (R,lanes)@(R,lanes)^T dots.
    dgdim = (((1,), (1,)), ((), ()))
    dot2 = lambda a, b: jax.lax.dot_general(a, b, dgdim, preferred_element_type=f32)
    acc_r = jnp.zeros_like(dm7r_ref)
    acc_i = jnp.zeros_like(dm7i_ref)
    for gg in range(g):
        acc_r = acc_r + dot2(cr[:, gg, :], xr[:, gg, :]) - dot2(ci[:, gg, :], xi[:, gg, :])
        acc_i = acc_i + dot2(cr[:, gg, :], xi[:, gg, :]) + dot2(ci[:, gg, :], xr[:, gg, :])
    dm7r_ref[:] += acc_r
    dm7i_ref[:] += acc_i
    # ct walk: ct = M7^T ct
    nr = _rowm_dot(m7r, cr, True) - _rowm_dot(m7i, ci, True)
    ni = _rowm_dot(m7r, ci, True) + _rowm_dot(m7i, cr, True)
    s_r[:] = jnp.reshape(xr, (rb, lanes))
    s_i[:] = jnp.reshape(xi, (rb, lanes))
    dsr_ref[:] = jnp.reshape(nr, (rb, lanes))
    dsi_ref[:] = jnp.reshape(ni, (rb, lanes))


def _zzrx_fwd_kernel(pairs, n, nrow, with_lane: bool = False, rmx: int = 0):
    from jax.experimental import pallas as pl

    def kernel(*refs):
        refs = list(refs)
        zzth_ref, cs_ref, srow_ref, slane_ref = refs[:4]
        refs = refs[4:]
        if rmx:
            m7r_ref, m7i_ref = refs[:2]
            refs = refs[2:]
        if with_lane:
            mr_ref, mi_ref = refs[:2]
            refs = refs[2:]
        sr_ref, si_ref, or_ref, oi_ref = refs
        cr = sr_ref[:]
        ci = si_ref[:]
        rb, lanes = cr.shape
        # expo = (Srow_block * theta) @ Slane^T: one MXU dot replaces the
        # per-pair bit arithmetic (the sign matrices carry the global row
        # index through the grid's block index map)
        if not _SKIP_ZZ:
            expo = jnp.dot(
                srow_ref[:] * zzth_ref[0][None, :],
                slane_ref[:].T,
                preferred_element_type=jnp.float32,
            )
            pc = jnp.cos(0.5 * expo)
            ps = -jnp.sin(0.5 * expo)  # phase = e^{-i expo / 2}
            cr, ci = pc * cr - ps * ci, pc * ci + ps * cr
        rows = jax.lax.broadcasted_iota(jnp.int32, cr.shape, 0)
        # low row bits (strides below 2^(nrow-rmx)) stay VPU butterflies;
        # the top rmx bits ride the MXU as one kron matmul below
        for ql in range(0 if not _SKIP_ROLLS else nrow - rmx, nrow - rmx):
            q = rmx + ql
            s = rb >> (q + 1)
            c = cs_ref[ql, 0]
            sn = cs_ref[ql, 1]
            cr, ci = _butterfly_rx(cr, ci, rows, s, c, -sn)
        if rmx:
            cr, ci = _rowm_fwd_stage(cr, ci, m7r_ref[:], m7i_ref[:])
        if with_lane:
            # the lane-qubit kron rides the MXU inside the same HBM pass
            # (VERDICT r2 #1c)
            _lane_fwd_epilogue(cr, ci, mr_ref, mi_ref, or_ref, oi_ref)
        else:
            or_ref[:] = cr
            oi_ref[:] = ci

    return kernel


def _zzrx_bwd_kernel(pairs, n, nrow, with_lane: bool = False, rmx: int = 0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    npairs = len(pairs)

    def kernel(*refs):
        refs = list(refs)
        zzth_ref, cs_ref, srow_ref, slane_ref = refs[:4]
        refs = refs[4:]
        if rmx:
            m7r_ref, m7i_ref = refs[:2]
            refs = refs[2:]
        if with_lane:
            mr_ref, mi_ref = refs[:2]
            refs = refs[2:]
        yr_ref, yi_ref, ctr_ref, cti_ref, dsr_ref, dsi_ref = refs[:6]
        refs = refs[6:]
        dzz_ref, dth_ref = refs[:2]
        refs = refs[2:]
        if rmx:
            dm7r_ref, dm7i_ref = refs[:2]
            refs = refs[2:]
        if with_lane:
            dmr_ref, dmi_ref = refs[:2]
            refs = refs[2:]
        s_r, s_i = refs
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            dzz_ref[:] = jnp.zeros_like(dzz_ref)
            for qq in range(nrow - rmx):
                dth_ref[qq] = 0.0

        if with_lane:
            _lane_bwd_prologue(
                j, mr_ref, mi_ref, yr_ref, yi_ref, ctr_ref, cti_ref,
                dsr_ref, dsi_ref, dmr_ref, dmi_ref, s_r, s_i,
            )
        else:
            s_r[:] = yr_ref[:]
            s_i[:] = yi_ref[:]
            dsr_ref[:] = ctr_ref[:]
            dsi_ref[:] = cti_ref[:]
        if rmx:
            _rowm_bwd_stage(
                j, m7r_ref, m7i_ref, s_r, s_i, dsr_ref, dsi_ref,
                dm7r_ref, dm7i_ref,
            )
        rb, lanes = s_r.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, s_r.shape, 0)
        for ql in range(nrow - rmx - 1, -1 if not _SKIP_ROLLS else nrow - rmx - 1, -1):
            q = rmx + ql
            s = rb >> (q + 1)
            c = cs_ref[ql, 0]
            sn = cs_ref[ql, 1]
            bit = (rows // s) % 2
            is_lo = bit == 0
            nsr, nsi = _butterfly_rx(s_r[:], s_i[:], rows, s, c, sn)
            s_r[:] = nsr
            s_i[:] = nsi
            cr = dsr_ref[:]
            ci = dsi_ref[:]
            pct_r = jnp.where(
                is_lo, pltpu.roll(cr, rb - s, 0), pltpu.roll(cr, s, 0)
            )
            pct_i = jnp.where(
                is_lo, pltpu.roll(ci, rb - s, 0), pltpu.roll(ci, s, 0)
            )
            if not _BWD_SKIP_GRADS:  # timing-diagnostic flag, never in prod
                re_s1 = jnp.sum(cr * nsr - ci * nsi)
                im_s2 = jnp.sum(pct_r * nsi + pct_i * nsr)
                dth_ref[ql] += -0.5 * sn * re_s1 + 0.5 * c * im_s2
            dsr_ref[:] = c * cr + sn * pct_i
            dsi_ref[:] = c * ci - sn * pct_r
        # phase stage: s = z = P x (still un-walked), ds = ct_z
        zr = s_r[:]
        zi = s_i[:]
        cr = dsr_ref[:]
        ci = dsi_ref[:]
        # dθ_k = Σ (s_k / 2)(ct_r z_i + ct_i z_r)   [non-conjugating VJP
        # convention of this module: ct walks by the TRANSPOSE map]
        # Σ h·(1-2xor) = Σ h z_a z_b — factored partial sums (one lane and
        # one sublane reduction shared by all pairs)
        h = cr * zi + ci * zr
        if not _BWD_SKIP_GRADS:
            # batched over pairs via the sign matrices: one MXU dot + one
            # masked column-sum instead of a full-block xor mask per pair
            t = jnp.dot(h, slane_ref[:], preferred_element_type=jnp.float32)
            dzz_ref[:] += 0.5 * jnp.sum(
                srow_ref[:] * t, axis=0, keepdims=True
            )
        if not _SKIP_ZZ:
            expo = jnp.dot(
                srow_ref[:] * zzth_ref[0][None, :],
                slane_ref[:].T,
                preferred_element_type=jnp.float32,
            )
            pc = jnp.cos(0.5 * expo)
            ps = -jnp.sin(0.5 * expo)
            # transpose walk of a diagonal map: multiply by the phase itself
            dsr_ref[:] = pc * cr - ps * ci
            dsi_ref[:] = pc * ci + ps * cr

    return kernel


def _zzrx_compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)


def _zzrx_sign_inputs(pairs, n, zzth, r, lanes):
    """Padded theta row + (Srow, Slane) sign matrices for the zz stage.

    Unlike the grid kernel (hard MAX_ML_PAIRS budget), this per-layer path
    handles ANY pair count: columns pad up to the next lane multiple (128)
    above npairs, and every kernel shape derives from that width.
    """
    import math as _math

    from .kernels_multilayer import MAX_ML_PAIRS, _sign_matrices

    npairs = zzth.shape[0]
    p_cols = max(MAX_ML_PAIRS, -(-npairs // 128) * 128)
    zzp = jnp.pad(zzth, (0, p_cols - npairs))[None, :]
    srow, slane = _sign_matrices(pairs, n, int(_math.log2(r)), lanes, p_cols)
    return zzp, jnp.asarray(srow), jnp.asarray(slane)


def _pallas_zzrx_fwd(pairs, n, zzth, th, sr, si, mr=None, mi=None,
                     m7r=None, m7i=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = th.shape[0]
    r, lanes = sr.shape
    rb = 2**nrow
    grid = (r // rb,)
    with_lane = mr is not None
    rmx = int(round(math.log2(m7r.shape[0]))) if m7r is not None else 0
    R = 2**rmx
    thl = th[rmx:]  # the top rmx row bits live in the m7 kron instead
    cs = jnp.stack([jnp.cos(thl / 2), jnp.sin(thl / 2)], axis=1)
    zzp, srow, slane = _zzrx_sign_inputs(pairs, n, zzth, r, lanes)
    P = zzp.shape[1]
    rowm_specs = (
        [
            pl.BlockSpec((R, R), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        if rmx
        else []
    )
    lane_specs = (
        [
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        if with_lane
        else []
    )
    nin = 4 + len(rowm_specs) + len(lane_specs)
    args = [zzp, cs, srow, slane]
    if rmx:
        args += [m7r, m7i]
    if with_lane:
        args += [mr, mi]
    args += [sr, si]
    return pl.pallas_call(
        _zzrx_fwd_kernel(pairs, n, nrow, with_lane, rmx),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(sr.shape, sr.dtype),
            jax.ShapeDtypeStruct(si.shape, si.dtype),
        ),
        in_specs=[
            pl.BlockSpec((1, P), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nrow - rmx, 2), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, P), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, P), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        + rowm_specs
        + lane_specs
        + [
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ),
        input_output_aliases={nin: 0, nin + 1: 1},
        compiler_params=_zzrx_compiler_params(),
        interpret=_INTERPRET,
    )(*args)


def _pallas_zzrx_bwd(pairs, n, zzth, th, yr, yi, ctr, cti, mr=None, mi=None,
                     m7r=None, m7i=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = th.shape[0]
    npairs = zzth.shape[0]
    r, lanes = yr.shape
    rb = 2**nrow
    grid = (r // rb,)
    with_lane = mr is not None
    rmx = int(round(math.log2(m7r.shape[0]))) if m7r is not None else 0
    R = 2**rmx
    nlow = nrow - rmx
    thl = th[rmx:]
    cs = jnp.stack([jnp.cos(thl / 2), jnp.sin(thl / 2)], axis=1)
    zzp, srow, slane = _zzrx_sign_inputs(pairs, n, zzth, r, lanes)
    P = zzp.shape[1]
    rowm_in = (
        [
            pl.BlockSpec((R, R), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        if rmx
        else []
    )
    lane_in = (
        [
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        if with_lane
        else []
    )
    out_shapes = [
        jax.ShapeDtypeStruct(yr.shape, yr.dtype),
        jax.ShapeDtypeStruct(yi.shape, yi.dtype),
        jax.ShapeDtypeStruct((1, P), jnp.float32),
        jax.ShapeDtypeStruct((nlow,), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nlow,), lambda j: (0,), memory_space=pltpu.SMEM),
    ]
    if rmx:
        out_shapes += [
            jax.ShapeDtypeStruct((R, R), jnp.float32),
            jax.ShapeDtypeStruct((R, R), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((R, R), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, R), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
    if with_lane:
        out_shapes += [
            jax.ShapeDtypeStruct((lanes, lanes), jnp.float32),
            jax.ShapeDtypeStruct((lanes, lanes), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
    nin = 4 + len(rowm_in) + len(lane_in)  # ctr is input nin+2
    args = [zzp, cs, srow, slane]
    if rmx:
        args += [m7r, m7i]
    if with_lane:
        args += [mr, mi]
    args += [yr, yi, ctr, cti]
    outs = pl.pallas_call(
        _zzrx_bwd_kernel(pairs, n, nrow, with_lane, rmx),
        grid=grid,
        out_shape=tuple(out_shapes),
        in_specs=[
            pl.BlockSpec((1, P), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nlow, 2), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, P), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, P), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ]
        + rowm_in
        + lane_in
        + [
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, lanes), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((rb, lanes), jnp.float32),
            pltpu.VMEM((rb, lanes), jnp.float32),
        ],
        input_output_aliases={nin + 2: 0, nin + 3: 1},
        compiler_params=_zzrx_compiler_params(),
        interpret=_INTERPRET,
    )(*args)
    if rmx and with_lane:
        dsr, dsi, dzzp, dth, dm7r, dm7i, dmr, dmi = outs
        return dsr, dsi, dzzp[0, :npairs], dth, dmr, dmi, dm7r, dm7i
    if rmx:
        dsr, dsi, dzzp, dth, dm7r, dm7i = outs
        return dsr, dsi, dzzp[0, :npairs], dth, None, None, dm7r, dm7i
    if with_lane:
        dsr, dsi, dzzp, dth, dmr, dmi = outs
        return dsr, dsi, dzzp[0, :npairs], dth, dmr, dmi
    dsr, dsi, dzzp, dth = outs
    return dsr, dsi, dzzp[0, :npairs], dth


def _zz_phase_dense(state2d, pairs, n, zz_thetas):
    """Reference zz phase on the (R, lanes) layout (CPU path)."""
    r, lanes = state2d.shape
    idx = jnp.arange(r * lanes, dtype=jnp.int32).reshape(r, lanes)
    expo = jnp.zeros((r, lanes), jnp.float32)
    for k, (a, b) in enumerate(pairs):
        xor = ((idx >> (n - 1 - a)) ^ (idx >> (n - 1 - b))) & 1
        expo = expo + zz_thetas[k].astype(jnp.float32) * (
            1.0 - 2.0 * xor.astype(jnp.float32)
        )
    return state2d * jnp.exp(-0.5j * expo).astype(state2d.dtype)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def zzrx_row_layer(pairs: Any, n: int, state2d: Tensor, zz_thetas: Tensor, rx_thetas: Tensor) -> Tensor:
    """exp(-i/2 Σ θ_k Z_a Z_b) then rx(φ_q) on the kernel row qubits.

    ``pairs`` is a static tuple of (a, b) qubit pairs over ALL n qubits;
    rx acts on the lowest ``len(rx_thetas)`` row bits of the 2D layout.
    dθ for both parameter sets is produced inside the backward kernel.
    """
    return _zzrx_fwd_impl(pairs, n, state2d, zz_thetas, rx_thetas)


def _zzrx_fwd_impl(pairs, n, state2d, zz_thetas, rx_thetas):
    if not (_on_tpu() or _INTERPRET):
        z = _zz_phase_dense(state2d, pairs, n, jnp.asarray(zz_thetas))
        return _row_layer_reference(z, _rx_gates(jnp.asarray(rx_thetas)))
    sr = jnp.real(state2d).astype(jnp.float32)
    si = jnp.imag(state2d).astype(jnp.float32)
    zzth = jnp.asarray(zz_thetas).astype(jnp.float32)
    th = jnp.asarray(rx_thetas).astype(jnp.float32)
    orr, oii = _pallas_zzrx_fwd(pairs, n, zzth, th, sr, si)
    return (orr + 1j * oii).astype(state2d.dtype)


def _zzrx_fwd(pairs, n, state2d, zz_thetas, rx_thetas):
    y = _zzrx_fwd_impl(pairs, n, state2d, zz_thetas, rx_thetas)
    return y, (y, zz_thetas, rx_thetas)


def _zzrx_bwd(pairs, n, res, ct):
    y, zz_thetas, rx_thetas = res
    if not (_on_tpu() or _INTERPRET):
        # reference chain: un-apply rx (generic bwd), then phase-stage VJP
        gates = _rx_gates(jnp.asarray(rx_thetas))
        ds, dg = _row_bwd_reference(y, gates, ct)
        c = jnp.cos(jnp.asarray(rx_thetas) / 2)
        s = jnp.sin(jnp.asarray(rx_thetas) / 2)
        dth = jnp.real(
            -0.5 * s * (dg[:, 0, 0] + dg[:, 1, 1])
            + (-0.5j * c) * (dg[:, 0, 1] + dg[:, 1, 0])
        ).astype(jnp.asarray(rx_thetas).dtype)
        # z = P x: un-apply the rx gates from y
        z = y
        nrow = gates.shape[0]
        r, lanes = y.shape
        for q in range(nrow - 1, -1, -1):
            st = (2**nrow) >> (q + 1)
            v = jnp.reshape(z, (r // (2 * st), 2, st, lanes))
            z = jnp.reshape(
                jnp.einsum("ab,xbsl->xasl", jnp.conj(gates[q].T).astype(v.dtype), v),
                (r, lanes),
            )
        idx = jnp.arange(r * lanes, dtype=jnp.int32).reshape(r, lanes)
        h = jnp.real(ds) * jnp.imag(z) + jnp.imag(ds) * jnp.real(z)
        dzz = []
        for k, (a, b) in enumerate(pairs):
            xor = (((idx >> (n - 1 - a)) ^ (idx >> (n - 1 - b))) & 1).astype(
                jnp.float32
            )
            dzz.append(0.5 * (jnp.sum(h) - 2.0 * jnp.sum(h * xor)))
        dzz = jnp.stack(dzz).astype(jnp.asarray(zz_thetas).dtype)
        expo = jnp.zeros((r, lanes), jnp.float32)
        for k, (a, b) in enumerate(pairs):
            xor = ((idx >> (n - 1 - a)) ^ (idx >> (n - 1 - b))) & 1
            expo = expo + jnp.asarray(zz_thetas)[k].astype(jnp.float32) * (
                1.0 - 2.0 * xor.astype(jnp.float32)
            )
        phase = jnp.exp(-0.5j * expo).astype(ds.dtype)
        return ds * phase, dzz, dth
    zzth = jnp.asarray(zz_thetas).astype(jnp.float32)
    th = jnp.asarray(rx_thetas).astype(jnp.float32)
    yr = jnp.real(y).astype(jnp.float32)
    yi = jnp.imag(y).astype(jnp.float32)
    ctr = jnp.real(ct).astype(jnp.float32)
    cti = jnp.imag(ct).astype(jnp.float32)
    dsr, dsi, dzz, dth = _pallas_zzrx_bwd(pairs, n, zzth, th, yr, yi, ctr, cti)
    return (
        (dsr + 1j * dsi).astype(y.dtype),
        dzz.astype(jnp.asarray(zz_thetas).dtype),
        dth.astype(jnp.asarray(rx_thetas).dtype),
    )


zzrx_row_layer.defvjp(_zzrx_fwd, _zzrx_bwd)

__all__ += ["zzrx_row_layer"]
