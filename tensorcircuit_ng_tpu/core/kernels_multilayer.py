"""Whole-block multi-layer zzrx Pallas kernels: L layers per HBM round trip.

Round-1 left ~3 ms/step of the N=20 TFIM VQE bench in the layer-by-layer
adjoint walk: each fused layer paid its own kernel launch + HBM round trip
in both directions, plus XLA AD for the outer-qubit einsums and the lane
matmul.  This module removes all three costs at once:

- the kernel row block covers ALL ``n - 7`` row qubits (up to 13 -> an 8 MB
  f32 plane pair for n=20), enabled by raising the Mosaic scoped-VMEM limit
  via ``pltpu.CompilerParams(vmem_limit_bytes=...)`` -- the 16 MB "wall" in
  the round-1 notes is only the DEFAULT scope; v5e has 128 MB of VMEM
  (confirmed by the compiler's own OOM report);
- the 128x128 lane matmul (kron of the 7 lane-qubit rx gates) runs on the
  MXU inside the same kernel;
- ALL L layers of exp(-i/2 sum theta_k Z_a Z_b) . prod rx(phi_q) loop inside
  ONE forward kernel and ONE backward kernel, with the state and the
  cotangent pair resident in VMEM across layers.  The backward reconstructs
  every intermediate by un-application (gates are unitary) and emits
  theta-native d(zz), d(rx_row) plus the full lane-matrix cotangent d(M_l);
  the tiny chain d(M_l) -> d(rx_lane) stays with XLA AD outside.

The zz machinery is sign-matrix matmuls rather than per-pair bit
arithmetic: with ``Srow[r, k] = prod of row-bit signs of pair k`` and
``Slane[c, k]`` its lane factor (built host-side, static per circuit),

    expo_l  = (Srow * theta_l) @ Slane^T          (one MXU dot per layer)
    dzz_l,k = 1/2 sum_r Srow[r,k] * (h @ Slane)[r,k]

This matters beyond speed: Mosaic hoists loop-invariant full-block values,
so the round-1 per-pair iota/sign temps would all be live simultaneously
(the 557 MB VMEM blowup observed on the first compile of this kernel);
the sign matrices are two small resident inputs instead.  All state
updates write through refs stage-by-stage to keep value live-ranges short.

Per training step the whole circuit body costs ~16 MB of HBM traffic
forward and ~24 MB backward, versus ~10 round trips before.  Reference for
the role: XLA-AD through the einsum chain (reference cons.py:937-950).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from . import kernels_rowlayer as krl
from .kernels_rowlayer import (
    _butterfly,
    _rx_gates,
    _row_layer_reference,
    _zz_phase_dense,
    _on_tpu,
)

Tensor = Any

__all__ = ["zzrx_multilayer", "MAX_ML_ROW_QUBITS", "MAX_ML_PAIRS"]

#: row-qubit budget for the whole-block kernel.  Mosaic materializes a
#: fresh buffer per unrolled butterfly (measured: no reuse), so the spill
#: footprint is ~nrow x 3 x (2^nrow x lanes x 4B); at 12 row qubits that is
#: ~72 MB, inside the 128 MB VMEM (13 was 137 MB and OOM'd the compile)
MAX_ML_ROW_QUBITS = 12

#: zz pairs are padded into one 128-wide sign-matrix column block
MAX_ML_PAIRS = 128

#: scoped-VMEM ceiling handed to Mosaic (v5e: 128 MB total)
VMEM_LIMIT_BYTES = 127 * 1024 * 1024


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


@lru_cache(maxsize=64)
def _sign_matrices(pairs, n, nrow, lanes, p_cols=None):
    """Host-side (Srow, Slane) f32 sign factors; columns padded to ``p_cols``.

    Cached: deterministic in hashable args, and the production stack path
    otherwise rebuilds the identical O(npairs * 2^nrow) matrices once per
    layer per direction on every trace.  Callers must not mutate the
    returned arrays (they ``jnp.asarray`` them).

    Global index = row * lanes + lane; qubit a lives at bit p = n-1-a from
    the LSB, lane bits are p < log2(lanes).  For pair k,
    ``z_a z_b = Srow[row, k] * Slane[lane, k]``.  Default padding is the
    grid-kernel budget MAX_ML_PAIRS; the per-layer path passes a wider
    lane-aligned width when a layer has more than 128 pairs.
    """
    lane_bits = int(math.log2(lanes))
    npairs = len(pairs)
    if p_cols is None:
        p_cols = MAX_ML_PAIRS
    assert npairs <= p_cols, (npairs, p_cols)
    srow = np.zeros((2**nrow, p_cols), np.float32)
    slane = np.zeros((lanes, p_cols), np.float32)
    rows = np.arange(2**nrow)
    cols = np.arange(lanes)
    for k, (a, b) in enumerate(pairs):
        sr = np.ones(2**nrow, np.float32)
        sl = np.ones(lanes, np.float32)
        for q in (a, b):
            p = n - 1 - q
            if p < lane_bits:
                sl *= 1.0 - 2.0 * ((cols >> p) & 1)
            else:
                sr *= 1.0 - 2.0 * ((rows >> (p - lane_bits)) & 1)
        srow[:, k] = sr
        slane[:, k] = sl
    return srow, slane


def _ml_fwd_kernel(nrow, L):
    """One LAYER per grid step; the state block has a constant index map, so
    it stays resident in VMEM across the (sequential) TPU grid — the Mosaic
    program is one layer's body, not L unrolled layers (the monolithic
    variant compiled for tens of minutes and spilled hundreds of MB)."""
    from jax.experimental import pallas as pl

    def kernel(
        cs_ref, zzth_ref, srow_ref, slane_ref, mr_ref, mi_ref,
        sr_ref, si_ref, or_ref, oi_ref,
    ):
        rb = or_ref.shape[0]
        f32 = jnp.float32
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            or_ref[:] = sr_ref[:]
            oi_ref[:] = si_ref[:]

        # zz phase: expo = (Srow * theta_l) @ Slane^T, one MXU dot
        expo = jnp.dot(
            srow_ref[:] * zzth_ref[0, 0][None, :],
            slane_ref[:].T,
            preferred_element_type=f32,
        )
        pc = jnp.cos(0.5 * expo)
        ps = -jnp.sin(0.5 * expo)  # phase = e^{-i expo / 2}
        cr = or_ref[:]
        ci = oi_ref[:]
        or_ref[:] = pc * cr - ps * ci
        oi_ref[:] = pc * ci + ps * cr
        # interleave sweep: iteration q butterflies the CURRENT TOP row bit
        # (two contiguous half-blocks - no rolls, no dynamic shapes), then
        # rotates that bit to the bottom via stack+reshape; after nrow
        # iterations the layout returns to canonical order.  Fixed shapes
        # let the whole sweep be ONE fori_loop body (unrolled butterflies
        # made Mosaic spill ~100 MB of vregs and compile for 25+ min;
        # dynamic-shift rolls ran ~3x slow)
        half = rb // 2

        def fwd_body(q, _):
            c = cs_ref[0, q, 0]
            sn = cs_ref[0, q, 1]
            xr = or_ref[:]
            xi = oi_ref[:]
            lo_r, hi_r = xr[:half], xr[half:]
            lo_i, hi_i = xi[:half], xi[half:]
            # interleaved views: iperm = (lo,hi) pairs, ipswap = (hi,lo);
            # rx = [[c, -i sn], [-i sn, c]] acts UNIFORMLY on both slots:
            # out = c*iperm + (-i sn)*ipswap
            iperm_r = jnp.reshape(jnp.stack([lo_r, hi_r], 1), (rb, -1))
            iperm_i = jnp.reshape(jnp.stack([lo_i, hi_i], 1), (rb, -1))
            ipswap_r = jnp.reshape(jnp.stack([hi_r, lo_r], 1), (rb, -1))
            ipswap_i = jnp.reshape(jnp.stack([hi_i, lo_i], 1), (rb, -1))
            or_ref[:] = c * iperm_r + sn * ipswap_i
            oi_ref[:] = c * iperm_i - sn * ipswap_r
            return _

        jax.lax.fori_loop(0, nrow, fwd_body, 0)
        mr = mr_ref[0]
        mi = mi_ref[0]
        cr = or_ref[:]
        ci = oi_ref[:]
        or_ref[:] = jnp.dot(cr, mr, preferred_element_type=f32) - jnp.dot(
            ci, mi, preferred_element_type=f32
        )
        oi_ref[:] = jnp.dot(cr, mi, preferred_element_type=f32) + jnp.dot(
            ci, mr, preferred_element_type=f32
        )

    return kernel


def _ml_bwd_kernel(nrow, L):
    """One LAYER per grid step, walked in reverse (index maps map grid step
    j to layer L-1-j); state/cotangent scratch persists across steps."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(
        cs_ref, zzth_ref, srow_ref, slane_ref, mr_ref, mi_ref,
        yr_ref, yi_ref, ctr_ref, cti_ref,
        dsr_ref, dsi_ref, dzz_ref, dth_ref, dmr_ref, dmi_ref,
        s_r, s_i,
    ):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            s_r[:] = yr_ref[:]
            s_i[:] = yi_ref[:]
            dsr_ref[:] = ctr_ref[:]
            dsi_ref[:] = cti_ref[:]

        rb = s_r.shape[0]
        f32 = jnp.float32
        dg_dim = (((1,), (1,)), ((), ()))  # a @ b^T
        dt_dim = (((0,), (0,)), ((), ()))  # a^T @ b
        # --- lane stage: y = psi @ M_l -------------------------------------
        mr = mr_ref[0]
        mi = mi_ref[0]
        yr = s_r[:]
        yi = s_i[:]
        ctr0 = dsr_ref[:]
        cti0 = dsi_ref[:]
        # un-lane: psi = y @ conj(M)^T (M unitary)
        s_r[:] = jax.lax.dot_general(
            yr, mr, dg_dim, preferred_element_type=f32
        ) + jax.lax.dot_general(yi, mi, dg_dim, preferred_element_type=f32)
        s_i[:] = jax.lax.dot_general(
            yi, mr, dg_dim, preferred_element_type=f32
        ) - jax.lax.dot_general(yr, mi, dg_dim, preferred_element_type=f32)
        # dM_l = psi^T @ ct (plain transpose, complex product)
        dmr_ref[0] = jax.lax.dot_general(
            s_r[:], ctr0, dt_dim, preferred_element_type=f32
        ) - jax.lax.dot_general(s_i[:], cti0, dt_dim, preferred_element_type=f32)
        dmi_ref[0] = jax.lax.dot_general(
            s_r[:], cti0, dt_dim, preferred_element_type=f32
        ) + jax.lax.dot_general(s_i[:], ctr0, dt_dim, preferred_element_type=f32)
        # ct walk through the lane map: ct_pre = ct @ M^T
        dsr_ref[:] = jax.lax.dot_general(
            ctr0, mr, dg_dim, preferred_element_type=f32
        ) - jax.lax.dot_general(cti0, mi, dg_dim, preferred_element_type=f32)
        dsi_ref[:] = jax.lax.dot_general(
            ctr0, mi, dg_dim, preferred_element_type=f32
        ) + jax.lax.dot_general(cti0, mr, dg_dim, preferred_element_type=f32)
        # --- rx stage: reverse interleave sweep (see fwd kernel) -----------
        # iteration i inverts fwd iteration q = nrow-1-i: the acted bit sits
        # at the BOTTOM of the row index, so lo/hi come interleaved
        half = rb // 2

        def bwd_body(i, _):
            q = nrow - 1 - i
            c = cs_ref[0, q, 0]
            sn = cs_ref[0, q, 1]
            # de-interleave into contiguous concat layouts (Mosaic cannot
            # reduce over strided-slice layouts, so everything downstream
            # works on full contiguous arrays)
            xr = jnp.reshape(s_r[:], (half, 2, -1))
            xi = jnp.reshape(s_i[:], (half, 2, -1))
            sperm_r = jnp.concatenate([xr[:, 0], xr[:, 1]], 0)
            sperm_i = jnp.concatenate([xi[:, 0], xi[:, 1]], 0)
            spswap_r = jnp.concatenate([xr[:, 1], xr[:, 0]], 0)
            spswap_i = jnp.concatenate([xi[:, 1], xi[:, 0]], 0)
            # un-apply rx^dagger = [[c, +i sn], [+i sn, c]]: uniform form
            nsr = c * sperm_r - sn * spswap_i
            nsi = c * sperm_i + sn * spswap_r
            s_r[:] = nsr
            s_i[:] = nsi
            ctr = jnp.reshape(dsr_ref[:], (half, 2, -1))
            cti = jnp.reshape(dsi_ref[:], (half, 2, -1))
            cperm_r = jnp.concatenate([ctr[:, 0], ctr[:, 1]], 0)
            cperm_i = jnp.concatenate([cti[:, 0], cti[:, 1]], 0)
            cpswap_r = jnp.concatenate([ctr[:, 1], ctr[:, 0]], 0)
            cpswap_i = jnp.concatenate([cti[:, 1], cti[:, 0]], 0)
            re_s1 = jnp.sum(cperm_r * nsr - cperm_i * nsi)
            im_s2 = jnp.sum(cpswap_r * nsi + cpswap_i * nsr)
            dth_ref[0, 0, q] = -0.5 * sn * re_s1 + 0.5 * c * im_s2
            # ct walk by rx^T = rx (uniform form on permuted arrays)
            dsr_ref[:] = c * cperm_r + sn * cpswap_i
            dsi_ref[:] = c * cperm_i - sn * cpswap_r
            return _

        jax.lax.fori_loop(0, nrow, bwd_body, 0)
        # --- zz phase stage: s currently holds z = P x ---------------------
        zr = s_r[:]
        zi = s_i[:]
        cr = dsr_ref[:]
        ci = dsi_ref[:]
        # dtheta_k = 1/2 sum_idx (ct_r z_i + ct_i z_r) z_a z_b, batched
        # over pairs via the sign matrices (one MXU dot + one reduce)
        h = cr * zi + ci * zr
        t = jnp.dot(h, slane_ref[:], preferred_element_type=f32)
        dzz_ref[0] = 0.5 * jnp.sum(srow_ref[:] * t, axis=0, keepdims=True)
        expo = jnp.dot(
            srow_ref[:] * zzth_ref[0, 0][None, :],
            slane_ref[:].T,
            preferred_element_type=f32,
        )
        pc = jnp.cos(0.5 * expo)
        ps = -jnp.sin(0.5 * expo)
        # transpose walk of a diagonal map: multiply by the phase itself
        dsr_ref[:] = pc * cr - ps * ci
        dsi_ref[:] = pc * ci + ps * cr
        # un-apply the phase from the state: x = conj(phase) * z
        s_r[:] = pc * zr + ps * zi
        s_i[:] = pc * zi - ps * zr

    return kernel


def _smem_spec(shape, index_map):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(shape, index_map, memory_space=pltpu.SMEM)


def _vmem_spec(shape, index_map):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _pallas_ml_fwd(zzth, cs, srow, slane, mr, mi, sr, si):
    from jax.experimental import pallas as pl

    L, nrow = cs.shape[0], cs.shape[1]
    lanes = sr.shape[1]
    const2 = lambda j: (0, 0)
    fwd_l = lambda j: (j, 0)
    fwd_l3 = lambda j: (j, 0, 0)
    return pl.pallas_call(
        _ml_fwd_kernel(nrow, L),
        grid=(L,),
        out_shape=(
            jax.ShapeDtypeStruct(sr.shape, sr.dtype),
            jax.ShapeDtypeStruct(si.shape, si.dtype),
        ),
        in_specs=[
            _smem_spec((1, nrow, 2), fwd_l3),
            _vmem_spec((1, 1, MAX_ML_PAIRS), fwd_l3),
            _vmem_spec(srow.shape, const2),
            _vmem_spec(slane.shape, const2),
            _vmem_spec((1, lanes, lanes), fwd_l3),
            _vmem_spec((1, lanes, lanes), fwd_l3),
            _vmem_spec(sr.shape, const2),
            _vmem_spec(si.shape, const2),
        ],
        out_specs=(_vmem_spec(sr.shape, const2), _vmem_spec(si.shape, const2)),
        input_output_aliases={6: 0, 7: 1},
        compiler_params=_compiler_params(),
        interpret=krl._INTERPRET,
    )(cs, zzth, srow, slane, mr, mi, sr, si)


def _pallas_ml_bwd(zzth, cs, srow, slane, mr, mi, yr, yi, ctr, cti):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, nrow = cs.shape[0], cs.shape[1]
    r, lanes = yr.shape
    const2 = lambda j: (0, 0)
    rev_l = lambda j: (L - 1 - j, 0)
    rev_l3 = lambda j: (L - 1 - j, 0, 0)
    return pl.pallas_call(
        _ml_bwd_kernel(nrow, L),
        grid=(L,),
        out_shape=(
            jax.ShapeDtypeStruct(yr.shape, yr.dtype),
            jax.ShapeDtypeStruct(yi.shape, yi.dtype),
            jax.ShapeDtypeStruct((L, 1, MAX_ML_PAIRS), jnp.float32),
            jax.ShapeDtypeStruct((L, 1, nrow), jnp.float32),
            jax.ShapeDtypeStruct(mr.shape, jnp.float32),
            jax.ShapeDtypeStruct(mi.shape, jnp.float32),
        ),
        in_specs=[
            _smem_spec((1, nrow, 2), rev_l3),
            _vmem_spec((1, 1, MAX_ML_PAIRS), rev_l3),
            _vmem_spec(srow.shape, const2),
            _vmem_spec(slane.shape, const2),
            _vmem_spec((1, lanes, lanes), rev_l3),
            _vmem_spec((1, lanes, lanes), rev_l3),
            _vmem_spec(yr.shape, const2),
            _vmem_spec(yi.shape, const2),
            _vmem_spec(ctr.shape, const2),
            _vmem_spec(cti.shape, const2),
        ],
        out_specs=(
            _vmem_spec(yr.shape, const2),
            _vmem_spec(yi.shape, const2),
            _vmem_spec((1, 1, MAX_ML_PAIRS), rev_l3),
            _smem_spec((1, 1, nrow), rev_l3),
            _vmem_spec((1, lanes, lanes), rev_l3),
            _vmem_spec((1, lanes, lanes), rev_l3),
        ),
        scratch_shapes=[
            pltpu.VMEM((r, lanes), jnp.float32),
            pltpu.VMEM((r, lanes), jnp.float32),
        ],
        input_output_aliases={8: 0, 9: 1},
        compiler_params=_compiler_params(),
        interpret=krl._INTERPRET,
    )(cs, zzth, srow, slane, mr, mi, yr, yi, ctr, cti)


# ---------------------------------------------------------------------------
# reference (CPU) path
# ---------------------------------------------------------------------------


def _ml_reference(pairs, n, state2d, zz_thetas, rx_row_thetas, mlane):
    L = zz_thetas.shape[0]
    psi = state2d
    for l in range(L):
        psi = _zz_phase_dense(psi, pairs, n, zz_thetas[l])
        psi = _row_layer_reference(psi, _rx_gates(rx_row_thetas[l]))
        psi = psi @ mlane[l].astype(psi.dtype)
    return psi


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def zzrx_multilayer(
    pairs: Any, n: int, state2d: Tensor, zz_thetas: Tensor,
    rx_row_thetas: Tensor, mlane: Tensor
) -> Tensor:
    """L layers of [zz phase over all n qubits; rx on the row qubits;
    ``@ mlane[l]`` on the lane axis] in ONE Pallas kernel pass each way.

    ``state2d`` is the (2^nrow, lanes) complex view with nrow = all row
    qubits (<= MAX_ML_ROW_QUBITS); ``zz_thetas`` (L, npairs<=128),
    ``rx_row_thetas`` (L, nrow), ``mlane`` (L, lanes, lanes) unitary
    right-multiplication matrices.  The VJP emits theta-native d(zz)/d(rx)
    and dense d(mlane).
    """
    return _ml_fwd_impl(pairs, n, state2d, zz_thetas, rx_row_thetas, mlane)


def _ml_prep(pairs, n, state2d, zz_thetas, rx_row_thetas, mlane):
    sr = jnp.real(state2d).astype(jnp.float32)
    si = jnp.imag(state2d).astype(jnp.float32)
    zzth = jnp.asarray(zz_thetas).astype(jnp.float32)
    L, npairs = zzth.shape
    zzth = jnp.pad(zzth, ((0, 0), (0, MAX_ML_PAIRS - npairs)))[:, None, :]
    th = jnp.asarray(rx_row_thetas).astype(jnp.float32)
    cs = jnp.stack([jnp.cos(th / 2), jnp.sin(th / 2)], axis=-1)
    nrow = th.shape[1]
    lanes = state2d.shape[1]
    srow, slane = _sign_matrices(pairs, n, nrow, lanes)
    mr = jnp.real(mlane).astype(jnp.float32)
    mi = jnp.imag(mlane).astype(jnp.float32)
    return sr, si, zzth, cs, jnp.asarray(srow), jnp.asarray(slane), mr, mi


def _ml_fwd_impl(pairs, n, state2d, zz_thetas, rx_row_thetas, mlane):
    if not (_on_tpu() or krl._INTERPRET):
        return _ml_reference(pairs, n, state2d, zz_thetas, rx_row_thetas, mlane)
    sr, si, zzth, cs, srow, slane, mr, mi = _ml_prep(
        pairs, n, state2d, zz_thetas, rx_row_thetas, mlane
    )
    orr, oii = _pallas_ml_fwd(zzth, cs, srow, slane, mr, mi, sr, si)
    return (orr + 1j * oii).astype(state2d.dtype)


def _ml_fwd(pairs, n, state2d, zz_thetas, rx_row_thetas, mlane):
    y = _ml_fwd_impl(pairs, n, state2d, zz_thetas, rx_row_thetas, mlane)
    return y, (y, zz_thetas, rx_row_thetas, mlane)


def _ml_bwd(pairs, n, res, ct):
    y, zz_thetas, rx_row_thetas, mlane = res
    L = jnp.asarray(zz_thetas).shape[0]
    npairs = jnp.asarray(zz_thetas).shape[1]
    if not (_on_tpu() or krl._INTERPRET):
        # chain the single-layer reference backward L times
        cur_y, cur_ct = y, ct
        dzz, dth, dm = [], [], []
        for l in range(L - 1, -1, -1):
            m = mlane[l]
            psi = cur_y @ jnp.conj(m).T.astype(cur_y.dtype)
            dm.insert(0, jnp.matmul(psi.T, cur_ct))
            ct_pre = cur_ct @ m.T.astype(cur_ct.dtype)
            ds, dz, dt = krl._zzrx_bwd(
                pairs, n, (psi, zz_thetas[l], rx_row_thetas[l]), ct_pre
            )
            # un-apply the zzrx block from psi to get the layer input
            gates = _rx_gates(jnp.asarray(rx_row_thetas[l]))
            z = psi
            nrow = gates.shape[0]
            r, lanes = psi.shape
            for q in range(nrow - 1, -1, -1):
                st = (2**nrow) >> (q + 1)
                v = jnp.reshape(z, (r // (2 * st), 2, st, lanes))
                z = jnp.reshape(
                    jnp.einsum(
                        "ab,xbsl->xasl", jnp.conj(gates[q].T).astype(v.dtype), v
                    ),
                    (r, lanes),
                )
            cur_y = _zz_phase_dense(z, pairs, n, -jnp.asarray(zz_thetas[l]))
            cur_ct = ds
            dzz.insert(0, dz)
            dth.insert(0, dt)
        return cur_ct, jnp.stack(dzz), jnp.stack(dth), jnp.stack(dm)
    _, _, zzth, cs, srow, slane, mr, mi = _ml_prep(
        pairs, n, y, zz_thetas, rx_row_thetas, mlane
    )
    yr = jnp.real(y).astype(jnp.float32)
    yi = jnp.imag(y).astype(jnp.float32)
    ctr = jnp.real(ct).astype(jnp.float32)
    cti = jnp.imag(ct).astype(jnp.float32)
    dsr, dsi, dzz, dth, dmr, dmi = _pallas_ml_bwd(
        zzth, cs, srow, slane, mr, mi, yr, yi, ctr, cti
    )
    ds = (dsr + 1j * dsi).astype(y.dtype)
    dm = (dmr + 1j * dmi).astype(jnp.asarray(mlane).dtype)
    return (
        ds,
        dzz[:, 0, :npairs].astype(jnp.asarray(zz_thetas).dtype),
        dth[:, 0, :].astype(jnp.asarray(rx_row_thetas).dtype),
        dm,
    )


zzrx_multilayer.defvjp(_ml_fwd, _ml_bwd)


# ---------------------------------------------------------------------------
# Pallas-free XLA variant: the same L-layer zzrx stack as plain matmuls +
# fused elementwise, native XLA AD.  The state is viewed (G, R, C) with the
# qubits split across three axes; each rx sweep is three kron matmuls (MXU),
# the zz phase is one sign-matrix matmul + cos/sin.  No Mosaic compile risk,
# residuals handled by XLA's own rematerialization choices.
# ---------------------------------------------------------------------------


def _axis_kron(mats):
    m = mats[0]
    for x in mats[1:]:
        m = jnp.kron(m, x)
    return m


def zzrx_multilayer_xla(pairs, n, state, zz_thetas, rx_thetas, split=(7, 7)):
    """L zzrx layers on the flat state via pure-XLA matmuls.

    ``split = (g_bits, c_bits)``: top g_bits on axis 0, bottom c_bits on
    axis 2, the rest in the middle.  rx on each axis applies as the kron of
    its gates (one dot per axis per layer).
    """
    from ..ops.gates import rx_matrix

    zz_thetas = jnp.asarray(zz_thetas)
    rx_thetas = jnp.asarray(rx_thetas)
    L = zz_thetas.shape[0]
    gb, cb = split
    mb = n - gb - cb
    G, M, C = 2**gb, 2**mb, 2**cb
    # sign matrices on the (G*M, C) view: rows cover the top gb+mb qubits
    srow, slane = _sign_matrices(pairs, n, gb + mb, C)
    srow = jnp.asarray(srow)
    slane = jnp.asarray(slane)
    npairs = len(pairs)
    psi = jnp.reshape(state, (G * M, C))
    for l in range(L):
        th = jnp.pad(zz_thetas[l], (0, MAX_ML_PAIRS - npairs))
        expo = (srow * th[None, :]) @ slane.T
        psi = psi * jnp.exp(-0.5j * expo).astype(psi.dtype)
        gates = jax.vmap(lambda t: rx_matrix(t).astype(psi.dtype))(rx_thetas[l])
        v = jnp.reshape(psi, (G, M, C))
        if gb:
            v = jnp.einsum("ab,bmc->amc", _axis_kron([gates[q] for q in range(gb)]), v)
        if mb:
            v = jnp.einsum("ab,gbc->gac", _axis_kron([gates[gb + q] for q in range(mb)]), v)
        if cb:
            v = jnp.einsum("ab,gmb->gma", _axis_kron([gates[gb + mb + q] for q in range(cb)]), v)
        psi = jnp.reshape(v, (G * M, C))
    return jnp.reshape(psi, (-1,))
