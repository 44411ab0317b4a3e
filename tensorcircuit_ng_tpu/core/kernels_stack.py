"""L-layer zzrx stack custom VJP threading f32 planes across layers.

The per-layer path (``kernels.fused_zzrx_layer``) pays, per layer and per
direction, a complex<->(real, imag) conversion pair around the opaque Pallas
call plus XLA-AD residual traffic for the outer-kron and lane matmul stages
— measured ~0.9 ms of the 2.5 ms N=20 L=4 VQE step
(``examples/microbench_layer_anatomy.py``).  This module fuses the WHOLE
L-layer stack into one custom-VJP boundary:

- the state is split into f32 planes ONCE per step (each way), and every
  stage — the Pallas zzrx kernel, the outer-qubit kron matmul, the lane
  matmul — consumes and produces planes;
- the backward walks the adjoint chain by hand: lane stage (dM + transpose
  ct walk as real dot_generals), outer stage (dMo + walk), then the Pallas
  backward kernel which un-applies the layer and emits theta-native
  d(zz)/d(rx) for the kernel qubits;
- the tiny chains d(Mo) -> d(rx_outer) and d(M) -> d(rx_lane) stay with XLA
  AD outside the boundary (the matrices are differentiable inputs, as in
  :mod:`kernels_multilayer`).

Layer structure (n qubits, layout index = row * 128 + lane):
  x --pallas zzrx (zz phase over ALL qubits + rx on nkernel row bits)--> k
  k --outer: kron of rx on the top nouter row bits, left matmul--> o
  o --lane: kron of rx on the 7 lane bits, right matmul--> x'

Residuals are the per-layer ``k`` planes (the Pallas outputs); ``o`` is
recomputed in the backward from ``k`` (two small dots) which is cheaper than
an extra HBM round trip of saves.  Gates are unitary, so the backward
kernel reconstructs everything else by un-application.

Reference for the role: XLA-AD through the reference's einsum chain
(reference cons.py:937-950); this replaces it with a hand-scheduled adjoint
at the HBM-traffic roofline.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from . import kernels_rowlayer as krl

Tensor = Any

__all__ = ["zzrx_stack_core", "zzrx_stack_energy"]

_LANE_QUBITS = 7

#: fuse the lane matmul INTO the Pallas zzrx kernels (fwd epilogue dot +
#: bwd un-lane/dM/walk prologue) — saves one full state read+write per
#: layer per direction vs the XLA lane dot_generals.  Hardware A/B
#: (examples/ab_lane_fused.py, 2026-08-18, TPU v5e): 2.051 -> 1.542
#: ms/step on the N=20 L=4 fused-energy VQE step with EXACT value/grad
#: parity — fused is the production default.
#: PRECONDITION when on: ``mlane`` must be UNITARY (the fused backward
#: reconstructs the pre-lane state as y @ conj(M)^T; the unfused path has
#: no such requirement).  The trace-time decision is captured in the
#: custom-VJP residual STRUCTURE, so flipping the flag between a vjp trace
#: and its backward call is safe (the backward follows the forward's mode).
FUSE_LANE = True

#: ride the TOP row bits of each kernel block on the MXU as one
#: (2^ROWM_QUBITS)^2 rx-kron left-matmul instead of per-qubit VPU
#: roll-butterflies (each butterfly = 4 full-block VMEM shuffles; the kron
#: matmul is one ~134 MFLOP MXU dot per block).  Backward mirrors the lane
#: machinery: un-apply via M7†, dM7 grid accumulation, ct walk via M7^T,
#: and dM7 -> dθ chained through a tiny jax.vjp of the kron builder.
#: Requires FUSE_LANE topology (tpu/interpret only).  Hardware A/B
#: (examples/ab_rowm_fused.py, 2026-08-19, v5e): 1.592 -> 1.879 ms/step —
#: the (rb,128)->(R,rb/R*128) reshape is a genuine Mosaic relayout (tile
#: shuffle) each way, which costs more than the 28 saved roll-butterflies;
#: compile time DID drop 968s -> 17s.  Default stays False; the kernels and
#: interpret parity tests remain as the measured record.
FUSE_ROWM = False
ROWM_QUBITS = 7

#: grand-fused FORWARD: the whole L-layer stack (zz + rolls + lane + outer)
#: as ONE Pallas kernel with whole-state VMEM residency — kills the
#: inter-layer dispatches, the XLA outer-stage fwd ops, and the
#: inter-layer HBM re-reads (micro-bench: 0.333 ms for 4 layers vs ~0.6
#: production, examples/micro_grand_fusion.py).  Streams out the same
#: per-layer post-lane residuals the per-layer adjoint chain consumes, so
#: the backward is unchanged.  Requires FUSE_LANE topology, no ROWM, an
#: EVEN layer count (ping-pong parity), and >=2 grid blocks.  Hardware A/B
#: (examples/ab_grand_fused.py, 2026-08-19, v5e): 1.404 -> 1.450 ms/step
#: (0.969x) with BIT-EXACT value/grad parity — the isolated-fwd micro win
#: (0.333 vs ~0.6) does not survive in-step when paired with the PER-LAYER
#: backward: the grand kernel writes every block twice (residual +
#: ping-pong) and triples the predicated code, which offsets the saved
#: dispatches and inter-layer HBM reads.  BUT paired with the grand
#: BACKWARD (FUSE_GRAND_BWD) the combination WINS decisively — hardware A/B
#: 2026-08-20 (N=20 L=4 K=250, v5e): per-layer 1.419 / grand-bwd-only
#: 1.383-1.390 / grand fwd+bwd 1.235 ms/step (1.15x vs production), parity
#: |dE| 1.9e-6, |dgrad|max 2.8e-3 (f32 band).  The per-layer forward was
#: paying for the residual layout the per-layer adjoint demanded; once both
#: directions are one-kernel the double-write is the only overhead left and
#: the saved round trips dominate.  Default True since 2026-08-20 (falls
#: back per-layer when L is odd, ROWM is on, or nouter == 0).
FUSE_GRAND = True

#: grand-fused BACKWARD (VERDICT r4 #1 "+bwd" sub-step): the whole L-layer
#: adjoint as ONE Pallas kernel with the cotangent VMEM-resident across
#: layers — kills the per-layer backward dispatches, the XLA outer-stage
#: adjoint ops, and the inter-layer cotangent HBM round trips
#: (kernels_grand.grand_zzrx_bwd).  Theta-level: routes through
#: :func:`zzrx_stack_energy_theta` (gradients for outer/lane rx angles are
#: produced directly, so the boundary's inputs are angles, not matrices).
#: Forward stays per-layer unless FUSE_GRAND is also on.  Requires
#: FUSE_LANE topology, no ROWM, nouter >= 1, tpu/interpret.  Hardware A/B
#: (examples/ab_grand_bwd.py, 2026-08-20, v5e, N=20 L=4 K=250): 1.419 ->
#: 1.390 ms/step (1.021x) with |dE| 1.9e-6 / |dgrad|max 3.7e-3 parity, and
#: the step compile drops 161 s -> 28 s (the per-layer bwd chain was the
#: Mosaic compile-time hog).  Default True since 2026-08-20.
FUSE_GRAND_BWD = True

#: VMEM envelope of the grand kernels: the backward keeps ~10 f32 state
#: planes resident (2x(2,r,128) scratch + ks/ct/ds blocks + cotangent
#: outputs), so 10 * 2^nrow * 128 * 4 B must stay under the 128 MB v5e
#: VMEM: nrow <= 13 is measured (bench n=20, ~40 MB), nrow = 14 fits by
#: arithmetic (~80 MB), nrow >= 15 would OOM.  Both grand dispatch gates
#: fall back to the per-layer rb-block grid above this bound.
MAX_GRAND_ROW_QUBITS = 14


def _rowm_qubits(nkernel: int) -> int:
    """Top row bits on the MXU: keep >=3 butterfly bits (sub-sublane
    strides stay on the VPU) and cap the kron at 128x128 (one MXU tile)."""
    return max(0, min(ROWM_QUBITS, nkernel - 3))


def _rx_kron_planes(th):
    """(real, imag) f32 planes of kron(rx(θ_0), ..., rx(θ_{k-1})), θ_0 on
    the most-significant bit — the in-kernel row matmul operand."""
    th = jnp.asarray(th, jnp.float32)
    mr = jnp.ones((1, 1), jnp.float32)
    mi = jnp.zeros((1, 1), jnp.float32)
    for q in range(th.shape[0]):
        c = jnp.cos(th[q] / 2)
        s = jnp.sin(th[q] / 2)
        z = jnp.zeros((), jnp.float32)
        gr = jnp.stack([jnp.stack([c, z]), jnp.stack([z, c])])
        gi = jnp.stack([jnp.stack([z, -s]), jnp.stack([-s, z])])
        mr, mi = (
            jnp.kron(mr, gr) - jnp.kron(mi, gi),
            jnp.kron(mr, gi) + jnp.kron(mi, gr),
        )
    return mr, mi


def _dot(a, b, contract):
    return jax.lax.dot_general(
        a, b, (contract, ((), ())), preferred_element_type=jnp.float32
    )


def _outer_apply(mor, moi, xr, xi):
    """(D, M, C) planes <- complex left-matmul by mo on the leading axis."""
    cdim = (((1,), (0,)),)
    yr = _dot(mor, xr, cdim[0]) - _dot(moi, xi, cdim[0])
    yi = _dot(mor, xi, cdim[0]) + _dot(moi, xr, cdim[0])
    return yr, yi


def _outer_walk(mor, moi, cr, ci):
    """ct <- mo^T @ ct (transpose walk, non-conjugating convention)."""
    cdim = (((0,), (0,)),)
    nr = _dot(mor, cr, cdim[0]) - _dot(moi, ci, cdim[0])
    ni = _dot(mor, ci, cdim[0]) + _dot(moi, cr, cdim[0])
    return nr, ni


def _lane_apply(mr, mi, xr, xi):
    """planes <- x @ m on the last axis (m is the pre-transposed kron)."""
    cdim = (((2,), (0,)),)
    yr = _dot(xr, mr, cdim[0]) - _dot(xi, mi, cdim[0])
    yi = _dot(xr, mi, cdim[0]) + _dot(xi, mr, cdim[0])
    return yr, yi


def _lane_walk(mr, mi, cr, ci):
    """ct <- ct @ m^T on the last axis."""
    cdim = (((2,), (1,)),)
    nr = _dot(cr, mr, cdim[0]) - _dot(ci, mi, cdim[0])
    ni = _dot(cr, mi, cdim[0]) + _dot(ci, mr, cdim[0])
    return nr, ni


def _shapes(n: int):
    nlane = _LANE_QUBITS
    nrow = n - nlane
    nkernel = min(nrow, krl.MAX_KERNEL_QUBITS_ZZRX)
    nouter = nrow - nkernel
    return nrow, nkernel, nouter, nlane


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def zzrx_stack_core(
    pairs: Any,
    n: int,
    state2d: Tensor,
    zz_thetas: Tensor,
    rx_kernel_thetas: Tensor,
    mout: Tensor,
    mlane: Tensor,
) -> Tensor:
    """L stacked [zz phase; rx on kernel rows; outer kron; lane matmul].

    ``state2d``: (2^nrow, 128) complex; ``zz_thetas`` (L, npairs);
    ``rx_kernel_thetas`` (L, nkernel); ``mout`` (L, D, D) complex left-mul
    unitaries on the top nouter row bits (D = 2^nouter); ``mlane``
    (L, 128, 128) complex right-mul unitaries on the lane bits.  Planes are
    split/combined exactly once per direction.
    """
    return _stack_fwd_impl(
        pairs, n, state2d, zz_thetas, rx_kernel_thetas, mout, mlane
    )[0]


def _stack_fwd_impl(pairs, n, state2d, zz_thetas, rx_kernel_thetas, mout, mlane):
    nrow, nkernel, nouter, nlane = _shapes(n)
    r, lanes = state2d.shape
    d = 2**nouter
    m = r // d
    L = zz_thetas.shape[0]
    fused = FUSE_LANE and (krl._on_tpu() or krl._INTERPRET)
    rmx = _rowm_qubits(nkernel) if (fused and FUSE_ROWM) else 0
    sr = jnp.real(state2d).astype(jnp.float32)
    si = jnp.imag(state2d).astype(jnp.float32)
    mor = jnp.real(mout).astype(jnp.float32)
    moi = jnp.imag(mout).astype(jnp.float32)
    mlr = jnp.real(mlane).astype(jnp.float32)
    mli = jnp.imag(mlane).astype(jnp.float32)
    if (
        FUSE_GRAND
        and fused
        and not rmx
        and nouter >= 1
        and L % 2 == 0
        and nrow <= MAX_GRAND_ROW_QUBITS
        and (krl._on_tpu() or krl._INTERPRET)
    ):
        from . import kernels_grand as kg

        ksr, ksi, yr, yi = kg.grand_zzrx_fwd(
            pairs, n, jnp.asarray(zz_thetas, jnp.float32),
            jnp.asarray(rx_kernel_thetas, jnp.float32), sr, si,
            mor, moi, mlr, mli,
        )
        ks = tuple((ksr[l], ksi[l]) for l in range(L))
        y = (yr + 1j * yi).astype(state2d.dtype)
        return y, ks, fused, rmx
    ks = []
    for l in range(L):
        if fused:
            # lane matmul rides inside the kernel; saved residual is the
            # POST-lane state (outer and lane act on disjoint axes, so
            # reordering lane before outer is exact)
            if rmx:
                m7r, m7i = _rx_kron_planes(rx_kernel_thetas[l, :rmx])
            else:
                m7r = m7i = None
            sr, si = _kernel_fwd(
                pairs, n, zz_thetas[l], rx_kernel_thetas[l], sr, si,
                mlr[l], mli[l], m7r, m7i,
            )
        else:
            sr, si = _kernel_fwd(
                pairs, n, zz_thetas[l], rx_kernel_thetas[l], sr, si
            )
        ks.append((sr, si))
        xr = jnp.reshape(sr, (d, m, lanes))
        xi = jnp.reshape(si, (d, m, lanes))
        if nouter:
            xr, xi = _outer_apply(mor[l], moi[l], xr, xi)
        else:
            # degenerate outer stage: mout is a (1, 1) complex scalar —
            # apply it rather than silently ignoring it (callers pass ones,
            # but the function is exported)
            ar, ai = mor[l, 0, 0], moi[l, 0, 0]
            xr, xi = ar * xr - ai * xi, ar * xi + ai * xr
        if not fused:
            xr, xi = _lane_apply(mlr[l], mli[l], xr, xi)
        sr = jnp.reshape(xr, (r, lanes))
        si = jnp.reshape(xi, (r, lanes))
    y = (sr + 1j * si).astype(state2d.dtype)
    return y, tuple(ks), fused, rmx


def _kernel_fwd(pairs, n, zzth, rxth, sr, si, mlr=None, mli=None,
                m7r=None, m7i=None):
    if krl._on_tpu() or krl._INTERPRET:
        return krl._pallas_zzrx_fwd(
            pairs, n, jnp.asarray(zzth, jnp.float32), jnp.asarray(rxth, jnp.float32),
            sr, si, mlr, mli, m7r, m7i,
        )
    if mlr is not None:  # pragma: no cover - fused requires tpu/interpret
        raise AssertionError("fused lane path reached the CPU reference")
    # CPU reference: complex round trip (tests exercise the interpret path)
    psi = (sr + 1j * si).astype(jnp.complex64)
    psi = krl._zz_phase_dense(psi, pairs, n, jnp.asarray(zzth))
    psi = krl._row_layer_reference(psi, krl._rx_gates(jnp.asarray(rxth)))
    return jnp.real(psi).astype(jnp.float32), jnp.imag(psi).astype(jnp.float32)


def _kernel_bwd(pairs, n, zzth, rxth, yr, yi, ctr, cti, mlr=None, mli=None,
                m7r=None, m7i=None):
    if krl._on_tpu() or krl._INTERPRET:
        return krl._pallas_zzrx_bwd(
            pairs, n, jnp.asarray(zzth, jnp.float32), jnp.asarray(rxth, jnp.float32),
            yr, yi, ctr, cti, mlr, mli, m7r, m7i,
        )
    if mlr is not None:  # pragma: no cover - fused requires tpu/interpret
        raise AssertionError("fused lane path reached the CPU reference")
    y = (yr + 1j * yi).astype(jnp.complex64)
    ct = (ctr + 1j * cti).astype(jnp.complex64)
    ds, dzz, dth = krl._zzrx_bwd(pairs, n, (y, zzth, rxth), ct)
    return (
        jnp.real(ds).astype(jnp.float32),
        jnp.imag(ds).astype(jnp.float32),
        dzz.astype(jnp.float32),
        dth.astype(jnp.float32),
    )


def _mode_marker(fused, rmx):
    # the mode rides the residual STRUCTURE (None vs () vs ((),) is a static
    # pytree property, not a traced leaf): the backward always follows the
    # mode the forward was traced with, even if the flags flip in between
    if not fused:
        return None
    return ((),) if rmx else ()


def _decode_marker(marker):
    fused = marker is not None
    rowm = fused and len(marker) == 1
    return fused, rowm


def _stack_fwd(pairs, n, state2d, zz_thetas, rx_kernel_thetas, mout, mlane):
    y, ks, fused, rmx = _stack_fwd_impl(
        pairs, n, state2d, zz_thetas, rx_kernel_thetas, mout, mlane
    )
    marker = _mode_marker(fused, rmx)
    return y, (ks, zz_thetas, rx_kernel_thetas, mout, mlane, marker)


def _stack_bwd(pairs, n, res, ct):
    ks, zz_thetas, rx_kernel_thetas, mout, mlane, marker = res
    cr = jnp.real(ct).astype(jnp.float32)
    ci = jnp.imag(ct).astype(jnp.float32)
    fused, rowm = _decode_marker(marker)
    ds, dzz, dth, dmo, dml = _adjoint_chain(
        pairs, n, ks, zz_thetas, rx_kernel_thetas, mout, mlane, cr, ci,
        fused=fused, rowm=rowm,
    )
    return (
        ds.astype(ct.dtype),
        dzz.astype(jnp.asarray(zz_thetas).dtype),
        dth.astype(jnp.asarray(rx_kernel_thetas).dtype),
        dmo.astype(jnp.asarray(mout).dtype),
        dml.astype(jnp.asarray(mlane).dtype),
    )


def _adjoint_chain(
    pairs, n, ks, zz_thetas, rx_kernel_thetas, mout, mlane, cr, ci,
    fused=False, rowm=False,
):
    """Walk the L-layer adjoint from output-cotangent planes ``(cr, ci)``.

    ``fused``/``rowm`` are the forward's trace-time FUSE_LANE/FUSE_ROWM
    decisions, recovered from the custom-VJP residual structure by the
    callers.
    """
    nrow, nkernel, nouter, nlane = _shapes(n)
    rmx = _rowm_qubits(nkernel) if rowm else 0
    L = zz_thetas.shape[0]
    r, lanes = ks[0][0].shape
    d = 2**nouter
    mm = r // d
    mor = jnp.real(mout).astype(jnp.float32)
    moi = jnp.imag(mout).astype(jnp.float32)
    mlr = jnp.real(mlane).astype(jnp.float32)
    mli = jnp.imag(mlane).astype(jnp.float32)
    dzz, dth, dmo, dml = [], [], [], []
    tdim = (((1,), (1,)),)  # (D, M C) x (D, M C) -> matmul over flattened MC
    for l in range(L - 1, -1, -1):
        kr, ki = ks[l]
        # fused: ks holds the POST-lane state (outer's direct input);
        # unfused: ks holds the kernel output and outer/lane follow
        k3r = jnp.reshape(kr, (d, mm, lanes))
        k3i = jnp.reshape(ki, (d, mm, lanes))
        c3r = jnp.reshape(cr, (d, mm, lanes))
        c3i = jnp.reshape(ci, (d, mm, lanes))
        if not fused:
            # recompute o = outer(k) on the (D, M, C) view
            if nouter:
                o3r, o3i = _outer_apply(mor[l], moi[l], k3r, k3i)
            else:
                ar, ai = mor[l, 0, 0], moi[l, 0, 0]
                o3r = ar * k3r - ai * k3i
                o3i = ar * k3i + ai * k3r
            # --- lane stage: x' = o @ m -----------------------------------
            # dm = o^T ct (complex, non-conjugating): contract (D, M) jointly
            ldim = (((0, 1), (0, 1)),)
            dmr = _dot(o3r, c3r, ldim[0]) - _dot(o3i, c3i, ldim[0])
            dmi = _dot(o3r, c3i, ldim[0]) + _dot(o3i, c3r, ldim[0])
            dml.insert(0, dmr + 1j * dmi)
            c3r, c3i = _lane_walk(mlr[l], mli[l], c3r, c3i)
        # --- outer stage: o = mo @ k --------------------------------------
        if nouter:
            # dmo = ct @ k^T over the flattened (M*C) axis
            fc_r = jnp.reshape(c3r, (d, mm * lanes))
            fc_i = jnp.reshape(c3i, (d, mm * lanes))
            fk_r = jnp.reshape(k3r, (d, mm * lanes))
            fk_i = jnp.reshape(k3i, (d, mm * lanes))
            dmor = _dot(fc_r, fk_r, tdim[0]) - _dot(fc_i, fk_i, tdim[0])
            dmoi = _dot(fc_r, fk_i, tdim[0]) + _dot(fc_i, fk_r, tdim[0])
            dmo.insert(0, dmor + 1j * dmoi)
            c3r, c3i = _outer_walk(mor[l], moi[l], c3r, c3i)
        else:
            # o = a·k for the complex scalar a: g_a = Σ g_o·k (non-conj),
            # g_k = a·g_o
            ar, ai = mor[l, 0, 0], moi[l, 0, 0]
            gar = jnp.sum(c3r * k3r) - jnp.sum(c3i * k3i)
            gai = jnp.sum(c3r * k3i) + jnp.sum(c3i * k3r)
            dmo.insert(0, jnp.reshape(gar + 1j * gai, (1, 1)))
            c3r, c3i = ar * c3r - ai * c3i, ar * c3i + ai * c3r
        cr = jnp.reshape(c3r, (r, lanes))
        ci = jnp.reshape(c3i, (r, lanes))
        # --- pallas zzrx stage (un-applies the layer internally; fused
        # variant also un-lanes, accumulates dM over the grid, and walks
        # the cotangent through M^T; rowm additionally un-applies the row
        # kron, accumulates dM7, and walks through M7^T) ---------------------
        if fused and rmx:
            m7r, m7i = _rx_kron_planes(rx_kernel_thetas[l, :rmx])
            cr, ci, dz, dt_low, dmr_f, dmi_f, dm7r, dm7i = _kernel_bwd(
                pairs, n, zz_thetas[l], rx_kernel_thetas[l], kr, ki, cr, ci,
                mlr[l], mli[l], m7r, m7i,
            )
            dml.insert(0, dmr_f + 1j * dmi_f)
            # chain dM7 -> dθ through the kron builder.  The kernel's plane
            # accumulation pairs the module's non-conjugating convention
            # (ct planes are (dL/dyr, -dL/dyi)), so dm7r = dL/d(m7r) and
            # dm7i = -dL/d(m7i) — flip the imag-plane cotangent.
            _, kron_vjp = jax.vjp(_rx_kron_planes, rx_kernel_thetas[l, :rmx])
            (dth7,) = kron_vjp((dm7r, -dm7i))
            dt = jnp.concatenate([dth7.astype(dt_low.dtype), dt_low])
        elif fused:
            cr, ci, dz, dt, dmr_f, dmi_f = _kernel_bwd(
                pairs, n, zz_thetas[l], rx_kernel_thetas[l], kr, ki, cr, ci,
                mlr[l], mli[l],
            )
            dml.insert(0, dmr_f + 1j * dmi_f)
        else:
            cr, ci, dz, dt = _kernel_bwd(
                pairs, n, zz_thetas[l], rx_kernel_thetas[l], kr, ki, cr, ci
            )
        dzz.insert(0, dz)
        dth.insert(0, dt)
    ds = cr + 1j * ci
    return ds, jnp.stack(dzz), jnp.stack(dth), jnp.stack(dmo), jnp.stack(dml)


zzrx_stack_core.defvjp(_stack_fwd, _stack_bwd)


# ======================================================================
# stack + fused TFIM-style energy readout in ONE custom-VJP boundary
# ======================================================================
#
# E = zz_weight * sum_{(a,b) in readout_pairs} <Z_a Z_b>
#   + x_weight  * sum_q <X_q>
#
# evaluated directly on the stack's f32 output planes: the zz part is an
# elementwise mask dot on |psi|^2, the X part three real block sandwiches
# (lane matmul + two row-block einsums) — ~half the HBM traffic of the
# complex XLA-AD readout, and the backward SEED planes are saved in the
# forward so the readout's whole backward collapses to one scale.
# Reference role: expectation chains through the einsum network
# (reference cons.py:937-950, templates/measurements.py) — here the readout
# joins the hand-scheduled adjoint instead.


def _np_kron_all(ms):
    out = ms[0]
    for m in ms[1:]:
        out = np.kron(out, m)
    return out


@lru_cache(maxsize=16)
def _readout_consts(spec, n, nrow_s):
    """(mask (r,lanes) f32, sxl (lanes,lanes) f32, row blocks [(pos,b,m)]).

    ``spec = (diag_terms, x_terms)``: ``diag_terms`` is a tuple of
    ``(qubits_tuple, weight)`` Z-strings (any order — single-Z fields, ZZ
    couplings, k-local strings), ``x_terms`` a tuple of ``(qubit, weight)``
    transverse fields.  Qubit q's bit of the flat index x is
    ``(x >> (n-1-q)) & 1``; rows hold qubits [0, nrow_s), lanes the rest
    (matching the stack's 2-D layout).
    """
    diag_terms, x_terms = spec
    nlane = n - nrow_s
    r, lanes = 2**nrow_s, 2**nlane
    idx = np.arange(2**n, dtype=np.int64)
    w = np.zeros(2**n, dtype=np.float64)
    for qubits, wt in diag_terms:
        zprod = np.ones(2**n, dtype=np.float64)
        for q in qubits:
            zprod *= 1 - 2 * ((idx >> (n - 1 - int(q))) & 1)
        w += float(wt) * zprod
    # keep f64: the stack path casts down to f32 at use, the dense readout
    # (ising_energy_dense) casts to the state's own precision
    mask = w.reshape(r, lanes)
    x2 = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=np.float64)
    e2 = np.eye(2, dtype=np.float64)
    xw = {int(q): float(wt) for q, wt in x_terms}
    sxl = np.zeros((lanes, lanes), dtype=np.float64)
    for j in range(nlane):
        wt = xw.get(nrow_s + j, 0.0)
        if wt:
            sxl += wt * _np_kron_all([x2 if jj == j else e2 for jj in range(nlane)])
    blocks = []
    pos = 0
    while pos < nrow_s:
        b = min(_LANE_QUBITS, nrow_s - pos)
        m = np.zeros((2**b, 2**b), dtype=np.float64)
        hit = False
        for j in range(b):
            wt = xw.get(pos + j, 0.0)
            if wt:
                hit = True
                m += wt * _np_kron_all([x2 if jj == j else e2 for jj in range(b)])
        if hit:
            blocks.append((pos, b, m))
        pos += b
    return mask, sxl, tuple(blocks)


def _x_sum_apply(plane, sxl, use_lanes, blocks, r, lanes):
    """(S_X plane) where S_X = Σ_q w_q X_q, real weighted blocks."""
    out = plane @ sxl if use_lanes else jnp.zeros_like(plane)
    for pos, b, m in blocks:
        left = 2**pos
        mid = 2**b
        v = jnp.reshape(plane, (left, mid, -1))
        out = out + jnp.reshape(jnp.einsum("ab,xby->xay", jnp.asarray(m), v), (r, lanes))
    return out


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 7))
def zzrx_stack_energy(
    pairs: Any,
    n: int,
    state2d: Tensor,
    zz_thetas: Tensor,
    rx_kernel_thetas: Tensor,
    mout: Tensor,
    mlane: Tensor,
    spec: Any = ((), ()),
) -> Tensor:
    """Real f32 ⟨H⟩ after L stacked zzrx layers (see module notes).

    ``spec = (diag_terms, x_terms)``, hashable with static float weights:
    ``diag_terms`` Z-strings ``((qubits...), w)`` of any locality, ``x_terms``
    transverse fields ``(q, w)`` — the general Ising/spin-glass readout
    family H = Σ w_s Π_{q∈s} Z_q + Σ w_q X_q.
    """
    return _stack_energy_fwd(
        pairs, n, state2d, zz_thetas, rx_kernel_thetas, mout, mlane, spec
    )[0]


def _stack_energy_fwd(
    pairs, n, state2d, zz_thetas, rx_kernel_thetas, mout, mlane, spec
):
    y, ks, fused, rmx = _stack_fwd_impl(
        pairs, n, state2d, zz_thetas, rx_kernel_thetas, mout, mlane
    )
    # _stack_fwd_impl combines planes into y only at the very end; re-split
    # is free for XLA (real/imag of a just-combined complex value fuses away)
    sr = jnp.real(y).astype(jnp.float32)
    si = jnp.imag(y).astype(jnp.float32)
    r, lanes = sr.shape
    nrow_s = int(round(math.log2(r)))
    diag_terms, x_terms = spec
    mask, sxl, blocks = _readout_consts(spec, n, nrow_s)
    br = jnp.zeros_like(sr)
    bi = jnp.zeros_like(si)
    if diag_terms:
        mask32 = jnp.asarray(mask.astype(np.float32))
        br = br + mask32 * sr
        bi = bi + mask32 * si
    if x_terms:
        use_lanes = bool(np.any(sxl))
        sxl32 = jnp.asarray(sxl.astype(np.float32))
        blocks32 = tuple((p0, b0, m0.astype(np.float32)) for p0, b0, m0 in blocks)
        br = br + _x_sum_apply(sr, sxl32, use_lanes, blocks32, r, lanes)
        bi = bi + _x_sum_apply(si, sxl32, use_lanes, blocks32, r, lanes)
    e = jnp.sum(sr * br) + jnp.sum(si * bi)
    marker = _mode_marker(fused, rmx)  # mode rides the residual structure
    return e, (ks, br, bi, zz_thetas, rx_kernel_thetas, mout, mlane, marker)


def _stack_energy_bwd(pairs, n, spec, res, ct):
    ks, br, bi, zz_thetas, rx_kernel_thetas, mout, mlane, marker = res
    # dE/d(plane) = 2 B (S_X symmetric, zz mask diagonal).  The chain pairs
    # non-conjugating (dL = Re<g, dx>, CLAUDE.md convention): g_r = dE/dsr,
    # g_i = -dE/dsi.
    s = 2.0 * ct.astype(jnp.float32)
    fused, rowm = _decode_marker(marker)
    ds, dzz, dth, dmo, dml = _adjoint_chain(
        pairs, n, ks, zz_thetas, rx_kernel_thetas, mout, mlane, s * br, -s * bi,
        fused=fused, rowm=rowm,
    )
    return (
        ds.astype(jnp.complex64),
        dzz.astype(jnp.asarray(zz_thetas).dtype),
        dth.astype(jnp.asarray(rx_kernel_thetas).dtype),
        dmo.astype(jnp.asarray(mout).dtype),
        dml.astype(jnp.asarray(mlane).dtype),
    )


zzrx_stack_energy.defvjp(_stack_energy_fwd, _stack_energy_bwd)


# ======================================================================
# theta-level stack + energy boundary for the grand-fused backward
# ======================================================================
#
# The matrix-interface boundary above returns dmo/dml matrix cotangents
# and lets XLA AD chain them through the kron builders.  The grand
# backward kernel cannot produce dmo (Mosaic rejects the two-contracting-
# dim dot) but computes dθ_outer DIRECTLY from the rx-kron derivative
# structure, so its natural boundary takes the (L, n) rx angles
# themselves.  dθ_lane is chained from the kernel's dM planes through a
# tiny jax.vjp of the lane kron builder (128x128, trivial XLA work).


def _lane_kron_planes_T(th):
    """Planes of kron(rx(θ_0), ..).T — the lane right-mul convention."""
    mr, mi = _rx_kron_planes(th)
    return mr.T, mi.T


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 5))
def zzrx_stack_energy_theta(
    pairs: Any,
    n: int,
    state2d: Tensor,
    zz_thetas: Tensor,
    rx_thetas: Tensor,
    spec: Any = ((), ()),
) -> Tensor:
    """Real f32 ⟨H⟩ after L stacked zzrx layers, theta-level boundary.

    ``rx_thetas`` is the FULL (L, n) angle grid (outer + kernel + lane
    qubits); the backward runs the grand-fused one-kernel adjoint
    (:func:`kernels_grand.grand_zzrx_bwd`).  Caller must guarantee the
    fused-lane topology (tpu/interpret, complex64, nouter >= 1, G >= 2).
    """
    return _theta_fwd(pairs, n, state2d, zz_thetas, rx_thetas, spec)[0]


def _theta_kron_mats(n, rx_thetas):
    nrow, nkernel, nouter, nlane = _shapes(n)
    mor, moi = jax.vmap(_rx_kron_planes)(rx_thetas[:, :nouter])
    mlr, mli = jax.vmap(_lane_kron_planes_T)(rx_thetas[:, nrow:])
    return mor, moi, mlr, mli


def _theta_fwd(pairs, n, state2d, zz_thetas, rx_thetas, spec):
    nrow, nkernel, nouter, nlane = _shapes(n)
    mor, moi, mlr, mli = _theta_kron_mats(n, rx_thetas)
    e, (ks, br, bi, _, _, _, _, marker) = _stack_energy_fwd(
        pairs, n, state2d, zz_thetas, rx_thetas[:, nouter:nrow],
        (mor + 1j * moi).astype(jnp.complex64),
        (mlr + 1j * mli).astype(jnp.complex64), spec,
    )
    fused, rowm = _decode_marker(marker)
    assert fused and not rowm, "grand bwd requires the fused-lane topology"
    return e, (ks, br, bi, zz_thetas, rx_thetas)


def _theta_bwd(pairs, n, spec, res, ct):
    from . import kernels_grand as kg

    ks, br, bi, zz_thetas, rx_thetas = res
    nrow, nkernel, nouter, nlane = _shapes(n)
    s = 2.0 * ct.astype(jnp.float32)
    mor, moi, mlr, mli = _theta_kron_mats(n, rx_thetas)
    ksr = jnp.stack([k[0] for k in ks])
    ksi = jnp.stack([k[1] for k in ks])
    th_kernel = jnp.asarray(rx_thetas[:, nouter:nrow], jnp.float32)
    dsr, dsi, dzz, dthk, dtho, dmlr, dmli = kg.grand_zzrx_bwd(
        pairs, n, jnp.asarray(zz_thetas, jnp.float32), th_kernel,
        ksr, ksi, s * br, -s * bi, mor, moi, mlr, mli,
    )

    # lane chain: kernel dM planes are (dL/dmr, -dL/dmi) — flip the imag
    # cotangent into the kron builder's vjp (same rule as the rowm chain)
    def lane_chain(th_l, gr, gi):
        _, vjp_fn = jax.vjp(_lane_kron_planes_T, th_l)
        (d,) = vjp_fn((gr, -gi))
        return d

    dthl = jax.vmap(lane_chain)(rx_thetas[:, nrow:], dmlr, dmli)
    rx_dt = jnp.asarray(rx_thetas).dtype
    dth_full = jnp.concatenate(
        [dtho.astype(rx_dt), dthk.astype(rx_dt), dthl.astype(rx_dt)], axis=1
    )
    return (
        (dsr + 1j * dsi).astype(jnp.complex64),
        dzz.astype(jnp.asarray(zz_thetas).dtype),
        dth_full,
    )


zzrx_stack_energy_theta.defvjp(_theta_fwd, _theta_bwd)

__all__ += ["zzrx_stack_energy_theta"]
