"""Pallas TPU kernels for statevector hot paths.

``fused_single_qubit_layer``: apply one single-qubit gate per qubit with
- row qubits: the Pallas row-layer kernel pair (fused forward sweep AND fused
  adjoint backward sweep, both one HBM round trip —
  :mod:`tensorcircuit_ng_tpu.core.kernels_rowlayer`), and
- lane qubits (last 7): ONE 128x128 MXU matmul of their kron product, with
  native XLA AD.

``block_kron_layer`` is a pallas-free alternative (all qubits via ~n/7
block-kron matmuls; measured slower end-to-end on v5e but supports
non-unitary gate stacks).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import kernels_rowlayer

Tensor = Any

__all__ = [
    "fused_single_qubit_layer",
    "fused_single_qubit_layer_pallas",
    "block_kron_layer",
    "pallas_available",
    "set_interpret_mode",
]

_LANE_QUBITS = 7


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa
        from jax.experimental.pallas import tpu as pltpu  # noqa

        return True
    except ImportError:  # pragma: no cover
        return False


def set_interpret_mode(value: bool) -> None:
    """Test hook: run the kernels in interpreter mode (works on CPU)."""
    kernels_rowlayer._INTERPRET = bool(value)


def _lane_matrix(gates: Tensor, nlane: int) -> Tensor:
    """kron of the last ``nlane`` gates — ONE matmul applies them all."""
    m = gates[-nlane]
    for j in range(1, nlane):
        m = jnp.kron(m, gates[-nlane + j])
    return m


def _apply_layer_reference(state: Tensor, gates: Tensor) -> Tensor:
    """Unfused fallback: one einsum per qubit."""
    from . import statevec

    n = gates.shape[0]
    for q in range(n):
        state = statevec.apply_unitary(state, gates[q], [q])
    return state


def fused_single_qubit_layer_pallas(
    state: Tensor, gates: Tensor, fuse_lane: bool = False, constant: bool = False
) -> Tensor:
    """Row-kernel + lane-matmul fused layer (UNITARY gates).

    Qubits split three ways: the first few large-stride qubits (beyond the
    kernel's VMEM row-block budget) apply as plain einsums; the middle
    ``<= MAX_KERNEL_QUBITS`` row qubits fuse into the Pallas kernel pair; the
    last 7 "lane" qubits collapse into one 128x128 MXU matmul.
    """
    from . import statevec

    n = gates.shape[0]
    nq = int(round(math.log2(state.shape[0])))
    assert nq == n, "one gate per qubit required"
    nlane = min(_LANE_QUBITS, n)
    nrow = n - nlane
    # NOTE: row_layer_lane (lane matmul fused into the kernel) measured
    # SLOWER end-to-end (7.44 vs 6.29 ms/step on the N=20 bench): the
    # fused backward's extra VMEM pressure forces a half-size row block,
    # which costs more than the saved HBM pass. Kept available via
    # fuse_lane=True for larger-lane configs.
    nkernel = min(nrow, kernels_rowlayer.MAX_KERNEL_QUBITS)
    nouter = nrow - nkernel
    psi = state
    for q in range(nouter):  # large-stride qubits: plain einsum (native AD)
        psi = statevec.apply_unitary(psi, gates[q], [q])
    psi = jnp.reshape(psi, (max(2**nrow, 1), 2**nlane))
    mlane = _lane_matrix(gates, nlane).astype(psi.dtype)
    if nkernel > 0 and fuse_lane:
        psi = kernels_rowlayer.row_layer_lane(psi, gates[nouter:nrow], mlane.T)
    elif nkernel > 0 and constant:
        psi = kernels_rowlayer.row_layer_const(psi, gates[nouter:nrow])
        psi = psi @ mlane.T
    elif nkernel > 0:
        psi = kernels_rowlayer.row_layer(psi, gates[nouter:nrow])
        psi = psi @ mlane.T
    else:
        psi = psi @ mlane.T
    return jnp.reshape(psi, (-1,))


#: route rx_layer through the theta-native kernel. Isolated, that kernel is
#: ~17% faster fwd+bwd (3.27 vs 3.91 ms/iter for 4 layers on v5e), but in
#: the full TFIM VQE step it interacts badly with the surrounding
#: rzz/readout AD graph (9.40 vs 6.32 ms/step measured A/B) — XLA inserts
#: extra copies around the smaller-block custom call. OFF by default until
#: the zz pass is fused into the same kernel (round-2 candidate).
USE_ROTX = False


def fused_rx_layer(state: Tensor, thetas: Tensor) -> Tensor:
    """rx(thetas[q]) on every qubit: theta-native Pallas backward.

    Row qubits use :func:`kernels_rowlayer.rotx_row_layer`, whose VJP
    produces d(theta) directly (2 block reductions per qubit instead of 8
    for the generic full-gate cotangent — the dominant backward cost of
    rotation layers); lane/outer qubits keep the generic autodiff paths.
    """
    from . import statevec
    from ..ops.gates import rx_matrix

    thetas = jnp.reshape(jnp.asarray(thetas), (-1,))
    if not USE_ROTX:
        from ..ops.gates import rx_matrix as _rxm

        return fused_single_qubit_layer(state, jax.vmap(_rxm)(thetas))
    n = thetas.shape[0]
    nq = int(round(math.log2(state.shape[0])))
    assert nq == n, "one angle per qubit required"
    nlane = min(_LANE_QUBITS, n)
    nrow = n - nlane
    nkernel = min(nrow, kernels_rowlayer.MAX_KERNEL_QUBITS_ROTX)
    nouter = nrow - nkernel
    psi = state
    for q in range(nouter):
        psi = statevec.apply_unitary(psi, rx_matrix(thetas[q]), [q])
    psi = jnp.reshape(psi, (max(2**nrow, 1), 2**nlane))
    if nkernel > 0:
        psi = kernels_rowlayer.rotx_row_layer(psi, thetas[nouter:nrow])
    lane_gates = jax.vmap(lambda t: rx_matrix(t).astype(psi.dtype))(thetas[nrow:])
    m = lane_gates[0]
    for j in range(1, nlane):
        m = jnp.kron(m, lane_gates[j])
    psi = psi @ m.T
    return jnp.reshape(psi, (-1,))


def fused_single_qubit_layer(state: Tensor, gates: Tensor, constant: bool = False) -> Tensor:
    """Apply gates[q] on qubit q for all q, fused.

    Default is the Pallas path (measured 15.3 vs 25.4 ms/step against the
    block-kron alternative on the v5e N=20 TFIM VQE bench); gates must be
    UNITARY (the row-kernel backward reconstructs intermediates by
    un-application).  Use :func:`block_kron_layer` for non-unitary stacks.
    """
    return fused_single_qubit_layer_pallas(state, gates, constant=constant)


def block_kron_layer(state: Tensor, gates: Tensor, block: int = _LANE_QUBITS) -> Tensor:
    """Apply gates[q] on every qubit via ~n/7 block-kron MXU matmuls.

    Pallas-free, plain XLA AD, no unitarity requirement.
    """
    n = gates.shape[0]
    sizes = []
    rest = n
    while rest > 0:
        b = min(block, rest)
        sizes.append(b)
        rest -= b
    pos = 0
    psi = state
    for b in sizes:
        m = gates[pos]
        for j in range(1, b):
            m = jnp.kron(m, gates[pos + j])
        left = 2**pos
        mid = 2**b
        right = psi.shape[0] // (left * mid)
        v = jnp.reshape(psi, (left, mid, right))
        v = jnp.einsum("ab,xby->xay", m.astype(psi.dtype), v)
        psi = jnp.reshape(v, (-1,))
        pos += b
    return psi


# kept for tests / internal reuse
_fused_fwd_impl = fused_single_qubit_layer_pallas


def fused_zzrx_layer(state: Tensor, pairs: Any, zz_thetas: Tensor, rx_thetas: Tensor) -> Tensor:
    """exp(-i/2 Σ θ_k Z_a Z_b) then rx(φ_q) on every qubit — fused TFIM layer.

    The zz phase (over ALL qubits, computed from global-index bit arithmetic
    in-kernel) and the row-qubit rx butterflies share ONE Pallas kernel pass
    with theta-native dθ for both parameter sets; outer row qubits and the 7
    lane qubits keep einsum/matmul paths (they commute with the kernel rx
    and run after the in-kernel zz stage).
    """
    from . import statevec
    from ..ops.gates import rx_matrix

    rx_thetas = jnp.reshape(jnp.asarray(rx_thetas), (-1,))
    zz_thetas = jnp.reshape(jnp.asarray(zz_thetas), (-1,))
    n = rx_thetas.shape[0]
    nq = int(round(math.log2(state.shape[0])))
    assert nq == n, "one rx angle per qubit required"
    pairs = tuple((int(a), int(b)) for a, b in pairs)
    if state.dtype != jnp.complex64:
        # the kernel VJPs compute in f32 planes; complex128 users keep full
        # precision through the plain dense formulation (XLA AD)
        psi = statevec.apply_zz_product_phase(state, pairs, zz_thetas)
        for q in range(n):
            psi = statevec.apply_unitary(
                psi, rx_matrix(rx_thetas[q]).astype(psi.dtype), [q]
            )
        return psi
    nlane = min(_LANE_QUBITS, n)
    nrow = n - nlane
    nkernel = min(nrow, kernels_rowlayer.MAX_KERNEL_QUBITS_ZZRX)
    nouter = nrow - nkernel
    psi = jnp.reshape(state, (max(2**nrow, 1), 2**nlane))
    if nkernel > 0:
        psi = kernels_rowlayer.zzrx_row_layer(
            pairs, n, psi, zz_thetas, rx_thetas[nouter:nrow]
        )
    else:
        psi = kernels_rowlayer._zz_phase_dense(psi, pairs, n, zz_thetas)
    if nouter:
        # ONE kron matmul applies all outer-qubit rx gates (one HLO + its
        # two AD ops, instead of 3 einsums + 6-9 AD ops per layer)
        og = jax.vmap(lambda t: rx_matrix(t).astype(psi.dtype))(rx_thetas[:nouter])
        mo = og[0]
        for j in range(1, nouter):
            mo = jnp.kron(mo, og[j])
        psi = jnp.reshape(mo @ jnp.reshape(psi, (2**nouter, -1)), (-1,))
    psi = jnp.reshape(psi, (max(2**nrow, 1), 2**nlane))
    lane_gates = jax.vmap(lambda t: rx_matrix(t).astype(psi.dtype))(rx_thetas[nrow:])
    m = lane_gates[0]
    for j in range(1, nlane):
        m = jnp.kron(m, lane_gates[j])
    psi = psi @ m.T
    return jnp.reshape(psi, (-1,))


#: multilayer implementation: "stack" (per-layer Pallas kernels chained
#: inside ONE custom-VJP boundary with f32 planes threaded across layers —
#: the production path), "pallas" (whole-block kernels; measured slower:
#: interleave butterflies), "xla" (pure-matmul variant, native AD), or
#: "perlayer" (round-1 path: one custom VJP and a complex<->planes
#: conversion pair per layer)
ML_MODE = "stack"


def fused_zzrx_multilayer(
    state: Tensor, pairs: Any, zz_thetas: Tensor, rx_thetas: Tensor
) -> Tensor:
    """L stacked zzrx layers in ONE Pallas kernel pass each way.

    ``zz_thetas`` (L, npairs), ``rx_thetas`` (L, n).  The whole-block kernel
    keeps the state (and, backward, the cotangent) resident in VMEM across
    all L layers — see :mod:`tensorcircuit_ng_tpu.core.kernels_multilayer`.
    Falls back to the per-layer path when the row count exceeds the kernel's
    VMEM budget.
    """
    from . import kernels_multilayer as kml

    zz_thetas = jnp.asarray(zz_thetas)
    rx_thetas = jnp.asarray(rx_thetas)
    L, n = rx_thetas.shape
    nq = int(round(math.log2(state.shape[0])))
    assert nq == n, "one rx angle per qubit per layer required"
    pairs = tuple((int(a), int(b)) for a, b in pairs)
    # lanes absorb whatever the kernel row budget cannot: n=20 -> 12 row
    # qubits + 8 lane qubits (a 256x256 lane matmul is still trivial MXU work)
    nrow = min(n - _LANE_QUBITS, kml.MAX_ML_ROW_QUBITS)
    nlane = n - nrow
    # stack-path viability: its outer-kron unitary is (2^nouter)^2 — cap
    # nouter at the lane width (mout <= 128x128) so the outer matmul stays
    # trivial MXU work; per-layer kernels handle any pair count (sign
    # columns pad to the next lane multiple)
    nouter_s = max(0, (n - _LANE_QUBITS) - kernels_rowlayer.MAX_KERNEL_QUBITS_ZZRX)
    # the stack VJP computes in f32 planes: complex128 states must keep the
    # per-layer path (which preserves the working dtype) or they'd silently
    # drop to single precision
    stack_ok = (
        n > _LANE_QUBITS
        and nouter_s <= _LANE_QUBITS
        and state.dtype == jnp.complex64
    )
    if ML_MODE == "perlayer" or (ML_MODE == "stack" and not stack_ok) or (
        ML_MODE == "xla" and (n < 10 or len(pairs) > kml.MAX_ML_PAIRS)
    ) or (
        ML_MODE not in ("stack", "xla")
        and (
            nrow < 1
            or nlane > 10
            or len(pairs) > kml.MAX_ML_PAIRS
            or state.dtype != jnp.complex64
        )
    ):
        psi = state
        for l in range(L):
            psi = fused_zzrx_layer(psi, pairs, zz_thetas[l], rx_thetas[l])
        return psi
    if ML_MODE == "stack":
        from . import kernels_stack as kst
        from ..ops.gates import rx_matrix

        nrow_s = n - _LANE_QUBITS
        nkernel = min(nrow_s, kernels_rowlayer.MAX_KERNEL_QUBITS_ZZRX)
        nouter = nrow_s - nkernel

        def kron_m(th_block, transpose):
            gs = jax.vmap(lambda t: rx_matrix(t).astype(state.dtype))(th_block)
            m = gs[0]
            for j in range(1, th_block.shape[0]):
                m = jnp.kron(m, gs[j])
            return m.T if transpose else m

        mlane = jax.vmap(lambda th: kron_m(th, True))(rx_thetas[:, nrow_s:])
        if nouter:
            mout = jax.vmap(lambda th: kron_m(th, False))(rx_thetas[:, :nouter])
        else:
            mout = jnp.ones((L, 1, 1), state.dtype)
        psi = jnp.reshape(state, (2**nrow_s, 2**_LANE_QUBITS))
        psi = kst.zzrx_stack_core(
            pairs, n, psi, zz_thetas, rx_thetas[:, nouter:nrow_s], mout, mlane
        )
        return jnp.reshape(psi, (-1,))
    if ML_MODE == "xla":
        gb = min(3, n - 14) if n > 14 else 0
        cb = min(7, n - gb - 1)
        return kml.zzrx_multilayer_xla(
            pairs, n, state, zz_thetas, rx_thetas, split=(gb, cb)
        )
    from ..ops.gates import rx_matrix

    def lane_m(th_lane):
        gs = jax.vmap(lambda t: rx_matrix(t).astype(state.dtype))(th_lane)
        m = gs[0]
        for j in range(1, nlane):
            m = jnp.kron(m, gs[j])
        return m.T  # right-multiplication convention

    mlane = jax.vmap(lane_m)(rx_thetas[:, nrow:])
    psi = jnp.reshape(state, (2**nrow, 2**nlane))
    psi = kml.zzrx_multilayer(pairs, n, psi, zz_thetas, rx_thetas[:, :nrow], mlane)
    return jnp.reshape(psi, (-1,))


def ising_readout_spec(
    n: int,
    zz_terms: Any = None,
    z_terms: Any = None,
    x_terms: Any = None,
) -> Tuple[Any, Any]:
    """Normalize Ising-family readout terms to the hashable fused-readout spec.

    ``zz_terms``: iterable of ``(a, b)`` or ``(a, b, w)``; ``z_terms``:
    ``q`` / ``(q,)`` / ``(q, w)``; ``x_terms``: same as z_terms, or ``True``
    for a uniform transverse field on every qubit.  Weights default to 1.0
    and must be static Python floats.  Returns ``(diag_terms, x_terms)``:
    diag entries are ``((qubits...), w)`` Z-strings of any locality.
    """
    diag = []
    for t in zz_terms or ():
        t = tuple(t)
        w = float(t[2]) if len(t) > 2 else 1.0
        diag.append(((int(t[0]), int(t[1])), w))
    for t in z_terms or ():
        t = (t,) if np.isscalar(t) else tuple(t)
        w = float(t[1]) if len(t) > 1 else 1.0
        diag.append(((int(t[0]),), w))
    if x_terms is True:
        x_terms = range(n)
    xs = []
    for t in x_terms or ():
        t = (t,) if np.isscalar(t) else tuple(t)
        w = float(t[1]) if len(t) > 1 else 1.0
        xs.append((int(t[0]), w))
    return tuple(diag), tuple(xs)


def ising_energy_dense(state: Tensor, n: int, spec: Any) -> Tensor:
    """⟨H⟩ for an Ising-family spec on a dense state, block-sandwich XLA path.

    The readout half of :func:`kernels_stack.zzrx_stack_energy` without the
    layer stack — works for any n and dtype (the masks/matrices are real
    numpy constants applied at the state's precision).
    """
    from . import kernels_stack as kst

    diag_terms, x_terms = spec
    nrow = max(n - _LANE_QUBITS, 0)
    r, lanes = 2**nrow, 2 ** min(n, _LANE_QUBITS)
    mask, sxl, blocks = kst._readout_consts(spec, n, nrow)
    psi = jnp.reshape(state, (r, lanes))
    sr = jnp.real(psi)
    si = jnp.imag(psi)
    br = jnp.zeros_like(sr)
    bi = jnp.zeros_like(si)
    rnp = np.float64 if sr.dtype == jnp.float64 else np.float32
    if diag_terms:
        m = jnp.asarray(mask.astype(rnp))
        br = br + m * sr
        bi = bi + m * si
    if x_terms:
        use_lanes = bool(np.any(sxl))
        sxl_t = jnp.asarray(sxl.astype(rnp))
        blocks_t = tuple((p0, b0, m0.astype(rnp)) for p0, b0, m0 in blocks)
        br = br + kst._x_sum_apply(sr, sxl_t, use_lanes, blocks_t, r, lanes)
        bi = bi + kst._x_sum_apply(si, sxl_t, use_lanes, blocks_t, r, lanes)
    return jnp.sum(sr * br) + jnp.sum(si * bi)


def fused_zzrx_multilayer_energy(
    state: Tensor,
    pairs: Any,
    zz_thetas: Tensor,
    rx_thetas: Tensor,
    spec: Any = ((), ()),
) -> Tensor:
    """L stacked zzrx layers + an Ising-family energy readout, ONE VJP boundary.

    ``spec`` from :func:`ising_readout_spec`: ⟨Σ w_s Π_{q∈s} Z_q + Σ w_q X_q⟩
    after applying the layers to ``state``.  On the stack path the readout
    joins the custom-VJP boundary (plane-native mask dot + real block
    sandwiches; its backward seed is saved in the forward —
    :func:`kernels_stack.zzrx_stack_energy`).  Falls back to layers +
    the XLA block-sandwich readout when the stack path is not viable
    (small n, non-complex64, other modes).
    """
    zz_thetas = jnp.asarray(zz_thetas)
    rx_thetas = jnp.asarray(rx_thetas)
    L, n = rx_thetas.shape
    nq = int(round(math.log2(state.shape[0])))
    assert nq == n, "one rx angle per qubit per layer required"
    pairs = tuple((int(a), int(b)) for a, b in pairs)
    nouter_s = max(0, (n - _LANE_QUBITS) - kernels_rowlayer.MAX_KERNEL_QUBITS_ZZRX)
    stack_ok = (
        ML_MODE == "stack"
        and n > _LANE_QUBITS
        and nouter_s <= _LANE_QUBITS
        and state.dtype == jnp.complex64
    )
    if not stack_ok:
        psi = fused_zzrx_multilayer(state, pairs, zz_thetas, rx_thetas)
        return ising_energy_dense(psi, n, spec)
    from . import kernels_stack as kst
    from ..ops.gates import rx_matrix

    nrow_s = n - _LANE_QUBITS
    nkernel = min(nrow_s, kernels_rowlayer.MAX_KERNEL_QUBITS_ZZRX)
    nouter = nrow_s - nkernel
    if (
        kst.FUSE_GRAND_BWD
        and kst.FUSE_LANE  # theta boundary asserts the fused-lane topology
        and not kst.FUSE_ROWM
        and nouter >= 1
        and nrow_s <= kst.MAX_GRAND_ROW_QUBITS  # VMEM envelope (n <= 21)
        and (kernels_rowlayer._on_tpu() or kernels_rowlayer._INTERPRET)
    ):
        # grand-fused one-kernel adjoint: theta-level boundary
        psi = jnp.reshape(state, (2**nrow_s, 2**_LANE_QUBITS))
        return kst.zzrx_stack_energy_theta(
            pairs, n, psi, zz_thetas, rx_thetas, spec
        )

    def kron_m(th_block, transpose):
        gs = jax.vmap(lambda t: rx_matrix(t).astype(state.dtype))(th_block)
        m = gs[0]
        for j in range(1, th_block.shape[0]):
            m = jnp.kron(m, gs[j])
        return m.T if transpose else m

    mlane = jax.vmap(lambda th: kron_m(th, True))(rx_thetas[:, nrow_s:])
    if nouter:
        mout = jax.vmap(lambda th: kron_m(th, False))(rx_thetas[:, :nouter])
    else:
        mout = jnp.ones((L, 1, 1), state.dtype)
    psi = jnp.reshape(state, (2**nrow_s, 2**_LANE_QUBITS))
    return kst.zzrx_stack_energy(
        pairs,
        n,
        psi,
        zz_thetas,
        rx_thetas[:, nouter:nrow_s],
        mout,
        mlane,
        spec,
    )


__all__ += [
    "fused_zzrx_layer",
    "fused_zzrx_multilayer",
    "fused_zzrx_multilayer_energy",
    "ising_readout_spec",
    "ising_energy_dense",
]
