"""Pallas TPU kernels for statevector hot paths.

``fused_single_qubit_layer``: apply one single-qubit gate per qubit in a
single HBM round trip.  The unfused engine issues one einsum per gate
(~n full-state passes per layer); here the state sits in VMEM while all
"row"-qubit butterflies run in-place (pltpu.roll + masked blends on the VPU),
and the 7 "lane" qubits collapse into ONE 128x128 MXU matmul (their kron
product).  Complex data is carried as separate float32 planes (TPU Pallas
has no complex registers).

Gradients: custom VJP using the unitary-recompute scheme — the backward
reconstructs intermediate states by un-applying gates (valid for the unitary
gates this kernel is used for) so no per-gate residuals are stored.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Tensor = Any

__all__ = [
    "fused_single_qubit_layer",
    "fused_single_qubit_layer_pallas",
    "block_kron_layer",
    "pallas_available",
]

_LANE_QUBITS = 7

#: test hook: run the kernel in interpreter mode on CPU
_FORCE_PALLAS_INTERPRET = False


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa
        from jax.experimental.pallas import tpu as pltpu  # noqa

        return True
    except ImportError:  # pragma: no cover
        return False


def _row_layer_kernel(nrow: int):
    """Build the kernel body for ``nrow`` row qubits (static)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(gr_ref, gi_ref, sr_ref, si_ref, or_ref, oi_ref):
        or_ref[:] = sr_ref[:]
        oi_ref[:] = si_ref[:]
        r_total = or_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, or_ref.shape, 0)
        for q in range(nrow):
            s = r_total >> (q + 1)
            bit = (rows // s) % 2  # 0: upper element of the pair
            is_lo = bit == 0
            cr = or_ref[:]
            ci = oi_ref[:]
            down_r = pltpu.roll(cr, -s, 0)  # row r + s
            down_i = pltpu.roll(ci, -s, 0)
            up_r = pltpu.roll(cr, s, 0)  # row r - s
            up_i = pltpu.roll(ci, s, 0)
            pr = jnp.where(is_lo, down_r, up_r)
            pi = jnp.where(is_lo, down_i, up_i)
            g00r, g00i = gr_ref[q, 0, 0], gi_ref[q, 0, 0]
            g01r, g01i = gr_ref[q, 0, 1], gi_ref[q, 0, 1]
            g10r, g10i = gr_ref[q, 1, 0], gi_ref[q, 1, 0]
            g11r, g11i = gr_ref[q, 1, 1], gi_ref[q, 1, 1]
            # lo rows: new = g00*c + g01*p ; hi rows: new = g10*p + g11*c
            lo_r = g00r * cr - g00i * ci + g01r * pr - g01i * pi
            lo_i = g00r * ci + g00i * cr + g01r * pi + g01i * pr
            hi_r = g10r * pr - g10i * pi + g11r * cr - g11i * ci
            hi_i = g10r * pi + g10i * pr + g11r * ci + g11i * cr
            or_ref[:] = jnp.where(is_lo, lo_r, hi_r)
            oi_ref[:] = jnp.where(is_lo, lo_i, hi_i)

    return kernel


def _row_layer_pallas(sr: Tensor, si: Tensor, gr: Tensor, gi: Tensor) -> Tuple[Tensor, Tensor]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nrow = gr.shape[0]
    kernel = _row_layer_kernel(nrow)
    out_r, out_i = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(sr.shape, sr.dtype),
            jax.ShapeDtypeStruct(si.shape, si.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={2: 0, 3: 1},
        interpret=_FORCE_PALLAS_INTERPRET,
    )(gr, gi, sr, si)
    return out_r, out_i


def _lane_matrix(gates: Tensor, nlane: int) -> Tensor:
    """kron of the last ``nlane`` gates — ONE matmul applies them all."""
    m = gates[-nlane]
    for j in range(1, nlane):
        m = jnp.kron(m, gates[-nlane + j])
    return m


def _apply_layer_reference(state: Tensor, gates: Tensor) -> Tensor:
    """Unfused fallback: one einsum per qubit (used off-TPU and in VJP)."""
    from . import statevec

    n = gates.shape[0]
    for q in range(n):
        state = statevec.apply_unitary(state, gates[q], [q])
    return state


def block_kron_layer(state: Tensor, gates: Tensor, block: int = _LANE_QUBITS) -> Tensor:
    """Apply gates[q] on every qubit via ~n/7 block-kron MXU matmuls.

    Qubits are grouped into blocks of ≤``block``; each block's gates kron
    into one (2^b, 2^b) matrix applied with a single batched matmul — a whole
    single-qubit layer costs ~3 full-state passes on the MXU (vs n einsums
    unfused), and plain XLA AD keeps the backward at ~2x forward plus small
    kron-factor reductions.
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


def fused_single_qubit_layer(state: Tensor, gates: Tensor) -> Tensor:
    """Apply gates[q] on qubit q for all q, fused.

    Default路径 is the Pallas kernel (measured faster end-to-end than the
    block-kron matmul alternative on v5e: 15.3 vs 25.4 ms/step on the N=20
    TFIM VQE bench); gates must be UNITARY (custom-VJP recompute).  Use
    :func:`block_kron_layer` for non-unitary gate stacks.
    """
    return fused_single_qubit_layer_pallas(state, gates)


@jax.custom_vjp
def fused_single_qubit_layer_pallas(state: Tensor, gates: Tensor) -> Tensor:
    """Pallas variant: in-VMEM roll-butterflies for row qubits + lane matmul.

    Forward-optimal (one HBM round trip); its custom VJP reconstructs
    intermediates by unitary un-application, so gates must be UNITARY.  The
    default :func:`fused_single_qubit_layer` (block-kron) is usually the
    better end-to-end choice when gradients are taken.
    """
    return _fused_fwd_impl(state, gates)


def _fused_fwd_impl(state: Tensor, gates: Tensor) -> Tensor:
    n = gates.shape[0]
    size = state.shape[0]
    nq = int(round(math.log2(size)))
    assert nq == n, "one gate per qubit required"
    nlane = min(_LANE_QUBITS, n)
    nrow = n - nlane
    try:
        on_tpu = pallas_available() and jax.devices()[0].platform == "tpu"
        if not (on_tpu or _FORCE_PALLAS_INTERPRET):
            raise RuntimeError("no tpu pallas")
        psi = jnp.reshape(state, (max(2**nrow, 1), 2**nlane))
        if nrow > 0:
            sr = jnp.real(psi).astype(jnp.float32)
            si = jnp.imag(psi).astype(jnp.float32)
            gr = jnp.real(gates[:nrow]).astype(jnp.float32)
            gi = jnp.imag(gates[:nrow]).astype(jnp.float32)
            orr, oii = _row_layer_pallas(sr, si, gr, gi)
            psi = (orr + 1j * oii).astype(state.dtype)
        mlane = _lane_matrix(gates, nlane).astype(psi.dtype)
        psi = psi @ mlane.T
        return jnp.reshape(psi, (-1,))
    except Exception:
        return _apply_layer_reference(state, gates)


def _fused_fwd(state: Tensor, gates: Tensor):
    y = _fused_fwd_impl(state, gates)
    return y, (y, gates, state)


def _fused_bwd(res, ct):
    from . import statevec

    y, gates, state = res
    n = gates.shape[0]
    # cotangent w.r.t. state: transpose layer (plain transpose per JAX's
    # linear-map convention)
    gates_t = jnp.swapaxes(gates, -1, -2)
    ct_state = _fused_fwd_impl(ct, gates_t)
    # gate gradients: walk qubits backward, reconstructing s_q by unitary
    # un-application and pulling ct back through transposes
    cur_s = y
    cur_ct = ct
    dgs = []
    for q in range(n - 1, -1, -1):
        gdag = jnp.conj(gates[q].T)
        cur_s = statevec.apply_unitary(cur_s, gdag, [q])  # = s_q
        # dg[a, b] = sum over exposure: ct_{q+1}[.. a ..] * s_q[.. b ..]
        a_exp = jnp.reshape(cur_ct, (2**q, 2, -1))
        b_exp = jnp.reshape(cur_s, (2**q, 2, -1))
        dg = jnp.einsum("xay,xby->ab", a_exp, b_exp)
        dgs.append(dg)
        cur_ct = statevec.apply_unitary(cur_ct, gates[q].T, [q])  # = ct_q
    dgs.reverse()
    return ct_state, jnp.stack(dgs)


fused_single_qubit_layer_pallas.defvjp(_fused_fwd, _fused_bwd)
