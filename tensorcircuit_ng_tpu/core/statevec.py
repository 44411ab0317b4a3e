"""Dense statevector engine: the TPU hot path.

The reference simulates circuits by lazily building a tensornetwork object
graph and contracting it (reference ``basecircuit.py:183-373``,
``cons.py:845-960``).  On TPU the dominant regime (n ≲ 32 qubits, deep
circuits, jit/vmap/grad everywhere) is better served by a *dense state
tensor* of shape ``(d,)*n`` updated in place by gate applications — XLA fuses
the resulting transpose+matmul chains onto the MXU, shapes are static, and
the whole circuit becomes one compiled program.  Wide shallow networks
(amplitudes of 40+ qubit circuits) go through the separate einsum IR
(:mod:`tensorcircuit_ng_tpu.core.einsum_ir`).

All functions are pure: state in, state out; `vmap` adds batch dims.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Tensor = Any

__all__ = [
    "init_state",
    "apply_unitary",
    "apply_diagonal",
    "expectation_local",
    "expectation_ps",
    "amplitude",
    "probabilities",
    "marginal_probability",
    "project_qubit",
]


def init_state(
    n: int,
    d: int = 2,
    dtype: Optional[str] = None,
    inputs: Optional[Tensor] = None,
) -> Tensor:
    """|0...0> of n qudits, or reshape user-provided dense ``inputs``."""
    from .. import config

    dtype = dtype or config.dtypestr()
    if inputs is not None:
        s = jnp.asarray(inputs).astype(jnp.dtype(dtype))
        return jnp.reshape(s, (d,) * n)
    s = jnp.zeros((d**n,), dtype=jnp.dtype(dtype))
    s = s.at[0].set(1.0)
    return jnp.reshape(s, (d,) * n)


def apply_unitary(state: Tensor, gate: Tensor, wires: Sequence[int]) -> Tensor:
    """Apply a k-site gate tensor to ``state`` on ``wires``.

    ``gate`` has shape ``(d,)*2k`` (first k axes are output legs) or the
    matrix form ``(d^k, d^k)``.  Equivalent of one ``tn.contract_between``
    step in the reference's engine, lowered directly to a tensordot that XLA
    turns into transpose+matmul on the MXU.
    """
    wires = list(wires)
    k = len(wires)
    d = state.shape[-1] if state.ndim else 2
    d = state.shape[wires[0]]
    g = jnp.asarray(gate)
    if g.ndim != 2 * k:
        g = jnp.reshape(g, (d,) * (2 * k))
    g = g.astype(state.dtype)
    out = jnp.tensordot(g, state, axes=[list(range(k, 2 * k)), wires])
    # tensordot result: k gate output axes first, then remaining state axes in
    # original relative order; move them back to `wires`.
    return jnp.moveaxis(out, list(range(k)), wires)


def apply_diagonal(state: Tensor, diag: Tensor, wires: Sequence[int]) -> Tensor:
    """Apply a diagonal k-site gate given its diagonal of shape ``(d,)*k``.

    Pure broadcast multiply — no transpose of the big state tensor.  This is
    the dense-engine counterpart of the reference's hyperedge/CopyNode
    diagonal-gate path (reference ``basecircuit.py:318-369``).
    """
    wires = list(wires)
    k = len(wires)
    n = state.ndim
    d = state.shape[wires[0]]
    dg = jnp.asarray(diag).astype(state.dtype)
    if dg.ndim != k:
        dg = jnp.reshape(dg, (d,) * k)
    # order diag axes by wire position so broadcasting lines up
    order = list(np.argsort(wires))
    dg = jnp.transpose(dg, order)
    shape = [1] * n
    for w in wires:
        shape[w] = d
    return state * jnp.reshape(dg, shape)


def expectation_local(
    state: Tensor, ops: Sequence[Tuple[Tensor, Sequence[int]]]
) -> Tensor:
    """⟨psi| prod_i O_i |psi⟩ for local operators on disjoint wires."""
    phi = state
    for op, wires in ops:
        phi = apply_unitary(phi, op, wires)
    return jnp.vdot(jnp.reshape(state, (-1,)), jnp.reshape(phi, (-1,)))


_PAULI = {
    1: np.array([[0.0, 1.0], [1.0, 0.0]]),
    2: np.array([[0.0, -1.0j], [1.0j, 0.0]]),
    3: np.array([[1.0, 0.0], [0.0, -1.0]]),
}


def expectation_ps(
    state: Tensor,
    x: Optional[Sequence[int]] = None,
    y: Optional[Sequence[int]] = None,
    z: Optional[Sequence[int]] = None,
) -> Tensor:
    """⟨psi| X_x Y_y Z_z |psi⟩ — Pauli-string expectation on the dense state.

    TPU-first: Z strings are a pure sign-mask multiply (no matmul); X/Y apply
    one 2x2 rotation each.  Mirrors the semantics of reference
    ``abstractcircuit.py:1523-1603``.
    """
    phi = state
    for q in x or ():
        phi = apply_unitary(phi, jnp.asarray(_PAULI[1], dtype=state.dtype), [q])
    for q in y or ():
        phi = apply_unitary(phi, jnp.asarray(_PAULI[2], dtype=state.dtype), [q])
    if z:
        zdiag = jnp.asarray([1.0, -1.0], dtype=state.dtype)
        for q in z:
            phi = apply_diagonal(phi, zdiag, [q])
    return jnp.vdot(jnp.reshape(state, (-1,)), jnp.reshape(phi, (-1,)))


def amplitude(state: Tensor, bitstring: Sequence[int]) -> Tensor:
    """⟨b|psi⟩ for a computational-basis string (static or traced ints)."""
    n = state.ndim
    flat = jnp.reshape(state, (-1,))
    d = state.shape[0]
    b = jnp.asarray(bitstring)
    idx = jnp.zeros((), dtype=jnp.int32)
    radix = jnp.asarray(
        [d ** (n - 1 - i) for i in range(n)], dtype=jnp.int32
    )
    idx = jnp.sum(b.astype(jnp.int32) * radix)
    return flat[idx]


def probabilities(state: Tensor) -> Tensor:
    """Full probability vector |psi|^2 of length d^n (real dtype)."""
    flat = jnp.reshape(state, (-1,))
    return jnp.real(jnp.conj(flat) * flat)


def marginal_probability(state: Tensor, wires: Sequence[int]) -> Tensor:
    """Marginal probability tensor over ``wires`` (shape (d,)*len(wires))."""
    p = jnp.real(jnp.conj(state) * state)
    n = state.ndim
    others = [i for i in range(n) if i not in set(wires)]
    p = jnp.sum(p, axis=tuple(others)) if others else p
    # sum removes axes; reorder to match requested wire order
    remaining = [w for w in sorted(wires)]
    perm = [remaining.index(w) for w in wires]
    return jnp.transpose(p, perm)


def project_qubit(state: Tensor, wire: int, outcome: Tensor, renormalize: bool = True) -> Tensor:
    """Project ``wire`` onto computational-basis ``outcome`` (0..d-1, traced ok)."""
    d = state.shape[wire]
    sel = jax.nn.one_hot(outcome, d, dtype=state.dtype)
    proj = apply_diagonal(state, sel, [wire])
    if renormalize:
        nrm = jnp.linalg.norm(jnp.reshape(proj, (-1,)))
        proj = proj / jnp.where(nrm == 0, 1.0, nrm).astype(proj.dtype)
    return proj
