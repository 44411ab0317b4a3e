"""Einsum IR: explicit, hashable contraction networks.

Replacement for the reference's mutable tensornetwork Node/Edge graph
(reference ``cons.py:492-547, 773-800`` extracts exactly this
``(inputs, output, size_dict)`` topology from node lists).  Circuits lower
their QIR directly to this IR; paths are found host-side by opt_einsum and
cached by the IR's structural signature; execution is a jitted einsum chain.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

Tensor = Any

__all__ = ["EinsumIR", "circuit_state_ir", "amplitude_ir", "expectation_ir", "superop_expectation_ir", "superop_boundary_ir"]


@dataclasses.dataclass
class EinsumIR:
    """(inputs, output, size_dict) topology + the operand tensors.

    Index ids are ints; ``signature()`` is hashable and independent of tensor
    values, so jit/path caches key on structure only.
    """

    inputs: List[Tuple[int, ...]]
    output: Tuple[int, ...]
    size_dict: Dict[int, int]
    tensors: List[Tensor]

    def signature(self) -> Tuple:
        return (
            tuple(self.inputs),
            tuple(self.output),
            tuple(sorted(self.size_dict.items())),
        )

    def shapes(self) -> List[Tuple[int, ...]]:
        return [tuple(self.size_dict[i] for i in inp) for inp in self.inputs]

    def to_subscripts(self) -> str:
        """opt_einsum-style subscripts using unicode symbols."""
        import opt_einsum as oe

        ids = sorted({i for inp in self.inputs for i in inp} | set(self.output))
        sym = {i: oe.get_symbol(k) for k, i in enumerate(ids)}
        lhs = ",".join("".join(sym[i] for i in inp) for inp in self.inputs)
        rhs = "".join(sym[i] for i in self.output)
        return f"{lhs}->{rhs}"


class _IRBuilder:
    """Track per-wire frontier index ids while appending gate tensors."""

    def __init__(self, n: int, d: int = 2):
        self.n = n
        self.d = d
        self.counter = 0
        self.inputs: List[Tuple[int, ...]] = []
        self.tensors: List[Tensor] = []
        self.size: Dict[int, int] = {}
        self.front: List[int] = []
        for _ in range(n):
            self.front.append(self.new_index())

    def new_index(self) -> int:
        i = self.counter
        self.counter += 1
        self.size[i] = self.d
        return i

    def add_tensor(self, t: Tensor, idx: Sequence[int]) -> None:
        self.inputs.append(tuple(idx))
        self.tensors.append(t)

    def add_initial(self, init_vec: Tensor) -> None:
        """Add |0> (or custom) product-state vectors on the current frontier."""
        for w in range(self.n):
            self.add_tensor(init_vec, (self.front[w],))

    def add_diagonal(self, diag: Tensor, wires: Sequence[int]) -> None:
        """Attach a k-local DIAGONAL as a (d,)*k hyperedge tensor.

        The tensor shares the wires' current frontier indices and the
        frontier does not advance: the contraction multiplies elementwise
        (the indices appear ≥3 times — a hyperedge, which the planner and
        executor already support).  Cost: 2^k entries, never (2^k)^2 — this
        is how matrix-free items (rzm, multicz) lower at ANY k.
        """
        k = len(wires)
        d = self.d
        t = diag if hasattr(diag, "ndim") else np.asarray(diag)
        if t.ndim != k:
            t = t.reshape((d,) * k)
        self.add_tensor(t, tuple(self.front[w] for w in wires))

    def add_gate(self, tensor: Tensor, wires: Sequence[int]) -> None:
        k = len(wires)
        d = self.d
        t = tensor if hasattr(tensor, "ndim") else np.asarray(tensor)
        if t.ndim != 2 * k:
            t = t.reshape((d,) * (2 * k))
        new = [self.new_index() for _ in range(k)]
        old = [self.front[w] for w in wires]
        # gate tensor convention: (out..., in...)
        self.add_tensor(t, tuple(new) + tuple(old))
        for j, w in enumerate(wires):
            self.front[w] = new[j]


def _zero_vec(d: int, dtype: Any) -> Tensor:
    # numpy on purpose: constants must not be device arrays (axon cannot
    # lower complex device-array constants in jit programs)
    v = np.zeros((d,), dtype=np.dtype(dtype))
    v[0] = 1.0
    return v


def _basis_vec(val: int, d: int, dtype: Any) -> Tensor:
    v = np.zeros((d,), dtype=np.dtype(dtype))
    v[val] = 1.0
    return v


def _build_forward(
    qir: List[Dict[str, Any]], n: int, d: int, dtype: Any, simplify: bool = True
) -> _IRBuilder:
    if simplify:
        from ..simplify import fuse_single_qubit_qir

        qir = fuse_single_qubit_qir(qir, d=d)
    b = _IRBuilder(n, d)
    b.add_initial(_zero_vec(d, dtype))
    for item in qir:
        if _add_matrix_free(b, item, dtype):
            continue
        b.add_gate(item["gate"].tensor, item["index"])
    return b


def _add_matrix_free(b: _IRBuilder, item: Dict[str, Any], dtype: Any, conj: bool = False) -> bool:
    """Lower matrix-free QIR items (multicz / zstring_rot) as diagonal
    hyperedges; returns True if handled.  ``conj`` for the bra side of
    doubled networks (diagonals need no leg swap, only conjugation)."""
    if item.get("multicz"):
        k = len(item["index"])
        diag = np.ones(2**k, dtype=np.dtype(dtype))
        diag[-1] = -1.0
        b.add_diagonal(diag, item["index"])
        return True
    if item.get("zstring_rot"):
        from ..ops.gates import rzm_diagonal

        diag = rzm_diagonal(item["theta"], len(item["index"]), dtype)
        if conj:
            diag = diag.conj()
        b.add_diagonal(diag, item["index"])
        return True
    return False


def circuit_state_ir(qir: List[Dict[str, Any]], n: int, d: int = 2, dtype: Any = None) -> EinsumIR:
    """IR whose contraction is the full output state (open legs)."""
    from .. import config

    dtype = dtype or jnp.dtype(config.dtypestr())
    b = _build_forward(qir, n, d, dtype)
    return EinsumIR(b.inputs, tuple(b.front), b.size, b.tensors)


def amplitude_ir(
    qir: List[Dict[str, Any]],
    n: int,
    bits: Sequence[int],
    d: int = 2,
    dtype: Any = None,
) -> EinsumIR:
    """IR for ⟨bits|C|0...0⟩ — a closed (scalar) network."""
    from .. import config

    dtype = dtype or jnp.dtype(config.dtypestr())
    b = _build_forward(qir, n, d, dtype)
    for w in range(n):
        b.add_tensor(_basis_vec(int(bits[w]), d, dtype), (b.front[w],))
    return EinsumIR(b.inputs, (), b.size, b.tensors)


def expectation_ir(
    qir: List[Dict[str, Any]],
    n: int,
    ops: Sequence[Tuple[Tensor, Sequence[int]]],
    d: int = 2,
    dtype: Any = None,
    lightcone: bool = True,
) -> EinsumIR:
    """IR for ⟨0|C† O C|0⟩ (doubled network, reference ``basecircuit.py:393-447``).

    With ``lightcone`` (reference ``simplify.py:198-296``) gates outside the
    observables' causal cone are dropped before the network is built.
    """
    from .. import config

    dtype = dtype or jnp.dtype(config.dtypestr())
    if lightcone:
        cone = set()
        for _, wires in ops:
            cone.update(int(w) for w in wires)
        keep: List[Dict[str, Any]] = []
        for item in reversed(qir):
            if cone.intersection(item["index"]):
                keep.append(item)
                cone.update(item["index"])
        qir = list(reversed(keep))
    # restrict the network to the wires actually touched: every other wire
    # contributes a trivial <0|0>=1 factor, and dropping them keeps the
    # operand count O(cone size) instead of O(n) — this is what makes
    # n=500 shallow-circuit expectations fast (reference README demo)
    support = sorted(
        {int(w) for item in qir for w in item["index"]}
        | {int(w) for _, wires in ops for w in wires}
    )
    wmap = {w: i for i, w in enumerate(support)}
    qir = [dict(item, index=tuple(wmap[int(w)] for w in item["index"])) for item in qir]
    ops = [(op, tuple(wmap[int(w)] for w in wires)) for op, wires in ops]
    n = max(len(support), 1)
    from ..simplify import fuse_single_qubit_qir

    qir = fuse_single_qubit_qir(qir, d=d)
    b = _build_forward(qir, n, d, dtype, simplify=False)
    ket_front = list(b.front)
    # operator tensors bridge ket frontier to bra frontier
    bra_front = list(ket_front)
    for op, wires in ops:
        k = len(wires)
        t = op if hasattr(op, "ndim") else np.asarray(op)
        if t.ndim != 2 * k:
            t = t.reshape((d,) * (2 * k))
        new = [b.new_index() for _ in range(k)]
        old = [bra_front[int(w)] for w in wires]
        b.add_tensor(t, tuple(new) + tuple(old))
        for j, w in enumerate(wires):
            bra_front[int(w)] = new[j]
    # conjugated circuit (bra side), applied in reverse with dagger tensors
    for item in reversed(qir):
        k = len(item["index"])
        if item.get("multicz") or item.get("zstring_rot"):
            if item.get("multicz"):
                diag = np.ones(d**k, dtype=np.dtype(dtype))
                diag[-1] = -1.0
            else:
                from ..ops.gates import rzm_diagonal

                diag = rzm_diagonal(item["theta"], k, dtype).conj()
            t = diag if hasattr(diag, "reshape") else np.asarray(diag)
            b.add_tensor(
                t.reshape((d,) * k),
                tuple(bra_front[w] for w in item["index"]),
            )
            continue
        t = item["gate"].tensor
        if not hasattr(t, "ndim"):
            t = np.asarray(t)
        if t.ndim != 2 * k:
            t = t.reshape((d,) * (2 * k))
        # dagger: conjugate and swap in/out legs (np/jnp duck-typed)
        perm = tuple(range(k, 2 * k)) + tuple(range(k))
        tdg = t.transpose(perm).conj()
        new = [b.new_index() for _ in range(k)]
        old = [bra_front[w] for w in item["index"]]
        b.add_tensor(tdg, tuple(new) + tuple(old))
        for j, w in enumerate(item["index"]):
            bra_front[w] = new[j]
    # close with <0| vectors
    for w in range(n):
        b.add_tensor(_zero_vec(d, dtype), (bra_front[w],))
    return EinsumIR(b.inputs, (), b.size, b.tensors)


def superop_expectation_ir(
    qir: List[Dict[str, Any]],
    n: int,
    ops: Sequence[Tuple[Tensor, Sequence[int]]],
    d: int = 2,
    dtype: Any = None,
    lightcone: bool = True,
) -> EinsumIR:
    """IR for tr(O_k ... O_1 rho) over the DOUBLED (superoperator) network.

    See :func:`superop_boundary_ir` — this is the all-wires-traced case.
    """
    return superop_boundary_ir(qir, n, ops=ops, d=d, dtype=dtype, lightcone=lightcone)


def superop_boundary_ir(
    qir: List[Dict[str, Any]],
    n: int,
    ops: Sequence[Tuple[Tensor, Sequence[int]]] = (),
    fixed: Optional[Dict[int, Tensor]] = None,
    diag_wires: Sequence[int] = (),
    d: int = 2,
    dtype: Any = None,
    lightcone: bool = True,
) -> EinsumIR:
    """Doubled (superoperator) network with per-wire boundary conditions.

    The reference keeps Kraus channels lazily in the tn graph
    (``densitymatrix.py:398-430`` with ``channels.py:542 kraus_to_super_gate``)
    so wide shallow noisy circuits serve expectation, sampling, probability
    and amplitude without a d^2n density matrix (reference
    ``basecircuit.py:449-560,626``); this is that capability on the einsum
    IR.  Unitaries contribute (U, conj U) on the ket/bra wire pair, channels
    ONE superoperator tensor S[ok.., ob.., ik.., ib..] = sum_i K_i[ok, ik]
    conj(K_i)[ob, ib] bridging both sides.

    Boundary per wire:
    - ``ops``: observable chain applied on the ket side before closing
      (expectation semantics tr(O_k .. O_1 rho));
    - ``fixed[w] = v``: the wire closes against |v><v| — ``v`` on the ket
      frontier, ``conj(v)`` on the bra frontier (``v`` may be a traced
      one-hot, enabling jittable autoregressive conditioning);
    - ``diag_wires``: the wire's ket/bra pair routes through a 3-leg
      delta whose third leg is an OUTPUT index — the contraction returns
      the joint diagonal marginal of these wires, shape (d,)*len;
    - all other wires are traced out (2-leg delta).

    Trace-preservation cancels out-of-cone items, so the light-cone prune
    seeds from ops ∪ fixed ∪ diag wires exactly like the pure case.
    """
    from .. import config

    fixed = {int(w): v for w, v in (fixed or {}).items()}
    diag_wires = [int(w) for w in diag_wires]
    dtype = dtype or jnp.dtype(config.dtypestr())
    boundary_wires = set(fixed) | set(diag_wires)
    if lightcone:
        cone = set(boundary_wires)
        for _, wires in ops:
            cone.update(int(w) for w in wires)
        keep: List[Dict[str, Any]] = []
        for item in reversed(qir):
            if cone.intersection(item["index"]):
                keep.append(item)
                cone.update(item["index"])
        qir = list(reversed(keep))
    support = sorted(
        {int(w) for item in qir for w in item["index"]}
        | {int(w) for _, wires in ops for w in wires}
        | boundary_wires
    )
    wmap = {w: i for i, w in enumerate(support)}
    qir = [dict(item, index=tuple(wmap[int(w)] for w in item["index"])) for item in qir]
    ops = [(op, tuple(wmap[int(w)] for w in wires)) for op, wires in ops]
    fixed = {wmap[w]: v for w, v in fixed.items()}
    diag_wires = [wmap[w] for w in diag_wires]
    from ..simplify import fuse_single_qubit_qir

    qir = fuse_single_qubit_qir(qir, d=d)
    m = max(len(support), 1)
    # doubled register: wires [0, m) are ket legs, [m, 2m) bra legs
    b = _IRBuilder(2 * m, d)
    b.add_initial(_zero_vec(d, dtype))
    for item in qir:
        wires = list(item["index"])
        k = len(wires)
        if item.get("multicz") or item.get("zstring_rot"):
            if item.get("multicz"):
                dk = np.ones(d**k, dtype=np.dtype(dtype))
                dk[-1] = -1.0
                db = dk
            else:
                from ..ops.gates import rzm_diagonal

                dk = rzm_diagonal(item["theta"], k, dtype)
                db = dk.conj()
            b.add_diagonal(dk, wires)
            b.add_diagonal(db, [w + m for w in wires])
            continue
        if item.get("is_channel"):
            mats = item["channel_kraus"]
            dim = d**k
            xp = np if all(isinstance(x, np.ndarray) for x in mats) else jnp
            s = None
            for kk in mats:
                kk = kk.reshape(dim, dim)
                term = xp.einsum("oi,pj->opij", kk, xp.conj(kk))
                s = term if s is None else s + term
            s = s.reshape((d,) * (4 * k))
            b.add_gate(s, wires + [w + m for w in wires])
        else:
            t = item["gate"].tensor
            if not hasattr(t, "ndim"):
                t = np.asarray(t)
            if t.ndim != 2 * k:
                t = t.reshape((d,) * (2 * k))
            b.add_gate(t, wires)
            b.add_gate(t.conj(), [w + m for w in wires])
    # observables chain on the ket side: tr(O_k ... O_1 rho)
    for op, wires in ops:
        k = len(wires)
        t = op if hasattr(op, "ndim") else np.asarray(op)
        if t.ndim != 2 * k:
            t = t.reshape((d,) * (2 * k))
        b.add_gate(t, list(wires))
    # per-wire boundary: fixed -> |v><v| closure; diag -> open 3-leg delta;
    # everything else -> trace delta connecting ket frontier to bra frontier
    eye = np.eye(d, dtype=np.dtype(dtype))
    delta3 = np.zeros((d, d, d), dtype=np.dtype(dtype))
    for i in range(d):
        delta3[i, i, i] = 1.0
    out_by_wire: Dict[int, int] = {}
    for w in range(m):
        if w in fixed:
            v = fixed[w]
            if not hasattr(v, "ndim"):
                v = np.asarray(v)
            b.add_tensor(v, (b.front[w],))
            b.add_tensor(v.conj(), (b.front[w + m],))
        elif w in set(diag_wires):
            o = b.new_index()
            out_by_wire[w] = o
            b.add_tensor(delta3, (b.front[w], b.front[w + m], o))
        else:
            b.add_tensor(eye, (b.front[w], b.front[w + m]))
    output = tuple(out_by_wire[w] for w in diag_wires)
    return EinsumIR(b.inputs, output, b.size, b.tensors)
