"""Network/IR simplification passes.

Counterpart of reference ``simplify.py``: two-qubit gate SVD splitting
(``simplify.py:88``), light-cone cancellation (``:198-296``, realized here as
a QIR pass used by ``Circuit.expectation(enable_lightcone=True)`` and the
einsum-IR lowering), and rank simplification (absorbed by opt_einsum path
planning in this architecture — small tensors are contracted first by the
planner rather than by a hand-written pass).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .core import linalg as _linalg

Tensor = Any

__all__ = [
    "split_two_qubit_gate",
    "light_cone_qir",
    "light_cone_cancel",
    "fuse_single_qubit_qir",
]


def _xp_of(*ts: Any) -> Any:
    return np if all(isinstance(t, np.ndarray) for t in ts) else jnp


def fuse_single_qubit_qir(
    qir: Sequence[Dict[str, Any]], d: int = 2, drop_identity: bool = True
) -> List[Dict[str, Any]]:
    """Merge single-qubit gate chains and absorb them into the next
    multi-qubit gate (reference ``simplify.py:131-196`` rank simplification +
    ``cons.py:298-374`` adjacent-gate merging, recast as a QIR lowering pass).

    Plain unitary items only; channels / mpo / split items act as barriers.
    Runs host-side on the QIR before the einsum IR is built, so deep unfused
    circuits lower to ~one tensor per entangling gate — the operand count
    (and with it path-search and XLA compile time) drops by the single-qubit
    depth factor.  Identity-equal accumulated gates are dropped entirely
    when concrete (``drop_identity``).
    """
    pending: Dict[int, Any] = {}  # wire -> accumulated (d, d) matrix
    out: List[Dict[str, Any]] = []
    # wire -> (position in ``out``, output-leg slot) of the last multi-qubit
    # gate whose output on that wire is still on the frontier
    last_gate: Dict[int, Tuple[int, int]] = {}

    def flush(wire: int) -> None:
        g = pending.pop(wire, None)
        if g is None:
            return
        if (
            drop_identity
            and isinstance(g, np.ndarray)
            and np.allclose(g, np.eye(d), atol=1e-12)
        ):
            return
        from .ops.gates import Gate

        if wire in last_gate:
            # absorb into the previous multi-qubit gate's OUTPUT leg
            pos, slot = last_gate[wire]
            item = dict(out[pos])
            t = item["gate"].tensor
            if not hasattr(t, "ndim"):
                t = np.asarray(t)
            k = len(item["index"])
            tt = t.reshape((d,) * (2 * k)) if t.ndim != 2 * k else t
            xp = _xp_of(tt, g)
            tt = xp.moveaxis(xp.tensordot(g, tt, axes=[[1], [slot]]), 0, slot)
            item["gate"] = Gate(tt, name=(item.get("name") or "gate") + "*")
            item["diagonal"] = False
            item["gatef"] = None
            item.pop("parameters", None)
            out[pos] = item
            return
        out.append(
            {
                "gatef": None,
                "gate": Gate(g, name="merged1q"),
                "index": (wire,),
                "name": "merged1q",
                "split": None,
                "mpo": False,
                "diagonal": False,
            }
        )

    for item in qir:
        idx = tuple(int(w) for w in item.get("index", ()))
        barrier = (
            item.get("is_channel")
            or item.get("mpo")
            or item.get("split")
            or "gate" not in item
            or item.get("gate") is None
        )
        if barrier:
            for w in idx:
                flush(w)
                last_gate.pop(w, None)
            out.append(item)
            continue
        t = item["gate"].tensor
        if not hasattr(t, "ndim"):
            t = np.asarray(t)
        k = len(idx)
        if k == 1:
            g = t.reshape(d, d)
            prev = pending.get(idx[0])
            # numpy @ numpy stays numpy (axon complex-constant rule);
            # anything traced promotes naturally
            pending[idx[0]] = g if prev is None else g @ prev
            continue
        # absorb pending single-qubit gates into this gate's input legs
        absorbed = [pending.pop(w, None) for w in idx]
        if any(a is not None for a in absorbed):
            xp = _xp_of(t, *[a for a in absorbed if a is not None])
            tt = t.reshape((d,) * (2 * k)) if t.ndim != 2 * k else t
            if xp is jnp:
                tt = jnp.asarray(tt)
            for j, a in enumerate(absorbed):
                if a is None:
                    continue
                # contract a into input leg k + j
                tt = xp.moveaxis(
                    xp.tensordot(tt, a, axes=[[k + j], [0]]), -1, k + j
                )
            item = dict(item)
            from .ops.gates import Gate

            item["gate"] = Gate(tt, name=(item.get("name") or "gate") + "*")
            item["diagonal"] = False
            item.pop("gatef", None)
            item["gatef"] = None
            item.pop("parameters", None)
        pos = len(out)
        out.append(item)
        for j, w in enumerate(idx):
            last_gate[w] = (pos, j)
    for w in sorted(pending):
        flush(w)
    return out


def split_two_qubit_gate(
    gate: Tensor,
    max_singular_values: Optional[int] = None,
    max_truncation_err: float = 0.0,
    relative: bool = False,
    d: int = 2,
) -> Tuple[Tensor, Tensor, Tensor]:
    """SVD-split a two-site gate across the bond: G = Σ_k A_k ⊗ B_k.

    Returns ``(a, s, b)`` with ``a: (d, d, k)``, ``s: (k,)``,
    ``b: (k, d, d)`` such that G[(o1 o2), (i1 i2)] =
    Σ_k a[o1, i1, k] s[k] b[k, o2, i2] (reference ``simplify.py:88``;
    useful for MPS/PEPS interop and bond-dimension analysis).
    """
    g = jnp.asarray(gate)
    g = jnp.reshape(g, (d, d, d, d))  # (o1, o2, i1, i2)
    g = jnp.transpose(g, (0, 2, 1, 3))  # (o1, i1, o2, i2)
    m = jnp.reshape(g, (d * d, d * d))
    k = max_singular_values or d * d
    u, s, vh, _ = _linalg.truncated_svd(
        m, max_singular_values=k, max_truncation_err=max_truncation_err, relative=relative
    )
    kdim = u.shape[1]
    a = jnp.reshape(u, (d, d, kdim))
    b = jnp.reshape(vh, (kdim, d, d))
    return a, s, b


def gate_schmidt_rank(gate: Tensor, tol: float = 1e-6, d: int = 2) -> int:
    """Operator-Schmidt rank of a two-site gate (1 = product, 2 = CNOT-like)."""
    _, s, _ = split_two_qubit_gate(gate, d=d)
    return int(np.sum(np.asarray(s) > tol))


def light_cone_qir(
    qir: Sequence[Dict[str, Any]], obs_wires: Sequence[int]
) -> List[Dict[str, Any]]:
    """Drop instructions outside the observables' backward causal cone.

    Reference ``simplify.py:198-296`` (``_full_light_cone_cancel``): U†U pairs
    outside the cone cancel exactly in ⟨psi|O|psi⟩ networks.
    """
    cone = set(int(w) for w in obs_wires)
    keep: List[Dict[str, Any]] = []
    for item in reversed(list(qir)):
        if cone.intersection(item["index"]):
            keep.append(item)
            cone.update(item["index"])
    keep.reverse()
    return keep


light_cone_cancel = light_cone_qir


# ======================================================================
# reference-parity shape-level helpers (simplify.py:54-86)
# ======================================================================


def infer_new_shape(
    shape_a: Sequence[int], shape_b: Sequence[int], shared: Sequence[int]
) -> Tuple[int, ...]:
    """Output shape of contracting two tensors over ``shared`` axis pairs.

    Reference ``infer_new_shape``: shape-only contraction bookkeeping used by
    the rank simplifier; ``shared`` lists (axis_in_a, axis_in_b) pairs.
    """
    a_axes = {a for a, _ in shared}
    b_axes = {b for _, b in shared}
    out = [d for i, d in enumerate(shape_a) if i not in a_axes]
    out += [d for i, d in enumerate(shape_b) if i not in b_axes]
    return tuple(out)


def pseudo_contract_between(
    inputs_a: Sequence[int],
    inputs_b: Sequence[int],
    size_dict: Dict[int, int],
) -> Tuple[Tuple[int, ...], int]:
    """Dry-run contraction of two IR operands: (output indices, write size).

    Reference ``pseudo_contract_between simplify.py:54``: contraction cost
    probing without touching tensor data.
    """
    shared = set(inputs_a) & set(inputs_b)
    out = tuple(i for i in inputs_a if i not in shared) + tuple(
        i for i in inputs_b if i not in shared
    )
    size = 1
    for i in out:
        size *= size_dict[i]
    return out, size
