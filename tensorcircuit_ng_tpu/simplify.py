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

__all__ = ["split_two_qubit_gate", "light_cone_qir", "light_cone_cancel"]


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
