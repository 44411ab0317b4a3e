"""Compiled sampling programs for stabilizer+T circuits with Pauli noise.

Counterpart of reference ``zx/scalar_graph.py`` (tsim-derived).  The
reference compiles pyzx scalar diagrams whose exact evaluation gives
conditional outcome probabilities P(m_i | m_<i, f); here each "compiled
scalar graph" is a jit-traceable closure over the TPU dense engine computing
the same quantity: conditioned on an error pattern ``f`` the outcome
distribution is sampled EXACTLY by the chain rule (no Monte-Carlo over
measurement randomness), which is the tsim algorithm's defining property.

A :class:`CompiledComponent` additionally carries a fused ``sample_fn`` that
draws all outputs of the component in ONE traced program (sequential
collapse inside the trace) — on TPU this is one XLA program per shot batch
instead of ``num_outputs`` re-runs per shot.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import statevec

Tensor = Any

__all__ = [
    "CompiledScalarGraphs",
    "CompiledComponent",
    "CompiledProgram",
    "compile_scalar_graphs",
    "compile_program",
    "find_stab",
    "find_stab_magic",
    "find_stab_u3",
]


@dataclass
class CompiledScalarGraphs:
    """One conditional-probability evaluator (a "scalar graph").

    ``eval_fn(params)`` takes a boolean/0-1 matrix [batch, num_params] whose
    columns are (f-bits…, earlier outcomes…, 1) and returns the joint
    probability P(m_<i = given, m_i = 1 | f) per row.
    """

    eval_fn: Callable[[Tensor], Tensor]
    num_params: int

    def eval(self, params: Tensor) -> Tensor:
        return self.eval_fn(params)


def compile_scalar_graphs(graphs: Sequence[CompiledScalarGraphs]) -> List[CompiledScalarGraphs]:
    """Batch-compile a list of scalar graphs (identity here: closures are
    already jit-traceable; reference packs pyzx graphs into arrays)."""
    return list(graphs)


@dataclass
class CompiledComponent:
    """Independent output block: scalar graphs + fused exact sampler."""

    compiled_scalar_graphs: List[CompiledScalarGraphs]
    f_selection: np.ndarray
    output_indices: List[int]
    sample_fn: Optional[Callable[[Tensor, Tensor], Tensor]] = None


@dataclass
class CompiledProgram:
    """All components of a circuit plus global output ordering."""

    components: List[CompiledComponent]
    output_order: List[int]
    num_records: int = 0


# ----------------------------------------------------------------------
# dense-engine compilation from a prepared instruction spec
# ----------------------------------------------------------------------


def _run_steps(
    steps: Sequence[Tuple],
    n: int,
    dtype: Any,
    f_bits: Tensor,
    outcome_source: Callable[[int, Tensor, Tensor], Tensor],
) -> Tuple[Tensor, List[Tensor], Tensor]:
    """Shared replay: apply gates/noise; measurements delegate to
    ``outcome_source(record_index, p1, psi)`` returning the outcome bit.

    Returns (psi, record list, running probability of the realized records).
    ``psi`` stays normalized; probability is accumulated separately so both
    sampling (chain rule) and outcome-probability evaluation reuse the walk.
    """
    psi = statevec.init_state(n, dtype=dtype)
    eye = jnp.eye(2, dtype=dtype)
    xm = jnp.asarray([[0.0, 1.0], [1.0, 0.0]], dtype=dtype)
    zm = jnp.asarray([[1.0, 0.0], [0.0, -1.0]], dtype=dtype)
    records: List[Tensor] = []
    prob = jnp.ones((), dtype=jnp.float32)
    for step in steps:
        kind = step[0]
        if kind == "gate":
            _, m, idx = step
            psi = statevec.apply_unitary(psi, jnp.asarray(m, dtype=dtype), list(idx), 2)
        elif kind == "pauli_zx":
            _, q, fz, fx = step
            if fx is not None:
                bx = f_bits[fx].astype(dtype)
                psi = statevec.apply_unitary(psi, eye + bx * (xm - eye), [q], 2)
            if fz is not None:
                bz = f_bits[fz].astype(dtype)
                psi = statevec.apply_unitary(psi, eye + bz * (zm - eye), [q], 2)
        elif kind == "measure":
            _, q, basis, reset, flip_slot_id, hidden = step
            if basis == "x":
                hm = jnp.asarray([[1.0, 1.0], [1.0, -1.0]], dtype=dtype) / math.sqrt(2)
                psi = statevec.apply_unitary(psi, hm, [q], 2)
            elif basis == "y":
                sdg_h = (
                    jnp.asarray([[1.0, -1.0j], [1.0, 1.0j]], dtype=dtype)
                    / math.sqrt(2)
                )
                psi = statevec.apply_unitary(psi, sdg_h, [q], 2)
            marg = statevec.marginal_probability(psi, [q], 2)
            marg = marg / jnp.sum(marg)
            p1 = jnp.real(marg[1]).astype(jnp.float32)
            outcome = outcome_source(len(records), p1, psi)
            raw = outcome
            if flip_slot_id is not None:
                outcome = jnp.mod(outcome + f_bits[flip_slot_id].astype(outcome.dtype), 2)
            if not hidden:
                prob = prob * jnp.where(raw > 0.5, p1, 1.0 - p1)
            psi = statevec.project_slot(psi, q, raw.astype(jnp.int32), 2)
            nrm = jnp.linalg.norm(psi)
            psi = psi / jnp.where(nrm > 1e-30, nrm, 1.0).astype(psi.dtype)
            records.append(outcome)
            if reset:
                flipped = statevec.flip_slot(psi, q, 2)
                psi = jnp.where(raw > 0.5, flipped, psi)
                if basis == "x":
                    hm = jnp.asarray([[1.0, 1.0], [1.0, -1.0]], dtype=dtype) / math.sqrt(2)
                    psi = statevec.apply_unitary(psi, hm, [q], 2)
                elif basis == "y":
                    h_s = (
                        jnp.asarray([[1.0, 1.0], [1.0j, -1.0j]], dtype=dtype)
                        / math.sqrt(2)
                    )
                    psi = statevec.apply_unitary(psi, h_s, [q], 2)
    return psi, records, prob


def compile_program(prepared: Any, mode: str = "sequential", strategy: str = "dense") -> CompiledProgram:
    """Compile a prepared instruction spec into a sampling program.

    ``prepared`` comes from :func:`tensorcircuit_ng_tpu.zx.converter.prepare_graph`
    and carries: n, steps, num_f, num_records, detectors, observables.
    ``strategy`` is accepted for reference-API parity; the dense TPU engine
    is always used ("dense").
    """
    n = prepared.n
    steps = prepared.steps
    num_records = prepared.num_records  # visible records only
    visible_pos = prepared.visible_pos  # raw record index -> visible index (or None)
    dtype = jnp.complex64

    def make_sample_fn() -> Callable[[Tensor, Tensor], Tensor]:
        def sample_fn(f_bits: Tensor, uniforms: Tensor) -> Tensor:
            def source(rec_i: int, p1: Tensor, psi: Tensor) -> Tensor:
                u = uniforms[rec_i].astype(p1.dtype)
                return (jnp.sign(u - (1.0 - p1) + 1e-12) + 1.0) / 2.0

            _, records, _ = _run_steps(steps, n, dtype, f_bits, source)
            vis = [r for i, r in enumerate(records) if visible_pos[i] is not None]
            if not vis:
                return jnp.zeros((0,), dtype=jnp.float32)
            return jnp.stack(vis)

        return sample_fn

    def make_prefix_graph(i: int) -> CompiledScalarGraphs:
        num_f = prepared.num_f

        def eval_fn(params: Tensor) -> Tensor:
            params = jnp.atleast_2d(jnp.asarray(params))

            def one(row: Tensor) -> Tensor:
                f_bits = row[:num_f]
                m_bits = row[num_f:]

                def source(rec_i: int, p1: Tensor, psi: Tensor) -> Tensor:
                    v = visible_pos[rec_i]
                    if v is None:
                        # hidden reset collapse: deterministic dominant branch
                        # (exact for the fresh-|0> resets of QEC programs)
                        return (jnp.sign(p1 - 0.5) + 1.0) / 2.0
                    return m_bits[v].astype(jnp.float32)

                _, _, prob = _run_steps(
                    steps[: prepared.step_cut[i]], n, dtype, f_bits, source
                )
                return prob

            return jax.vmap(one)(params)

        return CompiledScalarGraphs(eval_fn=eval_fn, num_params=num_f + i + 1)

    def make_norm_graph() -> CompiledScalarGraphs:
        def eval_fn(params: Tensor) -> Tensor:
            params = jnp.atleast_2d(jnp.asarray(params))
            return jnp.ones((params.shape[0],), dtype=jnp.float32)

        return CompiledScalarGraphs(eval_fn=eval_fn, num_params=prepared.num_f)

    graphs = [make_norm_graph()] + [make_prefix_graph(i) for i in range(num_records)]
    comp = CompiledComponent(
        compiled_scalar_graphs=compile_scalar_graphs(graphs),
        f_selection=np.arange(prepared.num_f, dtype=np.int64),
        output_indices=list(range(num_records)),
        sample_fn=make_sample_fn(),
    )
    return CompiledProgram(
        components=[comp],
        output_order=list(range(num_records)),
        num_records=num_records,
    )


# ----------------------------------------------------------------------
# stabilizer decompositions of magic states (strategy tables)
# ----------------------------------------------------------------------


def find_stab(k: int = 1) -> List[Tuple[complex, List[np.ndarray]]]:
    """Stabilizer decomposition of T^{⊗k} as Σ c_j · Clifford_j terms.

    T = a·I + b·S with a = 1 - b, b = (e^{iπ/4} - 1)/(i - 1); a k-T circuit
    expands into 2^k stabilizer terms (reference ``find_stab``; the
    reference's "cat" strategies trade term count for graph size — with the
    dense engine the direct product form is the natural choice).
    """
    b = (np.exp(1j * np.pi / 4) - 1.0) / (1j - 1.0)
    a = 1.0 - b
    eye = np.eye(2, dtype=complex)
    s = np.diag([1.0, 1.0j])
    terms: List[Tuple[complex, List[np.ndarray]]] = [(1.0, [])]
    for _ in range(k):
        new_terms = []
        for c, ops in terms:
            new_terms.append((c * a, ops + [eye]))
            new_terms.append((c * b, ops + [s]))
        terms = new_terms
    return terms


def find_stab_magic(k: int = 1) -> List[Tuple[complex, np.ndarray]]:
    """|T⟩^{⊗k} magic-state stabilizer decomposition (reference parity).

    |T⟩ = cos(π/8)|+⟩' … expressed directly: |T⟩ = (|0⟩ + e^{iπ/4}|1⟩)/√2
    = a|+⟩ + b·S|+⟩ with the :func:`find_stab` coefficients.
    """
    plus = np.array([1.0, 1.0], dtype=complex) / np.sqrt(2.0)
    out: List[Tuple[complex, np.ndarray]] = []
    for c, ops in find_stab(k):
        vec = np.array([1.0], dtype=complex)
        for op in ops:
            vec = np.kron(vec, op @ plus)
        if not ops:
            vec = np.ones(1, dtype=complex)
        out.append((c, vec))
    return out


def find_stab_u3(theta: float, phi: float, lam: float) -> List[Tuple[complex, np.ndarray]]:
    """Decompose a u3 gate into a sum of (at most 4) Clifford terms.

    Any diagonal-plus-rotation u3 = Rz(phi) Ry(theta) Rz(lam); each Rz/Ry
    splits as cos(t/2)·I - i sin(t/2)·P over the Clifford axis P, giving a
    stabilizer-sum without Clifford+T compilation (reference ``find_stab_u3``).
    """
    eye = np.eye(2, dtype=complex)
    z = np.diag([1.0, -1.0]).astype(complex)
    y = np.array([[0.0, -1.0j], [1.0j, 0.0]])

    def rot_terms(t: float, p: np.ndarray) -> List[Tuple[complex, np.ndarray]]:
        return [(np.cos(t / 2.0), eye), (-1.0j * np.sin(t / 2.0), p)]

    terms: List[Tuple[complex, np.ndarray]] = [(1.0, eye)]
    for t, p in ((lam, z), (theta, y), (phi, z)):
        terms = [(c1 * c2, m2 @ m1) for c1, m1 in terms for c2, m2 in rot_terms(t, p)]
    # merge identical Clifford factors
    merged: Dict[bytes, Tuple[complex, np.ndarray]] = {}
    for c, m in terms:
        key = np.round(m, 12).tobytes()
        if key in merged:
            merged[key] = (merged[key][0] + c, m)
        else:
            merged[key] = (c, m)
    return [(c, m) for c, m in merged.values() if abs(c) > 1e-12]
