"""Pauli propagation: Heisenberg-picture observable evolution.

Counterpart of reference ``pauliprop.py:30-540``: observables live in the
k-local Pauli basis (dim = Σ_{i<=k} C(n,i) 3^i plus a SINK for truncated
weight); gates act through numerically-computed Pauli transfer matrices with
host-precomputed index maps, so on-device application is one gather +
scatter-add per gate (``pauli_propagation`` functional wrapper ``:469``).
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import config

Tensor = Any

__all__ = ["PauliPropagationEngine", "SparsePauliPropagationEngine", "pauli_propagation"]

_P = [
    np.eye(2, dtype=complex),
    np.array([[0, 1], [1, 0]], dtype=complex),
    np.array([[0, -1j], [1j, 0]], dtype=complex),
    np.array([[1, 0], [0, -1]], dtype=complex),
]


def _pauli_kron(codes: Sequence[int]) -> np.ndarray:
    m = np.eye(1, dtype=complex)
    for c in codes:
        m = np.kron(m, _P[c])
    return m


def _ptm(u: np.ndarray, m: int) -> np.ndarray:
    r"""PTM R with U† P_a U = Σ_b R[b, a] P_b (real for unitary U)."""
    dim = 2**m
    codes = list(itertools.product(range(4), repeat=m))
    r = np.zeros((4**m, 4**m))
    for a, ca in enumerate(codes):
        pa = _pauli_kron(ca)
        conj = u.conj().T @ pa @ u
        for b, cb in enumerate(codes):
            pb = _pauli_kron(cb)
            r[b, a] = np.real(np.trace(pb @ conj)) / dim
    return r


class PauliPropagationEngine:
    """Propagate a weight-truncated Pauli observable backwards through gates."""

    def __init__(self, n: int, k: int = 2):
        self.n = n
        self.k = k
        # basis: all strings of weight <= k, as tuples of (site, code>0)
        self.basis: List[Tuple[Tuple[int, int], ...]] = []
        for w in range(k + 1):
            for sites in itertools.combinations(range(n), w):
                for codes in itertools.product((1, 2, 3), repeat=w):
                    self.basis.append(tuple(zip(sites, codes)))
        self.index: Dict[Tuple[Tuple[int, int], ...], int] = {
            b: i for i, b in enumerate(self.basis)
        }
        self.dim = len(self.basis)
        self.SINK = self.dim  # strings above locality k
        self._gate_map_cache: Dict[Tuple[int, ...], Tuple[np.ndarray, np.ndarray]] = {}

    def observable_vector(self, ps: Sequence[int]) -> Tensor:
        """Coefficient vector (length dim+1) of a single Pauli string."""
        key = tuple((i, int(v)) for i, v in enumerate(ps) if v)
        v = np.zeros(self.dim + 1, dtype=np.float32)
        if key in self.index:
            v[self.index[key]] = 1.0
        else:
            v[self.SINK] = 1.0
        return jnp.asarray(v)

    def _gate_maps(
        self, wires: Tuple[int, ...]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(codes[m], targets[m, 4^|w|]) for the basis under support ``wires``.

        Pure function of ``wires`` but O(dim * 4^|w|) python to build —
        memoized per engine (repeated layers re-use the same supports;
        un-memoized, a 30-step surrogate optimization spent ~all its time
        here)."""
        cached = self._gate_map_cache.get(wires)
        if cached is not None:
            return cached
        m = len(wires)
        nloc = 4**m
        codes = np.zeros(self.dim, dtype=np.int64)
        targets = np.zeros((self.dim, nloc), dtype=np.int64)
        wire_set = set(wires)
        for bi, b in enumerate(self.basis):
            on_support = {s: c for s, c in b if s in wire_set}
            rest = tuple((s, c) for s, c in b if s not in wire_set)
            code = 0
            for w in wires:
                code = code * 4 + on_support.get(w, 0)
            codes[bi] = code
            for new_code in range(nloc):
                digits = []
                cc = new_code
                for _ in range(m):
                    digits.append(cc % 4)
                    cc //= 4
                digits.reverse()
                new_terms = list(rest)
                for w, d in zip(wires, digits):
                    if d:
                        new_terms.append((w, d))
                new_key = tuple(sorted(new_terms))
                targets[bi, new_code] = self.index.get(new_key, self.SINK)
        self._gate_map_cache[wires] = (codes, targets)
        return codes, targets

    def apply_gate(self, coeffs: Tensor, u: Any, wires: Sequence[int]) -> Tensor:
        """obs' = U† obs U in the truncated basis (one gather+scatter)."""
        wires = tuple(int(w) for w in wires)
        m = len(wires)
        u_np = np.asarray(u).reshape(2**m, 2**m)
        r = _ptm(u_np, m)  # [4^m out, 4^m in]
        codes, targets = self._gate_maps(wires)
        r_j = jnp.asarray(r, dtype=coeffs.dtype)
        codes_j = jnp.asarray(codes)
        targets_j = jnp.asarray(targets)
        contrib = r_j.T[codes_j]  # [dim, 4^m]: contrib[s, b] = r[b, codes[s]]
        contrib = contrib * coeffs[:-1, None]
        new = jnp.zeros_like(coeffs)
        new = new.at[jnp.reshape(targets_j, (-1,))].add(jnp.reshape(contrib, (-1,)))
        new = new.at[self.SINK].add(coeffs[self.SINK])
        return new

    def propagate(self, qir: Sequence[Dict[str, Any]], ps: Sequence[int]) -> Tensor:
        """Backward-propagate observable ``ps`` through the circuit's QIR."""
        coeffs = self.observable_vector(ps)
        for item in reversed(list(qir)):
            g = item["gate"]
            tensor = g.tensor if hasattr(g, "tensor") else g
            coeffs = self.apply_gate(coeffs, np.asarray(tensor), item["index"])
        return coeffs

    def expectation_zero_state(self, coeffs: Tensor) -> Tensor:
        """⟨0...0| obs |0...0⟩: only Z-only strings contribute (+1 each)."""
        mask = np.zeros(self.dim + 1, dtype=np.float32)
        for bi, b in enumerate(self.basis):
            if all(c == 3 for _, c in b):
                mask[bi] = 1.0
        return jnp.sum(coeffs * jnp.asarray(mask, dtype=coeffs.dtype))

    # -- reference-parity surface (reference pauliprop.py:30-540) --

    def string_to_code(self, ps: Sequence[int]) -> int:
        """Index of a Pauli string in the truncated basis (SINK if weight > k)."""
        key = tuple((i, int(v)) for i, v in enumerate(ps) if v)
        return self.index.get(key, self.SINK)

    def get_initial_state(self, ps: Sequence[int]) -> Tensor:
        """Coefficient vector for observable ``ps`` (reference name)."""
        return self.observable_vector(ps)

    def get_ptm_1q(self, u: Any) -> Tensor:
        """4x4 Pauli-transfer matrix of a 1q unitary (reference name)."""
        return jnp.asarray(_ptm(np.asarray(u).reshape(2, 2), 1))

    def get_ptm_2q(self, u: Any) -> Tensor:
        """16x16 Pauli-transfer matrix of a 2q unitary (reference name)."""
        return jnp.asarray(_ptm(np.asarray(u).reshape(4, 4), 2))

    def expectation(self, circuit: Any, ps: Sequence[int]) -> Tensor:
        """⟨0|C† P C|0⟩ through this engine (reference ``expectation``)."""
        coeffs = self.propagate(circuit.to_qir(), ps)
        return self.expectation_zero_state(coeffs)

    def compute_expectation_scan(
        self, qirs: Sequence[Sequence[Dict[str, Any]]], ps: Sequence[int]
    ) -> Tensor:
        """Expectations after each successive layer (reference scan variant).

        ``qirs`` is a list of QIR segments (layers); returns the ⟨0|P(t)|0⟩
        trajectory as the observable propagates through them (backwards
        order).
        """
        coeffs = self.observable_vector(ps)
        out = [self.expectation_zero_state(coeffs)]
        for seg in reversed(list(qirs)):
            for item in reversed(list(seg)):
                g = item["gate"]
                tensor = g.tensor if hasattr(g, "tensor") else g
                coeffs = self.apply_gate(coeffs, np.asarray(tensor), item["index"])
            out.append(self.expectation_zero_state(coeffs))
        return jnp.stack(out)


def pauli_propagation(
    circuit: Any, ps: Sequence[int], k: int = 2
) -> Tensor:
    """⟨0|C† P C|0⟩ via truncated Pauli propagation (reference ``:469``)."""
    eng = PauliPropagationEngine(circuit.nqubits, k)
    coeffs = eng.propagate(circuit.to_qir(), ps)
    return eng.expectation_zero_state(coeffs)


class SparsePauliPropagationEngine:
    """Dict-of-coefficients Pauli propagation with coefficient truncation.

    Reference ``pauliprop.py`` sparse engine: instead of the dense
    C(n,≤k)·3^k basis vector, only nonzero strings are tracked (host-side
    dict), with optional magnitude truncation ``atol`` and locality cap
    ``k``.  Suited to large n with few contributing strings; the dense
    engine above is the jit/TPU path.
    """

    def __init__(self, n: int, k: Optional[int] = None, atol: float = 1e-12):
        self.n = n
        self.k = k if k is not None else n
        self.atol = atol

    def observable_dict(self, ps: Sequence[int]) -> Dict[Tuple[Tuple[int, int], ...], complex]:
        key = tuple((i, int(v)) for i, v in enumerate(ps) if v)
        return {key: 1.0}

    def apply_gate(
        self,
        coeffs: Dict[Tuple[Tuple[int, int], ...], complex],
        u: Any,
        wires: Sequence[int],
    ) -> Dict[Tuple[Tuple[int, int], ...], complex]:
        wires = tuple(int(w) for w in wires)
        m = len(wires)
        r = _ptm(np.asarray(u).reshape(2**m, 2**m), m)  # [out, in]
        wire_set = set(wires)
        new: Dict[Tuple[Tuple[int, int], ...], complex] = {}
        for key, c in coeffs.items():
            on = {s: v for s, v in key if s in wire_set}
            rest = tuple((s, v) for s, v in key if s not in wire_set)
            code = 0
            for w in wires:
                code = code * 4 + on.get(w, 0)
            col = r[:, code]
            for new_code in np.flatnonzero(np.abs(col) > self.atol):
                digits = []
                cc = int(new_code)
                for _ in range(m):
                    digits.append(cc % 4)
                    cc //= 4
                digits.reverse()
                terms = list(rest)
                for w, dgt in zip(wires, digits):
                    if dgt:
                        terms.append((w, dgt))
                nkey = tuple(sorted(terms))
                if len(nkey) > self.k:
                    continue  # locality truncation
                val = new.get(nkey, 0.0) + c * col[new_code]
                new[nkey] = val
        return {kk: vv for kk, vv in new.items() if abs(vv) > self.atol}

    def propagate(self, qir: Sequence[Dict[str, Any]], ps: Sequence[int]) -> Dict[Any, complex]:
        coeffs = self.observable_dict(ps)
        for item in reversed(list(qir)):
            g = item["gate"]
            tensor = g.tensor if hasattr(g, "tensor") else g
            coeffs = self.apply_gate(coeffs, np.asarray(tensor), item["index"])
        return coeffs

    def expectation_zero_state(self, coeffs: Dict[Any, complex]) -> complex:
        return sum(c for key, c in coeffs.items() if all(v == 3 for _, v in key))

    def expectation(self, circuit: Any, ps: Sequence[int]) -> complex:
        return self.expectation_zero_state(self.propagate(circuit.to_qir(), ps))

    def string_to_code(self, ps: Sequence[int]) -> Tuple[Tuple[int, int], ...]:
        """Canonical dict key of a Pauli string (sparse engine; reference name)."""
        return tuple((i, int(v)) for i, v in enumerate(ps) if v)

    def get_initial_state(self, ps: Sequence[int]) -> Dict[Any, complex]:
        return self.observable_dict(ps)

    def compute_expectation_scan(
        self, qirs: Sequence[Sequence[Dict[str, Any]]], ps: Sequence[int]
    ) -> List[complex]:
        coeffs = self.observable_dict(ps)
        out = [self.expectation_zero_state(coeffs)]
        for seg in reversed(list(qirs)):
            for item in reversed(list(seg)):
                g = item["gate"]
                tensor = g.tensor if hasattr(g, "tensor") else g
                coeffs = self.apply_gate(coeffs, np.asarray(tensor), item["index"])
            out.append(self.expectation_zero_state(coeffs))
        return out
