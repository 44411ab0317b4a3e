"""Scalable readout-error mitigation (reference ``results/readout_mitigation.py:43-790``).

``ReadoutMit(execute)`` takes a user ``execute: circuits, shots -> [counts]``
callable so mitigation is testable offline (reference ``:44-72``); supports
local (tensor-product) calibration (``cals_from_system:257``), inverse and
constrained-least-squares correction, an M3-style subspace-reduced direct
solver (``_direct_solver:705``), and mitigated expectation (``:770``).
"""

from __future__ import annotations

import itertools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import counts as counts_mod

ct = Dict[str, int]

__all__ = ["ReadoutMit"]


class ReadoutMit:
    def __init__(self, execute: Callable[..., List[ct]]):
        self.execute = execute
        self.single_qubit_cals: Optional[Dict[int, np.ndarray]] = None
        self.global_cal: Optional[np.ndarray] = None
        self.n: Optional[int] = None

    # ------------------------------------------------------------------
    # calibration
    # ------------------------------------------------------------------

    def cals_from_system(self, qubits: Any, shots: int = 8192, method: str = "local") -> None:
        """Run calibration circuits through ``execute`` (reference ``:257``)."""
        from ..models.circuit import Circuit

        if isinstance(qubits, int):
            qubits = list(range(qubits))
        qubits = list(qubits)
        n = len(qubits)
        self.n = n
        if method == "local":
            c0 = Circuit(n)
            c1 = Circuit(n)
            for i in range(n):
                c1.x(i)
            res = self.execute([c0, c1], shots)
            self.single_qubit_cals = {}
            for i in range(n):
                m = np.zeros((2, 2))
                for prep, cnt in enumerate(res):
                    marg = counts_mod.marginal_count(cnt, [i])
                    tot = sum(marg.values())
                    m[0, prep] = marg.get("0", 0) / tot
                    m[1, prep] = marg.get("1", 0) / tot
                self.single_qubit_cals[qubits[i]] = m
            self.qubits = qubits
        elif method == "global":
            circuits = []
            for basis in range(2**n):
                c = Circuit(n)
                for i in range(n):
                    if (basis >> (n - 1 - i)) & 1:
                        c.x(i)
                circuits.append(c)
            res = self.execute(circuits, shots)
            a = np.zeros((2**n, 2**n))
            for prep, cnt in enumerate(res):
                v = counts_mod.count2vec(cnt)
                a[:, prep] = v
            self.global_cal = a
            self.qubits = qubits
        else:
            raise ValueError(f"unknown calibration method {method!r}")

    def set_local_cals(self, cals: Dict[int, np.ndarray]) -> None:
        self.single_qubit_cals = {k: np.asarray(v) for k, v in cals.items()}
        self.qubits = sorted(cals)
        self.n = len(self.qubits)

    # ------------------------------------------------------------------
    # correction
    # ------------------------------------------------------------------

    def _local_matrix(self, measured_qubits: Sequence[int]) -> np.ndarray:
        mats = [self.single_qubit_cals[q] for q in measured_qubits]
        a = np.eye(1)
        for m in mats:
            a = np.kron(a, m)
        return a

    def apply_correction(
        self,
        count: ct,
        qubits: Optional[Sequence[int]] = None,
        method: str = "inverse",
        **kws: Any,
    ) -> ct:
        """Mitigate a counts dict; methods: inverse, square (lstsq), M3 (subspace)."""
        if qubits is None:
            qubits = self.qubits
        shots = sum(count.values())
        v = counts_mod.count2vec(count)
        if method in ("inverse", "pseudo_inverse"):
            a = (
                self._local_matrix(qubits)
                if self.single_qubit_cals is not None
                else self.global_cal
            )
            p = np.linalg.pinv(a) @ v
        elif method in ("square", "constrained_least_squares", "cls"):
            a = (
                self._local_matrix(qubits)
                if self.single_qubit_cals is not None
                else self.global_cal
            )
            p = _nnls_normalized(a, v)
        elif method.lower() in ("m3", "subspace", "direct"):
            p = self._subspace_solver(count, qubits, **kws)
        else:
            raise ValueError(f"unknown mitigation method {method!r}")
        p = np.clip(p, 0, None)
        if p.sum() > 0:
            p = p / p.sum()
        out = {}
        n = len(qubits)
        for i in np.nonzero(p > 1e-9)[0]:
            out[format(i, f"0{n}b")] = float(p[i] * shots)
        return out

    def _subspace_solver(self, count: ct, qubits: Sequence[int], distance: Optional[int] = None) -> np.ndarray:
        """M3-style: restrict A to the observed-bitstring subspace (reference ``:705``)."""
        n = len(qubits)
        keys = sorted(count.keys())
        if distance:
            base = set(keys)
            for k in list(base):
                for flips in itertools.combinations(range(n), distance):
                    kl = list(k)
                    for f in flips:
                        kl[f] = "1" if kl[f] == "0" else "0"
                    base.add("".join(kl))
            keys = sorted(base)
        idx = {k: i for i, k in enumerate(keys)}
        m = len(keys)
        a = np.zeros((m, m))
        for j, kin in enumerate(keys):
            for i, kout in enumerate(keys):
                prob = 1.0
                for q, (bo, bi) in enumerate(zip(kout, kin)):
                    cal = self.single_qubit_cals[qubits[q]]
                    prob *= cal[int(bo), int(bi)]
                a[i, j] = prob
        b = np.asarray([count.get(k, 0) for k in keys], dtype=float)
        b = b / b.sum()
        x = _nnls_normalized(a, b)
        full = np.zeros(2**n)
        for k, i in idx.items():
            full[int(k, 2)] = x[i]
        return full

    # ------------------------------------------------------------------
    # expectation
    # ------------------------------------------------------------------

    def expectation(
        self,
        count: ct,
        z: Optional[Sequence[int]] = None,
        diagonal_op: Optional[Any] = None,
        method: str = "inverse",
        **kws: Any,
    ) -> float:
        """Mitigated diagonal-observable expectation (reference ``:770``)."""
        if method in (None, "raw"):
            return counts_mod.expectation(count, z=z, diagonal_op=diagonal_op)
        mit = self.apply_correction(count, method=method, **kws)
        return counts_mod.expectation(mit, z=z, diagonal_op=diagonal_op)


def _nnls_normalized(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Least squares with nonnegativity + unit-sum via scipy nnls."""
    try:
        from scipy.optimize import nnls

        x, _ = nnls(a, b)
    except Exception:  # pragma: no cover
        x, *_ = np.linalg.lstsq(a, b, rcond=None)
        x = np.clip(x, 0, None)
    if x.sum() > 0:
        x = x / x.sum()
    return x
