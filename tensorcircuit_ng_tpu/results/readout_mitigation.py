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


# ======================================================================
# reference-parity surface (results/readout_mitigation.py:43-790)
# ======================================================================


def _rm_local_miti_readout_circ(self: ReadoutMit) -> List[Any]:
    """|0…0⟩ and |1…1⟩ preparation circuits for local calibration (ref :170)."""
    from ..models.circuit import Circuit

    n = (max(self.qubits) + 1) if getattr(self, "qubits", None) else self.n
    c0 = Circuit(n)
    c1 = Circuit(n)
    for q in self.qubits if getattr(self, "qubits", None) else range(n):
        c1.x(q)
    return [c0, c1]


def _rm_local_miti_readout_circ_by_mask(self: ReadoutMit, bsl: List[str]) -> List[Any]:
    """Preparation circuits for explicit bitstring masks (reference :187)."""
    from ..models.circuit import Circuit

    n = (max(self.qubits) + 1) if getattr(self, "qubits", None) else self.n
    cs = []
    for bs in bsl:
        c = Circuit(n)
        for j, b in enumerate(bs):
            if b == "1":
                c.x(j)
        cs.append(c)
    return cs


def _rm_global_miti_readout_circ(self: ReadoutMit) -> List[Any]:
    """All-2^n basis preparation circuits for global calibration (ref :198)."""
    from ..models.circuit import Circuit

    qubits = self.qubits if getattr(self, "qubits", None) else list(range(self.n))
    n = max(qubits) + 1
    cs = []
    for basis in range(2 ** len(qubits)):
        c = Circuit(n)
        for k, q in enumerate(qubits):
            if (basis >> (len(qubits) - 1 - k)) & 1:
                c.x(q)
        cs.append(c)
    return cs


def _rm_cals_from_api(self: ReadoutMit, qubits: Any, device: Optional[str] = None) -> None:
    """Local calibration rows from a cloud device's properties (ref :216)."""
    from ..cloud import apis

    if isinstance(qubits, int):
        qubits = list(range(qubits))
    dev = apis.get_device(device) if device is not None else apis.get_device()
    props = dev.native_gates() if False else getattr(dev, "list_properties", lambda: {})()
    cals: Dict[int, np.ndarray] = {}
    for q in qubits:
        info = (props or {}).get("qubits", {}).get(str(q), {})
        p00 = float(info.get("ReadoutF0", info.get("readout_fidelity_0", 0.99)))
        p11 = float(info.get("ReadoutF1", info.get("readout_fidelity_1", 0.98)))
        cals[q] = np.array([[p00, 1 - p11], [1 - p00, p11]])
    self.set_local_cals(cals)


def _rm_ubs(self: ReadoutMit, i: int, qubits: Optional[Sequence[Any]]) -> int:
    """Index filter for unused calibration qubits (reference :73)."""
    cal_qubits = self.qubits
    name = "{:0" + str(len(cal_qubits)) + "b}"
    bits = [int(x) for x in name.format(i)]
    vomit = 0
    for k, q in enumerate(cal_qubits):
        if qubits is not None and q not in qubits and bits[k]:
            vomit = 1
    return vomit


def _rm_newrange(self: ReadoutMit, m: int, qubits: Optional[Sequence[Any]]) -> int:
    """Reindex a bitstring integer onto the used-qubit order (reference :93)."""
    if qubits is None:
        return m
    cal_qubits = [q for q in self.qubits if q in qubits]
    name = "{:0" + str(len(self.qubits)) + "b}"
    bits = {q: b for q, b in zip(self.qubits, name.format(m))}
    out = "".join(bits[q] for q in cal_qubits)
    return int(out, 2) if out else 0


def _rm_get_matrix(self: ReadoutMit, qubits: Optional[Sequence[Any]] = None) -> np.ndarray:
    """Calibration matrix restricted to ``qubits`` (reference :121)."""
    if self.single_qubit_cals is not None:
        if qubits is None:
            qubits = self.qubits
        return self._local_matrix(list(qubits))
    return self.global_cal


def _rm_reduced_cal_matrix(self: ReadoutMit, count: ct, qubits: Sequence[int]) -> Tuple[np.ndarray, List[str]]:
    """A restricted to observed bitstrings (M3 subspace; reference :705 region)."""
    keys = sorted(count)
    a_full = self.get_matrix(qubits)
    idx = [int(k, 2) for k in keys]
    return a_full[np.ix_(idx, idx)], keys


def _rm_mitigate_probability(self: ReadoutMit, probability_noise: Any, method: str = "inverse") -> np.ndarray:
    """Mitigate a probability vector (reference :354)."""
    a = self.get_matrix()
    v = np.asarray(probability_noise, dtype=np.float64)
    if method == "inverse":
        p = np.linalg.pinv(a) @ v
    else:
        p = _nnls_normalized(a, v)
    p = np.clip(p, 0, None)
    return p / p.sum() if p.sum() > 0 else p


def _rm_apply_readout_mitigation(self: ReadoutMit, raw_count: ct, method: str = "inverse") -> Dict[str, float]:
    """Mitigated quasi-counts (reference :386)."""
    shots = sum(raw_count.values())
    v = counts_mod.count2vec(raw_count)
    p = self.mitigate_probability(v, method=method)
    n = int(np.log2(len(p)))
    return {format(i, f"0{n}b"): float(p[i] * shots) for i in np.nonzero(np.abs(p) > 1e-12)[0]}


def _rm_mapping_preprocess(
    self: ReadoutMit,
    counts: ct,
    qubits: Sequence[int],
    positional_logical_mapping: Optional[Dict[int, int]] = None,
    logical_physical_mapping: Optional[Dict[int, int]] = None,
) -> Tuple[ct, List[int]]:
    """Rewrite counts keys from positional to physical order (reference :406)."""
    if positional_logical_mapping is None:
        positional_logical_mapping = {i: q for i, q in enumerate(qubits)}
    if logical_physical_mapping is None:
        logical_physical_mapping = {q: q for q in positional_logical_mapping.values()}
    phys = [logical_physical_mapping[positional_logical_mapping[i]] for i in range(len(qubits))]
    order = np.argsort(phys)
    new_counts: ct = {}
    for k, vv in counts.items():
        nk = "".join(k[i] for i in order)
        new_counts[nk] = new_counts.get(nk, 0) + vv
    self.use_qubits = sorted(phys)
    return new_counts, sorted(phys)


ReadoutMit.local_miti_readout_circ = _rm_local_miti_readout_circ
ReadoutMit.local_miti_readout_circ_by_mask = _rm_local_miti_readout_circ_by_mask
ReadoutMit.global_miti_readout_circ = _rm_global_miti_readout_circ
ReadoutMit.cals_from_api = _rm_cals_from_api
ReadoutMit.ubs = _rm_ubs
ReadoutMit.newrange = _rm_newrange
ReadoutMit.get_matrix = _rm_get_matrix
ReadoutMit.reduced_cal_matrix = _rm_reduced_cal_matrix
ReadoutMit.mitigate_probability = _rm_mitigate_probability
ReadoutMit.apply_readout_mitigation = _rm_apply_readout_mitigation
ReadoutMit.mapping_preprocess = _rm_mapping_preprocess
