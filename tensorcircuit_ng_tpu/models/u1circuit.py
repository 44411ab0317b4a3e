"""``U1Circuit``: particle-number-conserving simulator in a fixed sector.

Counterpart of reference ``u1circuit.py``: the state is a dense C(n, k)
vector over the Hamming-weight-k bitstring basis (sorted int64 array,
``u1circuit.py:218-305``); diagonal gates act by bit masks (``:334-416``),
number-conserving two-site gates mix the 01/10 pairs, and general gates are
validated for number conservation (``:418-501``).  All index maps are built
host-side (static numpy), so applications are gathers/scatters that jit/vmap
cleanly on TPU.
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from .abstractcircuit import AbstractCircuit

Tensor = Any

__all__ = ["U1Circuit"]


def _sector_basis(n: int, k: int) -> np.ndarray:
    states = []
    for comb in itertools.combinations(range(n), k):
        v = 0
        for q in comb:
            v |= 1 << (n - 1 - q)
        states.append(v)
    return np.asarray(sorted(states), dtype=np.int64)


class U1Circuit(AbstractCircuit):
    """Simulator restricted to the Hamming-weight-k U(1) sector."""

    def __init__(
        self,
        nqubits: int,
        filled: Optional[Sequence[int]] = None,
        inputs: Optional[Tensor] = None,
        k: Optional[int] = None,
    ) -> None:
        super().__init__()
        if nqubits > 62:
            raise ValueError("U1Circuit supports at most 62 qubits (int64 masks)")
        self._nqubits = nqubits
        self._d = 2
        if filled is not None:
            k = len(filled)
        if k is None:
            raise ValueError("provide filled=[...] or k=")
        self.k = k
        self._filled = list(filled) if filled is not None else None
        self.basis = _sector_basis(nqubits, k)
        dim = len(self.basis)
        dt = jnp.dtype(config.dtypestr())
        if inputs is not None:
            self._state = jnp.reshape(jnp.asarray(inputs).astype(dt), (dim,))
        else:
            v = 0
            for q in filled or range(k):
                v |= 1 << (nqubits - 1 - q)
            idx = int(np.searchsorted(self.basis, v))
            assert self.basis[idx] == v
            s = jnp.zeros((dim,), dtype=dt)
            self._state = s.at[idx].set(1.0)

    @property
    def sector_dim(self) -> int:
        return len(self.basis)

    def _bit(self, q: int) -> np.ndarray:
        return ((self.basis >> (self._nqubits - 1 - q)) & 1).astype(np.int64)

    # ------------------------------------------------------------------
    # gate application
    # ------------------------------------------------------------------

    def apply_general_gate(
        self,
        gate: Any,
        *index: int,
        name: Optional[str] = None,
        split: Optional[Dict[str, Any]] = None,
        mpo: bool = False,
        ir_dict: Optional[Dict[str, Any]] = None,
    ) -> None:
        """General gate application with number-conservation validation."""
        from ..ops.gates import Gate

        index = tuple(int(i) % self._nqubits for i in index)
        if isinstance(gate, Gate):
            m = gate.matrix()
        else:
            m = jnp.asarray(gate)
            dim = int(round(2 ** len(index)))
            m = jnp.reshape(m, (dim, dim))
        self._qir.append(
            ir_dict
            or {
                "gatef": None,
                "gate": gate,
                "index": index,
                "name": name or "any",
                "split": None,
                "mpo": False,
            }
        )
        kk = len(index)
        m_np = None
        try:
            m_np = np.asarray(m)
        except Exception:
            pass
        if m_np is not None:
            # validate number conservation: matrix elements between different
            # weight sectors must vanish
            for a in range(2**kk):
                for b in range(2**kk):
                    if bin(a).count("1") != bin(b).count("1") and abs(m_np[a, b]) > 1e-9:
                        raise ValueError(
                            "gate is not particle-number conserving on its support"
                        )
        self._apply_sector_gate(m, index)

    def _apply_sector_gate(self, m: Tensor, index: Tuple[int, ...]) -> None:
        """Apply a number-conserving gate via host-built index maps."""
        kk = len(index)
        nloc = 2**kk
        # local code of each basis state on the support
        codes = np.zeros(len(self.basis), dtype=np.int64)
        for pos, q in enumerate(index):
            codes = codes * 2 + self._bit(q)
        # target basis index for replacing the support code: only
        # weight-preserving replacements exist inside the sector
        base_wo = self.basis.copy()
        for pos, q in enumerate(index):
            base_wo &= ~(1 << (self._nqubits - 1 - q))
        targets = np.full((len(self.basis), nloc), -1, dtype=np.int64)
        for b in range(nloc):
            v = base_wo.copy()
            for pos, q in enumerate(index):
                if (b >> (kk - 1 - pos)) & 1:
                    v |= 1 << (self._nqubits - 1 - q)
            pos_idx = np.searchsorted(self.basis, v)
            pos_idx = np.clip(pos_idx, 0, len(self.basis) - 1)
            valid = self.basis[pos_idx] == v
            targets[:, b] = np.where(valid, pos_idx, -1)
        codes_j = jnp.asarray(codes)
        targets_j = jnp.asarray(np.where(targets < 0, 0, targets))
        valid_j = jnp.asarray(targets >= 0)
        m = jnp.asarray(m).astype(self._state.dtype)
        # new_state[t] += m[b, code[s]] * state[s]  where t = targets[s, b]
        contrib = m.T[codes_j]  # [S, nloc]: contrib[s, b] = m[b, codes[s]]
        contrib = contrib * self._state[:, None]
        contrib = jnp.where(valid_j, contrib, 0.0)
        new = jnp.zeros_like(self._state)
        new = new.at[jnp.reshape(targets_j, (-1,))].add(jnp.reshape(contrib, (-1,)))
        self._state = new

    # fast diagonal gates (reference ``:334-416``) -----------------------

    def _apply_phase(self, phase: Tensor) -> None:
        self._state = self._state * phase

    def rz(self, q: int, theta: Any = 0) -> None:
        dt = self._state.dtype
        theta = jnp.asarray(theta).astype(dt)
        b = jnp.asarray(self._bit(q), dtype=dt)
        self._apply_phase(jnp.exp(-1j * theta / 2) * jnp.exp(1j * theta * b))
        self._qir.append({"gatef": None, "gate": None, "index": (q,), "name": "rz", "parameters": {"theta": theta}})

    def rzz(self, i: int, j: int, theta: Any = 0) -> None:
        dt = self._state.dtype
        theta = jnp.asarray(theta).astype(dt)
        zz = jnp.asarray((1 - 2 * self._bit(i)) * (1 - 2 * self._bit(j)), dtype=dt)
        self._apply_phase(jnp.exp(-1j * theta / 2 * zz))
        self._qir.append({"gatef": None, "gate": None, "index": (i, j), "name": "rzz", "parameters": {"theta": theta}})

    def cz(self, i: int, j: int) -> None:
        dt = self._state.dtype
        both = jnp.asarray(self._bit(i) * self._bit(j), dtype=dt)
        self._apply_phase(1.0 - 2.0 * both)
        self._qir.append({"gatef": None, "gate": None, "index": (i, j), "name": "cz"})

    def cphase(self, i: int, j: int, theta: Any = 0) -> None:
        dt = self._state.dtype
        theta = jnp.asarray(theta).astype(dt)
        both = jnp.asarray(self._bit(i) * self._bit(j), dtype=dt)
        self._apply_phase(jnp.exp(1j * theta * both))
        self._qir.append({"gatef": None, "gate": None, "index": (i, j), "name": "cphase", "parameters": {"theta": theta}})

    def z(self, q: int) -> None:
        dt = self._state.dtype
        b = jnp.asarray(self._bit(q), dtype=dt)
        self._apply_phase(1.0 - 2.0 * b)
        self._qir.append({"gatef": None, "gate": None, "index": (q,), "name": "z"})

    # ------------------------------------------------------------------
    # readout
    # ------------------------------------------------------------------

    def state(self, form: str = "default") -> Tensor:
        return self._state

    wavefunction = state

    def to_dense(self) -> Tensor:
        """Embed the sector vector into the full 2^n space (reference ``:640``)."""
        full = jnp.zeros((2**self._nqubits,), dtype=self._state.dtype)
        return full.at[jnp.asarray(self.basis)].set(self._state)

    def probability(self) -> Tensor:
        return jnp.real(jnp.conj(self._state) * self._state)

    def expectation_ps(
        self,
        x: Optional[Sequence[int]] = None,
        y: Optional[Sequence[int]] = None,
        z: Optional[Sequence[int]] = None,
        **kws: Any,
    ) -> Tensor:
        """Pauli expectation; X/Y strings must be number-conserving pairs."""
        if not x and not y:
            val = self._state
            phase = jnp.ones_like(jnp.real(val))
            for q in z or ():
                phase = phase * (1.0 - 2.0 * jnp.asarray(self._bit(q), dtype=phase.dtype))
            return jnp.sum(jnp.real(jnp.conj(val) * val) * phase).astype(self._state.dtype)
        # general string via dense embedding (small n fallback)
        from .circuit import Circuit

        c = Circuit(self._nqubits, inputs=self.to_dense())
        return c.expectation_ps(x=x, y=y, z=z)

    def expectation_two_body(self, i: int, j: int) -> Tensor:
        r"""⟨c_i† c_j⟩-style hopping expectation (XX+YY)/2 + i(XY-YX)/2 sector op."""
        m = np.zeros((4, 4), dtype=complex)
        m[1, 2] = 1.0  # |01><10| on (i, j): moves particle j -> i
        c2 = self.copy()
        c2._apply_sector_gate(jnp.asarray(m), (int(i), int(j)))
        return jnp.vdot(self._state, c2._state)

    def entanglement_entropy(self, cut: Sequence[int]) -> Tensor:
        """Entropy of the qubit subset via sector-resolved Schmidt blocks."""
        from .. import quantum as qu

        dense = self.to_dense()
        other = [q for q in range(self._nqubits) if q not in set(cut)]
        rho = qu.reduced_density_matrix(dense, other)
        return qu.entropy(rho)

    def copy(self) -> "U1Circuit":
        c = U1Circuit(self._nqubits, k=self.k, inputs=self._state)
        c._qir = [dict(i) for i in self._qir]
        return c

    # ------------------------------------------------------------------
    # reference-parity readout (u1circuit.py:502-1100)
    # ------------------------------------------------------------------

    def expectation_z(self, i: int) -> Tensor:
        """⟨Z_i⟩ from bit masks, no dense embedding (reference ``:502``)."""
        p = jnp.real(jnp.conj(self._state) * self._state)
        zv = 1.0 - 2.0 * jnp.asarray(self._bit(i), dtype=p.dtype)
        return jnp.sum(p * zv)

    def expectation_pss(self, ps_list: Sequence[Any], coefficients: Any) -> Tensor:
        """Σ_j c_j ⟨P_j⟩ over the sector state (reference ``u1circuit.py:1036``)."""
        coefficients = jnp.asarray(coefficients)
        acc = None
        for j, ps in enumerate(ps_list):
            if isinstance(ps, dict):
                x, y, z = ps.get("x"), ps.get("y"), ps.get("z")
            else:
                x = [q for q, v in enumerate(ps) if v == 1]
                y = [q for q, v in enumerate(ps) if v == 2]
                z = [q for q, v in enumerate(ps) if v == 3]
            ev = self.expectation_ps(x=x, y=y, z=z)
            if not jnp.issubdtype(jnp.asarray(coefficients).dtype, jnp.complexfloating):
                ev = jnp.real(ev)  # complex->real astype raises in newer jax
            term = coefficients[j] * ev.astype(coefficients.dtype)
            acc = term if acc is None else acc + term
        return acc

    def probability_full(self) -> Tensor:
        """Probability vector over the full 2^n basis (reference ``:675``)."""
        dense = self.to_dense()
        return jnp.real(jnp.conj(dense) * dense)

    def measure(
        self,
        *index: int,
        with_prob: bool = False,
        status: Optional[Tensor] = None,
    ) -> Tuple[Tensor, Any]:
        """Sample the register once, return the bits at ``index`` (ref :763)."""
        from ..backend import backend as K
        from .. import quantum as qu

        p = self.probability()
        p = p / jnp.sum(p)
        idx = K.probability_sample(1, p, status=status)
        full_idx = jnp.asarray(self.basis)[idx]
        bits = qu.sample_int2bin(full_idx, self._nqubits)[0]
        sel = bits[jnp.asarray([int(q) for q in index])]
        if with_prob:
            return sel, p[idx[0]]
        return sel, -1.0

    measure_jit = measure

    def reduced_density_matrix(
        self,
        subsystem_to_keep: Optional[Sequence[int]] = None,
        subsystem_to_traceout: Optional[Sequence[int]] = None,
        return_blocks: bool = False,
    ) -> Any:
        """ρ_A over kept qubits; optionally the charge-sector blocks.

        Reference ``u1circuit.py:873``: a number-conserving state's ρ_A is
        block-diagonal in the subsystem charge k_A; ``return_blocks`` returns
        the list of (k_A-sector) blocks instead of the embedded matrix.
        """
        from .. import quantum as qu

        n = self._nqubits
        if subsystem_to_keep is None and subsystem_to_traceout is None:
            raise ValueError("specify one of subsystem_to_keep / subsystem_to_traceout")
        if subsystem_to_keep is not None:
            keep = list(subsystem_to_keep)
            traceout = [q for q in range(n) if q not in set(keep)]
        else:
            traceout = list(subsystem_to_traceout)
            keep = [q for q in range(n) if q not in set(traceout)]
        rho = qu.reduced_density_matrix(self.to_dense(), traceout)
        if not return_blocks:
            return rho
        # split into charge sectors of the kept register
        m = len(keep)
        blocks = []
        for ka in range(m + 1):
            inds = qu.u1_inds(m, ka).astype(np.int32)
            blocks.append(rho[np.ix_(inds, inds)])
        return blocks

    def _copy_params(self) -> Dict[str, Any]:
        # inverse()/copy() rebuild in the SAME particle-number sector
        return {"nqubits": self._nqubits, "filled": self._filled, "k": self.k}

    def sample(
        self,
        batch: Optional[int] = None,
        status: Optional[Tensor] = None,
        format: Optional[str] = None,
        **kws: Any,
    ) -> Any:
        from ..backend import backend as K
        from .. import quantum as qu

        nbatch = 1 if batch is None else batch
        p = self.probability()
        p = p / jnp.sum(p)
        if status is not None and jnp.asarray(status).ndim == 2:
            # accept the trajectory-path convention [batch, n]: the sector
            # sampler needs one uniform per shot (same rule as the dense path)
            status = jnp.asarray(status)[:, 0]
        idx = K.probability_sample(nbatch, p, status=status)
        full_idx = jnp.asarray(self.basis)[idx]
        if format is None:
            bins = qu.sample_int2bin(full_idx, self._nqubits)
            if batch is None:
                return bins[0], -1.0
            return [(bins[b], -1.0) for b in range(nbatch)]
        return qu.sample2all(full_idx, self._nqubits, format=format, jittable=False)


class U1Operator:
    """Number-conserving operator in a fixed-k sector basis.

    Reference ``u1circuit.py U1Operator``: holds the sector-projected matrix
    of a Pauli-string sum for fast repeated expectations.
    """

    def __init__(self, n: int, k: int, ps_list: Sequence[Any], coefficients: Any):
        self.n = n
        self.k = k
        from .. import quantum as qu

        inds = qu.u1_inds(n, k).astype(np.int64)
        ls = []
        for ps in ps_list:
            if isinstance(ps, dict):
                ps = qu.xyz2ps(ps, n)
            ls.append([int(v) for v in ps])
        dense = np.asarray(qu.PauliStringSum2Dense(ls, list(np.asarray(coefficients)), numpy=True))
        self.matrix = jnp.asarray(dense[np.ix_(inds, inds)])

    def __call__(self, state: Any) -> Any:
        return self.matrix @ jnp.asarray(state)

    matvec = __call__

    def expectation(self, state: Any) -> Any:
        s = jnp.asarray(state)
        return jnp.vdot(s, self.matrix @ s)


__all__ = ["U1Circuit", "U1Operator"]
