"""``StabilizerCircuit``: Clifford simulator on the self-built tableau engine.

Counterpart of reference ``stabilizercircuit.py`` which wraps stim (C++):
gate-name forwarding (``:69-116``), measurement/sampling/expectation through
the tableau (``:157-347``), entanglement entropy from GF(2) rank (``:406``),
dense ``state()`` materialization (``:117-123``).  Here the engine is
:mod:`tensorcircuit_ng_tpu.core.tableau` — no external C++ dependency.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp

from .. import config
from ..core.tableau import Tableau
from ..core.native_tableau import make_tableau, native_tableau_available, NativeTableau
from .abstractcircuit import AbstractCircuit

#: gate-word name -> Tableau method (x/y/z are *_gate on the tableau)
_TABLEAU_OPS = {"x": "x_gate", "y": "y_gate", "z": "z_gate", "cx": "cnot"}

Tensor = Any

__all__ = ["StabilizerCircuit"]

#: gate name -> tableau method (reference ``gate_map`` ``stabilizercircuit.py:105``)
_GATE_MAP = {
    "h": "h",
    "x": "x_gate",
    "y": "y_gate",
    "z": "z_gate",
    "s": "s",
    "sd": "sd",
    "sdg": "sd",
    "sx": "sx",
    "cnot": "cnot",
    "cx": "cnot",
    "cz": "cz",
    "cy": "cy",
    "swap": "swap",
    "iswap": "iswap",
    "i": None,
}


class StabilizerCircuit(AbstractCircuit):
    """Clifford-only circuit on the CHP tableau."""

    is_stabilizer = True

    def __init__(self, nqubits: int, inputs: Any = None, tableau_inputs: Optional[Tableau] = None) -> None:
        super().__init__()
        if inputs is not None:
            raise ValueError("StabilizerCircuit does not take dense inputs")
        self._nqubits = nqubits
        self._d = 2
        self._tab = (
            tableau_inputs.copy() if tableau_inputs is not None else make_tableau(nqubits)
        )
        self._measure_record: List[int] = []
        #: False once the tableau holds information the QIR cannot replay
        #: (tableau inputs, collapses, unrecorded Cliffords, noise)
        self._replayable = tableau_inputs is None

    def _copy_params(self) -> Dict[str, Any]:
        return {"nqubits": self._nqubits}

    def copy(self) -> "StabilizerCircuit":
        c = StabilizerCircuit(self._nqubits)
        c._tab = self._tab.copy()
        c._qir = [dict(i) for i in self._qir]
        c._measure_record = list(self._measure_record)
        c._replayable = self._replayable
        return c

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
        gname = (name or "").lower()
        gname = self.gate_aliases.get(gname, gname)
        if gname not in _GATE_MAP:
            raise ValueError(
                f"gate {gname!r} is not Clifford / not supported by the tableau engine"
            )
        index = tuple(int(i) % self._nqubits for i in index)
        if ir_dict is None:
            ir_dict = {
                "gatef": None,
                "gate": gate,
                "index": index,
                "name": gname,
                "split": None,
                "mpo": False,
            }
        else:
            ir_dict = dict(ir_dict)
            ir_dict["index"] = index
        self._qir.append(ir_dict)
        meth = _GATE_MAP[gname]
        if meth is not None:
            getattr(self._tab, meth)(*index)

    # named clifford applications without building matrices
    def _apply_gate_instance(self, gatef, *index, name, split=None, **params):
        if params:
            raise ValueError("StabilizerCircuit takes no parameterized gates")
        # broadcast over sequences like the dense engine
        if index and hasattr(index[0], "__iter__"):
            seqs = [list(i) for i in index]
            for pos in range(len(seqs[0])):
                self._apply_gate_instance(
                    gatef, *(s[pos] for s in seqs), name=name, split=split
                )
            return
        self.apply_general_gate(None, *index, name=name)

    #: gate -> inverse sequence in circuit order; each entry is
    #: (gate_name, which-of-the-item's-qubits it acts on)
    _INVERSE_SEQ = {
        "h": (("h", (0,)),),
        "x": (("x", (0,)),),
        "y": (("y", (0,)),),
        "z": (("z", (0,)),),
        "s": (("sd", (0,)),),
        "sd": (("s", (0,)),),
        # sx = H S H  =>  sx† = H S† H (circuit order)
        "sx": (("h", (0,)), ("sd", (0,)), ("h", (0,))),
        "cnot": (("cnot", (0, 1)),),
        "cz": (("cz", (0, 1)),),
        "cy": (("cy", (0, 1)),),
        "swap": (("swap", (0, 1)),),
        # iswap = SWAP; CZ; S_a; S_b  =>  inverse: S†_a; S†_b; CZ; SWAP
        "iswap": (("sd", (0,)), ("sd", (1,)), ("cz", (0, 1)), ("swap", (0, 1))),
        "i": (("i", (0,)),),
    }

    def inverse(self, circuit_params: Optional[Dict[str, Any]] = None) -> "StabilizerCircuit":
        """Adjoint circuit by name-level Clifford inversion (no matrices)."""
        c = StabilizerCircuit(self._nqubits)
        for item in reversed(self._qir):
            name = item["name"]
            seq = self._INVERSE_SEQ.get(name)
            if seq is None:
                raise ValueError(f"no Clifford inverse rule for {name!r}")
            idx = item["index"]
            for g, which in seq:
                getattr(c, g)(*(idx[w] for w in which))
        return c

    # ------------------------------------------------------------------
    # measurement / sampling
    # ------------------------------------------------------------------

    def mid_measurement(self, index: int, keep: int = 0) -> None:
        """Post-select qubit ``index`` on ``keep`` (reference ``mid_measurement``)."""
        self._replayable = False
        out = self._tab.measure(index, status=float(keep))
        # post-selection: if the outcome was deterministic and != keep, the
        # state is inconsistent with the projection
        if out != keep:
            raise ValueError(
                "post-selected outcome has zero probability (deterministic mismatch)"
            )

    post_select = mid_measurement
    mid_measure = mid_measurement

    def cond_measurement(self, index: int, status: Optional[float] = None) -> int:
        self._replayable = False
        out = self._tab.measure(index, status=None if status is None else float(status))
        self._measure_record.append(out)
        return out

    cond_measure = cond_measurement

    def measure(self, *index: int, with_prob: bool = False, status: Optional[Sequence[float]] = None) -> Tuple[Any, float]:
        """Measure listed qubits (collapse on a copy; the circuit is unchanged)."""
        tab = self._tab.copy()
        outs = []
        p = 1.0
        for k, q in enumerate(index):
            st = None if status is None else float(np.asarray(status)[k])
            before_random = tab.is_random(q)
            outs.append(tab.measure(q, status=st))
            if before_random:
                p *= 0.5
        res = np.asarray(outs, dtype=np.int32)
        if with_prob:
            return res, p
        return res, -1.0

    measure_jit = measure

    def sample(
        self,
        batch: Optional[int] = None,
        allow_state: bool = False,
        format: Optional[str] = None,
        random_generator: Optional[Any] = None,
        status: Optional[Tensor] = None,
        **kws: Any,
    ) -> Any:
        nbatch = 1 if batch is None else batch
        if status is None and isinstance(self._tab, NativeTableau):
            # fast path: whole batch sampled inside the C++ engine (the
            # stim-speed role; one tableau copy + n measurements per shot)
            seed = (
                int(random_generator.integers(2**63))
                if hasattr(random_generator, "integers")
                else 0
            )
            samples = self._tab.sample(nbatch, seed=seed).astype(np.int32)
        else:
            if status is None:
                status = np.random.uniform(size=(nbatch, self._nqubits))
            status = np.asarray(status)
            samples = []
            for b in range(nbatch):
                res, p = self.measure(
                    *range(self._nqubits), with_prob=True, status=status[b]
                )
                samples.append(res)
            samples = np.stack(samples)
        if format is None:
            if batch is None:
                return samples[0], -1.0
            return [(samples[b], -1.0) for b in range(nbatch)]
        from .. import quantum as qu
        import jax.numpy as jnp

        idx = qu.sample_bin2int(jnp.asarray(samples), self._nqubits)
        return qu.sample2all(idx, self._nqubits, format=format, jittable=False)

    # ------------------------------------------------------------------
    # expectation
    # ------------------------------------------------------------------

    def expectation_ps(
        self,
        x: Optional[Sequence[int]] = None,
        y: Optional[Sequence[int]] = None,
        z: Optional[Sequence[int]] = None,
        ps: Optional[Sequence[int]] = None,
        **kws: Any,
    ) -> Tensor:
        """Exact ⟨P⟩ via tableau peek (reference ``:249-287``)."""
        import jax.numpy as jnp

        if ps is not None:
            x = [i for i, v in enumerate(ps) if v == 1]
            y = [i for i, v in enumerate(ps) if v == 2]
            z = [i for i, v in enumerate(ps) if v == 3]
        val = self._tab.expectation_pauli(
            tuple(x or ()), tuple(z or ()), tuple(y or ())
        )
        return jnp.asarray(float(val), dtype=jnp.dtype(config.rdtypestr()))

    def expectation(self, *ops: Any, **kws: Any) -> Tensor:
        raise NotImplementedError(
            "StabilizerCircuit supports expectation_ps (Pauli strings) only"
        )

    def sample_expectation_ps(
        self,
        x: Optional[Sequence[int]] = None,
        y: Optional[Sequence[int]] = None,
        z: Optional[Sequence[int]] = None,
        shots: Optional[int] = None,
        status: Optional[Tensor] = None,
        **kws: Any,
    ) -> Tensor:
        import jax.numpy as jnp

        if shots is None:
            return self.expectation_ps(x=x, y=y, z=z)
        c = self.copy()
        for q in x or ():
            c.h(q)  # type: ignore
        for q in y or ():
            c.sd(q)  # type: ignore
            c.h(q)  # type: ignore
        wires = list(x or ()) + list(y or ()) + list(z or ())
        if status is None:
            status = np.random.uniform(size=(shots, self._nqubits))
        acc = 0.0
        for s in range(shots):
            res, _ = c.measure(*wires, status=np.asarray(status)[s][: len(wires)])
            acc += (-1.0) ** int(np.sum(res))
        return jnp.asarray(acc / shots, dtype=jnp.dtype(config.rdtypestr()))

    # ------------------------------------------------------------------
    # state access / info
    # ------------------------------------------------------------------

    def state(self, form: str = "default") -> Tensor:
        """Materialize the dense statevector.

        Replaying the Clifford QIR preserves the exact global phase; when the
        tableau holds non-replayable information (tableau inputs, collapses,
        unrecorded Cliffords, trajectory noise) the state is reconstructed
        from the stabilizer group instead (canonical phase: the anchor basis
        amplitude is made real positive — a stabilizer tableau only defines
        the state up to global phase, as does stim's to_state_vector).
        """
        if self._replayable:
            from .circuit import Circuit

            c = Circuit(self._nqubits)
            for item in self._qir:
                gname = item["name"]
                # skip identity and flagged non-gate instructions (lazy noise
                # fires per shot in sample_detectors; measure/reset/detector
                # records carry no deterministic unitary content).  Unknown
                # GATE names stay loud (AttributeError) rather than silently
                # dropping from the reconstructed state.
                if (
                    gname == "i"
                    or item.get("noise")
                    or item.get("measure")
                    or item.get("reset")
                    or item.get("detector")
                    or item.get("meta")
                    or "index" not in item
                ):
                    continue
                getattr(c, gname)(*item["index"])
            return c.state(form=form)
        psi = self._state_from_tableau()
        if form == "tensor":
            return jnp.reshape(psi, (2,) * self._nqubits)
        return psi

    wavefunction = state

    def _state_from_tableau(self) -> Tensor:
        """|psi> = prod_j (I+g_j)/2 |z*>, anchored on a support basis state.

        z* comes from measuring every qubit on a COPY (status=0 branch);
        the projector product then reconstructs the full superposition with
        correct relative phases (g_j = (-1)^{r_j} prod_q sigma_q from the
        tableau rows, Y where x and z bits are both set).
        """
        from ..core import statevec

        n = self._nqubits
        tab = self._tab.copy()
        zstar = [int(tab.measure(q, status=0.0)) for q in range(n)]
        idx = 0
        for b in zstar:
            idx = idx * 2 + int(b)
        cdt = jnp.dtype(config.dtypestr())
        psi = jnp.zeros(2**n, cdt).at[idx].set(1.0)
        xs, zs, rs = self._tab.stabilizers()
        paulis = {
            (1, 0): np.array([[0, 1], [1, 0]]).astype(cdt),
            (0, 1): np.array([[1, 0], [0, -1]]).astype(cdt),
            (1, 1): np.array([[0, -1j], [1j, 0]]).astype(cdt),
        }
        for j in range(n):
            phi = psi
            for q in range(n):
                key = (int(xs[j, q]), int(zs[j, q]))
                if key in paulis:
                    phi = statevec.apply_unitary(phi, paulis[key], [q])
            if int(rs[j]):
                phi = -phi
            psi = 0.5 * (psi + phi)
        nrm = jnp.linalg.norm(psi)
        psi = psi / nrm.astype(psi.dtype)
        # canonical global phase: anchor amplitude real positive
        anchor = psi[idx]
        phase = anchor / jnp.abs(anchor).astype(psi.dtype)
        return psi * jnp.conj(phase)

    def entanglement_entropy(self, cut: Sequence[int]) -> float:
        """Entropy of region ``cut`` from GF(2) rank (reference ``:406-495``)."""
        return self._tab.entanglement_entropy(list(cut))

    def get_tableau(self) -> Tableau:
        return self._tab

    def current_tableau(self) -> Tableau:
        return self._tab

    def current_simulator(self) -> Tableau:
        """The live tableau engine (reference ``stabilizercircuit.py:382``:
        stim.TableauSimulator; here our CHP tableau plays that role)."""
        return self._tab

    def current_circuit(self) -> str:
        """stim-format program text of the recorded gates (reference :388
        returns a stim.Circuit; the text loads into stim directly)."""
        from ..translation import tc2stim

        return tc2stim(self)

    def current_inverse_tableau(self) -> Tableau:
        """Tableau reached by replaying the inverse circuit on |0…0⟩.

        Reference ``stabilizercircuit.py:400`` returns the inverse *map*
        tableau from stim; our tableau tracks states, so the closest
        equivalent is the state of the inverted program (documented
        deviation).
        """
        inv = self.inverse()
        return inv.get_tableau()

    def cond_measure_many(self, *index: int) -> Any:
        """Measure several qubits in Z basis, collapsing in place (ref :211)."""
        outs = [self.cond_measurement(q) for q in index]
        return np.asarray(outs, dtype=np.int32)

    def random_gate(self, *index: int, recorded: bool = False) -> None:
        """Apply a random Clifford on ``index`` (not recorded in QIR).

        Reference ``stabilizercircuit.py:125`` uses ``stim.Tableau.random``
        (uniform over the Clifford group); here the gate is a long random
        word in {H, S, CX} on the chosen qubits — full-support but not
        exactly Haar-on-Clifford (documented deviation).
        """
        rng = np.random.default_rng()
        m = len(index)
        ops: List[Tuple[str, Tuple[int, ...]]] = []
        for _ in range(20 * m + 12):
            choice = rng.integers(0, 3 if m > 1 else 2)
            if choice == 0:
                ops.append(("h", (int(rng.integers(m)),)))
            elif choice == 1:
                ops.append(("s", (int(rng.integers(m)),)))
            else:
                a, b = rng.choice(m, size=2, replace=False)
                ops.append(("cnot", (int(a), int(b))))
        self.tableau_gate(*index, tableau=ops, recorded=recorded)

    def tableau_gate(self, *index: int, tableau: Any, recorded: bool = False) -> None:
        """Apply a Clifford given as a gate word to ``index`` (not in QIR).

        ``tableau`` is a sequence of ``(name, local_indices)`` pairs over the
        local qubits 0..len(index)-1 (reference :141 takes a stim.Tableau;
        the gate-word form is the portable equivalent without stim).
        """
        if not recorded:
            self._replayable = False
        for name, local in tableau:
            target = tuple(index[i] for i in local)
            getattr(self._tab, _TABLEAU_OPS.get(name, name))(*target)
        if recorded:
            for name, local in tableau:
                self._qir.append(
                    {
                        "name": name,
                        "index": tuple(index[i] for i in local),
                        "gatef": None,
                        "untracked": True,
                    }
                )

    # ------------------------------------------------------------------
    # QEC program instructions (stim-style): lazy noise + measurement +
    # detector records, replayed per shot by sample_detectors (the role the
    # reference delegates to stim / its ZX StabilizerTCircuit)
    # ------------------------------------------------------------------

    def measure_instruction(self, *qubits: int) -> List[int]:
        """stim ``M``: measure now AND record the instruction for resampling."""
        self._qir.append({"name": "m", "index": tuple(int(q) for q in qubits), "measure": True})
        return [self.cond_measurement(q) for q in qubits]

    m_instruction = measure_instruction

    def reset_instruction(self, *qubits: int) -> None:
        """stim ``R``: reset to |0> (recorded for resampling)."""
        self._qir.append({"name": "r", "index": tuple(int(q) for q in qubits), "reset": True})
        for q in qubits:
            out = self.cond_measurement(q)
            self._measure_record.pop()  # resets don't enter the record
            if out == 1:
                self._tab.x_gate(q)

    def _noise_instruction(self, name: str, qubits: Sequence[int], p: float) -> None:
        self._qir.append(
            {"name": name, "index": tuple(int(q) for q in qubits), "p": float(p), "noise": True}
        )

    def x_error(self, *qubits: int, p: float) -> None:
        self._noise_instruction("x_error", qubits, p)

    def y_error(self, *qubits: int, p: float) -> None:
        self._noise_instruction("y_error", qubits, p)

    def z_error(self, *qubits: int, p: float) -> None:
        self._noise_instruction("z_error", qubits, p)

    def depolarize1(self, *qubits: int, p: float) -> None:
        self._noise_instruction("depolarize1", qubits, p)

    def depolarize2(self, *qubits: int, p: float) -> None:
        """Two-qubit depolarizing on consecutive pairs (stim DEPOLARIZE2)."""
        if len(qubits) % 2:
            raise ValueError("depolarize2 needs an even number of qubits")
        self._noise_instruction("depolarize2", qubits, p)

    def detector(self, *rec: int) -> None:
        """stim ``DETECTOR``: XOR of measurement-record offsets (negative)."""
        self._qir.append({"name": "detector", "rec": tuple(int(r) for r in rec), "meta": True})

    def observable_include(self, *rec: int, idx: int = 0) -> None:
        self._qir.append(
            {"name": "observable", "rec": tuple(int(r) for r in rec), "obs_idx": int(idx), "meta": True}
        )

    def sample_detectors(
        self, shots: int, seed: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Monte-Carlo detector/observable samples [shots, n_det], [shots, n_obs].

        Replays the recorded program per shot with fresh noise and
        measurement randomness on the (native) tableau — the stim
        detector-sampling workflow (reference rides stim / ZX
        ``sample_detectors``, ``zx/stabilizertcircuit.py:251``).
        """
        from ..core.native_tableau import make_tableau

        rng = np.random.default_rng(seed)
        det_items = [d for d in self._qir if d.get("meta") and d["name"] == "detector"]
        obs_items = [d for d in self._qir if d.get("meta") and d["name"] == "observable"]
        n_obs = 1 + max((d["obs_idx"] for d in obs_items), default=-1)
        dets = np.zeros((shots, len(det_items)), dtype=np.uint8)
        obs = np.zeros((shots, n_obs), dtype=np.uint8)
        paulis1 = ("x_gate", "y_gate", "z_gate")
        for s in range(shots):
            tab = make_tableau(self._nqubits)
            record: List[int] = []
            di = 0
            for item in self._qir:
                if item.get("measure"):
                    for q in item["index"]:
                        record.append(tab.measure(q, status=rng.random()))
                elif item.get("reset"):
                    for q in item["index"]:
                        if tab.measure(q, status=rng.random()) == 1:
                            tab.x_gate(q)
                elif item.get("noise"):
                    nm, pp = item["name"], item["p"]
                    if nm == "depolarize2":
                        qs = item["index"]
                        for g in range(0, len(qs), 2):
                            if rng.random() < pp:
                                w = int(rng.integers(1, 16))  # 15 non-identity pairs
                                pa, pb = w // 4, w % 4
                                if pa:
                                    getattr(tab, paulis1[pa - 1])(qs[g])
                                if pb:
                                    getattr(tab, paulis1[pb - 1])(qs[g + 1])
                        continue
                    for q in item["index"]:
                        if rng.random() >= pp:
                            continue
                        if nm == "x_error":
                            tab.x_gate(q)
                        elif nm == "y_error":
                            tab.y_gate(q)
                        elif nm == "z_error":
                            tab.z_gate(q)
                        else:  # depolarize1
                            getattr(tab, paulis1[int(rng.integers(3))])(q)
                elif item.get("meta"):
                    bits = [record[r] for r in item["rec"]]
                    val = int(np.bitwise_xor.reduce(bits)) if bits else 0
                    if item["name"] == "detector":
                        dets[s, di] = val
                        di += 1
                    else:
                        obs[s, item["obs_idx"]] ^= val
                else:
                    meth = _GATE_MAP.get(item.get("name", ""))
                    if meth is not None:
                        getattr(tab, meth)(*item["index"])
        return dets, obs

    # convenience noise: random Pauli (for QEC-style circuits)
    def depolarizing(self, *index: int, p: float = 0.0, status: Optional[Any] = None) -> None:
        """Trajectory depolarizing: applies a random Pauli with prob p per qubit."""
        rng_vals = (
            np.asarray(status)
            if status is not None
            else np.random.uniform(size=len(index))
        )
        for k, q in enumerate(index):
            r = float(np.asarray(rng_vals).reshape(-1)[k])
            if r < p:
                which = int(r / p * 3)  # uniform over x, y, z
                self._replayable = False
                [self._tab.x_gate, self._tab.y_gate, self._tab.z_gate][which](q)
