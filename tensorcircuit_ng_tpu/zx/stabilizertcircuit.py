"""Stabilizer+T circuits with Pauli noise: exact conditional sampling.

Counterpart of reference ``zx/stabilizertcircuit.py`` (tsim-derived).  The
algorithmic contract is preserved: noise is sampled in a reduced error basis
(:class:`~tensorcircuit_ng_tpu.zx.noise_model.ChannelSampler`), and —
conditioned on each error pattern — measurement outcomes are drawn EXACTLY
by the chain rule, so rare-outcome statistics need no extra trajectories.
The conditional probabilities are evaluated by the TPU dense engine
(vmapped over the shot batch, one XLA program per batch) instead of pyzx
scalar-diagram reduction; arbitrary-angle rotations therefore work too, not
just Clifford+T.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..models.abstractcircuit import AbstractCircuit
from ..ops import gates as gates_mod
from .converter import prepare_graph, build_sampling_graph, GATE_TABLE
from .noise_model import ChannelSampler
from .scalar_graph import (
    CompiledComponent,
    CompiledProgram,
    compile_program,
)

Tensor = Any

__all__ = ["StabilizerTCircuit", "sample_component", "sample_program"]


def sample_component(
    comp: CompiledComponent, f_params: Any, key: Any
) -> Tuple[Any, Any, Any]:
    """Exact chain-rule sampling of one component's outputs.

    Reference ``zx/stabilizertcircuit.py:37``; uses the component's fused
    ``sample_fn`` (one traced program) when present, else the per-output
    scalar graphs.
    """
    batch = f_params.shape[0]
    key, sub = jax.random.split(key)
    if comp.sample_fn is not None:
        num_u = max(len(comp.compiled_scalar_graphs) - 1, 1)
        uniforms = jax.random.uniform(sub, (batch, _raw_records_of(comp)))
        f_sel = f_params[:, comp.f_selection]
        bits = jax.vmap(comp.sample_fn)(jnp.asarray(f_sel), uniforms)
        return bits.astype(jnp.bool_), key, jnp.asarray(0.0)
    # scalar-graph route (reference algorithm verbatim shape)
    num_outputs = len(comp.compiled_scalar_graphs) - 1
    f_sel = jnp.asarray(f_params[:, comp.f_selection], dtype=jnp.float32)
    m_acc = jnp.zeros((batch, num_outputs), dtype=jnp.float32)
    prev = jnp.abs(comp.compiled_scalar_graphs[0].eval(f_sel))
    ones = jnp.ones((batch, 1), dtype=jnp.float32)
    for i, graph in enumerate(comp.compiled_scalar_graphs[1:]):
        params = jnp.hstack([f_sel, m_acc[:, :i], ones])
        p1 = jnp.abs(graph.eval(params))
        key, sub = jax.random.split(key)
        bits = jax.random.bernoulli(sub, p=jnp.clip(p1 / jnp.maximum(prev, 1e-30), 0, 1))
        m_acc = m_acc.at[:, i].set(bits.astype(jnp.float32))
        prev = jnp.where(bits, p1, prev - p1)
    return m_acc.astype(jnp.bool_), key, jnp.asarray(0.0)


def _raw_records_of(comp: CompiledComponent) -> int:
    return getattr(comp, "_raw_records", len(comp.compiled_scalar_graphs) - 1)


def sample_program(program: CompiledProgram, f_params: Any, key: Any) -> Any:
    """Sample every component and reassemble outputs in circuit order."""
    results = []
    for comp in program.components:
        s, key, _ = sample_component(comp, f_params, key)
        results.append(s)
    if not results:
        return jnp.zeros((f_params.shape[0], len(program.output_order)), dtype=jnp.bool_)
    combined = jnp.concatenate(results, axis=1)
    order = np.argsort(np.asarray(program.output_order))
    return combined[:, order]


class StabilizerTCircuit(AbstractCircuit):
    """Noisy Clifford+T (and beyond) circuit with exact-outcome sampling."""

    def __init__(self, nqubits: int, seed: Optional[int] = None, strategy: str = "dense"):
        self._nqubits = nqubits
        self._qir: List[Dict[str, Any]] = []
        self._extra_qir: List[Dict[str, Any]] = []
        self._tape: List[Dict[str, Any]] = []
        if seed is None:
            seed = int(np.random.default_rng().integers(0, 2**30))
        self._seed = seed
        self._key = jax.random.key(seed)
        self.strategy = strategy
        self._cache: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @property
    def nqubits(self) -> int:
        return self._nqubits

    def _invalidate(self) -> None:
        self._cache = {}

    def _record_gate(self, name: str, matrix: Any, *index: int) -> None:
        self._tape.append(
            {
                "kind": "gate",
                "name": name,
                "index": tuple(int(q) % self._nqubits for q in index),
                "matrix": np.asarray(matrix, dtype=np.complex64),
            }
        )
        self._qir.append({"name": name, "index": tuple(index), "gatef": None})
        self._invalidate()

    def apply_general_gate(self, gate: Any, *index: int, name: Optional[str] = None, **kws: Any) -> None:
        m = gate.matrix() if hasattr(gate, "matrix") else np.asarray(gate)
        self._record_gate(name or getattr(gate, "name", "any"), m, *index)

    def apply(self, gate: Any, *index: int, **kws: Any) -> None:
        self.apply_general_gate(gate, *index, **kws)

    def __getattr__(self, name: str) -> Any:
        lname = name.lower()
        if lname in gates_mod.GATES:
            gf = gates_mod.GATES[lname]

            def wrapper(*index: int, **kws: Any) -> None:
                g = gf(**kws) if kws else gf()
                self._record_gate(lname, g.matrix(), *index)

            return wrapper
        raise AttributeError(name)

    # explicit Clifford+T names (reference surface)
    def h(self, q: int) -> None:
        self._record_gate("h", gates_mod.GATES["h"]().matrix(), q)

    def x(self, q: int) -> None:
        self._record_gate("x", np.array([[0, 1], [1, 0]]), q)

    def y(self, q: int) -> None:
        self._record_gate("y", np.array([[0, -1j], [1j, 0]]), q)

    def z(self, q: int) -> None:
        self._record_gate("z", np.diag([1.0, -1.0]), q)

    def s(self, q: int) -> None:
        self._record_gate("s", np.diag([1.0, 1.0j]), q)

    def sd(self, q: int) -> None:
        self._record_gate("sd", np.diag([1.0, -1.0j]), q)

    sdg = sd

    def t(self, q: int) -> None:
        self._record_gate("t", np.diag([1.0, np.exp(0.25j * np.pi)]), q)

    def td(self, q: int) -> None:
        self._record_gate("td", np.diag([1.0, np.exp(-0.25j * np.pi)]), q)

    tdg = td

    def cnot(self, c: int, t: int) -> None:
        m = np.eye(4)[[0, 1, 3, 2]]
        self._record_gate("cx", m, c, t)

    cx = cnot

    def cz(self, a: int, b: int) -> None:
        self._record_gate("cz", np.diag([1.0, 1.0, 1.0, -1.0]), a, b)

    def cy(self, a: int, b: int) -> None:
        m = np.eye(4, dtype=complex)
        m[2:, 2:] = np.array([[0, -1j], [1j, 0]])
        self._record_gate("cy", m, a, b)

    def swap(self, a: int, b: int) -> None:
        self._record_gate("swap", np.eye(4)[[0, 2, 1, 3]], a, b)

    def rx(self, q: int, theta: float = 0) -> None:
        c, s = math.cos(theta / 2), math.sin(theta / 2)
        self._record_gate("rx", np.array([[c, -1j * s], [-1j * s, c]]), q)

    def ry(self, q: int, theta: float = 0) -> None:
        c, s = math.cos(theta / 2), math.sin(theta / 2)
        self._record_gate("ry", np.array([[c, -s], [s, c]]), q)

    def rz(self, q: int, theta: float = 0) -> None:
        self._record_gate("rz", np.diag([np.exp(-0.5j * theta), np.exp(0.5j * theta)]), q)

    # ------------------------------------------------------------------
    # noise / instructions (stim vocabulary)
    # ------------------------------------------------------------------

    def _record_channel(self, channel: str, index: Tuple[int, ...], params: Sequence[float], **extra: Any) -> None:
        self._tape.append(
            {"kind": "channel", "channel": channel, "index": tuple(index), "params": list(params), **extra}
        )
        self._invalidate()

    def depolarizing(self, q: int, px: float, py: float, pz: float) -> None:
        self._record_channel("pauli1", (q,), [px, py, pz])

    def pauli(self, q: int, px: float, py: float, pz: float) -> None:
        self._record_channel("pauli1", (q,), [px, py, pz])

    def pauli_instruction(self, q: int, px: float = 0, py: float = 0, pz: float = 0) -> None:
        self._record_channel("pauli1", (q,), [px, py, pz])

    def depolarizing_instruction(self, q: int, p: float) -> None:
        self._record_channel("pauli1", (q,), [p / 3, p / 3, p / 3])

    def depolarize1(self, *qubits: int, p: float) -> None:
        for q in qubits:
            self._record_channel("pauli1", (q,), [p / 3, p / 3, p / 3])

    def depolarizing2(self, q1: int, q2: int, p: float) -> None:
        probs = [p / 15.0] * 15
        self._record_channel("pauli2", (q1, q2), probs)

    def depolarizing2_instruction(self, q1: int, q2: int, p: float) -> None:
        self.depolarizing2(q1, q2, p)

    def depolarize2(self, *qubits: int, p: float) -> None:
        for a, b in zip(qubits[::2], qubits[1::2]):
            self.depolarizing2(a, b, p)

    def x_error(self, *qubits: int, p: float) -> None:
        for q in qubits:
            self._record_channel("x", (q,), [p])

    def y_error(self, *qubits: int, p: float) -> None:
        for q in qubits:
            self._record_channel("y", (q,), [p])

    def z_error(self, *qubits: int, p: float) -> None:
        for q in qubits:
            self._record_channel("z", (q,), [p])

    def correlated_error(self, targets: Sequence[Tuple[int, str]], probabilities: Sequence[float]) -> None:
        self._record_channel("correlated", tuple(q for q, _ in targets), list(probabilities), targets=list(targets))

    # measurement / reset

    def _record_measure(self, q: int, basis: str, reset: bool, p: float, hidden: bool = False) -> None:
        self._tape.append(
            {"kind": "measure", "index": (int(q),), "basis": basis, "reset": reset, "p": p, "hidden": hidden}
        )
        self._invalidate()

    def measure_instruction(self, *qubits: int, p: float = 0) -> None:
        for q in qubits:
            self._record_measure(q, "z", False, p)

    def m(self, *qubits: int, p: float = 0) -> None:
        self.measure_instruction(*qubits, p=p)

    def mx(self, q: int, p: float = 0) -> None:
        self._record_measure(q, "x", False, p)

    def my(self, q: int, p: float = 0) -> None:
        self._record_measure(q, "y", False, p)

    def mr_instruction(self, *qubits: int, p: float = 0) -> None:
        for q in qubits:
            self._record_measure(q, "z", True, p)

    def mrx_instruction(self, q: int, p: float = 0) -> None:
        self._record_measure(q, "x", True, p)

    def mry_instruction(self, q: int, p: float = 0) -> None:
        self._record_measure(q, "y", True, p)

    def mrz_instruction(self, q: int, p: float = 0) -> None:
        self._record_measure(q, "z", True, p)

    def reset_z(self, *qubits: int, p: float = 0) -> None:
        for q in qubits:
            self._tape.append({"kind": "reset", "index": (int(q),), "basis": "z"})
        self._invalidate()

    def reset_x(self, *qubits: int) -> None:
        for q in qubits:
            self._tape.append({"kind": "reset", "index": (int(q),), "basis": "x"})
        self._invalidate()

    def reset_y(self, *qubits: int) -> None:
        for q in qubits:
            self._tape.append({"kind": "reset", "index": (int(q),), "basis": "y"})
        self._invalidate()

    def r(self, q: int, p: float = 0) -> None:
        self.reset_z(q)

    def reset_instruction(self, *qubits: int) -> None:
        self.reset_z(*qubits)

    def detector_instruction(self, *records: int) -> None:
        self._tape.append({"kind": "detector", "records": tuple(records)})
        self._invalidate()

    detector = detector_instruction

    def observable_instruction(self, *records: int, idx: int = 0) -> None:
        self._tape.append({"kind": "observable", "records": tuple(records), "idx": idx})
        self._invalidate()

    def observable_include(self, *records: int, idx: int = 0) -> None:
        self.observable_instruction(*records, idx=idx)

    def qubit_coords_instruction(self, qubit: int, coords: Sequence[float]) -> None:
        self._tape.append({"kind": "coords", "index": (qubit,), "coords": list(coords)})

    def tick_instruction(self) -> None:
        self._tape.append({"kind": "tick"})

    # ------------------------------------------------------------------
    # construction from other representations
    # ------------------------------------------------------------------

    @classmethod
    def from_circuit(cls, circuit: Any, strategy: str = "dense") -> "StabilizerTCircuit":
        """Lift any AbstractCircuit's QIR into a StabilizerTCircuit."""
        c = cls(circuit._nqubits, strategy=strategy)
        for item in circuit.to_qir():
            gate = item.get("gate")
            if gate is None and item.get("gatef") is not None:
                gate = item["gatef"](**(item.get("parameters") or {}))
            c._record_gate(item.get("name") or "any", gate.matrix(), *item["index"])
        return c

    @classmethod
    def from_stim_str(cls, stim_str: str) -> "StabilizerTCircuit":
        from ..translation import stim2tc

        return stim2tc(stim_str, circuit_class=cls)

    @classmethod
    def from_stim_circuit(cls, stim_circuit: Any) -> "StabilizerTCircuit":
        return cls.from_stim_str(str(stim_circuit))

    def _merge_qir(self) -> List[Dict[str, Any]]:
        return self._tape

    # ------------------------------------------------------------------
    # compilation + sampling
    # ------------------------------------------------------------------

    def _compile(self, force_measure_all: bool = False) -> Tuple[CompiledProgram, ChannelSampler, Any]:
        key = ("prog", force_measure_all)
        if key not in self._cache:
            prepared = prepare_graph(self, force_measure_all=force_measure_all)
            program = compile_program(prepared, strategy=self.strategy)
            for comp in program.components:
                comp._raw_records = len(prepared.visible_pos)  # type: ignore[attr-defined]
            sampler = ChannelSampler(prepared.channel_probs, prepared.error_transform, seed=self._seed)
            self._cache[key] = (program, sampler, prepared)
        return self._cache[key]

    def _sample_f(self, sampler: ChannelSampler, shots: int) -> Any:
        if sampler.num_f_params == 0:
            return jnp.zeros((shots, 1), dtype=jnp.uint8)
        out, self._key = sampler.sample_jax(shots, self._key)
        return out

    def sample_measurements(self, shots: int = 1, seed: Optional[int] = None, batch_size: int = 100000) -> Any:
        """All measurement records, shape (shots, num_measurements)."""
        if seed is not None:
            self._key = jax.random.key(seed)
        has_m = any(t["kind"] == "measure" for t in self._tape)
        program, sampler, prepared = self._compile(force_measure_all=not has_m)
        outs = []
        left = shots
        while left > 0:
            b = min(left, batch_size)
            f = self._sample_f(sampler, b)
            if sampler.num_f_params == 0:
                f = jnp.zeros((b, 1), dtype=jnp.uint8)
            s = sample_program(program, f, self._next_key())
            outs.append(s)
            left -= b
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    def _next_key(self) -> Any:
        self._key, sub = jax.random.split(self._key)
        return sub

    def sample_detectors(
        self,
        shots: int = 1,
        separate_observables: bool = False,
        use_reference: bool = False,
        seed: Optional[int] = None,
        batch_size: int = 100000,
    ) -> Any:
        """Detector/observable parities, shape (shots, D [+ O])."""
        if seed is not None:
            self._key = jax.random.key(seed)
        program, sampler, prepared = self._compile()
        records = self.sample_measurements(shots, batch_size=batch_size).astype(jnp.int32)
        parities = _parity_matrix(prepared, records.shape[1])
        dets = jnp.mod(records @ parities.T, 2)
        if use_reference:
            fzero = jnp.zeros((1, max(sampler.num_f_params, 1)), dtype=jnp.uint8)
            ref_rec = sample_program(program, fzero, jax.random.key(0)).astype(jnp.int32)
            ref = jnp.mod(ref_rec @ parities.T, 2)
            dets = jnp.mod(dets + ref, 2)
        nd = prepared.num_detectors
        no = len(prepared.observables)
        if separate_observables:
            return dets[:, :nd].astype(jnp.bool_), dets[:, nd : nd + no].astype(jnp.bool_)
        return dets[:, : nd + no].astype(jnp.bool_)

    # ------------------------------------------------------------------
    # exact quantities
    # ------------------------------------------------------------------

    def _unitary_state(self) -> Any:
        """Noise-free pure state of the gate-only part (measurements skipped)."""
        from ..core import statevec

        psi = statevec.init_state(self._nqubits, dtype=jnp.complex64)
        for item in self._tape:
            if item["kind"] == "gate":
                psi = statevec.apply_unitary(
                    psi, jnp.asarray(item["matrix"], dtype=psi.dtype), list(item["index"]), 2
                )
        return psi

    def amplitude(self, state: Union[str, Sequence[int]]) -> Any:
        """⟨state|C|0…0⟩ for the noise-free unitary part."""
        from ..core import statevec

        bits = [int(b) for b in (state if not isinstance(state, str) else list(state))]
        return statevec.amplitude(self._unitary_state(), bits, 2)

    def outcome_probability(self, state: Any, shots: int = 1) -> Any:
        """P(measurement records == state) per sampled noise realization.

        Conditioned on each sampled error pattern the probability is EXACT
        (one chain-rule evaluation), reference ``zx/stabilizertcircuit.py:312``.
        """
        program, sampler, prepared = self._compile(
            force_measure_all=not any(t["kind"] == "measure" for t in self._tape)
        )
        comp = program.components[0]
        nrec = prepared.num_records
        if nrec == 0:
            return jnp.ones((shots,), dtype=jnp.float32)
        state_bits = jnp.asarray(np.asarray(state, dtype=np.float32))[:nrec]
        f = self._sample_f(sampler, shots)
        f_sel = jnp.asarray(f[:, comp.f_selection], dtype=jnp.float32)
        # the last prefix graph consumes every record bit: P(records = state)
        graph = comp.compiled_scalar_graphs[nrec]
        params = jnp.hstack([f_sel, jnp.broadcast_to(state_bits, (shots, nrec))])
        return jnp.abs(graph.eval(params))

    def expectation_ps(
        self,
        x: Optional[Sequence[int]] = None,
        y: Optional[Sequence[int]] = None,
        z: Optional[Sequence[int]] = None,
        shots: Optional[int] = None,
        **kws: Any,
    ) -> Any:
        """Noise-averaged Pauli-string expectation (gate-only circuits).

        With noise channels present the value is Monte-Carlo averaged over
        ``shots`` error patterns (default 1024); noiseless circuits are exact.
        """
        from ..core import statevec
        from .scalar_graph import _run_steps

        program, sampler, prepared = self._compile()
        n = self._nqubits

        def expect_of(f_bits: Any) -> Any:
            def source(rec_i: int, p1: Any, psi: Any) -> Any:
                return (jnp.sign(p1 - 0.5) + 1.0) / 2.0  # deterministic branch

            psi, _, _ = _run_steps(prepared.steps, n, jnp.complex64, f_bits, source)
            return jnp.real(statevec.expectation_ps(psi, x=x, y=y, z=z))

        if sampler.num_f_params == 0 or not prepared.channel_probs:
            return expect_of(jnp.zeros((max(sampler.num_f_params, 1),), dtype=jnp.uint8))
        shots = shots or 1024
        f = self._sample_f(sampler, shots)
        vals = jax.vmap(expect_of)(f)
        return jnp.mean(vals)


def _parity_matrix(prepared: Any, num_records: int) -> Any:
    rows = []
    for recs in list(prepared.detectors) + list(prepared.observables):
        row = np.zeros(num_records, dtype=np.int32)
        for r in recs:
            row[r] ^= 1
        rows.append(row)
    if not rows:
        return jnp.zeros((0, num_records), dtype=jnp.int32)
    return jnp.asarray(np.stack(rows))
