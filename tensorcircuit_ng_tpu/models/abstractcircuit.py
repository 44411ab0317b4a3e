"""Node-free circuit IR layer: gate metaprogramming + QIR.

Mirrors the reference ``abstractcircuit.py`` (gate-method metaprogramming at
``:242-373``, QIR at ``:375-496``, inverse ``:498``, composition
``:1448-1510``, ``expectation_ps`` sugar ``:1523-1603``) but carries no
tensor-network nodes: the QIR instruction list *is* the circuit, and engines
(dense statevector, einsum IR, MPS, ...) lower it however they like.
"""

from __future__ import annotations

import copy as _copy
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp

from .. import config
from ..ops import gates as gates_mod
from ..ops.gates import Gate, GateF, GateVF

Tensor = Any

__all__ = ["AbstractCircuit"]


def _is_sequence(x: Any) -> bool:
    return isinstance(x, (list, tuple, range, np.ndarray)) and not isinstance(
        x, (str, bytes)
    )



def _remap_qir_item(
    item: Dict[str, Any], mapping: Dict[int, int], n_new: int
) -> Dict[str, Any]:
    """Remap a QIR item's qubit references through ``mapping``.

    Layer items carry wires outside ``index`` ("pairs") and FULL-register
    per-qubit parameter arrays ("rx_thetas"/"thetas"/"gates"): the pairs are
    rewritten in place (their per-pair parameter order is unchanged), the
    per-qubit arrays are PERMUTED — which requires the mapping to be a
    full-register bijection; otherwise remapping is ill-defined and raises
    instead of silently misplacing parameters.
    """
    new_item = dict(item)
    if "index" in item:
        new_item["index"] = tuple(mapping[int(q)] for q in item["index"])
    if item.get("pairs") is not None:
        new_item["pairs"] = [
            (mapping[int(a)], mapping[int(b)]) for a, b in item["pairs"]
        ]
    per_qubit_keys = [
        k for k in ("rx_thetas", "gates") if item.get(k) is not None
    ]
    if item.get("rx_layer") or item.get("fused_1q_layer"):
        if item.get("thetas") is not None:
            per_qubit_keys.append("thetas")
    for key in per_qubit_keys:
        arr = jnp.asarray(item[key])
        if (
            len(mapping) != n_new
            or sorted(mapping.values()) != list(range(n_new))
            or arr.shape[0] != n_new
        ):
            raise ValueError(
                f"cannot remap fused-layer item {item.get('name')!r}: "
                "per-qubit parameters need a full-register bijection"
            )
        perm = np.zeros(n_new, dtype=np.int64)
        for logical, physical in mapping.items():
            perm[int(physical)] = int(logical)
        new_item[key] = arr[jnp.asarray(perm)]
    return new_item


class AbstractCircuit:
    """Gate bookkeeping shared by every simulator."""

    is_dm = False  # density-matrix flag (doubled wires)
    _nqubits: int
    _d: int

    # populated by _meta_apply below
    sgates = list(gates_mod.FIXED_GATE_NAMES)
    vgates = list(gates_mod.VARIABLE_GATE_NAMES)
    mpogates = ["multicontrol", "mpo"]
    diaggates = ["diagonal", "rzm", "cmz"]
    gate_aliases = dict(gates_mod.GATE_ALIASES)

    def __init__(self) -> None:
        self._qir: List[Dict[str, Any]] = []
        self._extra_qir: List[Dict[str, Any]] = []

    # ------------------------------------------------------------------
    # gate application plumbing
    # ------------------------------------------------------------------

    def apply_general_gate(
        self,
        gate: Union[Gate, Tensor],
        *index: int,
        name: Optional[str] = None,
        split: Optional[Dict[str, Any]] = None,
        mpo: bool = False,
        ir_dict: Optional[Dict[str, Any]] = None,
    ) -> None:
        raise NotImplementedError  # engine-specific

    def _apply_gate_instance(
        self,
        gatef: GateF,
        *index: Any,
        name: str,
        split: Optional[Dict[str, Any]] = None,
        **params: Any,
    ) -> None:
        """Build the gate tensor and dispatch, broadcasting over index lists.

        Broadcast semantics per reference ``abstractcircuit.py:161-238``:
        ``c.cx(range(3), range(1, 4))`` zips elementwise; parameter sequences
        broadcast per-index with scalar fallback.
        """
        if index and _is_sequence(index[0]):
            seqs = [list(i) if _is_sequence(i) else None for i in index]
            length = len(seqs[0])
            for s in seqs:
                if s is not None and len(s) != length:
                    raise ValueError("mismatched index sequence lengths")
            for pos in range(length):
                idx_i = tuple(
                    (seqs[j][pos] if seqs[j] is not None else index[j])
                    for j in range(len(index))
                )
                params_i = {}
                for key, val in params.items():
                    if _is_sequence(val) and len(val) == length:
                        params_i[key] = val[pos]
                    elif (
                        hasattr(val, "shape")
                        and getattr(val, "ndim", 0) >= 1
                        and val.shape[0] == length
                    ):
                        params_i[key] = val[pos]
                    else:
                        params_i[key] = val
                self._apply_gate_instance(
                    gatef, *idx_i, name=name, split=split, **params_i
                )
            return

        index = tuple(int(i) for i in index)
        gate = gatef(**params) if params else gatef()
        ir_dict = {
            "gatef": gatef,
            "gate": gate,
            "index": index,
            "name": name,
            "split": split,
            "mpo": False,
        }
        if params:
            ir_dict["parameters"] = dict(params)
        self.apply_general_gate(
            gate, *index, name=name, split=split, ir_dict=ir_dict
        )

    @classmethod
    def _meta_apply(cls) -> None:
        """Register every gate in the registry as a circuit method.

        Equivalent of reference ``abstractcircuit.py:242-373``: both lower and
        UPPER case method names are installed.
        """

        def make_method(gname: str, gatef: GateF) -> Callable[..., None]:
            def method(self: "AbstractCircuit", *index: Any, **params: Any) -> None:
                split = params.pop("split", None)
                name = params.pop("name", gname)
                self._apply_gate_instance(
                    gatef, *index, name=gname, split=split, **params
                )

            method.__name__ = gname
            method.__doc__ = (
                f"Apply **{gname}** gate on the given qubit indices."
                "\n\nIndex arguments may be sequences (elementwise broadcast)."
            )
            return method

        for gname, gatef in gates_mod.GATES.items():
            m = make_method(gname, gatef)
            setattr(cls, gname, m)
            setattr(cls, gname.upper(), m)

    # arbitrary-matrix gate (reference `any`/`unitary` alias)
    def any(self, *index: int, unitary: Tensor, name: str = "any", **kws: Any) -> None:
        """Apply an arbitrary dense gate given its matrix/tensor."""
        gate = Gate(jnp.asarray(unitary).astype(jnp.dtype(config.dtypestr())), name=name)
        k = len(index)
        d = self._d if hasattr(self, "_d") else 2
        gate.tensor = jnp.reshape(gate.tensor, (d,) * (2 * k))
        ir_dict = {
            "gatef": None,
            "gate": gate,
            "index": tuple(int(i) for i in index),
            "name": name,
            "split": kws.get("split"),
            "mpo": False,
            "parameters": {"unitary": gate.tensor},
        }
        self.apply_general_gate(
            gate, *ir_dict["index"], name=name, split=kws.get("split"), ir_dict=ir_dict
        )

    unitary = any
    ANY = any
    UNITARY = any

    # ------------------------------------------------------------------
    # QIR
    # ------------------------------------------------------------------

    def to_openqasm(self, **kws: Any) -> str:
        """OpenQASM 2.0 text of the circuit (reference ``abstractcircuit.py:1052``)."""
        from ..translation import circuit_to_qasm

        return circuit_to_qasm(self)

    def to_openqasm_file(self, file: str, **kws: Any) -> None:
        with open(file, "w") as f:
            f.write(self.to_openqasm(**kws))

    @classmethod
    def from_openqasm(cls, qasm: str, **kws: Any) -> "AbstractCircuit":
        from ..translation import qasm2tc

        return qasm2tc(qasm, circuit_class=cls)

    @classmethod
    def from_openqasm_file(cls, file: str, **kws: Any) -> "AbstractCircuit":
        with open(file) as f:
            return cls.from_openqasm(f.read(), **kws)

    def get_positional_logical_mapping(self) -> Dict[int, int]:
        """Position-in-count-bitstring -> logical qubit (reference ``:715``).

        Identity unless explicit measure instructions were recorded; with
        partial measurement, position i maps to the i-th measured qubit.
        """
        # measure instructions are recorded in _extra_qir (measure_instruction),
        # not in the gate QIR
        measured = [
            item["index"][0]
            for item in list(self._extra_qir) + list(self._qir)
            if item.get("measure") or item.get("name") == "measure"
        ]
        if not measured:
            return {i: i for i in range(self._nqubits)}
        return {i: q for i, q in enumerate(measured)}

    def compose(self, other: "AbstractCircuit", indices: Optional[Sequence[int]] = None) -> "AbstractCircuit":
        """Append another circuit (optionally remapped onto ``indices``)."""
        qir = other.to_qir()
        if indices is not None:
            mapping = {i: int(j) for i, j in enumerate(indices)}
            qir = [_remap_qir_item(item, mapping, self._nqubits) for item in qir]
        return self.append_from_qir([dict(item) for item in qir])

    def to_qir(self) -> List[Dict[str, Any]]:
        """Return the circuit's intermediate representation (list of dicts)."""
        return self._qir

    @classmethod
    def from_qir(
        cls,
        qir: List[Dict[str, Any]],
        circuit_params: Optional[Dict[str, Any]] = None,
        allow_channel: bool = True,
    ) -> "AbstractCircuit":
        """Rebuild a circuit from QIR (reference ``abstractcircuit.py:440-496``).

        ``allow_channel`` kept for reference signature parity — channels are
        always replayable here (statevector circuits re-sample trajectories,
        DM circuits apply them exactly).
        """
        if circuit_params is None:
            circuit_params = {}
        if "nqubits" not in circuit_params:
            nqubits = 0
            for item in qir:
                nqubits = max(nqubits, max(item["index"]) + 1)
            circuit_params["nqubits"] = nqubits
        c = cls(**circuit_params)  # type: ignore
        c.append_from_qir(qir)
        return c

    def append_from_qir(self, qir: List[Dict[str, Any]]) -> "AbstractCircuit":
        for item in qir:
            self._apply_qir_item(item)
        return self

    def _apply_qir_item(self, item: Dict[str, Any]) -> None:
        gatef = item.get("gatef")
        params = item.get("parameters", {})
        index = item["index"]
        if item.get("fused_1q_layer"):
            self.fused_single_qubit_layer(item["gates"], name=item.get("name", "fused_1q_layer"))  # type: ignore
            return
        if item.get("zz_product"):
            self.rzz_product(item["pairs"], item["thetas"])  # type: ignore
            return
        if item.get("rx_layer"):
            self.rx_layer(item["thetas"])  # type: ignore
            return
        if item.get("zzrx_layer"):
            self.zzrx_layer(item["pairs"], item["zz_thetas"], item["rx_thetas"])  # type: ignore
            return
        if item.get("multicz"):
            self.multicz(*item["index"])  # type: ignore
            return
        if item.get("zstring_rot"):
            self.rzm(*item["index"], theta=item["theta"])  # type: ignore
            return
        if item.get("gate") is None and gatef is None and not item.get("is_channel"):
            # matrix-free diagonal items (U1 fast paths): re-dispatch by name
            self_method = getattr(self, item.get("name", ""), None)
            if self_method is None:
                raise ValueError(f"cannot replay matrix-free QIR item {item.get('name')!r}")
            self_method(*index, **(item.get("parameters") or {}))
            return
        if item.get("is_channel"):
            kraus = item["channel_kraus"]
            status = item.get("channel_status")
            self.general_kraus(kraus, *index, status=status, name=item.get("name"))  # type: ignore
            return
        if gatef is None:
            self.any(*index, unitary=item["gate"].tensor, name=item.get("name", "any"))
        else:
            self._apply_gate_instance(
                gatef,
                *index,
                name=item.get("name", gatef.name),
                split=item.get("split"),
                **params,
            )

    def initial_mapping(
        self,
        logical_physical_mapping: Dict[int, int],
        n: Optional[int] = None,
        circuit_params: Optional[Dict[str, Any]] = None,
    ) -> "AbstractCircuit":
        """Rebuild the circuit with qubits remapped (reference ``:652``)."""
        if circuit_params is None:
            circuit_params = {}
        if "nqubits" not in circuit_params:
            circuit_params["nqubits"] = n if n is not None else self._nqubits
        c = type(self)(**circuit_params)  # type: ignore
        n_new = circuit_params.get("nqubits", self._nqubits)
        for item in self._qir:
            c._apply_qir_item(
                _remap_qir_item(item, logical_physical_mapping, n_new)
            )
        return c

    def inverse(self, circuit_params: Optional[Dict[str, Any]] = None) -> "AbstractCircuit":
        """Return the inverse (adjoint) circuit (reference ``:498-560``)."""
        if circuit_params is None:
            circuit_params = (
                dict(self._copy_params()) if hasattr(self, "_copy_params") else {}
            )
            circuit_params.pop("inputs", None)  # inverse starts from |0>
            circuit_params.pop("dminputs", None)
        if "nqubits" not in circuit_params and "nqudits" not in circuit_params:
            circuit_params["nqubits"] = self._nqubits
        c = type(self)(**circuit_params)  # type: ignore
        qir = self._expanded_qir() if hasattr(self, "_expanded_qir") else self._qir
        for item in reversed(qir):
            if item.get("is_channel") or item.get("cond_collapse"):
                # channels and measurement collapses have no adjoint: the
                # inverse circuit replays only the unitary part (reference
                # test_dmcircuit.py:281 semantics)
                continue
            if item.get("multicz"):  # diagonal ±1: self-inverse
                c.multicz(*item["index"])  # type: ignore
                continue
            if item.get("gate") is None and item.get("gatef") is None:
                # matrix-free items (U1 diagonal fast paths, zstring_rot):
                # parameterized ones invert by negating theta, the rest are
                # self-inverse diagonals (cz, cphase-free)
                params = item.get("parameters") or {}
                name = item.get("name")
                if "theta" in params:
                    getattr(c, name)(*item["index"], theta=-params["theta"])
                else:
                    getattr(c, name)(*item["index"])
                continue
            m = item["gate"].matrix()
            mh = m.T.conj() if hasattr(m, "conj") else jnp.conj(m.T)
            c.any(*item["index"], unitary=mh, name=(item.get("name") or "any") + "d")
        return c

    # ------------------------------------------------------------------
    # composition / copying
    # ------------------------------------------------------------------

    def append(self, c: "AbstractCircuit", indices: Optional[Sequence[int]] = None) -> "AbstractCircuit":
        """Append circuit ``c`` after this circuit (in place, returns self)."""
        for item in c.to_qir():
            new_item = dict(item)
            if indices is not None:
                new_item["index"] = tuple(indices[i] for i in item["index"])
            self._apply_qir_item(new_item)
        return self

    def prepend(self, c: "AbstractCircuit") -> "AbstractCircuit":
        """Prepend circuit ``c`` before this circuit (returns new circuit)."""
        new = c.copy()
        new.append(self)
        return new

    def copy(self) -> "AbstractCircuit":
        qir = [dict(item) for item in self._qir]
        c = type(self)(**self._copy_params())  # type: ignore
        c.append_from_qir(qir)
        return c

    def _copy_params(self) -> Dict[str, Any]:
        return {"nqubits": self._nqubits}

    # ------------------------------------------------------------------
    # stats / info
    # ------------------------------------------------------------------

    @property
    def nqubits(self) -> int:
        return self._nqubits

    def gate_count(self, gate_list: Optional[Sequence[str]] = None) -> int:
        """Count gates, optionally restricted to names in ``gate_list``."""
        if gate_list is None:
            return len(self._qir)
        gate_list = [g.lower() for g in gate_list]
        gate_list = [self.gate_aliases.get(g, g) for g in gate_list]
        cnt = 0
        for item in self._qir:
            name = (item.get("name") or "").lower()
            if name in gate_list or self.gate_aliases.get(name, name) in gate_list:
                cnt += 1
        return cnt

    def gate_count_by_condition(
        self, cond_func: Callable[[Dict[str, Any]], bool]
    ) -> int:
        return sum(1 for item in self._qir if cond_func(item))

    def gate_summary(self) -> Dict[str, int]:
        summary: Dict[str, int] = {}
        for item in self._qir:
            name = item.get("name") or "any"
            summary[name] = summary.get(name, 0) + 1
        return summary

    def count_flop(self) -> int:
        """Rough FLOP estimate of the dense-engine forward pass."""
        d = getattr(self, "_d", 2)
        total = 0
        for item in self._qir:
            k = len(item["index"])
            total += 8 * d ** (self._nqubits + k)
        return total

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(nqubits={self._nqubits}, "
            f"ngates={len(self._qir)})"
        )

    # ------------------------------------------------------------------
    # hardware-style instructions (recorded, engine may interpret)
    # ------------------------------------------------------------------

    def measure_instruction(self, *index: int) -> None:
        """Record a measurement instruction (reference ``:834-1005``)."""
        self._extra_qir.append(
            {"name": "measure", "index": tuple(index), "pos": len(self._qir)}
        )

    def reset_instruction(self, *index: int) -> None:
        self._extra_qir.append(
            {"name": "reset", "index": tuple(index), "pos": len(self._qir)}
        )

    def barrier_instruction(self, *index: int) -> None:
        self._extra_qir.append(
            {"name": "barrier", "index": tuple(index), "pos": len(self._qir)}
        )

    # ------------------------------------------------------------------
    # expectation sugar
    # ------------------------------------------------------------------

    def expectation(self, *ops: Any, **kws: Any) -> Tensor:
        raise NotImplementedError

    def expectation_ps(
        self,
        x: Optional[Sequence[int]] = None,
        y: Optional[Sequence[int]] = None,
        z: Optional[Sequence[int]] = None,
        ps: Optional[Sequence[int]] = None,
        reuse: bool = True,
        noise_conf: Optional[Any] = None,
        nmc: int = 1000,
        status: Optional[Tensor] = None,
        **kws: Any,
    ) -> Tensor:
        """Pauli-string expectation sugar (reference ``:1523-1603``).

        ``ps`` is a length-n list with entries 0/1/2/3 for I/X/Y/Z, taking
        precedence over x/y/z lists.
        """
        if ps is not None:
            x = [i for i, v in enumerate(ps) if v == 1]
            y = [i for i, v in enumerate(ps) if v == 2]
            z = [i for i, v in enumerate(ps) if v == 3]
        obs = []
        for q in x or ():
            obs.append((gates_mod.GATES["x"](), [int(q)]))
        for q in y or ():
            obs.append((gates_mod.GATES["y"](), [int(q)]))
        for q in z or ():
            obs.append((gates_mod.GATES["z"](), [int(q)]))
        if noise_conf is not None:
            from .. import noisemodel

            return noisemodel.expectation_noisfy(
                self, *obs, noise_conf=noise_conf, nmc=nmc, status=status, **kws
            )
        return self.expectation(*obs, reuse=reuse, **kws)

    # convenience: dict of pauli-string -> coefficient
    def expectation_structures(self, structures: Any, weights: Any, **kws: Any) -> Tensor:
        total = 0.0
        for s, w in zip(structures, weights):
            total = total + w * self.expectation_ps(ps=s, **kws)
        return total

    # ------------------------------------------------------------------
    # gate-factory plumbing (reference abstractcircuit.py:124)
    # ------------------------------------------------------------------

    @staticmethod
    def apply_general_gate_delayed(gatef: Any, name: Optional[str] = None, mpo: bool = False) -> Any:
        """Unbound method applying a FIXED gate factory (reference ``:124``)."""

        def apply(self: "AbstractCircuit", *index: int, **kws: Any) -> None:
            self._apply_gate_instance(gatef, *index, name=name or getattr(gatef, "name", "any"), **kws)

        return apply

    @staticmethod
    def apply_general_variable_gate_delayed(gatef: Any, name: Optional[str] = None, mpo: bool = False) -> Any:
        """Unbound method applying a PARAMETERIZED gate factory (reference ``:124``)."""
        return AbstractCircuit.apply_general_gate_delayed(gatef, name=name, mpo=mpo)

    @staticmethod
    def standardize_gate(name: str) -> str:
        """Canonical gate-name normalization (reference ``:242-373`` helper)."""
        name = name.lower()
        aliases = {
            "cx": "cnot",
            "toff": "toffoli",
            "ccx": "toffoli",
            "cswap": "fredkin",
            "sdg": "sd",
            "tdg": "td",
        }
        return aliases.get(name, name)

    # ------------------------------------------------------------------
    # serialization / interop (reference abstractcircuit.py:1118-1391)
    # ------------------------------------------------------------------

    def to_json(self, simplified: bool = False, file: Optional[str] = None) -> Any:
        """Circuit -> JSON string (or file) (reference ``abstractcircuit.py:1249``)."""
        from ..translation import circuit_to_json

        s = circuit_to_json(self, simplified=simplified, as_str=True)
        if file is not None:
            with open(file, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_json(cls, data: Any, **kws: Any) -> Any:
        from ..translation import circuit_from_json

        return circuit_from_json(data, circuit_class=cls)

    @classmethod
    def from_json_file(cls, file: str, **kws: Any) -> Any:
        with open(file) as f:
            return cls.from_json(f.read(), **kws)

    def to_qiskit(self, **kws: Any) -> Any:
        """Circuit -> qiskit.QuantumCircuit via OpenQASM (requires qiskit)."""
        from qiskit import QuantumCircuit  # type: ignore

        return QuantumCircuit.from_qasm_str(self.to_openqasm())

    @classmethod
    def from_qiskit(cls, qc: Any, **kws: Any) -> Any:
        from ..translation import get_qiskit_qasm

        return cls.from_openqasm(get_qiskit_qasm(qc), **kws)

    def to_cirq(self, **kws: Any) -> Any:
        """Circuit -> cirq.Circuit (requires cirq)."""
        from ..translation import qir2cirq

        return qir2cirq(self.to_qir(), self._nqubits)

    @classmethod
    def from_cirq(cls, qc: Any, **kws: Any) -> Any:
        from ..translation import cirq2tc

        return cirq2tc(qc, circuit_class=cls)

    @classmethod
    def from_qsim_file(cls, file: str, **kws: Any) -> Any:
        """Load a qsim-format circuit file (reference ``abstractcircuit.py``).

        qsim lines: first line nqubits; then ``cycle gate q [q2] [angle...]``.
        """
        with open(file) as f:
            lines = [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]
        n = int(lines[0])
        c = cls(n, **kws)
        for ln in lines[1:]:
            parts = ln.split()
            name = parts[1].lower()
            rest = parts[2:]
            if name in ("rz", "rx", "ry"):
                getattr(c, name)(int(rest[0]), theta=float(rest[1]))
            elif name in ("fs", "fsim"):
                import numpy as _np

                theta, phi = float(rest[2]), float(rest[3])
                a, b = int(rest[0]), int(rest[1])
                m = _np.eye(4, dtype=complex)
                m[1, 1] = m[2, 2] = _np.cos(theta)
                m[1, 2] = m[2, 1] = -1j * _np.sin(theta)
                m[3, 3] = _np.exp(-1j * phi)
                c.any(a, b, unitary=m, name="fsim")
            elif name in ("x_1_2",):
                c.rx(int(rest[0]), theta=np.pi / 2)
            elif name in ("y_1_2",):
                c.ry(int(rest[0]), theta=np.pi / 2)
            elif name in ("hz_1_2", "w_1_2"):
                import numpy as _np

                w = (_np.array([[1, -_np.sqrt(1j)], [_np.sqrt(-1j), 1]]) / _np.sqrt(2))
                c.any(int(rest[0]), unitary=w, name="w_1_2")
            else:
                idx = [int(x) for x in rest]
                getattr(c, name)(*idx)
        return c

    def draw(self, output: Optional[str] = None, **kws: Any) -> Any:
        """Draw the circuit: qiskit drawer when available, else ASCII fallback.

        Reference ``abstractcircuit.py:1118`` delegates to qiskit; the fallback
        here renders a plain text wire diagram so draw() always works.
        """
        try:
            return self.to_qiskit().draw(output=output, **kws)
        except Exception:
            lines = [f"q{q}: -" for q in range(self._nqubits)]
            for item in self._qir:
                width = max(len(item.get("name") or "?"), 1)
                touched = set(item["index"])
                for q in range(self._nqubits):
                    if q in touched:
                        lines[q] += f"[{item.get('name')}]-"
                    else:
                        lines[q] += "-" * (width + 3)
            return "\n".join(lines)

    def vis_tex(self, **kws: Any) -> str:
        """quantikz LaTeX of the circuit (reference ``vis_tex`` -> vis.qir2tex)."""
        from ..vis import qir2tex

        return qir2tex(self.to_qir(), self._nqubits, **kws)

    # -- hardware instruction sugar recorded in _extra_qir (reference :834-1005) --

    def pauli_instruction(self, *index: int, p: Any = None, **kws: Any) -> None:
        """Record a PAULI_CHANNEL_1-style noise instruction (reference name)."""
        self._extra_qir.append(
            {"name": "pauli", "index": tuple(index), "p": p, "pos": len(self._qir), **kws}
        )

    def pauli2_instruction(self, *index: int, p: Any = None, **kws: Any) -> None:
        self._extra_qir.append(
            {"name": "pauli2", "index": tuple(index), "p": p, "pos": len(self._qir), **kws}
        )

    def depolarizing_instruction(self, *index: int, p: float = 0.0, **kws: Any) -> None:
        self._extra_qir.append(
            {"name": "depolarizing", "index": tuple(index), "p": p, "pos": len(self._qir), **kws}
        )

    def depolarizing2_instruction(self, *index: int, p: float = 0.0, **kws: Any) -> None:
        self._extra_qir.append(
            {"name": "depolarizing2", "index": tuple(index), "p": p, "pos": len(self._qir), **kws}
        )

    def mr_instruction(self, *index: int, **kws: Any) -> None:
        """Measure-and-reset instruction record (reference name)."""
        self._extra_qir.append(
            {"name": "mr", "index": tuple(index), "pos": len(self._qir), **kws}
        )


AbstractCircuit._meta_apply()

# module-level gate-registry bindings (reference abstractcircuit.py:37-81)
sgates = AbstractCircuit.sgates
vgates = AbstractCircuit.vgates
mpogates = AbstractCircuit.mpogates
diaggates = AbstractCircuit.diaggates
gate_aliases = AbstractCircuit.gate_aliases
defined_gates = list(dict.fromkeys(sgates + vgates + mpogates + diaggates + list(gate_aliases)))
