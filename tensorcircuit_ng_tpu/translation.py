"""Circuit interop: OpenQASM 2, JSON, qiskit/cirq (optional), perm matrices.

Counterpart of reference ``translation.py``: QIR↔JSON with a tensor codec
(``:602-721``), OpenQASM (own text emitter/parser — qiskit is not vendored
in this image), ``qir2qiskit``/``qiskit2tc``/``qir2cirq`` behind optional
imports (``:221, :434, :119``), wire-order ``perm_matrix`` (``:63``).
"""

from __future__ import annotations

import json
import math
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

Tensor = Any

__all__ = [
    "perm_matrix",
    "qir2json",
    "json2qir",
    "circuit_to_json",
    "circuit_from_json",
    "qir2qasm",
    "qasm2tc",
    "circuit_to_qasm",
    "circuit_from_qasm",
    "qir2qiskit",
    "qiskit2tc",
    "qir2cirq",
]


def perm_matrix(n: int) -> np.ndarray:
    """Bit-reversal permutation matrix (little- vs big-endian wire order)."""
    dim = 2**n
    p = np.zeros((dim, dim))
    for i in range(dim):
        rev = int(format(i, f"0{n}b")[::-1], 2)
        p[rev, i] = 1.0
    return p


# ------------------------------------------------------------------
# JSON codec (reference translation.py:602-721)
# ------------------------------------------------------------------


def _tensor_to_json(t: Any) -> Dict[str, Any]:
    a = np.asarray(t)
    return {
        "shape": list(a.shape),
        "dtype": str(a.dtype),
        "real": np.real(a).reshape(-1).tolist(),
        "imag": np.imag(a).reshape(-1).tolist(),
    }


def _tensor_from_json(d: Dict[str, Any]) -> np.ndarray:
    re_ = np.asarray(d["real"], dtype=np.float64)
    im = np.asarray(d["imag"], dtype=np.float64)
    a = (re_ + 1j * im).reshape(d["shape"])
    return a


def qir2json(qir: Sequence[Dict[str, Any]], simplified: bool = False) -> List[Dict[str, Any]]:
    """Serialize QIR into plain JSON-compatible dicts."""
    out = []
    for item in qir:
        entry: Dict[str, Any] = {
            "name": item.get("name", "any"),
            "index": list(item["index"]),
        }
        params = item.get("parameters", {})
        jparams = {}
        for k, v in params.items():
            if hasattr(v, "shape") and np.asarray(v).ndim > 0:
                jparams[k] = _tensor_to_json(v)
            elif hasattr(v, "item") or isinstance(v, (int, float, complex)):
                vv = complex(np.asarray(v))
                jparams[k] = [vv.real, vv.imag]
            else:
                jparams[k] = v
        if jparams:
            entry["parameters"] = jparams
        if not simplified and item.get("gatef") is None and item.get("gate") is not None:
            entry["gate_tensor"] = _tensor_to_json(item["gate"].tensor)
        out.append(entry)
    return out


def json2qir(data: Sequence[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Deserialize; returns QIR-shaped dicts consumable by append_from_qir."""
    from .ops import gates as gates_mod
    from .ops.gates import Gate

    qir = []
    for entry in data:
        name = entry["name"]
        params = {}
        for k, v in entry.get("parameters", {}).items():
            if isinstance(v, dict) and "shape" in v:
                params[k] = _tensor_from_json(v)
            elif isinstance(v, list) and len(v) == 2:
                params[k] = v[0] if v[1] == 0 else complex(v[0], v[1])
            else:
                params[k] = v
        item: Dict[str, Any] = {
            "index": tuple(entry["index"]),
            "name": name,
            "split": None,
            "mpo": False,
        }
        if "gate_tensor" in entry:
            item["gatef"] = None
            item["gate"] = Gate(
                np.asarray(_tensor_from_json(entry["gate_tensor"])), name=name
            )
        else:
            item["gatef"] = gates_mod.GATES.get(name)
            item["parameters"] = params
            if item["gatef"] is None:
                raise ValueError(f"unknown gate {name!r} without tensor payload")
        qir.append(item)
    return qir


def _export_qir(c: Any) -> Any:
    """Per-gate QIR view (fused layers expanded) for exporters."""
    if hasattr(c, "_expanded_qir"):
        return c._expanded_qir()
    return c.to_qir()


def circuit_to_json(c: Any, simplified: bool = False, as_str: bool = True) -> Any:
    payload = {
        "nqubits": c.nqubits,
        "qir": qir2json(_export_qir(c), simplified=simplified),
    }
    return json.dumps(payload) if as_str else payload


def circuit_from_json(data: Any, circuit_class: Optional[Any] = None) -> Any:
    from .models.circuit import Circuit

    if isinstance(data, str):
        data = json.loads(data)
    cls = circuit_class or Circuit
    c = cls(data["nqubits"])
    c.append_from_qir(json2qir(data["qir"]))
    return c


# ------------------------------------------------------------------
# OpenQASM 2 (own emitter/parser; no qiskit dependency)
# ------------------------------------------------------------------

_QASM_EMIT = {
    "h": "h",
    "x": "x",
    "y": "y",
    "z": "z",
    "s": "s",
    "sd": "sdg",
    "t": "t",
    "td": "tdg",
    "sx": "sx",
    "cnot": "cx",
    "cx": "cx",
    "cy": "cy",
    "cz": "cz",
    "swap": "swap",
    "toffoli": "ccx",
    "ccx": "ccx",
    "fredkin": "cswap",
    "i": "id",
}

_QASM_PARAM = {
    "rx": ("rx", ["theta"]),
    "ry": ("ry", ["theta"]),
    "rz": ("rz", ["theta"]),
    "phase": ("p", ["theta"]),
    "cphase": ("cp", ["theta"]),
    "crx": ("crx", ["theta"]),
    "cry": ("cry", ["theta"]),
    "crz": ("crz", ["theta"]),
    "rxx": ("rxx", ["theta"]),
    "ryy": ("ryy", ["theta"]),
    "rzz": ("rzz", ["theta"]),
    "u": ("u", ["theta", "phi", "lbd"]),
}


def qir2qasm(qir: Sequence[Dict[str, Any]], n: int) -> str:
    """Emit OpenQASM 2.0 text from QIR."""
    lines = [
        "OPENQASM 2.0;",
        'include "qelib1.inc";',
        f"qreg q[{n}];",
    ]
    for item in qir:
        name = (item.get("name") or "any").lower()
        idx = ",".join(f"q[{i}]" for i in item["index"])
        if name in _QASM_EMIT:
            lines.append(f"{_QASM_EMIT[name]} {idx};")
        elif name in _QASM_PARAM:
            qname, pnames = _QASM_PARAM[name]
            params = item.get("parameters", {})
            vals = []
            for p in pnames:
                v = params.get(p, 0.0)
                vals.append(repr(float(np.real(np.asarray(v)))))
            lines.append(f"{qname}({','.join(vals)}) {idx};")
        elif len(item["index"]) == 1 and item.get("gate") is not None:
            # arbitrary single-qubit gate: ZYZ decomposition -> u(theta,phi,lam)
            m = np.asarray(item["gate"].matrix())
            theta, phi, lam = _u3_angles(m)
            lines.append(f"u({theta!r},{phi!r},{lam!r}) {idx};")
        elif name == "multicz" and len(item["index"]) in (2, 3):
            qs = [f"q[{int(i)}]" for i in item["index"]]
            if len(qs) == 2:
                lines.append(f"cz {qs[0]},{qs[1]};")
            else:
                # ccz = H(t) CCX H(t)
                lines.append(f"h {qs[2]};")
                lines.append(f"ccx {qs[0]},{qs[1]},{qs[2]};")
                lines.append(f"h {qs[2]};")
        else:
            raise ValueError(f"gate {name!r} has no OpenQASM 2 representation")
    return "\n".join(lines) + "\n"


def _u3_angles(m: np.ndarray) -> Tuple[float, float, float]:
    """(theta, phi, lam) with U ~ u(theta, phi, lam) up to global phase."""
    a = abs(m[0, 0])
    b = abs(m[1, 0])
    theta = 2.0 * math.atan2(b, a)
    if a > 1e-9 and b > 1e-9:
        ref = np.angle(m[0, 0])
        phi = float(np.angle(m[1, 0]) - ref)
        lam = float(np.angle(-m[0, 1]) - ref)
    elif a <= 1e-9:  # theta = pi
        phi = float(np.angle(m[1, 0]) - np.angle(-m[0, 1]))
        lam = 0.0
    else:  # theta = 0
        phi = float(np.angle(m[1, 1]) - np.angle(m[0, 0]))
        lam = 0.0
    return float(theta), phi, lam


def circuit_to_qasm(c: Any) -> str:
    return qir2qasm(_export_qir(c), c.nqubits)


_QASM_IMPORT = {v: k for k, v in _QASM_EMIT.items()}
_QASM_IMPORT.update({"id": "i", "cx": "cnot", "p": "phase", "cp": "cphase", "u3": "u", "u": "u"})
_QASM_PARAM_IMPORT = {v[0]: (k, v[1]) for k, v in _QASM_PARAM.items()}
_QASM_PARAM_IMPORT["u3"] = ("u", ["theta", "phi", "lbd"])


def qasm2tc(qasm: str, circuit_class: Optional[Any] = None) -> Any:
    """Parse an OpenQASM 2.0 subset into a circuit (reference ``qiskit2tc`` role)."""
    from .models.circuit import Circuit

    cls = circuit_class or Circuit
    n = None
    ops: List[Tuple[str, List[float], List[int]]] = []
    for raw in qasm.splitlines():
        line = raw.split("//")[0].strip()
        if not line or line.startswith(("OPENQASM", "include")):
            continue
        m = re.match(r"qreg\s+(\w+)\[(\d+)\]", line)
        if m:
            n = int(m.group(2))
            continue
        if line.startswith(("creg", "barrier", "measure")):
            continue
        m = re.match(r"(\w+)\s*(\(([^)]*)\))?\s+(.*);", line)
        if not m:
            continue
        gname = m.group(1)
        params = (
            [float(_eval_qasm_expr(x)) for x in m.group(3).split(",")]
            if m.group(3)
            else []
        )
        qubits = [int(x) for x in re.findall(r"\[(\d+)\]", m.group(4))]
        ops.append((gname, params, qubits))
    if n is None:
        n = max((max(q) for _, _, q in ops if q), default=-1) + 1
    c = cls(n)
    for gname, params, qubits in ops:
        if params:
            tc_name, pnames = _QASM_PARAM_IMPORT[gname]
            kwargs = dict(zip(pnames, params))
            getattr(c, tc_name)(*qubits, **kwargs)
        else:
            tc_name = _QASM_IMPORT.get(gname, gname)
            getattr(c, tc_name)(*qubits)
    return c


circuit_from_qasm = qasm2tc


def _eval_qasm_expr(expr: str) -> float:
    expr = expr.strip().replace("pi", repr(math.pi))
    allowed = set("0123456789.+-*/() e")
    if not set(expr) <= allowed:
        raise ValueError(f"disallowed characters in QASM expression {expr!r}")
    return float(eval(expr, {"__builtins__": {}}, {}))  # noqa: S307 - sanitized


# ------------------------------------------------------------------
# qiskit / cirq (optional dependencies)
# ------------------------------------------------------------------


def qir2qiskit(qir: Sequence[Dict[str, Any]], n: int) -> Any:
    """QIR -> qiskit.QuantumCircuit (requires qiskit installed)."""
    try:
        from qiskit import QuantumCircuit  # type: ignore
        from qiskit.qasm2 import loads  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError("qiskit is not installed in this environment") from e
    return loads(qir2qasm(qir, n))


def qiskit2tc(qc: Any, circuit_class: Optional[Any] = None) -> Any:
    """qiskit.QuantumCircuit -> circuit (via OpenQASM 2 text)."""
    try:
        from qiskit.qasm2 import dumps  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError("qiskit is not installed in this environment") from e
    return qasm2tc(dumps(qc), circuit_class)


def qir2cirq(qir: Sequence[Dict[str, Any]], n: int) -> Any:
    """QIR -> cirq.Circuit (requires cirq installed)."""
    try:
        import cirq  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError("cirq is not installed in this environment") from e
    qubits = cirq.LineQubit.range(n)
    ops = []
    gate_map = {
        "h": cirq.H,
        "x": cirq.X,
        "y": cirq.Y,
        "z": cirq.Z,
        "s": cirq.S,
        "t": cirq.T,
        "cnot": cirq.CNOT,
        "cz": cirq.CZ,
        "swap": cirq.SWAP,
        "toffoli": cirq.TOFFOLI,
    }
    for item in qir:
        name = (item.get("name") or "").lower()
        idx = [qubits[i] for i in item["index"]]
        params = item.get("parameters", {})
        if name in gate_map:
            ops.append(gate_map[name](*idx))
        elif name in ("rx", "ry", "rz"):
            th = float(np.real(np.asarray(params.get("theta", 0))))
            ops.append(getattr(cirq, name)(th)(*idx))
        else:
            m = np.asarray(item["gate"].matrix())
            ops.append(cirq.MatrixGate(m)(*idx))
    return cirq.Circuit(ops)


# ---------------------------------------------------------------------------
# stim (text circuit format — no stim dependency needed)
# ---------------------------------------------------------------------------

_TC2STIM = {
    "h": "H", "x": "X", "y": "Y", "z": "Z", "s": "S", "sd": "S_DAG",
    "sx": "SQRT_X", "cnot": "CX", "cx": "CX", "cy": "CY", "cz": "CZ",
    "swap": "SWAP", "iswap": "ISWAP", "i": "I",
}
_STIM2TC = {v: k for k, v in _TC2STIM.items()}
_STIM2TC.update({"CNOT": "cnot", "ZCX": "cnot", "ZCY": "cy", "ZCZ": "cz"})


def tc2stim(c: Any) -> str:
    """Clifford circuit -> stim program text (reference ``tc2stim``).

    Output loads directly into ``stim.Circuit(text)`` when stim is present;
    only Clifford gates are representable.
    """
    lines = []
    for item in c.to_qir():
        name = (item.get("name") or "").lower()
        if name not in _TC2STIM:
            raise ValueError(f"gate {name!r} has no stim equivalent")
        idx = " ".join(str(int(i)) for i in item["index"])
        lines.append(f"{_TC2STIM[name]} {idx}")
    return "\n".join(lines) + ("\n" if lines else "")


def stim2tc(program: Any, circuit_class: Optional[Any] = None) -> Any:
    """stim program (text or stim.Circuit) -> StabilizerCircuit.

    Parses the text format directly (reference ``stim2tc translation.py:798``
    needs stim; this works without it): gates, M/MZ measurements, R resets,
    TICK/comments, and REPEAT blocks.
    """
    if circuit_class is None:
        from .models.stabilizercircuit import StabilizerCircuit as circuit_class  # type: ignore

    text = program if isinstance(program, str) else str(program)

    def parse_block(lines: List[str], pos: int) -> Tuple[List[Tuple[str, List[int]]], int]:
        ops: List[Tuple[str, List[int]]] = []
        while pos < len(lines):
            line = lines[pos].split("#", 1)[0].strip()
            pos += 1
            if not line:
                continue
            if line == "}":
                return ops, pos
            if line.upper().startswith("REPEAT"):
                reps = int(line.split()[1])
                inner, pos = parse_block(lines, pos)
                ops.extend(inner * reps)
                continue
            parts = line.replace("{", "").split()
            if not parts:
                continue
            head = parts[0].upper()
            arg = None
            if "(" in head:
                head, rest = head.split("(", 1)
                arg = float(rest.rstrip(")"))
            targets: List[Any] = []
            for tok in parts[1:]:
                tok = tok.strip(",")
                if tok.lower().startswith("rec[") and tok.endswith("]"):
                    targets.append(("rec", int(tok[4:-1])))
                elif tok.lstrip("-+").replace(".", "", 1).isdigit():
                    if "." in tok:
                        arg = float(tok)
                    else:
                        targets.append(int(tok))
            ops.append((head, targets, arg))
        return ops, pos

    ops, _ = parse_block(text.splitlines(), 0)
    nq = 1 + max(
        (q for _, qs, _ in ops for q in qs if isinstance(q, int)), default=0
    )
    c = circuit_class(nq)
    for op, qs, arg in ops:
        if op in ("TICK", "SHIFT_COORDS", "QUBIT_COORDS"):
            continue
        if op == "DETECTOR":
            c.detector(*[r for kind, r in qs if kind == "rec"] if qs and isinstance(qs[0], tuple) else [])
            continue
        if op == "OBSERVABLE_INCLUDE":
            recs = [r for item in qs if isinstance(item, tuple) for kind, r in [item] if kind == "rec"]
            c.observable_include(*recs, idx=int(arg or 0))
            continue
        ints = [q for q in qs if isinstance(q, int)]
        if op in ("M", "MZ"):
            c.measure_instruction(*ints)
            continue
        if op in ("R", "RZ"):
            c.reset_instruction(*ints)
            continue
        if op in ("X_ERROR", "Y_ERROR", "Z_ERROR", "DEPOLARIZE1", "DEPOLARIZE2"):
            meth = {"X_ERROR": "x_error", "Y_ERROR": "y_error", "Z_ERROR": "z_error",
                    "DEPOLARIZE1": "depolarize1", "DEPOLARIZE2": "depolarize2"}[op]
            getattr(c, meth)(*ints, p=float(arg or 0.0))
            continue
        name = _STIM2TC.get(op)
        if name is None:
            raise ValueError(f"unsupported stim instruction {op!r}")
        arity = 2 if name in ("cnot", "cx", "cy", "cz", "swap", "iswap") else 1
        for g in range(0, len(ints), arity):
            getattr(c, name)(*ints[g : g + arity])
    return c


# ======================================================================
# reference-parity translation surface (translation.py:53-900)
# ======================================================================


def tensor_to_json(t: Any) -> Dict[str, Any]:
    """Tensor -> JSON-safe dict (public alias; reference ``:602-630``)."""
    return _tensor_to_json(t)


def json_to_tensor(d: Dict[str, Any]) -> np.ndarray:
    """JSON dict -> numpy tensor (public alias)."""
    return _tensor_from_json(d)


def get_qiskit_qasm(qc: Any) -> str:
    """OpenQASM2 text of a qiskit circuit across qiskit versions (ref :53)."""
    try:
        return qc.qasm()
    except AttributeError:
        from qiskit.qasm2 import dumps  # type: ignore

        return dumps(qc)


def ctrl_str2ctrl_state(ctrl_str: str, nctrl: int) -> List[int]:
    """Control-state string -> per-control bit list, LSB-first (ref :429)."""
    v = int(ctrl_str)
    return [0x1 & (v >> i) for i in range(nctrl)]


def eqasm2tc(
    eqasm: str, nqubits: Optional[int] = None, headers: Tuple[int, int] = (6, 1)
) -> Any:
    """qexe/eqasm instruction text -> Circuit (reference ``translation.py:722``).

    Handles ``bs``-prefixed gate lines: RZ_k (angle 2π/2^k), ±Z/2, named
    single/two-qubit gates; measurement lines are skipped.
    """
    from .models.circuit import Circuit

    lines = eqasm.split("\n")
    if nqubits is None:
        nqubits = len(lines[2].split(","))
    body = lines[headers[0] : -headers[1]] if headers[1] else lines[headers[0] :]
    c = Circuit(nqubits)
    for inst in body:
        if not inst.strip().startswith("bs"):
            continue
        parts = inst.split(" ")
        op = parts[2]
        if op.startswith("RZ"):
            k = int(op[3:])
            c.rz(int(parts[3][1:]), theta=2 * np.pi / 2**k)
        elif op == "Z/2":
            c.rz(int(parts[3][1:]), theta=-np.pi / 2)
        elif op == "-Z/2":
            c.rz(int(parts[3][1:]), theta=np.pi / 2)
        else:
            name = op.lower()
            if len(parts) == 4:
                idx = (int(parts[3][1:]),)
            elif len(parts) == 5:
                idx = (int(parts[3][2:-1]), int(parts[4][1:-1]))
            else:
                raise ValueError(f"Unknown format for eqasm: {parts!r}")
            getattr(c, name)(*idx)
    return c


def qiskit_from_qasm_str_ordered_measure(qasm_str: str) -> Any:
    """qiskit.from_qasm_str preserving measure order (reference ``:770``).

    Requires qiskit; measure lines are re-applied in file order after the
    unitary part loads.
    """
    from qiskit import QuantumCircuit  # type: ignore

    measure_sequence = []
    other_lines = []
    for line in qasm_str.split("\n"):
        if line.strip().startswith("measure"):
            q = int(line.split(" ")[1].split("[")[1].rstrip("];"))
            cbit = int(line.split("->")[1].strip().rstrip(";").split("[")[1].rstrip("]"))
            measure_sequence.append((q, cbit))
        else:
            other_lines.append(line)
    qc = QuantumCircuit.from_qasm_str("\n".join(other_lines))
    for q, cbit in measure_sequence:
        qc.measure(q, cbit)
    return qc


def cirq2tc(qc: Any, circuit_class: Optional[Any] = None) -> Any:
    """cirq.Circuit -> Circuit (reference ``translation.py:1009``); needs cirq."""
    import cirq  # type: ignore

    from .models.circuit import Circuit

    if circuit_class is None:
        circuit_class = Circuit
    qubits = sorted(qc.all_qubits())
    qmap = {q: i for i, q in enumerate(qubits)}
    c = circuit_class(len(qubits))
    for moment in qc:
        for op in moment.operations:
            u = cirq.unitary(op)
            idx = [qmap[q] for q in op.qubits]
            c.any(*idx, unitary=u, name=str(op.gate).lower())
    return c
