"""Tianyan provider: QCIS translation + topology validation (offline parts).

The reference's tianyan module (``cloud/tianyan.py``, 772 LoC) mixes network
I/O with an offline-testable QCIS translation layer; this module provides the
offline layer (circuit → QCIS text, coupling-map validation) and raises on
actual submission (no network egress in this environment).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .abstraction import Device, Task

__all__ = ["qir2qcis", "validate_topology", "submit_task", "list_devices", "get_device_properties"]

_QCIS_1Q = {"x": "X", "y": "Y", "z": "Z", "h": "H", "s": "S", "sd": "SD", "t": "T", "td": "TD", "sx": "X2P"}


def qir2qcis(qir: Sequence[Dict[str, Any]], n: int) -> str:
    """Translate QIR into QCIS instructions (CZ + single-qubit basis)."""
    lines: List[str] = []
    for item in qir:
        name = (item.get("name") or "").lower()
        idx = item["index"]
        params = item.get("parameters", {})
        if name in _QCIS_1Q:
            lines.append(f"{_QCIS_1Q[name]} Q{idx[0]}")
        elif name in ("rz", "rx", "ry"):
            theta = float(np.real(np.asarray(params.get("theta", 0))))
            lines.append(f"{name.upper()} Q{idx[0]} {theta:.8f}")
        elif name == "cz":
            lines.append(f"CZ Q{idx[0]} Q{idx[1]}")
        elif name in ("cnot", "cx"):
            # native set has CZ only: cx = H_t CZ H_t
            c, t = idx
            lines.append(f"H Q{t}")
            lines.append(f"CZ Q{c} Q{t}")
            lines.append(f"H Q{t}")
        elif name == "barrier":
            lines.append("B " + " ".join(f"Q{q}" for q in idx))
        else:
            raise ValueError(f"gate {name!r} has no QCIS translation; compile first")
    for q in range(n):
        lines.append(f"M Q{q}")
    return "\n".join(lines) + "\n"


def validate_topology(
    qir: Sequence[Dict[str, Any]], coupling_map: Sequence[Tuple[int, int]]
) -> List[Tuple[str, Tuple[int, ...]]]:
    """Return two-qubit instructions violating the device coupling map."""
    allowed = {tuple(sorted(e)) for e in coupling_map}
    bad = []
    for item in qir:
        if len(item["index"]) == 2:
            if tuple(sorted(item["index"])) not in allowed:
                bad.append((item.get("name", "?"), tuple(item["index"])))
    return bad


def list_devices() -> List[Device]:
    return [Device("tianyan_sim", None)]


def get_device_properties(device: Device) -> Dict[str, Any]:
    return {"name": device.name, "native_gates": ["X2P", "RZ", "CZ"], "offline": True}


def submit_task(device: Device, circuit: Any = None, shots: int = 8192, **kws: Any) -> Task:
    raise RuntimeError(
        "tianyan submission requires network access (not available here); "
        "use qir2qcis for offline translation or the 'local' provider"
    )


def list_properties(device: Device, **kws: Any) -> Dict[str, Any]:
    """Alias of :func:`get_device_properties` (reference provider surface)."""
    return get_device_properties(device)


def resubmit_task(task: Any, **kws: Any) -> Any:
    raise NotImplementedError(
        "tianyan QCIS tasks cannot be resubmitted server-side; submit anew"
    )


def remove_task(task: Any, **kws: Any) -> None:
    raise NotImplementedError("tianyan task removal requires the web console")


def list_tasks(**filters: Any) -> List[Any]:
    from . import apis

    return [t for t in apis._tasks.values() if getattr(t.device, "provider", None) and t.device.provider.name == "tianyan"]


def get_task_details(task: Any, **kws: Any) -> Dict[str, Any]:
    return task.details() if hasattr(task, "details") else {"id": str(task)}
