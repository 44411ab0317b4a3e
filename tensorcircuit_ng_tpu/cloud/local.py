"""Local simulator provider (reference ``cloud/local.py``): executes tasks
in-process on the dense engine and returns counts."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from .abstraction import Device, Task

__all__ = ["submit_task", "list_devices", "get_device_properties"]


def list_devices() -> List[Device]:
    return [Device("default", None), Device("testing", None)]


def get_device_properties(device: Device) -> Dict[str, Any]:
    return {"name": device.name, "qubits": 30, "native_gates": "all", "backend": "statevector"}


def submit_task(
    device: Device,
    circuit: Any = None,
    shots: Union[int, Sequence[int]] = 8192,
    **kws: Any,
) -> Union[Task, List[Task]]:
    circuits = circuit if isinstance(circuit, (list, tuple)) else [circuit]
    shots_list = shots if isinstance(shots, (list, tuple)) else [shots] * len(circuits)
    tasks = []
    for c, s in zip(circuits, shots_list):
        t = Task(device=device)
        counts = c.sample(
            batch=int(s),
            allow_state=True,
            format="count_dict_bin",
        )
        t._set_results({k: int(v) for k, v in counts.items()})
        tasks.append(t)
    if not isinstance(circuit, (list, tuple)):
        return tasks[0]
    return tasks
