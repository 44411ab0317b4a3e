"""Tencent quantum cloud provider (reference ``cloud/tencent.py``).

API-shape-complete port of the provider functions; HTTP goes through
:mod:`tensorcircuit_ng_tpu.cloud.utils` (retry + proxy).  Endpoints follow
the reference's payload contract; without network/token every entry raises a
clear error instead of hanging.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

from .abstraction import Device, Provider, Task
from .utils import rget_json, rpost_json

__all__ = [
    "tencent_headers",
    "error_handling",
    "list_devices",
    "list_properties",
    "get_device_properties",
    "submit_task",
    "resubmit_task",
    "remove_task",
    "list_tasks",
    "get_task_details",
]

_BASE = "https://quantum.tencent.com/api/v1"


def tencent_headers(token: Optional[str] = None) -> Dict[str, str]:
    """Auth headers for the Tencent API (reference ``tencent_headers``)."""
    if token is None:
        from . import apis

        token = apis.get_token("tencent")
    if token is None:
        raise ValueError("no token set for provider 'tencent' (use apis.set_token)")
    return {"Authorization": f"Bearer {token}", "Content-Type": "application/json"}


def error_handling(payload: Dict[str, Any]) -> Dict[str, Any]:
    """Raise on API-level error envelopes (reference ``error_handling``)."""
    if not isinstance(payload, dict):
        raise ValueError(f"malformed provider response: {payload!r}")
    if payload.get("err") or payload.get("error"):
        raise RuntimeError(f"tencent API error: {payload.get('err') or payload.get('error')}")
    return payload


def list_devices(token: Optional[str] = None, **kws: Any) -> List[Device]:
    payload = error_handling(rget_json(f"{_BASE}/devices", headers=tencent_headers(token)))
    provider = Provider("tencent")
    return [Device(d["id"], provider) for d in payload.get("devices", [])]


def list_properties(device: Device, token: Optional[str] = None) -> Dict[str, Any]:
    payload = error_handling(
        rget_json(f"{_BASE}/devices/{device.name}", headers=tencent_headers(token))
    )
    return payload.get("device", payload)


get_device_properties = list_properties


def submit_task(
    device: Device,
    circuit: Any = None,
    shots: int = 8192,
    source: Optional[str] = None,
    token: Optional[str] = None,
    **kws: Any,
) -> Task:
    """Submit an OpenQASM job (reference contract: source + shots + device)."""
    if source is None:
        source = circuit.to_openqasm()
    payload = error_handling(
        rpost_json(
            f"{_BASE}/tasks",
            body={"device": device.name, "shots": shots, "source": source, "lang": "OPENQASM"},
            headers=tencent_headers(token),
        )
    )
    t = Task(payload["task"]["id"], device)
    return t


def resubmit_task(task: Union[str, Task], token: Optional[str] = None, **kws: Any) -> Task:
    tid = task.id_ if isinstance(task, Task) else task
    payload = error_handling(
        rpost_json(f"{_BASE}/tasks/{tid}/resubmit", headers=tencent_headers(token))
    )
    return Task(payload["task"]["id"])


def remove_task(task: Union[str, Task], token: Optional[str] = None) -> None:
    tid = task.id_ if isinstance(task, Task) else task
    error_handling(
        rpost_json(f"{_BASE}/tasks/{tid}/remove", headers=tencent_headers(token))
    )


def list_tasks(device: Optional[Device] = None, token: Optional[str] = None, **filters: Any) -> List[Task]:
    url = f"{_BASE}/tasks"
    if device is not None:
        url += f"?device={device.name}"
    payload = error_handling(rget_json(url, headers=tencent_headers(token)))
    return [Task(t["id"]) for t in payload.get("tasks", [])]


def get_task_details(task: Union[str, Task], token: Optional[str] = None) -> Dict[str, Any]:
    tid = task.id_ if isinstance(task, Task) else task
    payload = error_handling(rget_json(f"{_BASE}/tasks/{tid}", headers=tencent_headers(token)))
    return payload.get("task", payload)
