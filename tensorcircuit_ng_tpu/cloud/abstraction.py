"""Provider / Device / Task OO abstraction (reference ``cloud/abstraction.py:44-472``)."""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional, Sequence, Union

__all__ = ["Provider", "Device", "Task"]


class Provider:
    _registry: Dict[str, "Provider"] = {}

    def __init__(self, name: str, lower: bool = True):
        self.name = name.lower() if lower else name
        Provider._registry[self.name] = self

    @classmethod
    def from_name(cls, name: Union[str, "Provider"]) -> "Provider":
        if isinstance(name, Provider):
            return name
        name = name.lower()
        if name not in cls._registry:
            Provider(name)
        return cls._registry[name]

    def list_devices(self) -> List["Device"]:
        from . import apis

        return apis.list_devices(self)

    def __repr__(self) -> str:
        return f"Provider({self.name!r})"


class Device:
    def __init__(self, name: str, provider: Optional[Provider] = None):
        if "::" in name and provider is None:
            pname, name = name.split("::", 1)
            provider = Provider.from_name(pname)
        self.name = name
        self.provider = provider or Provider.from_name("local")

    @classmethod
    def from_name(cls, name: Union[str, "Device"], provider: Any = None) -> "Device":
        if isinstance(name, Device):
            return name
        return cls(name, Provider.from_name(provider) if provider else None)

    def list_properties(self) -> Dict[str, Any]:
        from . import apis

        return apis.get_device_properties(self)

    def submit_task(self, **kws: Any) -> Any:
        from . import apis

        return apis.submit_task(device=self, **kws)

    def __repr__(self) -> str:
        return f"Device({self.provider.name}::{self.name})"


class Task:
    """Handle to a submitted job with a minimal state machine (reference ``:295``)."""

    def __init__(self, id_: Optional[str] = None, device: Optional[Device] = None):
        self.id_ = id_ or str(uuid.uuid4())
        self.device = device
        self._state = "pending"
        self._results: Optional[Dict[str, int]] = None
        self._submit_time = time.time()

    def state(self) -> str:
        return self._state

    status = state

    def _set_results(self, counts: Dict[str, int]) -> None:
        self._results = counts
        self._state = "completed"

    def results(self, blocked: bool = True, format: Optional[str] = None, mitigated: bool = False) -> Any:
        if self._results is None:
            raise RuntimeError(f"task {self.id_} has no results (state={self._state})")
        return dict(self._results)

    def details(self) -> Dict[str, Any]:
        return {
            "id": self.id_,
            "device": repr(self.device),
            "state": self._state,
            "submit_time": self._submit_time,
        }

    def __repr__(self) -> str:
        return f"Task(id={self.id_!r}, state={self._state!r})"
