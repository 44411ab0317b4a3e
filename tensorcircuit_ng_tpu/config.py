"""Runtime configuration for the TPU-native framework.

The reference (tensorcircuit-ng) implements runtime config by rebinding
module globals across ``sys.modules`` (reference ``cons.py:131-134``).  Here we
use an explicit, thread/async-safe design built on ``contextvars``:

- a process-global default config (mutated by ``set_dtype`` / ``set_backend`` /
  ``set_contractor``),
- a contextvar override stack used by the ``runtime_*`` context managers and
  ``set_function_*`` decorators (reference ``cons.py:90-285, 1269-1314``).

All modules consult :func:`current` lazily at call time, so there is no global
rebinding and jitted functions close over explicit values.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import functools
from typing import Any, Callable, Iterator, Optional

import numpy as np

__all__ = [
    "Config",
    "current",
    "set_dtype",
    "get_dtype",
    "set_backend",
    "get_backend",
    "set_contractor",
    "get_contractor",
    "runtime_dtype",
    "runtime_backend",
    "runtime_contractor",
    "set_function_dtype",
    "set_function_backend",
    "set_function_contractor",
    "dtypestr",
    "rdtypestr",
    "npdtype",
]

_COMPLEX_TO_REAL = {"complex64": "float32", "complex128": "float64"}
_REAL_TO_COMPLEX = {"float32": "complex64", "float64": "complex128"}


@dataclasses.dataclass(frozen=True)
class Config:
    """Immutable snapshot of runtime configuration."""

    dtype: str = "complex64"  # complex dtype for states/gates
    backend: str = "jax"  # "jax" (primary) or "numpy" (eager debug)
    contractor: str = "auto"  # contraction path strategy for the einsum IR
    contractor_options: Optional[dict] = None

    @property
    def rdtype(self) -> str:
        """Real dtype paired with :attr:`dtype`."""
        return _COMPLEX_TO_REAL[self.dtype]

    @property
    def idtype(self) -> str:
        """Int dtype paired with :attr:`dtype` (reference ``cons.py:211-214``)."""
        return "int64" if self.dtype == "complex128" else "int32"

    @property
    def npdtype(self) -> Any:
        return np.dtype(self.dtype)


_default = Config()
_override: contextvars.ContextVar[Optional[Config]] = contextvars.ContextVar(
    "tc_tpu_config_override", default=None
)


def current() -> Config:
    """Return the active configuration (contextvar override or global default)."""
    c = _override.get()
    return c if c is not None else _default


def _normalize_dtype(dtype: str) -> str:
    # reference cons.py:202-207: float aliases still set complex dtypes
    if dtype in _REAL_TO_COMPLEX:
        dtype = _REAL_TO_COMPLEX[dtype]
    if dtype in ("64", 64):
        dtype = "complex64"
    if dtype in ("128", 128):
        dtype = "complex128"
    if dtype not in _COMPLEX_TO_REAL:
        raise ValueError(
            f"unsupported dtype {dtype!r}: use complex64/complex128 "
            "(float32/float64 aliases accepted)"
        )
    return dtype


def _enable_x64(on: bool) -> None:
    import jax

    try:
        jax.config.update("jax_enable_x64", on)
    except Exception:  # pragma: no cover - jax always supports this today
        pass


def set_dtype(dtype: str = "complex64") -> tuple[str, str]:
    """Set the global default dtype.

    Mirrors reference ``cons.py:185-245`` including the x64 flip for
    complex128.  Returns ``(complex_dtype_str, real_dtype_str)``.
    """
    global _default
    dtype = _normalize_dtype(dtype)
    _enable_x64(dtype == "complex128")
    _default = dataclasses.replace(_default, dtype=dtype)
    return dtype, _COMPLEX_TO_REAL[dtype]


def get_dtype() -> str:
    return current().dtype


def set_backend(backend: str = "jax") -> Any:
    """Select the compute backend.

    This framework is TPU/JAX-native; ``"jax"`` (alias ``"tpu"``) is the
    compiled path and ``"numpy"`` is an eager debug path sharing the same
    API via jax's numpy-like semantics.  TensorFlow/PyTorch *backends* from
    the reference are intentionally not supported (torch/tf *interfaces*
    are — see ``interfaces/``).
    """
    global _default
    if backend in ("tpu", "gpu", "cpu"):
        backend = "jax"
    if backend not in ("jax", "numpy"):
        raise ValueError(
            f"backend {backend!r} not supported: this framework is JAX/TPU-native "
            "(use tc.interfaces for torch/tf interop)"
        )
    _default = dataclasses.replace(_default, backend=backend)
    import importlib

    # NOT ``from . import backend``: the package exposes ``backend`` as the
    # live backend INSTANCE, which shadows the submodule of the same name
    _backend_mod = importlib.import_module(__package__ + ".backend")
    return _backend_mod.get_backend(backend)


def get_backend_name() -> str:
    return current().backend


def get_backend() -> Any:
    import importlib

    _backend_mod = importlib.import_module(__package__ + ".backend")
    return _backend_mod.get_backend(current().backend)


def set_contractor(
    method: str = "auto", optimizer: Any = None, **options: Any
) -> str:
    """Set the default contraction-path strategy for the lazy einsum-IR path.

    Methods: ``"auto"`` (opt_einsum auto), ``"greedy"``, ``"optimal"``,
    ``"branch-2"``, ``"plain"`` (sequential), ``"custom"`` (pass an
    opt_einsum-compatible ``optimizer=``).
    """
    global _default
    opts = dict(options)
    if optimizer is not None:
        opts["optimizer"] = optimizer
        method = "custom"
    _default = dataclasses.replace(
        _default, contractor=method, contractor_options=opts or None
    )
    return method


def get_contractor() -> str:
    return current().contractor


@contextlib.contextmanager
def _runtime(**changes: Any) -> Iterator[Config]:
    base = current()
    token = _override.set(dataclasses.replace(base, **changes))
    try:
        yield current()
    finally:
        _override.reset(token)


@contextlib.contextmanager
def runtime_dtype(dtype: str) -> Iterator[Config]:
    dtype = _normalize_dtype(dtype)
    if dtype == "complex128":
        _enable_x64(True)
    with _runtime(dtype=dtype) as c:
        yield c


@contextlib.contextmanager
def runtime_backend(backend: str) -> Iterator[Config]:
    if backend in ("tpu", "gpu", "cpu"):
        backend = "jax"
    with _runtime(backend=backend) as c:
        yield c


@contextlib.contextmanager
def runtime_contractor(method: str = "auto", **options: Any) -> Iterator[Config]:
    with _runtime(contractor=method, contractor_options=options or None) as c:
        yield c


def set_function_dtype(dtype: str) -> Callable:
    """Decorator: run the wrapped function under ``runtime_dtype(dtype)``."""

    def deco(f: Callable) -> Callable:
        @functools.wraps(f)
        def wrapper(*args: Any, **kws: Any) -> Any:
            with runtime_dtype(dtype):
                return f(*args, **kws)

        return wrapper

    return deco


def set_function_backend(backend: str) -> Callable:
    def deco(f: Callable) -> Callable:
        @functools.wraps(f)
        def wrapper(*args: Any, **kws: Any) -> Any:
            with runtime_backend(backend):
                return f(*args, **kws)

        return wrapper

    return deco


def set_function_contractor(method: str = "auto", **options: Any) -> Callable:
    def deco(f: Callable) -> Callable:
        @functools.wraps(f)
        def wrapper(*args: Any, **kws: Any) -> Any:
            with runtime_contractor(method, **options):
                return f(*args, **kws)

        return wrapper

    return deco


def dtypestr() -> str:
    return current().dtype


def rdtypestr() -> str:
    return current().rdtype


def npdtype() -> Any:
    return current().npdtype


def __getattr__(name: str) -> Any:
    """Forward contractor helpers so ``tc.cons.plain_contractor`` etc. work.

    The reference exposes path-finding/contraction utilities on ``cons``
    (reference ``cons.py``: get_symbol, plain_contractor, custom, ...); ours
    live in :mod:`..core.contractor` — forward attribute lookups there.
    """
    from .core import contractor as _contractor

    if hasattr(_contractor, name):
        return getattr(_contractor, name)
    raise AttributeError(f"module 'tensorcircuit_ng_tpu.config' has no attribute {name!r}")


# reference-parity module constants (cons.py:72,76)
package_name = "tensorcircuit_ng_tpu"
idtypestr = "int32"
