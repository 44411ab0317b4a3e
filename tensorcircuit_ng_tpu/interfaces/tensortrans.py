"""Pytree-aware tensor conversion plumbing (reference ``interfaces/tensortrans.py``)."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

Tensor = Any


def general_args_to_numpy(args: Any) -> Any:
    """Convert any pytree of framework tensors to numpy arrays."""

    def to_np(x: Any) -> Any:
        if hasattr(x, "detach"):  # torch
            return x.detach().cpu().numpy()
        if isinstance(x, (jnp.ndarray, np.ndarray)) or hasattr(x, "__array__"):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(to_np, args)


def numpy_args_to_backend(
    args: Any, dtype: Optional[Any] = None, target: str = "jax"
) -> Any:
    """Convert a numpy pytree to jax (default) or torch tensors."""

    def to_backend(x: Any) -> Any:
        if not isinstance(x, np.ndarray):
            x = np.asarray(x)
        if target == "torch":
            import torch

            t = torch.from_numpy(np.ascontiguousarray(x))
            return t
        t = jnp.asarray(x)
        if dtype is not None:
            t = t.astype(dtype)
        return t

    return jax.tree_util.tree_map(to_backend, args)


def which_dtype(x: Any) -> str:
    return str(np.asarray(x).dtype)


# ======================================================================
# reference-parity conversion surface (interfaces/tensortrans.py:28-314)
# ======================================================================

import functools
from typing import Union


def which_backend(a: Any, return_backend: bool = True) -> Any:
    """Framework of a tensor: "jax" | "numpy" | "torch" | "tensorflow".

    Reference ``tensortrans.py:28``; returns a module-like object with
    ``numpy``/``convert_to_tensor``/``to_dlpack`` when ``return_backend``.
    """
    module = type(a).__module__.split(".")[0]
    table = {
        "jax": "jax",
        "jaxlib": "jax",
        "numpy": "numpy",
        "builtins": "numpy",
        "torch": "torch",
        "tensorflow": "tensorflow",
    }
    bkstr = table.get(module, "numpy")
    if not return_backend:
        return bkstr
    return _MiniBackend(bkstr)


class _MiniBackend:
    """Minimal per-framework conversion shims (numpy/convert/to_dlpack)."""

    def __init__(self, name: str):
        self.name = name

    def numpy(self, t: Any) -> Any:
        if self.name == "torch":
            return t.detach().cpu().numpy()
        if self.name == "tensorflow":
            return t.numpy()
        return np.asarray(t)

    def convert_to_tensor(self, t: Any) -> Any:
        if self.name == "torch":
            import torch

            return torch.as_tensor(np.ascontiguousarray(t).copy())
        if self.name == "tensorflow":
            import tensorflow as tf

            return tf.convert_to_tensor(t)
        if self.name == "numpy":
            return np.asarray(t)
        return jnp.asarray(t)

    def to_dlpack(self, t: Any) -> Any:
        if self.name == "torch":
            import torch.utils.dlpack as tdl

            return tdl.to_dlpack(t)
        if self.name == "tensorflow":
            import tensorflow.experimental.dlpack as tfdl

            return tfdl.to_dlpack(t)
        return t.__dlpack__() if hasattr(t, "__dlpack__") else t

    def from_dlpack(self, cap: Any) -> Any:
        if self.name == "torch":
            import torch.utils.dlpack as tdl

            return tdl.from_dlpack(cap)
        if self.name == "tensorflow":
            import tensorflow.experimental.dlpack as tfdl

            return tfdl.from_dlpack(cap)
        return jnp.from_dlpack(cap) if self.name == "jax" else np.from_dlpack(cap)


def tensor_to_numpy(t: Any) -> Any:
    """Any-framework tensor -> numpy (reference :47)."""
    if isinstance(t, (int, float)) or t is None:
        return t
    return which_backend(t).numpy(t)


def tensor_to_backend_jittable(t: Any) -> Any:
    """Convert only when the tensor is foreign (jit-safe for jax inputs)."""
    if isinstance(t, (int, float)):
        return t
    if which_backend(t, return_backend=False) == "jax":
        return t
    return jnp.asarray(which_backend(t).numpy(t))


def numpy_to_tensor(t: Any, backend: Any = None) -> Any:
    """numpy -> target-backend tensor (reference :65; default jax)."""
    if isinstance(t, (int, float)):
        return t
    if backend is None or getattr(backend, "name", backend) in ("jax", None):
        return jnp.asarray(t)
    if isinstance(backend, str):
        backend = _MiniBackend(backend)
    return backend.convert_to_tensor(t)


def tensor_to_dlpack(t: Any) -> Any:
    """Tensor -> dlpack capsule (reference :71)."""
    return which_backend(t).to_dlpack(t)


def general_args_to_backend(
    args: Any, dtype: Any = None, target_backend: Any = None, enable_dlpack: bool = True
) -> Any:
    """Cross-framework pytree transfer, dlpack fast path (reference :121)."""
    if isinstance(target_backend, str):
        target_backend = _MiniBackend(target_backend)
    if target_backend is None:
        target_backend = _MiniBackend("jax")
    if enable_dlpack:
        try:
            caps = jax.tree_util.tree_map(tensor_to_dlpack, args)
            return jax.tree_util.tree_map(target_backend.from_dlpack, caps)
        except Exception:
            pass
    args = general_args_to_numpy(args)
    return jax.tree_util.tree_map(
        lambda x: numpy_to_tensor(
            np.asarray(x, dtype=dtype) if dtype is not None else x, target_backend
        ),
        args,
    )


def gate_to_matrix(t: Any, is_reshapem: bool = True) -> Any:
    """Gate -> dense tensor/matrix (reference :153)."""
    from ..ops.gates import Gate

    if isinstance(t, Gate):
        return t.matrix() if is_reshapem else t.tensor
    return t


def qop_to_matrix(t: Any, is_reshapem: bool = True) -> Any:
    """QuOperator -> dense matrix/tensor (reference :161)."""
    from ..quantum import QuOperator

    if isinstance(t, QuOperator):
        return t.eval_matrix() if is_reshapem else t.eval_matrix()
    return t


def args_to_tensor(
    f: Callable[..., Any],
    argnums: Union[int, Sequence[int]] = 0,
    tensor_as_matrix: bool = False,
    gate_to_tensor: bool = False,
    gate_as_matrix: bool = True,
    qop_to_tensor: bool = False,
    qop_as_matrix: bool = True,
    cast_dtype: bool = True,
) -> Callable[..., Any]:
    """Decorator converting chosen args to jax tensors (reference :170).

    Gates/QuOperators optionally densify; foreign tensors transfer; dtype
    casts to the framework complex dtype when ``cast_dtype``.
    """
    from .. import config

    if isinstance(argnums, int):
        argnums = (argnums,)

    def convert(x: Any) -> Any:
        from ..ops.gates import Gate
        from ..quantum import QuOperator

        if gate_to_tensor and isinstance(x, Gate):
            x = gate_to_matrix(x, gate_as_matrix)
        if qop_to_tensor and isinstance(x, QuOperator):
            x = qop_to_matrix(x, qop_as_matrix)
        if isinstance(x, (list, tuple)) and x and not np.isscalar(x[0]):
            return type(x)(convert(e) for e in x)
        if hasattr(x, "__array__") or hasattr(x, "detach"):
            x = tensor_to_backend_jittable(x)
            if cast_dtype:
                x = jnp.asarray(x).astype(jnp.dtype(config.dtypestr()))
            return x
        return x

    @functools.wraps(f)
    def wrapper(*args: Any, **kws: Any) -> Any:
        nargs = list(args)
        for i in argnums:
            if i < len(nargs):
                nargs[i] = convert(nargs[i])
        return f(*nargs, **kws)

    return wrapper
