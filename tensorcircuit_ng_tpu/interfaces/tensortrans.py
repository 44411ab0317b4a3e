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
