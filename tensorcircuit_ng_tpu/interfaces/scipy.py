"""Scipy optimizer interface (reference ``interfaces/scipy.py:15``)."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Tensor = Any

__all__ = ["scipy_interface", "scipy_optimize_interface"]


def scipy_optimize_interface(
    fun: Callable[..., Any],
    shape: Optional[Sequence[int]] = None,
    jit: bool = True,
    gradient: bool = True,
) -> Callable[..., Any]:
    """Produce ``f(x_flat) -> (value, grad_flat)`` for ``scipy.optimize.minimize``.

    The returned function accepts/returns float64 numpy arrays, flattening
    the parameter shape; use ``jac=True`` in minimize when ``gradient``.
    """
    if gradient:
        vg = jax.value_and_grad(fun)
        if jit:
            vg = jax.jit(vg)

        def f(x: np.ndarray, *args: Any) -> Tuple[float, np.ndarray]:
            xj = jnp.asarray(x, dtype=jnp.float32)
            if shape is not None:
                xj = jnp.reshape(xj, shape)
            v, g = vg(xj, *args)
            return float(np.asarray(v)), np.asarray(g, dtype=np.float64).reshape(-1)

        return f
    fn = jax.jit(fun) if jit else fun

    def f_only(x: np.ndarray, *args: Any) -> float:
        xj = jnp.asarray(x, dtype=jnp.float32)
        if shape is not None:
            xj = jnp.reshape(xj, shape)
        return float(np.asarray(fn(xj, *args)))

    return f_only


scipy_interface = scipy_optimize_interface
