"""JAX-facing interface (reference ``interfaces/jax.py``).

This framework is JAX-native, so these are thin: ``jax_wrapper`` stages a
backend function for jax consumption; ``create_jax_function`` /
``jax_interface`` return jax-callable (optionally jitted) functions with AD
via the function's own VJP.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

__all__ = ["jax_interface", "jax_wrapper", "create_jax_function"]


def jax_wrapper(fun: Callable[..., Any]) -> Callable[..., Any]:
    """Wrap a backend function for the jax runtime (identity here)."""

    def wrapped(*args: Any, **kws: Any) -> Any:
        return fun(*args, **kws)

    return wrapped


def create_jax_function(fun: Callable[..., Any], jit: bool = False) -> Callable[..., Any]:
    """Return a jax-callable version of ``fun`` (reference name)."""
    f = jax_wrapper(fun)
    return jax.jit(f) if jit else f


def jax_interface(fun: Callable[..., Any], jit: bool = False) -> Callable[..., Any]:
    """Reference ``interfaces/jax.py:69``: jax-native passthrough."""
    return create_jax_function(fun, jit=jit)
