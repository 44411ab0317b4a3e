"""Numpy interface (reference ``interfaces/numpy.py:14``)."""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import jax

from .tensortrans import general_args_to_numpy, numpy_args_to_backend

__all__ = ["numpy_interface", "np_interface"]


def numpy_interface(fun: Callable[..., Any], jit: bool = False) -> Callable[..., Any]:
    """Wrap a jax-backed function to accept and return numpy arrays."""
    if jit:
        fun = jax.jit(fun)

    def wrapper(*args: Any, **kws: Any) -> Any:
        args_jax = numpy_args_to_backend(general_args_to_numpy(args))
        out = fun(*args_jax, **kws)
        return general_args_to_numpy(out)

    return wrapper


# reference alias (interfaces/numpy.py:61)
np_interface = numpy_interface
