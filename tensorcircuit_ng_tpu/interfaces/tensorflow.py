"""TensorFlow interface (reference ``interfaces/tensorflow.py:38``).

TensorFlow is not vendored in this image; the wrapper imports lazily and
raises a clear error otherwise.  When available, the jax function is exposed
through ``tf.custom_gradient`` with numpy crossings.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["tensorflow_interface", "tf_interface"]


def tensorflow_interface(fun: Callable[..., Any], ydtype: Any = None, jit: bool = False) -> Callable[..., Any]:
    try:
        import tensorflow as tf  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "tensorflow is not installed in this environment; use the torch or "
            "scipy interfaces, or install tensorflow"
        ) from e

    if jit:
        fun = jax.jit(fun)

    def wrapper(*args: Any) -> Any:
        @tf.custom_gradient
        def run(*tf_args: Any):
            np_args = [np.asarray(a) for a in tf_args]
            jax_args = [jnp.asarray(a) for a in np_args]
            y, vjp = jax.vjp(fun, *jax_args)

            def grad(dy: Any, variables: Any = None):
                gy = jnp.asarray(np.asarray(dy)).astype(np.asarray(y).dtype)
                gs = vjp(gy)
                out = [tf.convert_to_tensor(np.asarray(g)) for g in gs]
                if variables is not None:
                    return out, []
                return out

            return tf.convert_to_tensor(np.asarray(y)), grad

        return run(*args)

    return wrapper


tf_interface = tensorflow_interface
