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


def tf_dtype(dtype: Any) -> Any:
    """str/np dtype -> tf.DType (reference ``interfaces/tensorflow.py``)."""
    import tensorflow as tf

    if isinstance(dtype, tf.DType):
        return dtype
    return tf.as_dtype(str(np.dtype(dtype)) if not isinstance(dtype, str) else dtype)


def tf_wrapper(fun: Callable[..., Any]) -> Callable[..., Any]:
    """Stage a jax-backend function for TF eager consumption (reference name):
    TF tensors in, TF tensors out, numpy transport."""
    from .tensortrans import general_args_to_numpy, numpy_args_to_backend

    def wrapped(*args: Any, **kws: Any) -> Any:
        import tensorflow as tf

        np_args = general_args_to_numpy(args)
        out = fun(*np_args, **kws)
        return jax.tree_util.tree_map(
            lambda x: tf.convert_to_tensor(np.asarray(x)), general_args_to_numpy(out)
        )

    return wrapped
