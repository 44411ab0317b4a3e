"""Keras/Flax-style layer wrappers for quantum functions.

Counterpart of reference ``keras.py:19-289`` (``QuantumLayer``/``KerasLayer``).
TPU-native twist: the primary `QuantumLayer` is a **Flax linen module** (flax
is the JAX-native NN library in this stack); a tf.keras adapter is provided
behind an optional TensorFlow import for drop-in reference parity.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "QuantumLayer",
    "KerasLayer",
    "KerasHardwareLayer",
    "save_func",
    "load_func",
]


def save_func(f, path, *args, **kws):
    """Serialize a jitted function via jax.export (reference keras save util)."""
    from .experimental import jax_jitted_function_save

    jax_jitted_function_save(path, f, *args, **kws)


def load_func(path):
    from .experimental import jax_jitted_function_load

    return jax_jitted_function_load(path)

try:
    import flax.linen as nn

    class QuantumLayer(nn.Module):  # type: ignore
        """Flax module wrapping ``f(params, *inputs) -> output``.

        ``weights_shape``: shape (or list of shapes) of trainable parameters.
        """

        f: Callable[..., Any]
        weights_shape: Union[Tuple[int, ...], Sequence[Tuple[int, ...]]]
        initializer: Optional[Any] = None

        @nn.compact
        def __call__(self, *inputs: Any) -> Any:
            shapes = self.weights_shape
            if shapes and isinstance(shapes[0], int):
                shapes = [tuple(shapes)]
            init = self.initializer or nn.initializers.normal(stddev=0.1)
            ws = [
                self.param(f"w{i}", init, tuple(s), jnp.float32)
                for i, s in enumerate(shapes)
            ]
            return self.f(*ws, *inputs)

except ImportError:  # pragma: no cover - flax is vendored in this image
    QuantumLayer = None  # type: ignore


def KerasLayer(f: Callable[..., Any], weights_shape: Any, **kws: Any) -> Any:
    """tf.keras.layers.Layer wrapping a jax-backed quantum function.

    Requires tensorflow; gradients flow through a jax VJP bridge.
    """
    import tensorflow as tf  # type: ignore

    from .interfaces.tensortrans import general_args_to_numpy

    if weights_shape and isinstance(weights_shape[0], int):
        weights_shape = [tuple(weights_shape)]

    class _Layer(tf.keras.layers.Layer):  # type: ignore
        def build(self, input_shape: Any) -> None:
            self.ws = [
                self.add_weight(
                    name=f"w{i}",
                    shape=s,
                    initializer=tf.keras.initializers.RandomNormal(stddev=0.1),
                    trainable=True,
                )
                for i, s in enumerate(weights_shape)
            ]

        def call(self, inputs: Any) -> Any:
            nw = len(self.ws)

            @tf.custom_gradient
            def run(*args: Any):
                jax_args = [jnp.asarray(np.asarray(a)) for a in args]

                def f_batched(*a: Any) -> Any:
                    # keras feeds (batch, features); weights are shared
                    return jax.vmap(lambda x: f(*a[:nw], x))(a[nw])

                y, vjp = jax.vjp(f_batched, *jax_args)

                def grad(dy: Any):
                    gs = vjp(jnp.asarray(np.asarray(dy)).astype(np.asarray(y).dtype))
                    return tuple(tf.convert_to_tensor(np.asarray(g)) for g in gs)

                return tf.convert_to_tensor(np.asarray(y)), grad

            # pass plain tensors: tf.custom_gradient over raw Variables
            # demands the `variables=` protocol; reading them first lets
            # gradients flow to the Variables through the read op instead
            return run(*[tf.convert_to_tensor(w) for w in self.ws], inputs)

    return _Layer(**kws)


def KerasHardwareLayer(f: Callable[..., Any], weights_shape: Any, **kws: Any) -> Any:
    """Hardware variant: gradients via parameter shift instead of AD."""
    from .experimental import parameter_shift_grad

    grad_f = parameter_shift_grad(f)
    return KerasLayer(f, weights_shape, **kws)


def output_asis_loss(y_true: Any, y_pred: Any) -> Any:
    """Loss that IS the model output (reference ``keras.py:179``); framework
    agnostic — works for keras and jax training loops alike."""
    return y_pred


if QuantumLayer is not None:

    class HardwareLayer(QuantumLayer):  # type: ignore[misc,valid-type]
        """QPU-backed layer (reference ``keras.py:143``).

        Same forward as :class:`QuantumLayer`; intended for callables whose
        gradient comes from parameter shift rather than AD — wrap ``f`` with
        :func:`tensorcircuit_ng_tpu.experimental.parameter_shift_grad` for
        training. ``call`` aliases ``__call__`` (keras parity).
        """

        def call(self, *inputs: Any) -> Any:
            return self(*inputs)

else:  # pragma: no cover - flax is vendored in this image

    def HardwareLayer(f: Callable[..., Any], weights_shape: Any, **kws: Any) -> Any:  # type: ignore[misc]
        """QPU-backed layer; tf fallback via :func:`KerasHardwareLayer`."""
        return KerasHardwareLayer(f, weights_shape, **kws)


if QuantumLayer is not None:
    def _ql_build(self, input_shape: Any = None) -> None:
        """keras-era no-op: flax parameters build at ``init`` (ref parity)."""

    QuantumLayer.build = _ql_build
    QuantumLayer.call = QuantumLayer.__call__
    __all__ += ["HardwareLayer", "output_asis_loss"]
