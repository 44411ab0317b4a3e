"""Data encoding helpers for QML (reference ``templates/dataset.py``)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

__all__ = ["amplitude_encoding", "mnist_pair_data"]


def amplitude_encoding(fig: Any, nqubits: int, index: Optional[Any] = None) -> Any:
    """L2-normalize flattened data into a 2^n amplitude vector.

    Reference ``dataset.py:amplitude_encoding``; batched inputs keep the
    leading axis.
    """
    import jax.numpy as jnp

    x = jnp.asarray(fig)
    batched = x.ndim > 2 or (x.ndim == 2 and x.shape[-1] != x.shape[-2] and x.shape[0] > 2**nqubits)
    if x.ndim >= 2 and x.shape[0] != 2**nqubits:
        # heuristically treat axis 0 as batch when flattening overflows
        pass
    flat = jnp.reshape(x, (x.shape[0], -1)) if x.ndim > 1 else jnp.reshape(x, (1, -1))
    size = flat.shape[-1]
    dim = 2**nqubits
    if size < dim:
        flat = jnp.pad(flat, ((0, 0), (0, dim - size)))
    else:
        flat = flat[:, :dim]
    if index is not None:
        flat = flat[:, jnp.asarray(index)]
    nrm = jnp.linalg.norm(flat, axis=-1, keepdims=True)
    flat = flat / jnp.where(nrm == 0, 1.0, nrm)
    if x.ndim == 1:
        return flat[0]
    return flat


def mnist_pair_data(
    a: int = 3, b: int = 6, binarize: bool = False, loader: Optional[Any] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Filter an (x, y) MNIST-style dataset down to two classes.

    ``loader`` must return ((x_train, y_train), (x_test, y_test)) — no
    network access is attempted here (reference downloads via keras).
    """
    if loader is None:
        raise ValueError(
            "provide loader=... returning ((x_train,y_train),(x_test,y_test))"
        )
    (x_train, y_train), (x_test, y_test) = loader()

    def filt(x, y):
        keep = (y == a) | (y == b)
        x, y = x[keep], y[keep]
        y = (y == b).astype(np.int64)
        x = x / 255.0
        if binarize:
            x = (x > 0.5).astype(np.float64)
        return x, y

    x_train, y_train = filt(x_train, y_train)
    x_test, y_test = filt(x_test, y_test)
    return x_train, y_train, x_test, y_test
