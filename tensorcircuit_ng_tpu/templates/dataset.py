"""Data encoding helpers for QML (reference ``templates/dataset.py``)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

__all__ = ["amplitude_encoding", "mnist_pair_data"]


def amplitude_encoding(fig: Any, nqubits: int, index: Optional[Any] = None) -> Any:
    """L2-normalize flattened data into a 2^n amplitude vector.

    NON-batch, exactly the reference's pipeline (``dataset.py:15-36``):
    flatten everything → normalize → zero-pad to 2^n → optional index
    gather.  Batch with ``jax.vmap`` (vectorized argnum 0).
    """
    import jax.numpy as jnp

    flat = jnp.reshape(jnp.asarray(fig), (-1,))
    dim = 2**nqubits
    if flat.shape[0] > dim:
        # truncate BEFORE normalizing so the returned vector is a valid
        # quantum state (the reference neither truncates nor renormalizes
        # oversized input; truncating after the norm left ||out|| < 1)
        flat = flat[:dim]
    nrm = jnp.linalg.norm(flat)
    flat = flat / jnp.where(nrm == 0, 1.0, nrm)
    size = flat.shape[0]
    if size < dim:
        flat = jnp.pad(flat, (0, dim - size))
    if index is not None:
        flat = flat[jnp.asarray(index).astype(jnp.int32)]
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
