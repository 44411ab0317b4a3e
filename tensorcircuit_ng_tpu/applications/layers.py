"""Parameterized circuit-layer generators (reference ``applications/layers.py``)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np

__all__ = [
    "rx_layer",
    "ry_layer",
    "rz_layer",
    "zz_layer",
    "xx_layer",
    "yy_layer",
    "cnot_ring",
    "cz_ring",
    "entangler_layer",
]


def rx_layer(c: Any, params: Any) -> Any:
    for i in range(c.nqubits):
        c.rx(i, theta=params[i])
    return c


def ry_layer(c: Any, params: Any) -> Any:
    for i in range(c.nqubits):
        c.ry(i, theta=params[i])
    return c


def rz_layer(c: Any, params: Any) -> Any:
    for i in range(c.nqubits):
        c.rz(i, theta=params[i])
    return c


def _bond_layer(c: Any, params: Any, g: Optional[Any], gate: str) -> Any:
    n = c.nqubits
    if g is None:
        bonds = [(i, i + 1) for i in range(n - 1)]
    else:
        bonds = list(g.edges) if hasattr(g, "edges") else list(g)
    for k, (a, b) in enumerate(bonds):
        theta = params[k] if hasattr(params, "__len__") or getattr(params, "ndim", 0) else params
        getattr(c, gate)(a, b, theta=theta)
    return c


def zz_layer(c: Any, params: Any, g: Optional[Any] = None) -> Any:
    return _bond_layer(c, params, g, "rzz")


def xx_layer(c: Any, params: Any, g: Optional[Any] = None) -> Any:
    return _bond_layer(c, params, g, "rxx")


def yy_layer(c: Any, params: Any, g: Optional[Any] = None) -> Any:
    return _bond_layer(c, params, g, "ryy")


def cnot_ring(c: Any) -> Any:
    n = c.nqubits
    for i in range(n):
        c.cnot(i, (i + 1) % n)
    return c


def cz_ring(c: Any) -> Any:
    n = c.nqubits
    for i in range(n):
        c.cz(i, (i + 1) % n)
    return c


def entangler_layer(c: Any, params: Any) -> Any:
    """ry-rz + cnot ladder entangling layer."""
    n = c.nqubits
    for i in range(n):
        c.ry(i, theta=params[0, i])
        c.rz(i, theta=params[1, i])
    for i in range(n - 1):
        c.cnot(i, i + 1)
    return c
