"""Qudit (d-level) gate matrices.

Counterpart of reference ``quditgates.py:84-617``: clock-and-shift X/Z,
generalized H (Fourier), two-level rotations rx/ry/rz, u8, cphase, csum.
All functions return dense (d, d) or (d^2, d^2) jnp matrices at the active
dtype and are jit/AD transparent in their angle parameters.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax.numpy as jnp

from .. import config

Tensor = Any

__all__ = [
    "x_matrix_func",
    "z_matrix_func",
    "s_matrix_func",
    "rzz_matrix_func",
    "rxx_matrix_func",
    "h_matrix_func",
    "i_matrix_func",
    "rx_matrix_func",
    "ry_matrix_func",
    "rz_matrix_func",
    "phase_matrix_func",
    "u8_matrix_func",
    "cphase_matrix_func",
    "csum_matrix_func",
    "swap_matrix_func",
]


def _dt() -> Any:
    return jnp.dtype(config.dtypestr())


def i_matrix_func(d: int) -> Tensor:
    return jnp.eye(d, dtype=_dt())


def x_matrix_func(d: int) -> Tensor:
    """Shift: X|j> = |j+1 mod d>."""
    m = np.zeros((d, d))
    for j in range(d):
        m[(j + 1) % d, j] = 1.0
    return jnp.asarray(m, dtype=_dt())


def z_matrix_func(d: int, omega: Optional[complex] = None) -> Tensor:
    """Clock: Z|j> = w^j |j>, w = omega or exp(2 pi i / d) (reference ``:111``)."""
    w = np.exp(2j * np.pi / d) if omega is None else omega
    return jnp.asarray(np.diag(w ** np.arange(d)), dtype=_dt())


def h_matrix_func(d: int, omega: Optional[complex] = None) -> Tensor:
    """Generalized Hadamard (quantum Fourier): H_{jk} = w^{jk}/sqrt(d)
    (reference ``:129``, custom root of unity via ``omega``)."""
    w = np.exp(2j * np.pi / d) if omega is None else omega
    j, k = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    return jnp.asarray(w ** (j * k) / np.sqrt(d), dtype=_dt())


def _two_level(d: int, block: Tensor, j: int, k: int) -> Tensor:
    m = jnp.eye(d, dtype=_dt())
    m = m.at[j, j].set(block[0, 0])
    m = m.at[j, k].set(block[0, 1])
    m = m.at[k, j].set(block[1, 0])
    m = m.at[k, k].set(block[1, 1])
    return m


def s_matrix_func(d: int, omega: Optional[complex] = None) -> Tensor:
    r"""Qudit phase gate: S|j> = w^{j(j+p)/2}|j>, p = d mod 2 (reference ``:148``)."""
    w = np.exp(2j * np.pi / d) if omega is None else omega
    j = np.arange(d)
    p = d % 2
    return jnp.asarray(np.diag(w ** (j * (j + p) / 2.0)), dtype=_dt())


def _pair_index(d: int, j1: int, k1: int, j2: int, k2: int) -> tuple:
    for v in (j1, k1, j2, k2):
        if not 0 <= v < d:
            raise ValueError(f"level index {v} out of range for d={d}")
    a, b = j1 * d + j2, k1 * d + k2
    if a == b:
        raise ValueError("subspace states must be distinct")
    return a, b


def rzz_matrix_func(
    d: int, theta: Any = 0, j1: int = 0, k1: int = 1, j2: int = 0, k2: int = 1
) -> Tensor:
    r"""Two-qudit RZZ on the |j1 j2>, |k1 k2> subspace (reference ``:339``).

    diag(e^{-i theta/2}, e^{+i theta/2}) on the selected pair, identity
    elsewhere.
    """
    a, b = _pair_index(d, j1, k1, j2, k2)
    theta = jnp.asarray(theta).astype(_dt())
    m = jnp.eye(d * d, dtype=_dt())
    m = m.at[a, a].set(jnp.exp(-1j * theta / 2.0))
    m = m.at[b, b].set(jnp.exp(1j * theta / 2.0))
    return m


def rxx_matrix_func(
    d: int, theta: Any = 0, j1: int = 0, k1: int = 1, j2: int = 0, k2: int = 1
) -> Tensor:
    r"""Two-qudit RXX on the |j1 j2>, |k1 k2> subspace (reference ``:381``)."""
    a, b = _pair_index(d, j1, k1, j2, k2)
    theta = jnp.asarray(theta).astype(_dt())
    c = jnp.cos(theta / 2.0)
    s = -1j * jnp.sin(theta / 2.0)
    m = jnp.eye(d * d, dtype=_dt())
    m = m.at[a, a].set(c)
    m = m.at[b, b].set(c)
    m = m.at[a, b].set(s)
    m = m.at[b, a].set(s)
    return m


def rx_matrix_func(d: int, theta: Any = 0, j: int = 0, k: int = 1) -> Tensor:
    """Two-level rx rotation in the (j, k) subspace."""
    theta = jnp.asarray(theta).astype(_dt())
    c = jnp.cos(theta / 2)
    s = -1j * jnp.sin(theta / 2)
    block = jnp.stack([jnp.stack([c, s]), jnp.stack([s, c])])
    return _two_level(d, block, j, k)


def ry_matrix_func(d: int, theta: Any = 0, j: int = 0, k: int = 1) -> Tensor:
    theta = jnp.asarray(theta).astype(_dt())
    c = jnp.cos(theta / 2)
    s = jnp.sin(theta / 2)
    block = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])
    return _two_level(d, block, j, k)


def rz_matrix_func(d: int, theta: Any = 0, j: int = 0, k: int = 1) -> Tensor:
    theta = jnp.asarray(theta).astype(_dt())
    m = jnp.eye(d, dtype=_dt())
    m = m.at[j, j].set(jnp.exp(-1j * theta / 2))
    m = m.at[k, k].set(jnp.exp(1j * theta / 2))
    return m


def phase_matrix_func(d: int, theta: Any = 0, j: int = 1) -> Tensor:
    """diag with exp(i theta) at level j."""
    theta = jnp.asarray(theta).astype(_dt())
    m = jnp.eye(d, dtype=_dt())
    return m.at[j, j].set(jnp.exp(1j * theta))


def u8_matrix_func(
    d: int, gamma: Any = 0, z: Any = 0, eps: Any = 0,
    omega: Optional[complex] = None,
) -> Tensor:
    """Qutrit U8 phase gate diag(w^{...}) (reference ``quditgates.py:422``)."""
    if d != 3:
        raise ValueError("u8 gate is defined for qutrits (d=3)")
    w = jnp.asarray(
        np.exp(2j * np.pi / 3) if omega is None else omega
    ).astype(_dt())
    gamma = jnp.asarray(gamma).astype(_dt())
    z = jnp.asarray(z).astype(_dt())
    eps = jnp.asarray(eps).astype(_dt())
    diag = jnp.stack(
        [jnp.ones((), dtype=_dt()), w**z * jnp.exp(1j * gamma), w ** (2 * z) * jnp.exp(1j * eps)]
    )
    return jnp.diag(diag)


def cphase_matrix_func(
    d: int, cv: Optional[int] = None, theta: Any = None,
    omega: Optional[complex] = None,
) -> Tensor:
    """Controlled phase (reference ``:516``): the SUMZ block-diagonal
    |j,k> -> w^{jk}|j,k> when ``theta`` is None (``cv`` selects the single
    control value applying Z, reference convention; ``omega`` a custom
    root of unity), or the selective theta-phase form otherwise."""
    if theta is None:
        w = np.exp(2j * np.pi / d) if omega is None else omega
        if cv is not None:
            if not (0 <= cv < d):
                raise ValueError(f"cv must be in [0, {d - 1}], got {cv}")
            m = np.eye(d * d, dtype=np.complex128)
            for t in range(d):
                m[cv * d + t, cv * d + t] = w**t
            return jnp.asarray(m, dtype=_dt())
        j, k = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        diag = (w ** (j * k)).reshape(-1)
        return jnp.asarray(np.diag(diag), dtype=_dt())
    theta = jnp.asarray(theta).astype(_dt())
    cv = d - 1 if cv is None else cv
    m = jnp.eye(d * d, dtype=_dt())
    for t in range(d):
        idx = cv * d + t
        m = m.at[idx, idx].set(jnp.exp(1j * theta * t))
    return m


def csum_matrix_func(d: int, cv: Optional[int] = None) -> Tensor:
    """Controlled sum (generalized CNOT, reference ``:568``): the SUMX
    block-diagonal |j,k> -> |j, j+k mod d>, or — with ``cv`` — a single X
    shift on the target only when the control reads ``cv``."""
    m = np.zeros((d * d, d * d))
    if cv is not None:
        if not (0 <= cv < d):
            raise ValueError(f"cv must be in [0, {d - 1}], got {cv}")
        for j in range(d):
            for k in range(d):
                shift = 1 if j == cv else 0
                m[j * d + (k + shift) % d, j * d + k] = 1.0
        return jnp.asarray(m, dtype=_dt())
    for j in range(d):
        for k in range(d):
            m[j * d + (j + k) % d, j * d + k] = 1.0
    return jnp.asarray(m, dtype=_dt())


def swap_matrix_func(d: int) -> Tensor:
    m = np.zeros((d * d, d * d))
    for j in range(d):
        for k in range(d):
            m[k * d + j, j * d + k] = 1.0
    return jnp.asarray(m, dtype=_dt())


# name -> (parameter names, builder) registries (reference quditgates.py:23-58).
# Builders follow the reference calling convention ``builder(d, omega, **kw)``
# — ``omega`` (a custom primitive root of unity) is accepted positionally or
# by keyword and threaded into the omega-aware matrix functions; our
# keyword-only call style ``builder(d, theta=...)`` keeps working since
# ``omega`` defaults to None.
SINGLE_BUILDERS = {
    "I": (("none",), lambda d, omega=None, **kw: i_matrix_func(d)),
    "X": (("none",), lambda d, omega=None, **kw: x_matrix_func(d)),
    "Z": (("none",), lambda d, omega=None, **kw: z_matrix_func(d, omega)),
    "H": (("none",), lambda d, omega=None, **kw: h_matrix_func(d, omega)),
    "S": (("none",), lambda d, omega=None, **kw: s_matrix_func(d, omega)),
    "RX": (("theta", "j", "k"), lambda d, omega=None, **kw: rx_matrix_func(d, kw.get("theta", 0), kw.get("j", 0), kw.get("k", 1))),
    "RY": (("theta", "j", "k"), lambda d, omega=None, **kw: ry_matrix_func(d, kw.get("theta", 0), kw.get("j", 0), kw.get("k", 1))),
    "RZ": (("theta", "j"), lambda d, omega=None, **kw: rz_matrix_func(d, kw.get("theta", 0), kw.get("j", 0))),
    "PHASE": (("theta", "j"), lambda d, omega=None, **kw: phase_matrix_func(d, kw.get("theta", 0), kw.get("j", 1))),
    "U8": (("gamma", "z", "eps"), lambda d, omega=None, **kw: u8_matrix_func(d, kw.get("gamma", 0), kw.get("z", 0), kw.get("eps", 0), omega)),
}

TWO_BUILDERS = {
    "RXX": (("theta", "j1", "k1", "j2", "k2"), lambda d, omega=None, **kw: rxx_matrix_func(d, kw.get("theta", 0), kw.get("j1", 0), kw.get("k1", 1), kw.get("j2", 0), kw.get("k2", 1))),
    "RZZ": (("theta",), lambda d, omega=None, **kw: rzz_matrix_func(d, kw.get("theta", 0))),
    "CPHASE": (("cv", "theta"), lambda d, omega=None, **kw: cphase_matrix_func(d, kw.get("cv"), kw.get("theta"), omega)),
    "CSUM": (("cv",), lambda d, omega=None, **kw: csum_matrix_func(d, kw.get("cv"))),
    "SWAP": (("none",), lambda d, omega=None, **kw: swap_matrix_func(d)),
}
