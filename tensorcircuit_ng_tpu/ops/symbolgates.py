"""Sympy-exact gate matrices (reference ``symbolgates.py`` role).

Exact symbolic forms of the standard gate set for algebraic manipulation
(`sympy.Matrix`), plus parameterized rotations over free symbols. Consumed
by :class:`~tensorcircuit_ng_tpu.models.symbolcircuit.SymbolCircuit` and
usable standalone for exact circuit identities.
"""

from __future__ import annotations

from typing import Any

__all__ = [
    "sym_i", "sym_x", "sym_y", "sym_z", "sym_h", "sym_s", "sym_sd",
    "sym_t", "sym_td", "sym_cnot", "sym_cz", "sym_swap",
    "sym_rx", "sym_ry", "sym_rz", "sym_phase", "sym_rzz", "sym_u",
]


def _sp() -> Any:
    import sympy

    return sympy


def sym_i() -> Any:
    sp = _sp()
    return sp.eye(2)


def sym_x() -> Any:
    sp = _sp()
    return sp.Matrix([[0, 1], [1, 0]])


def sym_y() -> Any:
    sp = _sp()
    return sp.Matrix([[0, -sp.I], [sp.I, 0]])


def sym_z() -> Any:
    sp = _sp()
    return sp.Matrix([[1, 0], [0, -1]])


def sym_h() -> Any:
    sp = _sp()
    return sp.Matrix([[1, 1], [1, -1]]) / sp.sqrt(2)


def sym_s() -> Any:
    sp = _sp()
    return sp.Matrix([[1, 0], [0, sp.I]])


def sym_sd() -> Any:
    return sym_s().conjugate().T


def sym_t() -> Any:
    sp = _sp()
    return sp.Matrix([[1, 0], [0, sp.exp(sp.I * sp.pi / 4)]])


def sym_td() -> Any:
    return sym_t().conjugate().T


def sym_cnot() -> Any:
    sp = _sp()
    return sp.Matrix([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])


def sym_cz() -> Any:
    sp = _sp()
    return sp.diag(1, 1, 1, -1)


def sym_swap() -> Any:
    sp = _sp()
    return sp.Matrix([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]])


def sym_rx(theta: Any) -> Any:
    sp = _sp()
    c, s = sp.cos(theta / 2), sp.sin(theta / 2)
    return sp.Matrix([[c, -sp.I * s], [-sp.I * s, c]])


def sym_ry(theta: Any) -> Any:
    sp = _sp()
    c, s = sp.cos(theta / 2), sp.sin(theta / 2)
    return sp.Matrix([[c, -s], [s, c]])


def sym_rz(theta: Any) -> Any:
    sp = _sp()
    return sp.diag(sp.exp(-sp.I * theta / 2), sp.exp(sp.I * theta / 2))


def sym_phase(theta: Any) -> Any:
    sp = _sp()
    return sp.diag(1, sp.exp(sp.I * theta))


def sym_rzz(theta: Any) -> Any:
    sp = _sp()
    em, ep = sp.exp(-sp.I * theta / 2), sp.exp(sp.I * theta / 2)
    return sp.diag(em, ep, ep, em)


def sym_u(theta: Any, phi: Any, lbd: Any) -> Any:
    sp = _sp()
    c, s = sp.cos(theta / 2), sp.sin(theta / 2)
    return sp.Matrix(
        [
            [c, -sp.exp(sp.I * lbd) * s],
            [sp.exp(sp.I * phi) * s, sp.exp(sp.I * (phi + lbd)) * c],
        ]
    )


# ======================================================================
# reference-parity symbolic gates (symbolgates.py:22-361)
# ======================================================================

import numpy as np


def sym_wroot() -> Any:
    """sqrt-of-W gate (reference ``sym_wroot``)."""
    sp = _sp()
    v = sp.Rational(1, 1) / sp.sqrt(2)
    return sp.Matrix(
        [
            [v, -v * (1 + sp.I) / sp.sqrt(2)],
            [v * (1 - sp.I) / sp.sqrt(2), v],
        ]
    )


def sym_cy() -> Any:
    sp = _sp()
    return sp.Matrix(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, -sp.I], [0, 0, sp.I, 0]]
    )


def _sym_ocontrolled(u: Any) -> Any:
    """Open-controlled (control on |0⟩) embedding [[U, 0], [0, I]]."""
    sp = _sp()
    m = sp.zeros(4, 4)
    m[0:2, 0:2] = u
    m[2, 2] = 1
    m[3, 3] = 1
    return m


def _sym_controlled(u: Any) -> Any:
    sp = _sp()
    m = sp.eye(4)
    m[2:4, 2:4] = u
    return m


def sym_ox() -> Any:
    return _sym_ocontrolled(sym_x())


def sym_oy() -> Any:
    return _sym_ocontrolled(sym_y())


def sym_oz() -> Any:
    return _sym_ocontrolled(sym_z())


def sym_orx(theta: Any = 0) -> Any:
    return _sym_ocontrolled(sym_rx(theta))


def sym_ory(theta: Any = 0) -> Any:
    return _sym_ocontrolled(sym_ry(theta))


def sym_orz(theta: Any = 0) -> Any:
    return _sym_ocontrolled(sym_rz(theta))


def sym_toffoli() -> Any:
    sp = _sp()
    m = sp.eye(8)
    m[6, 6] = 0
    m[7, 7] = 0
    m[6, 7] = 1
    m[7, 6] = 1
    return m


def sym_fredkin() -> Any:
    sp = _sp()
    m = sp.eye(8)
    m[5, 5] = 0
    m[6, 6] = 0
    m[5, 6] = 1
    m[6, 5] = 1
    return m


def sym_r(theta: Any = 0, alpha: Any = 0, phi: Any = 0) -> Any:
    """General rotation exp(-iθ n̂·σ) with axis angles (α, φ)."""
    sp = _sp()
    nx = sp.sin(alpha) * sp.cos(phi)
    ny = sp.sin(alpha) * sp.sin(phi)
    nz = sp.cos(alpha)
    x, y, z = sym_x(), sym_y(), sym_z()
    h = nx * x + ny * y + nz * z
    return sp.cos(theta) * sp.eye(2) - sp.I * sp.sin(theta) * h


def sym_rxx(theta: Any = 0) -> Any:
    sp = _sp()
    xkx = sp.Matrix(np.kron(np.array([[0, 1], [1, 0]]), np.array([[0, 1], [1, 0]])).tolist())
    return sp.cos(theta / 2) * sp.eye(4) - sp.I * sp.sin(theta / 2) * xkx


def sym_ryy(theta: Any = 0) -> Any:
    sp = _sp()
    y = np.array([[0, -1j], [1j, 0]])
    yky = np.real(np.kron(y, y)).astype(int)
    return sp.cos(theta / 2) * sp.eye(4) - sp.I * sp.sin(theta / 2) * sp.Matrix(yky.tolist())


def sym_iswap(theta: Any = 1) -> Any:
    sp = _sp()
    c = sp.cos(sp.pi * theta / 2)
    s = sp.sin(sp.pi * theta / 2)
    return sp.Matrix(
        [[1, 0, 0, 0], [0, c, sp.I * s, 0], [0, sp.I * s, c, 0], [0, 0, 0, 1]]
    )


def sym_cphase(theta: Any = 0) -> Any:
    sp = _sp()
    return sp.diag(1, 1, 1, sp.exp(sp.I * theta))


def sym_crx(theta: Any = 0) -> Any:
    return _sym_controlled(sym_rx(theta))


def sym_cry(theta: Any = 0) -> Any:
    return _sym_controlled(sym_ry(theta))


def sym_crz(theta: Any = 0) -> Any:
    return _sym_controlled(sym_rz(theta))


def sym_cu(theta: Any = 0, phi: Any = 0, lbd: Any = 0) -> Any:
    return _sym_controlled(sym_u(theta, phi, lbd))


def sym_cr(theta: Any = 0, alpha: Any = 0, phi: Any = 0) -> Any:
    return _sym_controlled(sym_r(theta, alpha, phi))


def sym_any(unitary: Any) -> Any:
    """Wrap an arbitrary (numeric or sympy) matrix as a symbolic gate."""
    sp = _sp()
    if hasattr(unitary, "tolist"):
        unitary = unitary.tolist()
    return sp.Matrix(unitary)


__all__ += [
    "sym_wroot", "sym_cy", "sym_ox", "sym_oy", "sym_oz", "sym_toffoli",
    "sym_fredkin", "sym_r", "sym_rxx", "sym_ryy", "sym_iswap", "sym_cphase",
    "sym_crx", "sym_cry", "sym_crz", "sym_cu", "sym_cr", "sym_orx",
    "sym_ory", "sym_orz", "sym_any",
]
