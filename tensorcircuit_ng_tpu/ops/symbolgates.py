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
