"""``QuditCircuit``: d-level statevector simulator (3 <= d <= 36).

Counterpart of reference ``quditcircuit.py:30-739``: a thin wrapper whose
gates come from :mod:`tensorcircuit_ng_tpu.ops.quditgates`; the dense engine
(``core/statevec``) is d-generic already, so amplitudes/sampling/measurement
inherit directly with base-d digit strings 0-9A-Z.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp

from .. import config
from ..ops import quditgates as qg
from .circuit import Circuit

Tensor = Any

__all__ = ["QuditCircuit"]


class QuditCircuit(Circuit):
    """Qudit circuit: same engine as ``Circuit`` with d-level gate factories."""

    def __init__(self, nqudits: int, dim: int = 3, inputs: Optional[Tensor] = None) -> None:
        if not (2 <= dim <= 36):
            raise ValueError("dim must be within [2, 36] (base-36 digit strings)")
        super().__init__(nqudits, inputs=inputs, dim=dim)

    def _copy_params(self):
        return {"nqudits": self._nqubits, "dim": self._d, "inputs": self._inputs}

    @property
    def dim(self) -> int:
        return self._d

    # --- named qudit gates (matrices from quditgates) ------------------

    def i(self, *index: int) -> None:
        self.any(*index, unitary=qg.i_matrix_func(self._d), name="i")

    def x(self, *index: int) -> None:
        for q in index:
            self.any(q, unitary=qg.x_matrix_func(self._d), name="x")

    def z(self, *index: int) -> None:
        for q in index:
            self.any(q, unitary=qg.z_matrix_func(self._d), name="z")

    def h(self, *index: int) -> None:
        for q in index:
            self.any(q, unitary=qg.h_matrix_func(self._d), name="h")

    def rx(self, index: int, theta: Any = 0, j: int = 0, k: int = 1) -> None:
        self.any(index, unitary=qg.rx_matrix_func(self._d, theta, j, k), name="rx")

    def ry(self, index: int, theta: Any = 0, j: int = 0, k: int = 1) -> None:
        self.any(index, unitary=qg.ry_matrix_func(self._d, theta, j, k), name="ry")

    def rz(self, index: int, theta: Any = 0, j: int = 0, k: int = 1) -> None:
        self.any(index, unitary=qg.rz_matrix_func(self._d, theta, j, k), name="rz")

    def phase(self, index: int, theta: Any = 0, j: int = 1) -> None:
        self.any(index, unitary=qg.phase_matrix_func(self._d, theta, j), name="phase")

    def u8(self, index: int, gamma: Any = 0, z: Any = 0, eps: Any = 0) -> None:
        self.any(index, unitary=qg.u8_matrix_func(self._d, gamma, z, eps), name="u8")

    def cphase(self, *index: int, cv: Optional[int] = None, theta: Any = None) -> None:
        self.any(*index, unitary=qg.cphase_matrix_func(self._d, cv, theta), name="cphase")

    def csum(self, *index: int) -> None:
        self.any(*index, unitary=qg.csum_matrix_func(self._d), name="csum")

    cnot = csum

    def swap(self, *index: int) -> None:
        self.any(*index, unitary=qg.swap_matrix_func(self._d), name="swap")

    def rzz(self, *index: int, theta: Any = 0) -> None:
        """Two-qudit ZZ-like rotation via clock generators."""
        d = self._d
        import numpy as np

        zgen = np.arange(d) - (d - 1) / 2.0
        gen = np.kron(np.diag(zgen), np.diag(zgen))
        theta_t = jnp.asarray(theta).astype(jnp.dtype(config.dtypestr()))
        diag = jnp.exp(-1j * theta_t * jnp.asarray(np.diagonal(gen), dtype=theta_t.dtype))
        self.any(*index, unitary=jnp.diag(diag), name="rzz")

    @property
    def nqudits(self) -> int:
        """Number of qudits (reference ``quditcircuit.py`` naming)."""
        return self._nqubits

    def rxx(self, *index: int, theta: Any = 0, j1: int = 0, k1: int = 1, j2: int = 0, k2: int = 1) -> None:
        """Two-qudit XX-type rotation on the (j,k) two-level subspaces.

        Reference ``quditcircuit.py rxx``: exp(-i θ σx^{(j1,k1)} ⊗ σx^{(j2,k2)}).
        """
        import numpy as _np
        import jax.numpy as _jnp
        import jax.scipy.linalg as _jsl

        d = self._d
        sx1 = _np.zeros((d, d)); sx1[j1, k1] = sx1[k1, j1] = 1.0
        sx2 = _np.zeros((d, d)); sx2[j2, k2] = sx2[k2, j2] = 1.0
        gen = _np.kron(sx1, sx2)
        theta_t = _jnp.asarray(theta).astype(_jnp.dtype(config.dtypestr()))
        u = _jsl.expm(-1j * theta_t * _jnp.asarray(gen, dtype=theta_t.dtype if _jnp.iscomplexobj(theta_t) else None))
        self.any(*index, unitary=u, name="rxx")

    # expectation of qudit operators uses `expectation` from BaseCircuit with
    # matrices; Pauli-string sugar is qubit-specific and not defined for d>2.
    def expectation_ps(self, *args: Any, **kws: Any) -> Tensor:
        if self._d != 2:
            raise NotImplementedError(
                "expectation_ps is qubit-specific; use expectation((op, wires))"
            )
        return super().expectation_ps(*args, **kws)
