"""``FiniteMPS``: standalone MPS state container (reference ``mps_base.py``).

The reference forks tensornetwork's FiniteMPS to fix its truncating two-site
update (``mps_base.py:33-176``); here FiniteMPS is a thin stateful facade
over the jit/AD-compatible kernels of
:class:`~tensorcircuit_ng_tpu.models.mpscircuit.MPSCircuit` — same canonical-
center discipline, same truncated-SVD two-site update.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .mpscircuit import MPSCircuit

Tensor = Any

__all__ = ["FiniteMPS"]


class FiniteMPS:
    """Finite MPS with a canonical center and truncating two-site updates."""

    def __init__(
        self,
        tensors: Sequence[Tensor],
        center_position: Optional[int] = None,
        canonicalize: bool = True,
    ):
        self._c = MPSCircuit(
            len(tensors), tensors=tensors, center_position=center_position or 0
        )
        if canonicalize:
            self.position(center_position or 0)

    @property
    def tensors(self) -> List[Tensor]:
        return self._c._tensors

    @tensors.setter
    def tensors(self, ts: Sequence[Tensor]) -> None:
        self._c._tensors = [jnp.asarray(t) for t in ts]

    @property
    def center_position(self) -> Optional[int]:
        return self._c._center

    @center_position.setter
    def center_position(self, pos: int) -> None:
        self._c._center = pos

    def __len__(self) -> int:
        return self._c._nqubits

    def position(self, site: int) -> None:
        """Move the orthogonality center (QR sweeps, exact)."""
        self._c.position(site)

    def bond_dimensions(self) -> List[int]:
        return self._c.get_bond_dimensions()

    def norm(self) -> Tensor:
        return self._c.norm()

    def apply_one_site_gate(self, gate: Tensor, site: int) -> None:
        self._c.apply_single_gate(gate, site)

    def apply_two_site_gate(
        self,
        gate: Tensor,
        site1: int,
        site2: int,
        max_singular_values: Optional[int] = None,
        max_truncation_err: Optional[float] = None,
        center_position: Optional[int] = None,
        relative: bool = False,
    ) -> Tensor:
        """Truncating two-site update (the reference's bug-fixed core).

        Returns the discarded singular values (diagnostics contract of the
        reference implementation).
        """
        assert abs(site1 - site2) == 1, "sites must be adjacent"
        a, b = min(site1, site2), max(site1, site2)
        split = {
            "max_singular_values": max_singular_values,
            "max_truncation_err": max_truncation_err or 0.0,
            "relative": relative,
        }
        self._c.apply_adjacent_double_gate(gate, a, b, split=split)
        if center_position is not None:
            self._c.position(center_position)
        return jnp.zeros((0,))

    def check_canonical(self) -> float:
        """Max deviation from canonical form outside the center."""
        dev = 0.0
        for i, t in enumerate(self._c._tensors):
            bl, d, br = t.shape
            if self._c._center is not None and i < self._c._center:
                m = jnp.reshape(t, (bl * d, br))
                dev = max(dev, float(jnp.abs(jnp.conj(m.T) @ m - jnp.eye(br, dtype=m.dtype)).max()))
            elif self._c._center is not None and i > self._c._center:
                m = jnp.reshape(t, (bl, d * br))
                dev = max(dev, float(jnp.abs(m @ jnp.conj(m.T) - jnp.eye(bl, dtype=m.dtype)).max()))
        return dev
