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

    def copy(self) -> "FiniteMPS":
        """Deep copy preserving the canonical center (reference ``mps_base.py:177``)."""
        out = FiniteMPS([jnp.array(t) for t in self.tensors], canonicalize=False)
        out.center_position = self.center_position
        return out

    def conj(self) -> "FiniteMPS":
        """Complex conjugate state (reference ``mps_base.py:183``)."""
        out = FiniteMPS([jnp.conj(t) for t in self.tensors], canonicalize=False)
        out.center_position = self.center_position
        return out

    # -- transfer-matrix environments ----------------------------------

    def _left_envs(self) -> List[Tensor]:
        """L[i] = contraction of <psi|psi> strictly left of site i; (χ, χ)."""
        n = len(self)
        envs = []
        L = jnp.ones((1, 1), dtype=self.tensors[0].dtype)
        for i in range(n):
            envs.append(L)
            t = self.tensors[i]
            L = jnp.einsum("ab,adr,bds->rs", L, t, jnp.conj(t))
        self._norm_sq = L[0, 0]
        return envs

    def _right_envs(self) -> List[Tensor]:
        """R[i] = contraction strictly right of site i; (χ, χ)."""
        n = len(self)
        envs = [None] * n
        R = jnp.ones((1, 1), dtype=self.tensors[0].dtype)
        for i in range(n - 1, -1, -1):
            envs[i] = R
            t = self.tensors[i]
            R = jnp.einsum("ldr,mds,rs->lm", t, jnp.conj(t), R)
        return envs  # type: ignore[return-value]

    def measure_local_operator(
        self, ops: List[Tensor], sites: Sequence[int]
    ) -> List[Tensor]:
        """<ops[k]> at sites[k] (reference ``mps_base.py:189``); jit/AD-safe."""
        if len(ops) != len(sites):
            raise ValueError("measure_local_operator: len(ops) must equal len(sites)")
        lenvs = self._left_envs()
        renvs = self._right_envs()
        res = []
        for op, site in zip(ops, sites):
            t = self.tensors[site]
            op = jnp.asarray(op).astype(t.dtype)
            val = jnp.einsum(
                "ab,adr,ed,bes,rs->", lenvs[site], t, op, jnp.conj(t), renvs[site]
            )
            res.append(val)
        return res

    def measure_two_body_correlator(
        self, op1: Tensor, op2: Tensor, site1: int, sites2: Sequence[int]
    ) -> List[Tensor]:
        """<op1(site1) op2(s)> for each s in sites2 (reference ``mps_base.py:224``).

        At ``s == site1`` op2 is applied first: <op1 op2> on that site.
        """
        n = len(self)
        if not 0 <= site1 < n:
            raise ValueError(f"site1 {site1} out of range for n={n}")
        lenvs = self._left_envs()
        renvs = self._right_envs()
        dt = self.tensors[0].dtype
        op1 = jnp.asarray(op1).astype(dt)
        op2 = jnp.asarray(op2).astype(dt)
        res = []
        for s in sites2:
            lo, hi = (s, site1) if s < site1 else (site1, s)
            env = lenvs[lo]
            for i in range(lo, hi + 1):
                t = self.tensors[i]
                if i == s == site1:
                    op = op1 @ op2  # op2 acts first on the shared site
                elif i == site1:
                    op = op1
                elif i == s:
                    op = op2
                else:
                    op = None
                if op is None:
                    env = jnp.einsum("ab,adr,bds->rs", env, t, jnp.conj(t))
                else:
                    env = jnp.einsum("ab,adr,ed,bes->rs", env, t, op, jnp.conj(t))
            res.append(jnp.einsum("rs,rs->", env, renvs[hi]))
        return res

    def left_envs(self, sites: Sequence[int]) -> Any:
        """Dict site -> left environment (tensornetwork-API parity)."""
        envs = self._left_envs()
        return {s: envs[s] for s in sites}

    def right_envs(self, sites: Sequence[int]) -> Any:
        envs = self._right_envs()
        return {s: envs[s] for s in sites}

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
