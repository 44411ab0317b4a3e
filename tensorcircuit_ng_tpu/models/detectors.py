"""Stim-style detector machinery for QEC circuits (trajectory sampling).

Counterpart of reference ``basecircuit.py:834-1005`` (instruction recording)
and ``sample_detector``/``detector_probabilities`` (``:1197-1400``, ``:975``):
measurement records accumulate during a trajectory replay; detectors are
parities over record references (stim ``rec[-k]`` convention).  The replay is
status-driven and vmappable, so shots batch on device.  The reference's
exact Walsh-Hadamard parity-network method (``_build_detector_tn_wht``) is a
follow-up; the trajectory path below covers sampling workloads.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import statevec

Tensor = Any

__all__ = ["DetectorMixin"]


class DetectorMixin:
    """Mixed into ``Circuit``: measure/reset/detector instructions + sampling."""

    def detector_instruction(self, *records: int) -> None:
        """Define a detector: parity of measurement records (negative = from end)."""
        self._extra_qir.append(
            {"name": "detector", "records": tuple(records), "pos": len(self._qir)}
        )

    detector = detector_instruction

    def observable_instruction(self, *records: int) -> None:
        self._extra_qir.append(
            {"name": "observable", "records": tuple(records), "pos": len(self._qir)}
        )

    observable = observable_instruction

    def _num_measures(self) -> int:
        return sum(
            len(e["index"])
            for e in self._extra_qir
            if e["name"] in ("measure", "reset")
        )

    def _num_channels(self) -> int:
        return sum(1 for item in self._qir if item.get("is_channel"))

    def _trajectory(self, status_m: Tensor, status_c: Tensor) -> Tuple[Tensor, Tensor]:
        """One shot: returns (detector bits, observable bits)."""
        d = self._d
        psi = self._initial_state()
        records: List[Tensor] = []
        detectors: List[Tensor] = []
        observables: List[Tensor] = []
        mi = 0
        ci = 0

        extras = sorted(
            range(len(self._extra_qir)), key=lambda i: (self._extra_qir[i]["pos"], i)
        )
        eptr = 0

        def run_extras(pos: int, psi: Tensor, mi: int) -> Tuple[Tensor, int]:
            nonlocal eptr
            while eptr < len(extras) and self._extra_qir[extras[eptr]]["pos"] <= pos:
                e = self._extra_qir[extras[eptr]]
                if e["name"] in ("measure", "reset"):
                    for q in e["index"]:
                        marg = statevec.marginal_probability(psi, [q], d)
                        marg = marg / jnp.sum(marg)
                        cdf = jnp.cumsum(marg)
                        r = status_m[mi].astype(cdf.dtype)
                        outcome = jnp.clip(
                            jnp.searchsorted(cdf, r + 1e-12, side="left"), 0, d - 1
                        )
                        psi = statevec.project_slot(psi, q, outcome, d)
                        records.append(outcome)
                        if e["name"] == "reset":
                            # flip back to |0> conditioned on outcome (d=2)
                            flipped = statevec.flip_slot(psi, q, d)
                            sel = (outcome == 1)
                            psi = jnp.where(sel, flipped, psi)
                        mi += 1
                elif e["name"] == "detector":
                    par = jnp.zeros((), dtype=jnp.int32)
                    for rref in e["records"]:
                        par = par ^ records[rref].astype(jnp.int32)
                    detectors.append(par)
                elif e["name"] == "observable":
                    par = jnp.zeros((), dtype=jnp.int32)
                    for rref in e["records"]:
                        par = par ^ records[rref].astype(jnp.int32)
                    observables.append(par)
                elif e["name"] == "barrier":
                    pass
                eptr += 1
            return psi, mi

        for pos, item in enumerate(self._qir):
            psi, mi = run_extras(pos, psi, mi)  # extras with pos<=len(applied gates)
            if item.get("is_channel"):
                mats = [jnp.asarray(m).astype(psi.dtype) for m in item["channel_kraus"]]
                nrm2 = jnp.real(jnp.vdot(psi, psi))
                probs = []
                for m in mats:
                    phi = statevec.apply_unitary(psi, m, item["index"], d)
                    probs.append(jnp.real(jnp.vdot(phi, phi)) / nrm2)
                p = jnp.stack(probs)
                p = p / jnp.sum(p)
                cdf = jnp.cumsum(p)
                r = status_c[ci].astype(cdf.dtype)
                idx = jnp.clip(
                    jnp.searchsorted(cdf, r + 1e-12, side="left"), 0, len(mats) - 1
                )
                onehot = jax.nn.one_hot(idx, len(mats), dtype=mats[0].dtype)
                op = sum(onehot[i] * mats[i] for i in range(len(mats)))
                psi = statevec.apply_unitary(psi, op, item["index"], d)
                nrm = jnp.linalg.norm(psi)
                psi = psi / nrm.astype(psi.dtype)
                ci += 1
            else:
                psi = self._apply_item(psi, item)
        psi, mi = run_extras(len(self._qir), psi, mi)
        det = (
            jnp.stack(detectors)
            if detectors
            else jnp.zeros((0,), dtype=jnp.int32)
        )
        obs = (
            jnp.stack(observables)
            if observables
            else jnp.zeros((0,), dtype=jnp.int32)
        )
        return det, obs

    def sample_detector(
        self,
        shots: int = 1,
        status: Optional[Tensor] = None,
        statusc: Optional[Tensor] = None,
        with_observable: bool = False,
    ) -> Any:
        """Sample detector parities over trajectories (reference ``:1197-1400``).

        ``status``: uniform [shots, num_measurements]; ``statusc``: uniform
        [shots, num_channels] for Monte-Carlo channels.
        """
        from ..backend import backend as K

        nm = max(self._num_measures(), 1)
        nc = max(self._num_channels(), 1)
        if status is None:
            status = K.implicit_randu([shots, nm])
        if statusc is None:
            statusc = K.implicit_randu([shots, nc])

        det, obs = jax.vmap(self._trajectory)(
            jnp.asarray(status), jnp.asarray(statusc)
        )
        if with_observable:
            return det, obs
        return det

    def detector_probabilities(
        self, shots: int = 4096, status: Optional[Tensor] = None, statusc: Optional[Tensor] = None
    ) -> Tensor:
        """Estimated firing probability of each detector."""
        det = self.sample_detector(shots, status=status, statusc=statusc)
        return jnp.mean(det.astype(jnp.float32), axis=0)
