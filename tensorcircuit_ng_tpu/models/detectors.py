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


def _dm_measure_kernel(rho: Tensor, q: int, n: int, signed: bool) -> Tensor:
    """Dephasing (unsigned) or (Zρ+ρZ)/2 (signed) measurement kernel."""
    zdiag = jnp.asarray([1.0, -1.0], dtype=rho.dtype)
    z_ket = statevec.apply_diagonal(rho, zdiag, [q], 2)
    z_bra = statevec.apply_diagonal(rho, zdiag, [n + q], 2)
    if signed:
        return (z_ket + z_bra) / 2.0
    return (rho + statevec.apply_diagonal(z_ket, zdiag, [n + q], 2)) / 2.0


def _dm_reset_after_measure(rho: Tensor, q: int, n: int) -> Tensor:
    """After a measurement kernel: map |1><1| population back to |0><0|.

    The post-measurement rho is qubit-diagonal on q; reset = P0 rho P0 +
    X P1 rho P1 X.
    """
    p0 = jnp.asarray([1.0, 0.0], dtype=rho.dtype)
    p1 = jnp.asarray([0.0, 1.0], dtype=rho.dtype)
    r0 = statevec.apply_diagonal(
        statevec.apply_diagonal(rho, p0, [q], 2), p0, [n + q], 2
    )
    r1 = statevec.apply_diagonal(
        statevec.apply_diagonal(rho, p1, [q], 2), p1, [n + q], 2
    )
    r1 = statevec.flip_slot(statevec.flip_slot(r1, q, 2), n + q, 2)
    return r0 + r1

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

    def detector_probabilities_exact(self) -> Tensor:
        """EXACT detector firing probabilities via signed density evolution.

        Parity trick (the role of the reference's Walsh-Hadamard parity
        network, ``basecircuit.py:895-973``): E[(-1)^parity] is obtained by
        replaying the circuit as a density matrix where measurements inside
        the detector's record set apply the signed kernel
        P₀ρP₀ − P₁ρP₁ = (Zρ + ρZ)/2 and other measurements dephase
        (ρ + ZρZ)/2; channels apply exactly.  Then p(fire) = (1 − E)/2.
        One DM evolution per detector — exact for arbitrary Kraus noise.
        """
        d = self._d
        assert d == 2, "exact detector probabilities implemented for qubits"
        n = self._nqubits
        # map record index -> (extra position, qubit)
        records: List[Tuple[int, int]] = []
        for ei, e in enumerate(self._extra_qir):
            if e["name"] in ("measure", "reset"):
                for q in e["index"]:
                    records.append((ei, q))
        detectors = [e for e in self._extra_qir if e["name"] == "detector"]
        out = []
        for det in detectors:
            target = set()
            for rref in det["records"]:
                idx = rref if rref >= 0 else len(records) + rref
                target.add(idx)
            rho = self._dm_initial()
            rec_counter = 0
            extras = sorted(
                range(len(self._extra_qir)),
                key=lambda i: (self._extra_qir[i]["pos"], i),
            )
            eptr = 0

            def run_extras(pos: int, rho: Tensor, rec_counter: int, eptr: int):
                while (
                    eptr < len(extras)
                    and self._extra_qir[extras[eptr]]["pos"] <= pos
                ):
                    e = self._extra_qir[extras[eptr]]
                    if e["name"] in ("measure", "reset"):
                        for q in e["index"]:
                            signed = rec_counter in target
                            rho = _dm_measure_kernel(rho, q, n, signed)
                            if e["name"] == "reset":
                                rho = _dm_reset_after_measure(rho, q, n)
                            rec_counter += 1
                    eptr += 1
                return rho, rec_counter, eptr

            for pos, item in enumerate(self._qir):
                rho, rec_counter, eptr = run_extras(pos, rho, rec_counter, eptr)
                rho = self._dm_apply_item(rho, item)
            rho, rec_counter, eptr = run_extras(len(self._qir), rho, rec_counter, eptr)
            dim = d**n
            e_val = jnp.real(jnp.trace(jnp.reshape(rho, (dim, dim))))
            out.append((1.0 - e_val) / 2.0)
        return jnp.stack(out)

    # --- density-matrix helpers for the exact path ---------------------

    def _dm_initial(self) -> Tensor:
        psi = self._initial_state()
        rho = jnp.outer(psi, jnp.conj(psi))
        return jnp.reshape(rho, (-1,))

    def _dm_apply_item(self, rho: Tensor, item: Dict[str, Any]) -> Tensor:
        n = self._nqubits
        d = self._d
        if item.get("is_channel"):
            acc = None
            for m in item["channel_kraus"]:
                m = jnp.asarray(m).astype(rho.dtype)
                t = statevec.apply_unitary(rho, m, item["index"], d)
                t = statevec.apply_unitary(
                    t, jnp.conj(m), [w + n for w in item["index"]], d
                )
                acc = t if acc is None else acc + t
            return acc
        # unitary (incl. fused items expanded)
        items = [item]
        if item.get("fused_1q_layer") or item.get("zz_product"):
            saved, self._qir = self._qir, [item]
            try:
                items = self._expanded_qir()
            finally:
                self._qir = saved
        for it in items:
            g = it["gate"].tensor
            rho = statevec.apply_unitary(rho, g, it["index"], d)
            rho = statevec.apply_unitary(
                rho, jnp.conj(jnp.asarray(g)), [w + n for w in it["index"]], d
            )
        return rho
