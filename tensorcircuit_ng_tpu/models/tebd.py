"""Parallel TEBD in Vidal Γ-λ form: batched same-parity two-site updates.

TPU-native evolution engine complementing :class:`MPSCircuit`'s sequential
sweep (reference ``mpscircuit.py``/``mps_base.py`` role): the state is kept
in the canonical Vidal form (site tensors Γ_i and bond weights λ_i), where a
two-site gate on bond i touches only (Γ_i, λ_i, Γ_{i+1}) and *reads* the
frozen neighbors λ_{i-1}, λ_{i+1}.  All even bonds therefore update
simultaneously — ONE ``vmap``-batched Gram-eigh SVD of ~n/2 theta matrices
per half-step instead of n/2 sequential decompositions, which is the shape
TPUs want (batched MXU matmuls + batched eigh).

All bonds are padded to the static bond dimension χ (zero λ entries mark
unused directions), so every Γ is (χ, d, χ) and each parity class is one
uniform batch; `safe_inverse` guards the padded directions.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import config
from ..core import linalg as _linalg

Tensor = Any

__all__ = ["ParallelTEBD"]

#: batched truncation engine: "auto" (pallas subspace-compressed Jacobi on
#: TPU, Gram-eigh elsewhere), "gram", "jacobi", or "subspace".  Measured on
#: TPU for n=60 chi=64: XLA batched eigh costs 58.5 ms ALONE per layer; the
#: full in-kernel Jacobi 30.5 ms/step (VPU-throughput bound,
#: examples/tebd_anatomy.py); the subspace path runs the same sweeps on a
#: (chi·d, chi+16) panel — 0.39x the rotation work — with the capture on
#: the MXU (kernels_jacobi.subspace_svd).
SVD_MODE = "auto"
JACOBI_SWEEPS = 10
#: de Rijk column-norm presort of the cold panel before the Jacobi kernel
#: (kernels_jacobi.jacobi_svd presort flag).  A/B: examples/ab_jacobi_presort.py
JACOBI_PRESORT = False
#: sweeps when warm-started by the previous trotter step's V on the same
#: bond (theta drifts by O(dt) per step, so the iteration starts inside the
#: quadratic basin).  The Jacobi kernel is the whole TEBD step cost
#: (measured 30.2 of 32.6 ms at n=60 chi=64) and is linear in sweeps.
JACOBI_SWEEPS_WARM = 4
#: subspace-capture rounds: 2 cold reaches full-Jacobi truncation quality
#: (rec err 1.6e-5 on a decaying test spectrum); 1 suffices warm.
SUBSPACE_REFINE = 2
SUBSPACE_REFINE_WARM = 1
#: warm-panel random probe columns (randomized range-finder tracking).
#: REFUTED on chip for this workload (2026-08-19 A/B: raw probes collapsed
#: a chi=64 quench to S=0.45, sigma-weighted A^H-Omega probes to S=0.04 —
#: fresh un-sorted panel columns defeat the 10-sweep panel Jacobi, which
#: relies on the warm chain handing it a nearly-diagonal input).  Kept as
#: an opt-in knob + measured record; 0 disables.
SUBSPACE_INJECT = 0
#: captured-basis width beyond chi: the leak of the warm chain lives at the
#: truncation edge, so widening the buffer trades panel-Jacobi time
#: (linear in width) for per-step capture accuracy.
SUBSPACE_OVERSAMPLE = 16


def _svd_batched(
    theta: Tensor, chi: int, vh0: Optional[Tensor] = None
) -> Tuple[Tensor, Tensor, Tensor, Optional[Tensor]]:
    """Batched truncation SVD; returns (u, s, vh, warm_record).

    ``warm_record`` is the mode-specific state worth threading to the next
    step on the same bond (full vh for "jacobi", the captured V basis for
    "subspace", None for "gram"); ``vh0`` is the previous record.
    """
    mode = SVD_MODE
    if mode == "auto":
        # in-process TPU A/B (n=60 chi=64, steady ~27ms calibration):
        # gram 58.5 ms/step vs jacobi accV 32.6 ms/step, same physics.
        # "subspace" stays OPT-IN: its cold path is jacobi anyway, and the
        # warm panel path trades accuracy under sustained truncation
        # (chi=8 quench probes: warm-subspace 0.96 overlap, warm-jacobi
        # 0.31 — see CLAUDE.md round-4 notes) for ~2.5x sweep savings.
        mode = "jacobi" if jax.default_backend() == "tpu" else "gram"
    if mode == "subspace":
        from ..core.kernels_jacobi import subspace_svd

        u, s, vh, v = subspace_svd(
            theta,
            chi,
            sweeps=JACOBI_SWEEPS,
            refine=SUBSPACE_REFINE if vh0 is None else SUBSPACE_REFINE_WARM,
            v0=vh0,
            oversample=SUBSPACE_OVERSAMPLE,
            inject=0 if vh0 is None else SUBSPACE_INJECT,
            return_basis=True,
        )
        return u, s, vh, v
    if mode == "jacobi":
        from ..core.kernels_jacobi import jacobi_svd, jacobi_svd_warm

        # accumulate_v=True: the cheap vh = S^-1 U^H A recovery amplifies
        # U's residual non-orthogonality by s_max/s_cut at the truncation
        # edge (measured: chi=12 quench fidelity 0.93 vs 0.999995)
        if vh0 is not None:
            u, s, vh = jacobi_svd_warm(theta, JACOBI_SWEEPS_WARM, True, vh0)
        else:
            u, s, vh = jacobi_svd(theta, JACOBI_SWEEPS, True, JACOBI_PRESORT)
        return u, s, vh, vh
    if mode != "gram":
        raise ValueError(
            f"SVD_MODE must be 'auto', 'gram', 'jacobi' or 'subspace', got {mode!r}"
        )
    u, s, vh = _linalg.gram_svd(theta)
    return u, s, vh, None


def _safe_inv(x: Tensor, eps: float = 1e-12) -> Tensor:
    return jnp.where(x > eps, 1.0 / jnp.where(x > eps, x, 1.0), 0.0)


#: RELATIVE floor for the S^-1 unwrap: singular directions below
#: ``INV_S_REL * s_max`` are dropped from the new site tensors (their
#: Schmidt weight is < INV_S_REL^2 — physically negligible) instead of
#: inverted.  The 10-sweep Jacobi recovers u_i = q_i / s_i, so columns at
#: the f32 noise floor are NOT orthonormal-to-eps the way LAPACK's are;
#: inverting them injects amplified noise that walks the trajectory off
#: the f64 track REGARDLESS of sweep count (n=16 dense-oracle probe,
#: max|dlam| at mid-bond vs exact: abs-1e-12 floor 1.3e-2 @K10 / 2.1e-1
#: @K20, sweeps=14 no better; rel=1e-6 floor 6.4e-7 @K10 / 1.3e-6 @K20 —
#: LAPACK-f32-grade tracking).  ``None`` = auto: 1e-6 in f32 (where the
#: Jacobi kernel runs), 0 in f64 (LAPACK-grade SVDs, no floor needed).
INV_S_REL: Optional[float] = None


class ParallelTEBD:
    """Vidal-form MPS with batched even/odd two-site updates.

    :param n: number of sites
    :param chi: static bond dimension (all bonds padded to χ)
    :param d: local dimension
    :param initial: "zeros" | "neel" | list of product-state kets (d,)
    """

    def __init__(
        self,
        n: int,
        chi: int,
        d: int = 2,
        initial: Any = "zeros",
        dtype: Optional[str] = None,
    ):
        self.n = n
        self.chi = chi
        self.d = d
        g, lam = self.initial_tensors(n, chi, d, initial, dtype)
        # NUMPY until first op (axon: complex device arrays can't be fetched
        # or passed as jit inputs — keep concrete complex host-side)
        self.gammas = g
        self.lambdas = lam
        # warm-start is OPT-IN (from_state(warm=...)): a long-lived engine
        # must not silently drop to JACOBI_SWEEPS_WARM sweeps nor cache
        # trace-local tracers on the instance (CLAUDE.md no-tracer-caching)
        self._warm_in: dict = {}
        self._vh_warm: dict = {}
        self._record_warm = False

    @staticmethod
    def initial_tensors(
        n: int,
        chi: int,
        d: int = 2,
        initial: Any = "zeros",
        dtype: Optional[str] = None,
    ) -> Tuple[Any, Any]:
        """Numpy Vidal tensors for a product state: (n,χ,d,χ) Γ, (n+1,χ) λ.

        Kept host-side so callers on axon-like backends can split real/imag
        before crossing a jit boundary.
        """
        dt = np.dtype(dtype or config.dtypestr())
        if isinstance(initial, str):
            kets = []
            for i in range(n):
                v = np.zeros(d)
                # "neel": |1> on even sites (matches x(0), x(2), ... circuits)
                v[(1 - i % 2) if initial == "neel" else 0] = 1.0
                kets.append(v)
        else:
            kets = [np.asarray(v) for v in initial]
        gammas = np.zeros((n, chi, d, chi), dtype=dt)
        for i, v in enumerate(kets):
            gammas[i, 0, :, 0] = v
        lam = np.zeros((n + 1, chi), dtype=np.float32)
        lam[:, 0] = 1.0
        return gammas, lam

    @classmethod
    def from_state(
        cls, gammas: Tensor, lambdas: Tensor, warm: Optional[dict] = None
    ) -> "ParallelTEBD":
        """Wrap existing (n,χ,d,χ) Γ / (n+1,χ) λ tensors (e.g. scan carries).

        ``warm``: optional :meth:`warm_state` dict — per-parity (real, imag)
        plane pairs of the previous step's full ``vh``, used to warm-start
        the Jacobi truncation (see :data:`JACOBI_SWEEPS_WARM`).
        """
        e = cls.__new__(cls)
        e.n, e.chi, e.d = int(gammas.shape[0]), int(gammas.shape[1]), int(gammas.shape[2])
        e.gammas, e.lambdas = gammas, lambdas
        e._warm_in = {}
        e._vh_warm = {}
        # warm-start only when the caller explicitly opts in; passing warm={}
        # opts in to RECORDING (first step of a scan carry) with cold sweeps
        e._record_warm = warm is not None
        if warm:
            for p, (vr, vi) in warm.items():
                e._warm_in[int(p)] = vr + 1j * vi
        return e

    def warm_state(self) -> dict:
        """Per-parity (real, imag) planes of the last full ``vh``.

        Float planes so the dict can cross jit boundaries / ride scan
        carries on axon (complex jit inputs are unsupported there); feed
        back via :meth:`from_state`'s ``warm=``.
        """
        return {
            p: (jnp.real(vh), jnp.imag(vh)) for p, vh in self._vh_warm.items()
        }

    # ------------------------------------------------------------------
    # core batched update
    # ------------------------------------------------------------------

    @staticmethod
    def _pair_update(gl, gr, lam_l, lam_c, lam_r, gate, chi, d):
        """One Vidal two-site update; fully traceable (vmapped over bonds).

        gl, gr: (χ, d, χ); lam_*: (χ,); gate: (d*d, d*d).
        Returns new (gl, gr, lam_c).
        """
        dt = gl.dtype
        # theta_{(a i), (j b)} = λl_a Γl_{a i m} λc_m Γr_{m j b} λr_b
        left = lam_l.astype(dt)[:, None, None] * gl  # (χ, d, χ)
        left = left * lam_c.astype(dt)[None, None, :]
        right = gr * lam_r.astype(dt)[None, None, :]
        theta = jnp.einsum("aim,mjb->aijb", left, right, precision="highest")
        theta = jnp.reshape(theta, (chi * d, d * chi))
        # apply the gate on the physical pair
        th = jnp.reshape(theta, (chi, d, d, chi))
        th = jnp.einsum(
            "pq,aqb->apb",
            gate.astype(dt),
            jnp.reshape(th, (chi, d * d, chi)),
            precision="highest",
        )
        theta = jnp.reshape(th, (chi * d, d * chi))
        u, s, vh = _linalg.gram_svd(theta)
        u = u[:, :chi]
        s = s[:chi]
        vh = vh[:chi, :]
        nrm = jnp.linalg.norm(s)
        s = s / jnp.where(nrm > 1e-30, nrm, 1.0)
        # unwrap the environment weights: Γl' = λl^{-1} U, Γr' = Vh λr^{-1}
        inv_l = _safe_inv(lam_l).astype(dt)
        inv_r = _safe_inv(lam_r).astype(dt)
        gl_new = jnp.reshape(u, (chi, d, chi)) * inv_l[:, None, None]
        gr_new = jnp.reshape(vh, (chi, d, chi)) * inv_r[None, None, :]
        return gl_new, gr_new, s

    def apply_two_site_layer(self, gates: Tensor, parity: int = 0) -> None:
        """Apply two-site gates on every bond of the given parity, batched.

        ``gates``: (nb, d², d²) — one gate per parity-bond (or a single
        (d², d²) gate broadcast over the layer).
        """
        n, chi, d = self.n, self.chi, self.d
        bonds = list(range(parity, n - 1, 2))
        nb = len(bonds)
        gates = jnp.asarray(gates)
        if gates.ndim == 2:
            gates = jnp.broadcast_to(gates, (nb,) + gates.shape)
        p = parity
        hi = p + 2 * nb  # one past the last touched site
        # lift numpy-held initial tensors (kept host-side for axon) to jnp
        self.gammas = jnp.asarray(self.gammas)
        self.lambdas = jnp.asarray(self.lambdas)
        # strided slices instead of fancy-index gathers: TPU scatters/gathers
        # over the site axis serialize; stride-2 slices are single-pass
        gl = self.gammas[p:hi:2]
        gr = self.gammas[p + 1 : hi : 2]
        lam_l = self.lambdas[p:hi:2]
        lam_c = self.lambdas[p + 1 : hi : 2]
        lam_r = self.lambdas[p + 2 : hi + 1 : 2]
        dt = gl.dtype

        def fold_gate(th):
            th = jnp.reshape(th, (nb, chi, d * d, chi))
            th = jnp.einsum("bpq,baqc->bapc", gates.astype(dt), th, precision="highest")
            return jnp.reshape(th, (nb, chi * d, d * chi))

        # theta_{b,(a i),(j c)} = λl Γl λc Γr λr, gate applied on (i j).
        # Also build the λl-free and λr-free variants: the unwrap below uses
        # Γl' = θ_noλl Vh^H S^-1 and Γr' = S^-1 U^H θ_noλr (Hastings/TeNPy
        # inverse-free form) instead of dividing U/Vh by the environment λ.
        # The old λ^-1 unwrap amplifies any ABSOLUTE noise in U/Vh entries at
        # small-λ positions by up to 1/λ; the cold Jacobi keeps those entries
        # exactly zero, but the warm-start rotation (and any dense SVD) does
        # not, which measured as an exponential norm blow-up (|ψ| 1.45 by 40
        # steps).  S^-1 touches only kept singular values, and rows scaled by
        # 1/s_i are re-suppressed by λ'_c = s_i in every later contraction.
        left_bare = gl * lam_c.astype(dt)[:, None, None, :]
        right = gr * lam_r.astype(dt)[:, None, None, :]
        theta_nl = fold_gate(
            jnp.einsum("baim,bmjc->baijc", left_bare, right, precision="highest")
        )
        left = lam_l.astype(dt)[:, :, None, None] * left_bare
        theta_nr = fold_gate(
            jnp.einsum("baim,bmjc->baijc", left, gr, precision="highest")
        )
        # theta = λl-row-scale of the λl-free variant (exact, elementwise)
        theta = jnp.reshape(
            lam_l.astype(dt)[:, :, None, None]
            * jnp.reshape(theta_nl, (nb, chi, d, d * chi)),
            (nb, chi * d, d * chi),
        )
        u, s, vh, warm_rec = _svd_batched(theta, chi, self._warm_in.pop(parity, None))
        if self._record_warm and warm_rec is not None:
            # mode-specific warm record (full vh for jacobi, captured V basis
            # for subspace) is next step's warm start on this parity (recorded
            # ONLY under explicit opt-in: long-lived engines must not hold
            # tracers across traces nor silently drop to warm sweeps)
            self._vh_warm[parity] = warm_rec
        u = u[..., :, :chi]
        s = s[..., :chi]
        vh = vh[..., :chi, :]
        nrm = jnp.linalg.norm(s, axis=-1, keepdims=True)
        s_new = s / jnp.where(nrm > 1e-30, nrm, 1.0)
        inv_s = _safe_inv(s).astype(dt)
        rel = INV_S_REL
        if rel is None:
            rel = 1e-6 if jnp.finfo(s.dtype).bits <= 32 else 0.0
        if rel:
            # drop (not invert) noise-floor directions — see INV_S_REL note
            inv_s = jnp.where(s > rel * s[..., :1], inv_s, jnp.zeros_like(inv_s))
        gl_new = jnp.reshape(
            jnp.matmul(
                theta_nl, jnp.conj(jnp.swapaxes(vh, -1, -2)), precision="highest"
            )
            * inv_s[:, None, :],
            (nb, chi, d, chi),
        )
        gr_new = jnp.reshape(
            inv_s[:, :, None]
            * jnp.matmul(
                jnp.conj(jnp.swapaxes(u, -1, -2)), theta_nr, precision="highest"
            ),
            (nb, chi, d, chi),
        )
        # Restore the zero-at-padded-directions invariant the old λ^-1 unwrap
        # enforced via _safe_inv=0: without it, f32 noise in theta at padded
        # zero-λ environment directions survives the inverse-free unwrap, and
        # canonicalize()'s QR sweep normalizes that garbage into O(1) spurious
        # orthonormal Schmidt directions.
        gl_new = jnp.where(lam_l[:, :, None, None] > 1e-12, gl_new, 0.0)
        gr_new = jnp.where(lam_r[:, None, None, :] > 1e-12, gr_new, 0.0)
        if isinstance(self.gammas, jax.core.Tracer):
            # traced (jit/TPU production): reassemble by interleave + concat —
            # pure reshapes/slices XLA fuses, instead of site-axis scatters
            # which serialize on TPU
            mid_g = jnp.reshape(
                jnp.stack([gl_new, gr_new], axis=1), (2 * nb, chi, d, chi)
            )
            self.gammas = jnp.concatenate(
                [self.gammas[:p], mid_g, self.gammas[hi:]], axis=0
            )
            mid_lam = jnp.reshape(
                jnp.stack([lam_l, s_new], axis=1), (2 * nb, chi)
            )
            self.lambdas = jnp.concatenate(
                [self.lambdas[:p], mid_lam, self.lambdas[hi:]], axis=0
            )
        else:
            # eager: two scatters dispatch fewer ops than the concat chain
            li = np.arange(p, hi, 2)
            self.gammas = self.gammas.at[li].set(gl_new).at[li + 1].set(gr_new)
            self.lambdas = self.lambdas.at[li + 1].set(s_new)

    def trotter_step(self, even_gates: Tensor, odd_gates: Optional[Tensor] = None) -> None:
        """Even layer then odd layer (2nd-order users call with half-steps).

        NOTE for imaginary time / open chains: a single uniform bond gate
        undercounts single-site fields at the chain edges (sites 0 and n-1
        sit on one bond only) — pass per-bond ``(nb, d^2, d^2)`` stacks with
        boundary-corrected bond Hamiltonians, and call :meth:`canonicalize`
        periodically during non-unitary evolution.
        """
        self.apply_two_site_layer(even_gates, parity=0)
        self.apply_two_site_layer(
            even_gates if odd_gates is None else odd_gates, parity=1
        )

    # ------------------------------------------------------------------
    # readout
    # ------------------------------------------------------------------

    def canonicalize(self) -> None:
        """Restore the Vidal canonical form (QR left sweep + SVD right sweep).

        Real-time (unitary) TEBD preserves canonicality automatically, but
        imaginary-time / non-unitary gates leave the λ environments stale —
        the "simple update" bias (measured: TFIM ground-state energy error
        8e-2 regardless of χ without this).  Call periodically during
        imaginary-time evolution; the state is unchanged (up to global
        norm/phase), λ become true Schmidt spectra.
        """
        n, chi, d = self.n, self.chi, self.d
        # re-gauging invalidates any recorded warm-start basis
        self._warm_in = {}
        self._vh_warm = {}
        tensors = self.to_mps_tensors()
        dt = jnp.asarray(tensors[0]).dtype
        # left-to-right QR sweep -> left-canonical A_i
        a_list = []
        carry = jnp.eye(chi, dtype=dt)
        for i in range(n):
            t = jnp.einsum("ab,bdc->adc", carry, jnp.asarray(tensors[i]))
            m = jnp.reshape(t, (chi * d, chi))
            q, r = jnp.linalg.qr(m)
            k = q.shape[-1]
            if k < chi:  # pad rank (static shapes)
                q = jnp.pad(q, ((0, 0), (0, chi - k)))
                r = jnp.pad(r, ((0, chi - k), (0, 0)))
            a_list.append(jnp.reshape(q, (chi, d, chi)))
            carry = r
        # right-to-left SVD sweep -> Schmidt λ and right-canonical B_i
        lambdas = [None] * (n + 1)
        lam_edge = np.zeros((chi,), dtype=np.float32)
        lam_edge[0] = 1.0
        lambdas[n] = jnp.asarray(lam_edge)
        gammas = [None] * n
        # seed with the final QR carry: it projects out the orthonormal
        # completion columns QR invented for the rank-1 edge bond (discarding
        # it leaves garbage Schmidt directions in the right sweep)
        nrm0 = jnp.abs(carry[0, 0])
        carry = carry / jnp.where(nrm0 > 1e-30, nrm0, 1.0).astype(dt)
        for i in range(n - 1, -1, -1):
            t = jnp.einsum("adc,ce->ade", a_list[i], carry)
            m = jnp.reshape(t, (chi, d * chi))
            u, s, vh = _linalg.gram_svd(m)
            u = u[..., :, :chi]
            s = s[..., :chi]
            vh = vh[..., :chi, :]
            nrm = jnp.linalg.norm(s)
            s = s / jnp.where(nrm > 1e-30, nrm, 1.0)
            b = jnp.reshape(vh, (chi, d, chi))
            # Vidal: right-canonical B_i = Γ_i λ_{i+1}  =>  Γ_i = B_i λ_{i+1}^{-1}
            inv_r = _safe_inv(jnp.real(lambdas[i + 1])).astype(dt)
            gammas[i] = b * inv_r[None, None, :]
            lambdas[i] = jnp.real(s).astype(jnp.float32)
            carry = u * s.astype(dt)[None, :]
        # bond 0 is the open left edge: slot 0 only
        lambdas[0] = jnp.asarray(lam_edge)
        self.gammas = jnp.stack(gammas)
        self.lambdas = jnp.stack(lambdas)

    def theta_single(self, i: int) -> Tensor:
        """Canonical single-site tensor λ_{i-1} Γ_i λ_i (χ, d, χ)."""
        dt = self.gammas.dtype
        return (
            self.lambdas[i].astype(dt)[:, None, None]
            * self.gammas[i]
            * self.lambdas[i + 1].astype(dt)[None, None, :]
        )

    def expectation_single(self, op: Tensor, i: int) -> Tensor:
        """⟨O_i⟩ via the canonical environment (exact in Vidal form)."""
        th = self.theta_single(i)
        op = jnp.asarray(op).astype(th.dtype)
        num = jnp.einsum("aib,ij,ajb->", jnp.conj(th), op, th)
        den = jnp.einsum("aib,aib->", jnp.conj(th), th)
        return num / den

    def expectation_two_site(self, op: Tensor, i: int) -> Tensor:
        """⟨O_{i,i+1}⟩ for a (d², d²) operator on bond i."""
        dt = self.gammas.dtype
        left = self.lambdas[i].astype(dt)[:, None, None] * self.gammas[i]
        left = left * self.lambdas[i + 1].astype(dt)[None, None, :]
        right = self.gammas[i + 1] * self.lambdas[i + 2].astype(dt)[None, None, :]
        th = jnp.einsum("aim,mjb->aijb", left, right)
        th2 = jnp.reshape(th, (self.chi, self.d * self.d, self.chi))
        op = jnp.asarray(op).astype(dt)
        oth = jnp.einsum("pq,aqb->apb", op, th2)
        num = jnp.einsum("apb,apb->", jnp.conj(th2), oth)
        den = jnp.einsum("apb,apb->", jnp.conj(th2), th2)
        return num / den

    def entanglement_entropy(self, bond: int) -> Tensor:
        """Von Neumann entropy of the bond's λ spectrum."""
        p = self.lambdas[bond] ** 2
        p = p / jnp.sum(p)
        p = jnp.clip(p, 1e-12, 1.0)
        return -jnp.sum(p * jnp.log(p))

    def to_mps_tensors(self) -> List[Tensor]:
        """Site tensors (l, d, r) of the equivalent left-absorbed MPS."""
        out = []
        dt = self.gammas.dtype
        for i in range(self.n):
            t = self.lambdas[i].astype(dt)[:, None, None] * self.gammas[i]
            if i == self.n - 1:
                t = t * self.lambdas[i + 1].astype(dt)[None, None, :]
            out.append(t)
        return out

    def wavefunction(self) -> Tensor:
        """Dense state (small n only)."""
        tensors = self.to_mps_tensors()
        psi = tensors[0][:1]  # (1, d, χ) — the padded edge bond starts at slot 0
        psi = jnp.reshape(psi, (self.d, self.chi))
        for t in tensors[1:]:
            psi = jnp.einsum("xm,mdb->xdb", psi, t, precision="highest")
            psi = jnp.reshape(psi, (-1, self.chi))
        return psi[:, 0]
