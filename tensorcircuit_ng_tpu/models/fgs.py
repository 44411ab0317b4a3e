"""Fermion Gaussian state (free-fermion) simulator.

Counterpart of reference ``fgs.py``: :class:`FGSSimulator` tracks the
2L x L Bogoliubov matrix ``alpha`` (reference ``fgs.py:113-260``), evolves
under quadratic Hamiltonians (``:525-577``), exposes hopping / pairing /
chemical-potential generators (``:578-835``), correlation matrix, overlap,
and entanglement entropy (``:314-524``); :class:`FGSTestSimulator` is the
dense 2^L Jordan-Wigner oracle used by the tests (``fgs.py:1042-1512``).

Conventions: Ψ = (c_1..c_L, c†_1..c†_L); BdG matrix M with
H = (1/2) Ψ† M Ψ + const; the state is encoded by ``alpha`` (2L x L) whose
columns span the annihilator space, C = ⟨Ψ Ψ†⟩ = alpha @ alpha†.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import config

Tensor = Any

__all__ = ["FGSSimulator", "FGSTestSimulator", "onehot_matrix"]


def onehot_matrix(i: int, j: int, N: int) -> np.ndarray:
    """N x N matrix with a single 1 at (i, j) (reference ``fgs.py:21``)."""
    m = np.zeros([N, N], dtype=complex)
    m[i, j] = 1.0
    return m


class FGSSimulator:
    """Free-fermion simulator on the correlation-matrix representation."""

    def __init__(
        self,
        L: int,
        filled: Optional[Sequence[int]] = None,
        alpha: Optional[Tensor] = None,
        hc: Optional[Tensor] = None,
        dtype: Optional[str] = None,
    ):
        self.L = L
        dt = jnp.dtype(dtype or config.dtypestr())
        if alpha is not None:
            self.alpha = jnp.asarray(alpha).astype(dt)
        elif hc is not None:
            # ground state: annihilators are the positive-eigenvalue BdG
            # modes; alpha columns are their conjugates (see module notes)
            e, v = jnp.linalg.eigh(jnp.asarray(hc).astype(dt))
            self.alpha = jnp.conj(v[:, L:])
        else:
            self.alpha = jnp.asarray(self.init_alpha(list(filled or []), L), dtype=dt)
        self.alpha0 = self.alpha  # initial state, for OTOC correlators
        self.cmatrix: Optional[Tensor] = None
        self.otcmatrix: dict = {}

    def _invalidate(self) -> None:
        self.cmatrix = None
        self.otcmatrix = {}

    @staticmethod
    def init_alpha(filled: Sequence[int], L: int) -> np.ndarray:
        """Initial alpha for occupied sites ``filled`` (reference ``fgs.py:187``)."""
        alpha = np.zeros([2 * L, L])
        for i in range(L):
            if i in filled:
                alpha[i + L, i] = 1.0
            else:
                alpha[i, i] = 1.0
        return alpha

    @staticmethod
    def wmatrix(L: int) -> np.ndarray:
        r"""Fermion -> Majorana transform W with γ = W Ψ (reference ``fgs.py:165``).

        Rows alternate γ_{2i} = c_i + c†_i and γ_{2i+1} = i(c_i - c†_i).
        """
        w = np.zeros([2 * L, 2 * L], dtype=complex)
        for i in range(2 * L):
            if i % 2 == 1:
                w[i, (i - 1) // 2] = 1.0j
                w[i, (i - 1) // 2 + L] = -1.0j
            else:
                w[i, i // 2] = 1.0
                w[i, i // 2 + L] = 1.0
        return w

    @classmethod
    def fermion_diagonalization(cls, hc: Tensor, L: int) -> Tuple[Tensor, Tensor, Tensor]:
        """(eigenvalues desc, eigenvectors, alpha) of a BdG matrix (ref :113)."""
        es, u = jnp.linalg.eigh(jnp.asarray(hc))
        es = es[::-1]
        u = u[:, ::-1]
        alpha = u[:, :L]
        return es, u, alpha

    @classmethod
    def fermion_diagonalization_2(cls, hc: Tensor, L: int) -> Tuple[Tensor, Tensor, Tensor]:
        """Schur-based real-Majorana diagonalization (reference ``fgs.py:136``).

        Host-side (scipy schur); use for offline mode analysis.
        """
        import scipy.linalg as sl

        w = cls.wmatrix(L)
        hm = 0.25 * w @ np.asarray(hc) @ w.conj().T
        hm = np.real(-1.0j * hm)
        hd, om = sl.schur(hm, output="real")
        es = w.conj().T @ (1.0j * hd) @ w
        u = 0.5 * w.conj().T @ om.T @ w
        alpha = u.conj().T[:, :L]
        return es, u, alpha

    # ------------------------------------------------------------------
    # generators (BdG matrices)
    # ------------------------------------------------------------------

    @staticmethod
    def hopping(L: int, i: int, j: int, chi: complex = 1.0) -> np.ndarray:
        r"""M for H = chi c_i† c_j + conj(chi) c_j† c_i."""
        h = np.zeros((L, L), dtype=complex)
        h[i, j] += chi
        h[j, i] += np.conj(chi)
        return FGSSimulator.bdg(h, np.zeros((L, L), dtype=complex))

    @staticmethod
    def chemical_potential(L: int, i: int, mu: float = 1.0) -> np.ndarray:
        r"""M for H = mu c_i† c_i."""
        h = np.zeros((L, L), dtype=complex)
        h[i, i] = mu
        return FGSSimulator.bdg(h, np.zeros((L, L), dtype=complex))

    @staticmethod
    def pairing(L: int, i: int, j: int, delta: complex = 1.0) -> np.ndarray:
        r"""M for H = delta c_i c_j + conj(delta) c_j† c_i†."""
        d = np.zeros((L, L), dtype=complex)
        # H = (1/2) sum Δ_ab c_a c_b with antisymmetric Δ
        d[i, j] += delta
        d[j, i] -= delta
        return FGSSimulator.bdg(np.zeros((L, L), dtype=complex), d)

    sc_pairing = pairing  # reference name

    @staticmethod
    def bdg(h: np.ndarray, d: np.ndarray) -> np.ndarray:
        r"""Assemble M from h (hermitian, c† c) and d (antisymmetric, c c).

        H = Σ h_ij c_i† c_j + (1/2) Σ (d_ij c_i c_j + h.c.)
          = (1/2) Ψ† M Ψ + tr(h)/2 with M = [[h, -conj(d)], [d, -h^T]]
        (verified against the JW oracle in tests/test_fgs_qudit.py).
        """
        h = np.asarray(h, dtype=complex)
        d = np.asarray(d, dtype=complex)
        # with Ψ = (c, c†):  Ψ† M Ψ = Σ_ab [ c†_a M11_ab c_b + c†_a M12_ab c†_b
        #                                   + c_a M21_ab c_b + c_a M22_ab c†_b ]
        # choose M11 = h, M22 = -h^T, M12 = -conj(d)/1, M21 = d:
        # (1/2)(c† h c + c (-h^T) c†) = c† h c - tr(h)/2
        # (1/2)(c d c) + (1/2)(c† (-conj(d)) c†) = (1/2) Σ d_ij c_i c_j + h.c.
        m = np.zeros((2 * h.shape[0],) * 2, dtype=complex)
        L = h.shape[0]
        m[:L, :L] = h
        m[L:, L:] = -h.T
        m[:L, L:] = -np.conj(d)
        m[L:, :L] = d
        # hermitize (guards numerical asymmetry)
        return (m + m.conj().T) / 2.0

    # ------------------------------------------------------------------
    # evolution
    # ------------------------------------------------------------------

    def evol_hamiltonian(self, m: Tensor, t: float = 1.0) -> None:
        r"""Unitary evolution e^{-i H t} with H = (1/2)Ψ† M Ψ (reference ``:525``)."""
        import jax.scipy.linalg as jsl

        m = jnp.asarray(m).astype(self.alpha.dtype)
        u = jsl.expm(-1j * jnp.asarray(t, dtype=m.dtype) * m)
        self.alpha = u @ self.alpha
        self._invalidate()

    def evol_ihamiltonian(self, m: Tensor, t: float = 1.0) -> None:
        r"""Imaginary-time evolution e^{-H t} with re-orthonormalization.

        Note the + sign: the annihilator map alpha is antilinear in the state,
        so e^{-Ht} on kets is alpha' = e^{+Mt} alpha (cooling amplifies the
        annihilators of the low-energy configuration).
        """
        import jax.scipy.linalg as jsl

        m = jnp.asarray(m).astype(self.alpha.dtype)
        u = jsl.expm(jnp.asarray(t, dtype=m.dtype) * m)
        self.alpha = u @ self.alpha
        self.orthogonalize()
        self._invalidate()

    def evol_ghamiltonian(self, m: Tensor, t: float = 1.0) -> None:
        r"""Non-unitary evolution by a general (non-hermitian) M (reference ``:572``)."""
        import jax.scipy.linalg as jsl

        m = jnp.asarray(m).astype(self.alpha.dtype)
        u = jsl.expm(-1j * jnp.asarray(t, dtype=m.dtype) * m)
        self.alpha = u @ self.alpha
        self.orthogonalize()
        self._invalidate()

    def orthogonalize(self) -> None:
        q, _ = jnp.linalg.qr(self.alpha)
        self.alpha = q

    def orthogonal(self) -> None:
        """Reference alias (``fgs.py:572``)."""
        self.orthogonalize()

    # ---- O(L) local evolutions (reference fgs.py:603-835) ----

    def _evol_rows4(self, idx: List[int], m4: Tensor, imag: bool = False) -> None:
        """Apply exp(∓i m4) to the four alpha rows ``idx`` (analytic local update)."""
        import jax.scipy.linalg as jsl

        m4 = jnp.asarray(m4).astype(self.alpha.dtype)
        u4 = jsl.expm(m4 if imag else -1j * m4)
        rows = self.alpha[jnp.asarray(idx, dtype=jnp.int32), :]
        self.alpha = self.alpha.at[jnp.asarray(idx, dtype=jnp.int32), :].set(u4 @ rows)
        self._invalidate()

    def evol_hp(self, i: int, j: int, chi: Any = 0) -> None:
        r"""Evolve by H = chi c_i† c_j + h.c. in O(L) (reference ``fgs.py:603``).

        jit-safe for traced ``chi``; consistent with
        ``evol_hamiltonian(hopping(L, i, j, chi))``.
        """
        chi = jnp.asarray(chi)
        z = jnp.zeros((), dtype=self.alpha.dtype)
        c = chi.astype(self.alpha.dtype)
        # basis [i, j, L+i, L+j]: M = [[h, 0], [0, -h^T]] with h = [[0, chi], [chi*, 0]]
        m4 = jnp.stack(
            [
                jnp.stack([z, c, z, z]),
                jnp.stack([jnp.conj(c), z, z, z]),
                jnp.stack([z, z, z, -jnp.conj(c)]),
                jnp.stack([z, z, -c, z]),
            ]
        )
        self._evol_rows4([i, j, self.L + i, self.L + j], m4)

    def evol_sp(self, i: int, j: int, chi: Any = 0) -> None:
        r"""Evolve by H = chi c_i c_j + h.c. in O(L) (reference ``fgs.py:704``).

        Consistent with ``evol_hamiltonian(pairing(L, i, j, chi))``.
        """
        chi = jnp.asarray(chi)
        z = jnp.zeros((), dtype=self.alpha.dtype)
        c = chi.astype(self.alpha.dtype)
        # basis [i, j, L+i, L+j]: m[:2,2:] = -conj(d), m[2:,:2] = d,
        # d = [[0, chi], [-chi, 0]]
        m4 = jnp.stack(
            [
                jnp.stack([z, z, z, -jnp.conj(c)]),
                jnp.stack([z, z, jnp.conj(c), z]),
                jnp.stack([z, c, z, z]),
                jnp.stack([-c, z, z, z]),
            ]
        )
        self._evol_rows4([i, j, self.L + i, self.L + j], m4)

    def evol_cp(self, i: int, chi: Any = 0) -> None:
        r"""Evolve by H = chi c_i† c_i in O(L) (reference ``fgs.py:762``)."""
        chi = jnp.asarray(chi).astype(self.alpha.dtype)
        idx = jnp.asarray([i, self.L + i], dtype=jnp.int32)
        rows = self.alpha[idx, :]
        phases = jnp.stack([jnp.exp(-1j * chi), jnp.exp(1j * chi)])
        self.alpha = self.alpha.at[idx, :].set(phases[:, None] * rows)
        self._invalidate()

    def evol_icp(self, i: int, chi: Any = 0) -> None:
        r"""Imaginary-time evolve by H = chi c_i† c_i in O(L) (reference ``fgs.py:799``).

        Follows the ``evol_ihamiltonian`` sign convention (alpha' ∝ e^{+M} alpha)
        and re-orthonormalizes.
        """
        chi = jnp.asarray(chi).astype(self.alpha.dtype)
        idx = jnp.asarray([i, self.L + i], dtype=jnp.int32)
        rows = self.alpha[idx, :]
        scales = jnp.stack([jnp.exp(chi), jnp.exp(-chi)])
        self.alpha = self.alpha.at[idx, :].set(scales[:, None] * rows)
        self.orthogonalize()
        self._invalidate()

    # ------------------------------------------------------------------
    # observables
    # ------------------------------------------------------------------

    def get_alpha(self) -> Tensor:
        return self.alpha

    def get_cmatrix(self, now_i: bool = True, now_j: bool = True) -> Tensor:
        r"""C = ⟨Ψ Ψ†⟩ = alpha alpha† (2L x 2L); OTOC variants mix alpha0.

        Reference ``fgs.py:217`` (including the out-of-time-order options).
        """
        key = (int(now_i), int(now_j))
        if key == (1, 1):
            if self.cmatrix is None:
                self.cmatrix = self.alpha @ jnp.conj(self.alpha.T)
            return self.cmatrix
        if key not in self.otcmatrix:
            a = self.alpha if now_i else self.alpha0
            b = self.alpha if now_j else self.alpha0
            self.otcmatrix[key] = a @ jnp.conj(b.T)
        return self.otcmatrix[key]

    def get_reduced_cmatrix(self, subsystems_to_trace_out: Optional[Sequence[int]] = None) -> Tensor:
        """Correlation matrix restricted to the kept sites (reference ``fgs.py:261``).

        O(L·L_A²): slices alpha rows first, then forms the product.
        """
        trace_set = set(subsystems_to_trace_out or [])
        keep = [i for i in range(self.L) if i not in trace_set]
        keep += [i + self.L for i in range(self.L) if i not in trace_set]
        if not keep:
            raise ValueError("the full system is traced out, no subsystems to keep")
        sub = self.alpha[jnp.asarray(keep, dtype=jnp.int32), :]
        return sub @ jnp.conj(sub.T)

    def expectation_2body(self, i: int, j: int, now_i: bool = True, now_j: bool = True) -> Tensor:
        r"""⟨op_i op_j⟩ with op_m = c_m for m < L and c†_{m-L} for m >= L.

        Reference convention ``fgs.py:885``: value is C[i, (j+L) mod 2L].
        E.g. ⟨c†_i c_j⟩ = ``expectation_2body(i + L, j)``.
        """
        c = self.get_cmatrix(now_i, now_j)
        return c[i, (j + self.L) % (2 * self.L)]

    def expectation_4body(self, i: int, j: int, k: int, l: int) -> Tensor:
        r"""Wick's theorem for ⟨op_i op_j op_k op_l⟩ (reference ``fgs.py:906``)."""
        return (
            self.expectation_2body(i, j) * self.expectation_2body(k, l)
            - self.expectation_2body(i, k) * self.expectation_2body(j, l)
            + self.expectation_2body(i, l) * self.expectation_2body(j, k)
        )

    def occupation(self, i: int) -> Tensor:
        r"""⟨c†_i c_i⟩."""
        return jnp.real(self.expectation_2body(self.L + i, i))

    def get_bogoliubov_uv(self) -> Tuple[Tensor, Tensor]:
        r"""(u, v) with annihilators b_k = Σ_i u_{ik} c_i + v_{ik} c†_i (ref :837)."""
        return self.alpha[: self.L, :], self.alpha[self.L :, :]

    def get_cmatrix_majorana(self) -> Tensor:
        r"""Correlation matrix ⟨γ γ†⟩ in the Majorana basis (reference ``fgs.py:859``)."""
        w = jnp.asarray(self.wmatrix(self.L), dtype=self.alpha.dtype)
        return w @ self.get_cmatrix() @ jnp.conj(w.T)

    def get_covariance_matrix(self) -> Tensor:
        """-i(2 M - I) with M the Majorana correlation matrix (reference :873)."""
        m = self.get_cmatrix_majorana()
        return -1.0j * (2.0 * m - jnp.eye(2 * self.L, dtype=m.dtype))

    # ---- charge moments / entanglement asymmetry (reference fgs.py:350-480) ----

    def _charge_moment_core(self, gamma: Tensor, alpha_angles: Tensor, n: int) -> Tensor:
        subL2 = gamma.shape[-1]
        eye = jnp.eye(subL2, dtype=gamma.dtype)
        eps = {2: 1e-3, 3: 2e-2}.get(n, 8e-2)
        na = jnp.concatenate(
            [-jnp.ones(subL2 // 2), jnp.ones(subL2 // 2)]
        ).astype(gamma.dtype)
        m = (eye - gamma) / 2.0
        for _ in range(n - 1):
            m = m @ ((eye - gamma) / 2.0)
        invm = jnp.linalg.inv((1 + eps) * eye - gamma)
        wprod = eye
        for i in range(n):
            dphase = alpha_angles[(i + 1) % n] - alpha_angles[i]
            wprod = (
                (((1 + eps) * eye - gamma) @ (wprod @ invm))
                @ ((eye + gamma) / 2.0)
                @ jnp.diag(jnp.exp(1.0j * dphase * na))
            )
        return jnp.sqrt(jnp.linalg.det(m + wprod))

    def charge_moment(
        self,
        alpha_angles: Tensor,
        n: int,
        subsystems_to_trace_out: Optional[Sequence[int]] = None,
    ) -> Tensor:
        """Charge moment Z_n({alpha}) of the kept subsystem (reference ``fgs.py:350``).

        Ref: arXiv 2302.03330; determinant formula over the reduced covariance.
        """
        m = self.get_reduced_cmatrix(subsystems_to_trace_out)
        gamma = 2.0 * m - jnp.eye(m.shape[-1], dtype=m.dtype)
        return self._charge_moment_core(gamma, jnp.asarray(alpha_angles).astype(m.dtype), n)

    def renyi_entanglement_asymmetry(
        self,
        n: int,
        subsystems_to_trace_out: Optional[Sequence[int]] = None,
        batch: int = 100,
        status: Optional[Tensor] = None,
        with_std: bool = False,
    ) -> Tensor:
        """Monte-Carlo Rényi-n entanglement asymmetry (reference ``fgs.py:406``).

        Reference semantics (verified against the dense oracle): the return is
        the Rényi-n entropy of the *charge-dephased* reduced state
        S_n(ρ_AQ) = 1/(1-n) log E_α[Z_n(α)] — NOT normalized by tr ρ_A^n.
        The asymmetry proper is ``self.renyi_entanglement_asymmetry(n, r) -
        self.renyi_entropy(kept, n)``; for a number-conserving state the two
        terms coincide and the difference is 0.

        ``status``: [batch, n] angles in (-π, π); vmapped over the batch
        (reference loops in Python — vmap keeps one XLA program).
        """
        if status is None:
            status = np.random.default_rng().uniform(-np.pi, np.pi, size=[batch, n])
        m = self.get_reduced_cmatrix(subsystems_to_trace_out)
        gamma = 2.0 * m - jnp.eye(m.shape[-1], dtype=m.dtype)
        angles = jnp.asarray(status).astype(m.dtype)
        r = jax.vmap(lambda a: self._charge_moment_core(gamma, a, n))(angles)
        r_mean = jnp.real(jnp.mean(r))
        saq = 1.0 / (1 - n) * jnp.log(r_mean)
        if not with_std:
            return saq
        return saq, jnp.abs(1.0 / (1 - n) * jnp.real(jnp.std(r)) / saq)

    def cond_measure(self, ind: int, status: Any, with_prob: bool = False) -> Tensor:
        """Measure occupation of site ``ind`` and collapse (reference ``fgs.py:994``).

        ``status`` in [0, 1) drives the outcome via the jit-safe sign trick;
        returns the outcome (0./1.), optionally with [P(0), P(1)].
        """
        c = self.get_cmatrix()
        p0 = jnp.real(c[ind, ind])  # ⟨c c†⟩ = P(unoccupied)
        status = jnp.asarray(status, dtype=p0.dtype)
        eps = 1e-12
        keep = (jnp.sign(status - p0 + eps) + 1) / 2
        self.post_select(ind, keep)
        if with_prob:
            return keep, jnp.stack([p0, 1 - p0])
        return keep

    def entropy(self, region: Sequence[int]) -> Tensor:
        r"""Entanglement entropy of site subset (reference ``:314-420``)."""
        idx = list(region) + [self.L + i for i in region]
        c = self.get_cmatrix()
        sub = c[jnp.ix_(jnp.asarray(idx), jnp.asarray(idx))]
        lam = jnp.real(jnp.linalg.eigvalsh(sub))
        # clip bound must be representable at this dtype: f32 rounds
        # 1 - 1e-12 back to 1.0, giving 0*log(0) = NaN for filled modes
        eps = 10.0 * jnp.finfo(lam.dtype).eps
        lam = jnp.clip(lam, eps, 1 - eps)
        return -0.5 * jnp.sum(lam * jnp.log(lam) + (1 - lam) * jnp.log(1 - lam))

    def renyi_entropy(self, region: Sequence[int], k: int = 2) -> Tensor:
        idx = list(region) + [self.L + i for i in region]
        c = self.get_cmatrix()
        sub = c[jnp.ix_(jnp.asarray(idx), jnp.asarray(idx))]
        lam = jnp.real(jnp.linalg.eigvalsh(sub))
        lam = jnp.clip(lam, 1e-12, 1 - 1e-12)
        return 0.5 * jnp.sum(jnp.log(lam**k + (1 - lam) ** k)) / (1 - k)

    def overlap(self, other: "FGSSimulator") -> Tensor:
        r"""|⟨ψ1|ψ2⟩| via the Onishi-style determinant formula."""
        m = jnp.conj(self.alpha.T) @ other.alpha
        return jnp.sqrt(jnp.abs(jnp.linalg.det(m)))

    def post_select(self, i: int, keep: Any = 0) -> None:
        r"""Project mode i onto occupation ``keep`` (reference ``:930-1020``).

        Implemented by strong imaginary-time evolution of ±n_i followed by
        orthonormalization (exact in the infinite-strength limit); ``keep``
        may be a traced 0/1 scalar (jit/vmap-safe).
        """
        sign = 1.0 - 2.0 * jnp.asarray(keep, dtype=jnp.float32)
        m = jnp.asarray(self.chemical_potential(self.L, i, 1.0))
        self.evol_ihamiltonian(sign.astype(m.dtype) * 30.0 * m)


class FGSTestSimulator:
    """Dense 2^L Jordan-Wigner oracle (reference ``fgs.py:1042-1512``)."""

    def __init__(self, L: int, filled: Optional[Sequence[int]] = None):
        self.L = L
        dim = 2**L
        psi = np.zeros(dim, dtype=complex)
        idx = 0
        for i in filled or []:
            idx |= 1 << (L - 1 - i)
        psi[idx] = 1.0
        # apply creation-operator phases for the canonical ordering
        # c†_{i1} c†_{i2} ... |0> with i1 < i2 < ...: JW signs are +1 in this
        # ordering, so the basis state is exact.
        self.psi = psi

    def c_op(self, i: int) -> np.ndarray:
        """JW annihilation operator c_i as a dense matrix."""
        L = self.L
        sz = np.diag([1.0, -1.0])
        sm = np.array([[0.0, 1.0], [0.0, 0.0]])  # |0><1| (annihilate)
        eye = np.eye(2)
        ops = []
        for k in range(L):
            if k < i:
                ops.append(sz)
            elif k == i:
                ops.append(sm)
            else:
                ops.append(eye)
        m = ops[0]
        for o in ops[1:]:
            m = np.kron(m, o)
        return m

    def hamiltonian_dense(self, h: np.ndarray, d: Optional[np.ndarray] = None) -> np.ndarray:
        """H = Σ h_ij c†_i c_j + (1/2) Σ (d_ij c_i c_j + h.c.) as 2^L matrix."""
        L = self.L
        cs = [self.c_op(i) for i in range(L)]
        H = np.zeros((2**L, 2**L), dtype=complex)
        for i in range(L):
            for j in range(L):
                if h[i, j] != 0:
                    H += h[i, j] * cs[i].conj().T @ cs[j]
        if d is not None:
            for i in range(L):
                for j in range(L):
                    if d[i, j] != 0:
                        H += 0.5 * d[i, j] * cs[i] @ cs[j]
                        H += 0.5 * np.conj(d[i, j]) * cs[j].conj().T @ cs[i].conj().T
        return H

    def evol(self, h: np.ndarray, d: Optional[np.ndarray] = None, t: float = 1.0) -> None:
        import scipy.linalg as sl

        H = self.hamiltonian_dense(h, d)
        self.psi = sl.expm(-1j * t * H) @ self.psi

    def get_cmatrix(self) -> np.ndarray:
        """⟨Ψ Ψ†⟩ in the same (c, c†) block convention as FGSSimulator."""
        L = self.L
        cs = [self.c_op(i) for i in range(L)]
        ops = cs + [c.conj().T for c in cs]
        C = np.zeros((2 * L, 2 * L), dtype=complex)
        for a in range(2 * L):
            for b in range(2 * L):
                C[a, b] = self.psi.conj() @ (ops[a] @ ops[b].conj().T) @ self.psi
        return C

    def entropy(self, region: Sequence[int]) -> float:
        from .. import quantum as qu

        cut = [i for i in range(self.L) if i not in set(region)]
        rho = qu.reduced_density_matrix(jnp.asarray(self.psi), cut)
        return float(qu.entropy(rho))

    def occupation(self, i: int) -> float:
        c = self.c_op(i)
        return float(np.real(self.psi.conj() @ c.conj().T @ c @ self.psi))

    # ---- reference-parity oracle methods (fgs.py:1057-1512) ----

    @staticmethod
    def init_state(filled: Sequence[int], L: int) -> np.ndarray:
        """Dense JW basis state with ``filled`` occupied (reference :1076)."""
        return FGSTestSimulator(L, filled=list(filled)).psi

    def get_hmatrix(self, h: np.ndarray, d: Optional[np.ndarray] = None) -> np.ndarray:
        """Dense 2^L Hamiltonian (alias of :meth:`hamiltonian_dense`, ref :1089)."""
        return self.hamiltonian_dense(h, d)

    def hopping_jw(self, i: int, j: int, chi: complex = 1.0) -> np.ndarray:
        """Dense chi c†_i c_j + h.c. (reference :1122)."""
        ci, cj = self.c_op(i), self.c_op(j)
        return chi * ci.conj().T @ cj + np.conj(chi) * cj.conj().T @ ci

    def chemical_potential_jw(self, i: int, chi: float = 1.0) -> np.ndarray:
        """Dense chi c†_i c_i (reference :1131)."""
        c = self.c_op(i)
        return chi * c.conj().T @ c

    def sc_pairing_jw(self, i: int, j: int, chi: complex = 1.0) -> np.ndarray:
        """Dense chi c_i c_j + h.c. (reference :1161)."""
        ci, cj = self.c_op(i), self.c_op(j)
        return chi * ci @ cj + np.conj(chi) * cj.conj().T @ ci.conj().T

    def evol_hp(self, i: int, j: int, chi: complex = 0) -> None:
        import scipy.linalg as sl

        self.psi = sl.expm(-1j * self.hopping_jw(i, j, chi)) @ self.psi

    def evol_sp(self, i: int, j: int, chi: complex = 0) -> None:
        import scipy.linalg as sl

        self.psi = sl.expm(-1j * self.sc_pairing_jw(i, j, chi)) @ self.psi

    def evol_cp(self, i: int, chi: float = 0) -> None:
        import scipy.linalg as sl

        self.psi = sl.expm(-1j * self.chemical_potential_jw(i, chi)) @ self.psi

    def evol_icp(self, i: int, chi: float = 0) -> None:
        import scipy.linalg as sl

        self.psi = sl.expm(self.chemical_potential_jw(i, -chi)) @ self.psi
        self.orthogonal()

    def evol_hamiltonian(self, h: np.ndarray, d: Optional[np.ndarray] = None, t: float = 1.0) -> None:
        """Alias of :meth:`evol` (reference :1137 takes the quadratic blocks)."""
        self.evol(h, d, t)

    def evol_ihamiltonian(self, h: np.ndarray, d: Optional[np.ndarray] = None, t: float = 1.0) -> None:
        import scipy.linalg as sl

        H = self.hamiltonian_dense(h, d)
        self.psi = sl.expm(-t * H) @ self.psi
        self.orthogonal()

    def evol_ghamiltonian(self, h: np.ndarray, d: Optional[np.ndarray] = None, t: float = 1.0) -> None:
        import scipy.linalg as sl

        H = self.hamiltonian_dense(h, d)
        self.psi = sl.expm(-1j * t * H) @ self.psi
        self.orthogonal()

    def orthogonal(self) -> None:
        """Normalize the dense state (reference :1172)."""
        self.psi = self.psi / np.linalg.norm(self.psi)

    def get_cmatrix_majorana(self) -> np.ndarray:
        """⟨γ γ†⟩ in the Majorana basis (reference :1358)."""
        w = FGSSimulator.wmatrix(self.L)
        return w @ self.get_cmatrix() @ w.conj().T

    def expectation_2body(self, i: int, j: int) -> complex:
        """⟨op_i op_j⟩, op convention as :meth:`FGSSimulator.expectation_2body`."""
        return complex(self.get_cmatrix()[i, (j + self.L) % (2 * self.L)])

    def expectation_4body(self, i: int, j: int, k: int, l: int) -> complex:
        """Exact ⟨op_i op_j op_k op_l⟩ (reference :1383)."""
        L = self.L
        cs = [self.c_op(m) for m in range(L)]
        ops = cs + [c.conj().T for c in cs]
        m = ops[i] @ ops[j] @ ops[k] @ ops[l]
        return complex(self.psi.conj() @ m @ self.psi)

    def renyi_entropy(self, region: Sequence[int], k: int = 2) -> float:
        from .. import quantum as qu

        cut = [i for i in range(self.L) if i not in set(region)]
        rho = qu.reduced_density_matrix(jnp.asarray(self.psi), cut)
        return float(qu.renyi_entropy(rho, k))

    def get_dm(self) -> np.ndarray:
        """Dense density matrix |psi><psi| (reference :1481)."""
        return np.outer(self.psi, self.psi.conj())

    def product(self, other: "FGSTestSimulator") -> complex:
        """⟨self|other⟩ (reference :1485)."""
        return complex(self.psi.conj() @ other.psi)

    def overlap(self, other: "FGSTestSimulator") -> float:
        """|⟨self|other⟩| (reference :1478)."""
        return abs(self.product(other))

    def _number_op(self, region: Sequence[int]) -> np.ndarray:
        n_op = np.zeros((2**self.L, 2**self.L), dtype=complex)
        for i in region:
            c = self.c_op(i)
            n_op += c.conj().T @ c
        return n_op

    def charge_moment(
        self,
        alpha_angles: Sequence[float],
        n: int,
        subsystems_to_trace_out: Optional[Sequence[int]] = None,
    ) -> complex:
        """Dense-oracle charge moment (reference :1424): Z_n = tr ∏_i ρ_A e^{iδα_i Q_A}."""
        import scipy.linalg as sl

        from .. import quantum as qu

        trace_out = list(subsystems_to_trace_out or [])
        keep = [i for i in range(self.L) if i not in set(trace_out)]
        rho = np.asarray(qu.reduced_density_matrix(jnp.asarray(self.psi), trace_out))
        # Q_A in the reduced register ordering (kept sites, original order)
        sub = FGSTestSimulator(len(keep))
        q = sub._number_op(range(len(keep)))
        m = np.eye(rho.shape[0], dtype=complex)
        for i in range(n):
            dphase = alpha_angles[(i + 1) % n] - alpha_angles[i]
            m = m @ rho @ sl.expm(1j * dphase * q)
        return complex(np.trace(m))

    def post_select(self, i: int, keep: int = 0) -> None:
        """Project site i onto occupation ``keep`` and renormalize (reference :1492)."""
        c = self.c_op(i)
        n_op = c.conj().T @ c
        proj = n_op if keep == 1 else np.eye(2**self.L) - n_op
        self.psi = proj @ self.psi
        self.orthogonal()

    def cond_measure(self, ind: int, status: float, with_prob: bool = False) -> Any:
        """Measure site ``ind`` with random draw ``status`` (reference :1499)."""
        p1 = self.occupation(ind)
        p0 = 1.0 - p1
        keep = 0 if status < p0 else 1
        self.post_select(ind, keep)
        if with_prob:
            return float(keep), np.array([p0, p1])
        return float(keep)

    def fermion_diagonalization(self, hc: Any, L: int) -> Any:
        """Oracle-side ground state from a BdG matrix (reference :1083)."""
        _, _, alpha = FGSSimulator.fermion_diagonalization(hc, L)
        return np.asarray(alpha)

    def get_ot_cmatrix(self, psi0: Optional[np.ndarray] = None) -> np.ndarray:
        """Out-of-time-order ⟨ψ0|Ψ Ψ†|ψ⟩ correlation matrix (reference :1175)."""
        L = self.L
        cs = [self.c_op(i) for i in range(L)]
        ops = cs + [c.conj().T for c in cs]
        bra = self.psi if psi0 is None else np.asarray(psi0)
        C = np.zeros((2 * L, 2 * L), dtype=complex)
        for a in range(2 * L):
            for b in range(2 * L):
                C[a, b] = bra.conj() @ (ops[a] @ ops[b].conj().T) @ self.psi
        return C

    def renyi_entanglement_asymmetry(
        self,
        n: int,
        subsystems_to_trace_out: Optional[Sequence[int]] = None,
        batch: int = 100,
        status: Optional[np.ndarray] = None,
        with_std: bool = False,
    ) -> Any:
        """Dense-oracle S_n of the charge-dephased rho_A (matches FGSSimulator)."""
        if status is None:
            status = np.random.default_rng().uniform(-np.pi, np.pi, size=[batch, n])
        zs = np.array(
            [self.charge_moment(a, n, subsystems_to_trace_out) for a in np.asarray(status)]
        )
        r_mean = float(np.mean(zs.real))
        saq = 1.0 / (1 - n) * np.log(r_mean)
        if with_std:
            return saq, abs(1.0 / (1 - n) * float(np.std(zs.real)) / saq)
        return saq




