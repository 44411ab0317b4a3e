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

__all__ = ["FGSSimulator", "FGSTestSimulator"]


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
            filled = list(filled or [])
            cols = []
            for i in range(L):
                col = np.zeros((2 * L,))
                if i in filled:
                    col[L + i] = 1.0
                else:
                    col[i] = 1.0
                cols.append(col)
            self.alpha = jnp.asarray(np.stack(cols, axis=1), dtype=dt)

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

    def evol_ghamiltonian(self, m: Tensor, t: float = 1.0) -> None:
        r"""Non-unitary evolution by a general (non-hermitian) M (reference ``:572``)."""
        import jax.scipy.linalg as jsl

        m = jnp.asarray(m).astype(self.alpha.dtype)
        u = jsl.expm(-1j * jnp.asarray(t, dtype=m.dtype) * m)
        self.alpha = u @ self.alpha
        self.orthogonalize()

    def orthogonalize(self) -> None:
        q, _ = jnp.linalg.qr(self.alpha)
        self.alpha = q

    # ------------------------------------------------------------------
    # observables
    # ------------------------------------------------------------------

    def get_alpha(self) -> Tensor:
        return self.alpha

    def get_cmatrix(self) -> Tensor:
        r"""C = ⟨Ψ Ψ†⟩ = alpha alpha† (2L x 2L)."""
        return self.alpha @ jnp.conj(self.alpha.T)

    def expectation_2body(self, i: int, j: int) -> Tensor:
        r"""⟨c_i† c_j⟩ from the correlation matrix."""
        c = self.get_cmatrix()
        # ⟨c_i† c_j⟩ = δ_ij - ⟨c_j c_i†⟩ = δ_ij - C[j, i]
        return (1.0 if i == j else 0.0) - c[j, i]

    def occupation(self, i: int) -> Tensor:
        return jnp.real(self.expectation_2body(i, i))

    def entropy(self, region: Sequence[int]) -> Tensor:
        r"""Entanglement entropy of site subset (reference ``:314-420``)."""
        idx = list(region) + [self.L + i for i in region]
        c = self.get_cmatrix()
        sub = c[jnp.ix_(jnp.asarray(idx), jnp.asarray(idx))]
        lam = jnp.real(jnp.linalg.eigvalsh(sub))
        lam = jnp.clip(lam, 1e-12, 1 - 1e-12)
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

    def post_select(self, i: int, keep: int = 0) -> None:
        r"""Project mode i onto occupation ``keep`` (reference ``:930-1020``).

        Implemented by strong imaginary-time evolution of ±n_i followed by
        orthonormalization (exact in the infinite-strength limit).
        """
        sign = 1.0 if keep == 0 else -1.0
        m = self.chemical_potential(self.L, i, 1.0)
        self.evol_ihamiltonian(sign * 30.0 * m)


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
