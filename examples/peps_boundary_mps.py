"""Boundary-MPS contraction of a 2D tensor network: log-partition function
of the square-lattice classical Ising model (reference
``examples/peps_boundary_mps.py`` role).

The L x L open-boundary Ising partition function is written as a PEPS-like
grid of rank-4 tensors T[u,l,d,r] = sum_s W[s,u]W[s,l]W[s,d]W[s,r] with
W the symmetric square root of the bond Boltzmann matrix
M = [[e^b, e^-b], [e^-b, e^b]].  The grid is contracted row by row into a
boundary MPS of bond dimension chi:

- absorb: MPS bond (chi) x tensor bond (2) -> 2*chi, fully vectorized,
- compress: a left-to-right QR scan then a right-to-left truncated-SVD
  scan, both ``lax.scan``s over fixed-shape (2chi, 2, 2chi) site tensors —
  no dynamic shapes anywhere, so the WHOLE L-row contraction jits as one
  XLA program (rows ride an outer ``lax.scan``),
- open-boundary edge legs are consumed by cap vectors (solve(W, 1)) once
  per row inside the compression sweeps,
- overflow safety: every SVD extracts its leading singular value into an
  accumulated log factor, so logZ for arbitrarily large beta*L^2 never
  leaves f64 range.

Self-validating checks:

1. L=4 vs EXACT enumeration of all 2^16 spin configurations: logZ matches
   to 1e-9 at both beta=0.3 and beta=0.7 (chi=8 is exact for L=4).
2. Truncation convergence: at L=32, beta=0.6, chi=8 and chi=16 agree on
   logZ/site to 1e-8 (thermal spectra decay fast off criticality).
3. Thermodynamic limit: the OBC free energy per site approaches Onsager's
   exact bulk value monotonically as L doubles (16 -> 32), with the L=32
   boundary deviation under 6%.

TPU notes: all tensors are fixed-shape and the compression is QR/SVD on
(4chi x 2chi)-sized panels — MXU-friendly; swap jnp.linalg.svd for
``core.kernels_jacobi`` on-chip if chi grows past a few hundred.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from jax import lax
from functools import partial


def site_tensor(beta):
    m = jnp.asarray(
        [[jnp.exp(beta), jnp.exp(-beta)], [jnp.exp(-beta), jnp.exp(beta)]]
    )
    evals, evecs = jnp.linalg.eigh(m)
    w = evecs * jnp.sqrt(evals)[None, :]  # W[s, k], sum_k W[s,k]W[s',k] = M
    t = jnp.einsum("su,sl,sd,sr->uldr", w, w, w, w)
    cap = jnp.linalg.solve(w, jnp.ones(2))  # sum_l W[s,l] cap[l] = 1
    return t, cap


def _compress(tensors, cap, chi, log_acc):
    """(L, m, 2, m) -> (L, chi, 2, chi); consumes this row's edge caps.

    Edge bonds live at raw composite indices {0, 1} = (carry=0) x (leg l).
    """
    L, m = tensors.shape[0], tensors.shape[1]

    def qr_step(r, a):
        a = jnp.einsum("ab,buc->auc", r, a)
        q, rn = jnp.linalg.qr(a.reshape(m * 2, m))
        return rn, q.reshape(m, 2, m)

    r_f, qs = lax.scan(qr_step, jnp.eye(m), tensors)
    # fold the final R into the last site; its right bond carries this
    # row's right edge leg -> consume the right cap into new bond index 0
    last = jnp.einsum("aub,bc->auc", qs[-1], r_f)
    capvec = jnp.zeros(m).at[0].set(cap[0]).at[1].set(cap[1])
    m_init = jnp.zeros((m, chi)).at[:, 0].set(capvec)

    def svd_step(mc, a):  # right-to-left truncated SVD
        b = jnp.einsum("aub,bc->auc", a, mc).reshape(m, 2 * chi)
        u, s, vh = jnp.linalg.svd(b, full_matrices=False)
        s0 = jnp.maximum(s[0], 1e-300)
        new = vh[:chi].reshape(chi, 2, chi)
        carry = u[:, :chi] * (s[:chi] / s0)[None, :]
        return carry, (new, jnp.log(s0))

    seq = jnp.concatenate([qs[:-1], last[None]], axis=0)[::-1]
    m_f, (news, logs) = lax.scan(svd_step, m_init, seq)
    news = news[::-1]
    # left edge: composite indices {0,1} are this row's left leg -> cap
    w_l = cap[0] * m_f[0] + cap[1] * m_f[1]  # (chi,)
    s0 = jnp.maximum(jnp.linalg.norm(w_l), 1e-300)
    first = jnp.einsum("c,cub->ub", w_l / s0, news[0])[None]
    first = jnp.pad(first, ((0, chi - 1), (0, 0), (0, 0)))
    out = jnp.concatenate([first[None], news[1:]], axis=0)
    return out, log_acc + jnp.sum(logs) + jnp.log(s0)


@partial(jax.jit, static_argnums=(1, 2))
def log_z(beta, L, chi):
    t, cap = site_tensor(beta)
    m = 2 * chi
    # top row: cap the up leg, embed (l, d, r) into (chi, 2, chi)
    t_top = jnp.einsum("u,uldr->ldr", cap, t)
    a0 = jnp.zeros((L, chi, 2, chi))
    a0 = a0.at[:, 0:2, :, 0:2].set(jnp.broadcast_to(t_top, (L, 2, 2, 2)))
    mps, log_acc = _compress(
        jnp.pad(a0, ((0, 0), (0, chi), (0, 0), (0, chi))), cap, chi, 0.0
    )

    def absorb(a):  # (L,chi,2,chi) x T -> (L, 2chi, 2, 2chi)
        return jnp.einsum("jaub,uldr->jaldbr", a, t).reshape(L, m, 2, m)

    def row_step(carry, _):
        mps, log_acc = carry
        mps, log_acc = _compress(absorb(mps), cap, chi, log_acc)
        return (mps, log_acc), 0.0

    (mps, log_acc), _ = lax.scan(row_step, (mps, log_acc), None, length=L - 2)

    # bottom row: cap the down leg; edge legs consumed by the chain caps
    t_bot = jnp.einsum("d,uldr->ulr", cap, t)
    mats = jnp.einsum("jaub,ulr->jalbr", mps, t_bot).reshape(L, m, m)
    capvec = jnp.zeros(m).at[0].set(cap[0]).at[1].set(cap[1])

    def chain_step(v, mm):
        v = v @ mm
        s = jnp.maximum(jnp.linalg.norm(v), 1e-300)
        return v / s, jnp.log(s)

    v, logs = lax.scan(chain_step, capvec, mats)
    return log_acc + jnp.sum(logs) + jnp.log(jnp.maximum(v @ capvec, 1e-300))


def brute_force_log_z(beta, L):
    n = L * L
    states = np.arange(2**n, dtype=np.int64)
    bits = ((states[:, None] >> np.arange(n)[None, :]) & 1) * 2 - 1
    e = np.zeros(len(states))
    for i in range(L):
        for j in range(L):
            s = bits[:, i * L + j]
            if j + 1 < L:
                e += s * bits[:, i * L + j + 1]
            if i + 1 < L:
                e += s * bits[:, (i + 1) * L + j]
    emax = (beta * e).max()
    return float(np.log(np.exp(beta * e - emax).sum()) + emax)


def onsager_bulk_f(beta):
    """Exact bulk -beta*f per site (Onsager)."""
    th = np.linspace(0, 2 * np.pi, 401)[:-1]
    t1, t2 = np.meshgrid(th, th)
    k = np.cosh(2 * beta) ** 2 - np.sinh(2 * beta) * (np.cos(t1) + np.cos(t2))
    # beta->inf limit fixes the constant: ln[cosh^2] ~ 4b - ln4, so the
    # integral term gives 2b - ln2 and the prefactor must be ln2 (not ln2/2)
    return float(np.log(2) + np.mean(np.log(k)) / 2)


if __name__ == "__main__":
    # [1] exact parity at L=4
    for beta in (0.3, 0.7):
        lz = float(log_z(jnp.float64(beta), 4, 8))
        bf = brute_force_log_z(beta, 4)
        print(f"[1] L=4 beta={beta}: boundary-MPS logZ={lz:.9f} brute={bf:.9f}")
        assert abs(lz - bf) < 1e-8, (lz, bf)

    # [2] chi convergence at L=32
    beta = 0.6
    lz8 = float(log_z(jnp.float64(beta), 32, 8)) / 32**2
    lz16 = float(log_z(jnp.float64(beta), 32, 16)) / 32**2
    print(f"[2] L=32 beta=0.6: logZ/site chi=8 {lz8:.10f} vs chi=16 {lz16:.10f}")
    assert abs(lz8 - lz16) < 1e-8

    # [3] approach to the Onsager bulk value
    bulk = onsager_bulk_f(beta)
    d16 = abs(float(log_z(jnp.float64(beta), 16, 12)) / 16**2 - bulk)
    d32 = abs(lz16 - bulk)
    print(
        f"[3] -beta*f/site: bulk {bulk:.6f}, |dev| L=16 {d16:.4f} > L=32 {d32:.4f}"
    )
    assert d32 < d16 < 0.12 * bulk
    assert d32 < 0.06 * bulk
    print("OK: jitted boundary-MPS contracts the 2D Ising PEPS exactly and scales to the bulk limit")
