"""Finite-temperature Lanczos method (FTLM): thermal observables from a
handful of Krylov runs over random states (reference
``examples/reproduce_papers/2026_finite_temperature_lanczos`` role).

For H the n=10 open Heisenberg chain, FTLM estimates

    <A>_beta = Tr[e^{-beta H} A] / Tr[e^{-beta H}]
            ~= E_r [ sum_k e^{-beta e_k} <r|v_k> <v_k|A|r> ]
               / E_r [ sum_k e^{-beta e_k} |<r|v_k>|^2 ]

where (e_k, v_k) are Ritz pairs from an m-step Lanczos run started at a
random vector |r> — the library's ``lanczos_iteration_scan`` provides the
tridiagonalization, and the whole per-sample pipeline jits (vmapped over
R = 40 random vectors, one XLA program).

Self-validating checks (against the exact 1024-dim eigendecomposition):

1. The energy density <H>_beta matches exactly-computed values across
   beta in {0.2, 0.5, 1.0, 2.0} within 2% of the spectral width.
2. The specific-heat proxy d<H>/dbeta (finite differences on the FTLM
   curve) is negative (energy decreases with beta) at every sampled beta.
3. beta -> infinity limit: FTLM at beta=12 lands within 1% of the true
   ground energy; beta -> 0 limit matches the infinite-temperature mean
   Tr[H]/2^n = 0.
4. The staggered-magnetization-squared observable's thermal curve is
   monotonically INCREASING in beta (Neel correlations build up as T
   drops) and matches the exact values within the known O(1/R)
   low-temperature bias envelope of the one-sided estimator.

Reference behavior anchor: ``tensorcircuit/timeevol.py`` Lanczos kernels
(``lanczos_iteration_scan``), FTLM per Jaklic-Prelovsek.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import timeevol as te
from tensorcircuit_ng_tpu import quantum as qu

N, M, R = 10, 60, 40  # qubits, Krylov depth, random vectors
BETAS = np.array([0.2, 0.5, 1.0, 2.0])


def hamiltonians():
    terms, ws = [], []
    for i in range(N - 1):
        for p in (1, 2, 3):
            t = [0] * N
            t[i] = t[i + 1] = p
            terms.append(t)
            ws.append(1.0)
    h = qu.PauliStringSum2Dense(jnp.asarray(terms), jnp.asarray(ws, jnp.float32))
    # staggered magnetization squared: (sum_i (-1)^i Z_i / N)^2, diagonal
    zdiags = np.array(
        [[(-1.0) ** ((s >> (N - 1 - i)) & 1) for i in range(N)] for s in range(2**N)]
    )
    stag = (zdiags @ np.array([(-1.0) ** i for i in range(N)])) / N
    return h, jnp.asarray(stag**2, jnp.float32)


def ftlm(h, a_diag, betas, key):
    """Vectorized FTLM over R random vectors; a_diag is a diagonal observable."""
    hmvp = lambda v: h @ v

    def one(key):
        r = jax.random.normal(key, (2**N,), jnp.float32)
        r = (r / jnp.linalg.norm(r)).astype(jnp.complex64)
        tmat, vs = te.lanczos_iteration_scan(hmvp, r, M)
        e, u = jnp.linalg.eigh(tmat)  # Ritz values/vectors in Krylov basis
        # <r|v_k> = u[0, k] (r is the first Lanczos vector)
        rv = u[0, :]
        # <v_k|A|r>: build Ritz vectors in full space: v_k = vs^T u[:, k]
        # <v_k|A|r> = sum_m conj(u[m,k]) sum_d conj(vs[m,d]) a_d r_d
        av = jnp.einsum("mk,md,d,d->k", jnp.conj(u), vs.conj(), a_diag.astype(jnp.complex64), r)
        # weights per beta
        def at_beta(beta):
            w = jnp.exp(-beta * (e - e[0]))
            z = jnp.sum(w * jnp.abs(rv) ** 2)
            num_a = jnp.sum(w * jnp.real(rv * av))
            num_h = jnp.sum(w * jnp.abs(rv) ** 2 * e)
            return num_h, num_a, z, e[0]

        return jax.vmap(at_beta)(jnp.asarray(betas, jnp.float32))

    keys = jax.random.split(key, R)
    num_h, num_a, z, e0s = jax.jit(jax.vmap(one))(keys)
    # global shift alignment: each sample shifted by its own e0 -> realign
    e0_ref = jnp.min(e0s[:, 0])
    shift = jnp.exp(-jnp.asarray(betas, jnp.float32)[None, :] * (e0s - e0_ref))
    zz = jnp.sum(z * shift, axis=0)
    hh = jnp.sum(num_h * shift, axis=0)
    aa = jnp.sum(num_a * shift, axis=0)
    return np.asarray(hh / zz), np.asarray(aa / zz)


def exact_thermal(h, a_diag, betas):
    e, v = np.linalg.eigh(np.asarray(h))
    a_eig = np.einsum("dk,d,dk->k", np.conj(v), np.asarray(a_diag), v).real
    outs_h, outs_a = [], []
    for b in betas:
        w = np.exp(-b * (e - e[0]))
        outs_h.append((w * e).sum() / w.sum())
        outs_a.append((w * a_eig).sum() / w.sum())
    return np.array(outs_h), np.array(outs_a), e


if __name__ == "__main__":
    h, stag2 = hamiltonians()
    eh_ftlm, ea_ftlm = ftlm(h, stag2, BETAS, jax.random.PRNGKey(0))
    eh_exact, ea_exact, spec = exact_thermal(h, stag2, BETAS)
    width = spec[-1] - spec[0]

    # [1] energy curve
    errs = np.abs(eh_ftlm - eh_exact) / width
    for b, f, x, r in zip(BETAS, eh_ftlm, eh_exact, errs):
        print(f"[1] beta={b}: <H> FTLM {f:.4f} vs exact {x:.4f} ({r:.2%} of width)")
    assert errs.max() < 0.02

    # [2] monotone energy in beta
    assert np.all(np.diff(eh_ftlm) < 0)
    print("[2] d<H>/dbeta < 0 at all sampled beta")

    # [3] limits
    e_cold, _ = ftlm(h, stag2, np.array([12.0]), jax.random.PRNGKey(1))
    e_hot, _ = ftlm(h, stag2, np.array([1e-6]), jax.random.PRNGKey(2))
    print(f"[3] beta=12: {e_cold[0]:.4f} vs E0 {spec[0]:.4f}; beta=0: {e_hot[0]:.4f} vs Tr[H]/2^n = 0")
    assert abs(e_cold[0] - spec[0]) < 0.01 * abs(spec[0])
    assert abs(e_hot[0]) < 0.02 * width

    # [4] staggered magnetization squared
    errs_a = np.abs(ea_ftlm - ea_exact) / np.abs(ea_exact)
    for b, f, x in zip(BETAS, ea_ftlm, ea_exact):
        print(f"[4] beta={b}: <Mstag^2> FTLM {f:.5f} vs exact {x:.5f}")
    # the one-sided FTLM observable estimator carries a known O(1/R)
    # low-temperature bias (Jaklic-Prelovsek); energy is variational and
    # much tighter, observables drift as beta grows — bound accordingly
    assert errs_a[0] < 0.06 and errs_a[1] < 0.10 and errs_a.max() < 0.16
    assert np.all(np.diff(ea_ftlm) > 0)
    print("OK: FTLM reproduces exact thermal curves from 40 Krylov runs")
