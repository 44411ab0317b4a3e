"""One-site TDVP for the transverse-field Ising chain, jit end-to-end.

Reference role: ``examples/one_site_tdvp.py`` (reference validates against
quimb; quimb is not installed here, so the oracle is exact dense evolution
at n=8, where bond dimension 16 makes the MPS manifold the full Hilbert
space and one-site TDVP must reproduce expm exactly up to the symmetric
Trotter splitting of the projector).

TPU-native design notes (vs the reference's per-site python):
- the whole sweep (site evolutions, QR splits, zero-site back-evolutions,
  environment updates) is traced once inside one ``jax.jit``; sites loop
  as a python range over a FIXED list of per-site shapes (bond dims vary
  along the chain, so ``lax.scan`` over sites would force padding).
- Lanczos exponentials run on a fixed Krylov dimension with
  ``jax.lax.scan`` and masked Gram-Schmidt (no data-dependent shapes).
- validation: overlap with ``expm(-iHt)|psi0>`` and energy conservation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# exact-oracle validation example: run on host CPU (the axon TPU tunnel
# cannot fetch complex host values; see CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

n, D, KRYLOV = 8, 16, 12
g_field = 1.1  # TFIM: H = -sum ZZ - g sum X
dt, steps = 0.05, 20
CPLX = jnp.complex128


def tfim_mpo(n, g):
    """Standard 3x3 block MPO for -sum Z_i Z_{i+1} - g sum X_i."""
    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])
    I = np.eye(2)
    W = np.zeros((3, 2, 3, 2))  # (wl, s', wr, s)
    W[0, :, 0, :] = I
    W[1, :, 0, :] = Z
    W[2, :, 0, :] = -g * X
    W[2, :, 1, :] = -Z
    W[2, :, 2, :] = I
    Wl = W[2:3]  # (1, 2, 3, 2)
    Wr = W[:, :, 0:1, :]  # (3, 2, 1, 2)
    return [jnp.asarray(Wl if i == 0 else (Wr if i == n - 1 else W), CPLX)
            for i in range(n)]


def random_right_canonical(key, n, D):
    """Random MPS, right-canonicalized by LQ sweeps; bond dims capped by
    both D and the exact Schmidt bound 2^min(i, n-i)."""
    dims = [1] + [min(D, 2 ** min(i, n - i)) for i in range(1, n)] + [1]
    keys = jax.random.split(key, n)
    ms = [
        jax.random.normal(keys[i], (dims[i], 2, dims[i + 1]))
        + 1j * jax.random.normal(jax.random.split(keys[i])[0], (dims[i], 2, dims[i + 1]))
        for i in range(n)
    ]
    ms = [m.astype(CPLX) for m in ms]
    for i in range(n - 1, 0, -1):  # right-canonicalize: m_i = L @ Q
        dl, d, dr = ms[i].shape
        q, r = jnp.linalg.qr(jnp.conj(jnp.reshape(ms[i], (dl, d * dr))).T)
        q = jnp.conj(q).T  # (dl', d*dr) row-orthonormal
        ms[i] = jnp.reshape(q, (q.shape[0], d, dr))
        ms[i - 1] = jnp.einsum("adb,bc->adc", ms[i - 1], jnp.conj(r).T)
    ms[0] = ms[0] / jnp.linalg.norm(ms[0])
    return ms


def lanczos_expm(matvec, v, tau, k=KRYLOV):
    """exp(tau * A) v on a k-dim Krylov subspace, static shapes.

    A is Hermitian (effective Hamiltonian blocks); tau is ±i dt/2."""
    shape = v.shape
    v = jnp.reshape(v, (-1,))
    nrm = jnp.linalg.norm(v)
    q0 = v / nrm

    def step(carry, i):
        V, alphas, betas, q = carry
        V = V.at[i].set(q)  # BEFORE the projection: w must lose its alpha·q part
        w = jnp.reshape(matvec(jnp.reshape(q, shape)), (-1,))
        alpha = jnp.real(jnp.vdot(q, w))
        # full masked re-orthogonalization keeps the basis clean at f64
        proj = jnp.where(jnp.arange(k) <= i, jnp.conj(V) @ w, 0.0)
        w = w - V.T @ proj
        beta = jnp.linalg.norm(w)
        qn = w / jnp.where(beta > 1e-14, beta, 1.0)
        return (V, alphas.at[i].set(alpha), betas.at[i].set(beta), qn), None

    V0 = jnp.zeros((k, v.shape[0]), v.dtype)
    (V, alphas, betas, _), _ = jax.lax.scan(
        step, (V0, jnp.zeros(k), jnp.zeros(k), q0), jnp.arange(k)
    )
    T = jnp.diag(alphas.astype(CPLX)) + jnp.diag(betas[:-1].astype(CPLX), 1) + jnp.diag(
        betas[:-1].astype(CPLX), -1
    )
    e, U = jnp.linalg.eigh(T)
    coeff = U @ (jnp.exp(tau * e) * jnp.conj(U[0]))
    out = V.T @ coeff * nrm
    return jnp.reshape(out, shape)


# environment convention, used CONSISTENTLY below: L and R are
# (ket bond, mpo bond, bra bond); M is a ket tensor (a, s, b);
# W is (wl, s'=bra phys, wr, s=ket phys).

def heff_matvec(L, W, R):
    # (Heff M)[a', s', b'] = L[a,w,a'] W[w,s',v,s] R[b,v,b'] M[a,s,b]
    def mv(M):
        t = jnp.einsum("awx,asb->wxsb", L, M)
        t = jnp.einsum("wxsb,wpvs->xpvb", t, W)
        return jnp.einsum("xpvb,bvy->xpy", t, R)
    return mv


def keff_matvec(L, R):
    # (Keff C)[a', b'] = L[a,w,a'] C[a,b] R[b,w,b']
    def mv(C):
        return jnp.einsum("awx,ab,bwy->xy", L, C, R)
    return mv


def env_left(L, M, W):
    # new_L[b, v, b'] = L[a,w,a'] M[a,s,b] W[w,s',v,s] conj(M)[a',s',b']
    t = jnp.einsum("awx,asb->wxsb", L, M)
    t = jnp.einsum("wxsb,wpvs->xpvb", t, W)
    return jnp.einsum("xpvb,xpy->bvy", t, jnp.conj(M))


def env_right(R, M, W):
    # new_R[a, w, a'] = R[b,v,b'] M[a,s,b] W[w,s',v,s] conj(M)[a',s',b']
    t = jnp.einsum("bvy,asb->vyas", R, M)
    t = jnp.einsum("vyas,wpvs->ywpa", t, W)
    return jnp.einsum("ywpa,xpy->awx", t, jnp.conj(M))


def tdvp_sweep(ms, Ws, dt):
    """One symmetric left-right + right-left one-site TDVP sweep."""
    n = len(ms)
    Ls = [jnp.ones((1, 1, 1), CPLX)]
    Rs = [jnp.ones((1, 1, 1), CPLX)] * n
    for i in range(n - 1, 0, -1):
        Rs[i - 1] = env_right(Rs[i] if i < n - 1 else jnp.ones((1, 1, 1), CPLX),
                              ms[i], Ws[i])
    R_end = jnp.ones((1, 1, 1), CPLX)
    # -> left-to-right half step
    for i in range(n):
        Ri = Rs[i] if i < n - 1 else R_end
        ms[i] = lanczos_expm(heff_matvec(Ls[i], Ws[i], Ri), ms[i], -0.5j * dt)
        if i < n - 1:
            dl, d, dr = ms[i].shape
            q, r = jnp.linalg.qr(jnp.reshape(ms[i], (dl * d, dr)))
            ms[i] = jnp.reshape(q, (dl, d, q.shape[1]))
            Ls.append(env_left(Ls[i], ms[i], Ws[i]))
            c = lanczos_expm(keff_matvec(Ls[i + 1], Ri), r, +0.5j * dt)
            ms[i + 1] = jnp.einsum("ab,bsc->asc", c, ms[i + 1])
    # <- right-to-left half step
    Rcur = R_end
    for i in range(n - 1, -1, -1):
        ms[i] = lanczos_expm(heff_matvec(Ls[i], Ws[i], Rcur), ms[i], -0.5j * dt)
        if i > 0:
            dl, d, dr = ms[i].shape
            qt, rt = jnp.linalg.qr(jnp.conj(jnp.reshape(ms[i], (dl, d * dr))).T)
            ms[i] = jnp.reshape(jnp.conj(qt).T, (qt.shape[1], d, dr))
            Rcur = env_right(Rcur, ms[i], Ws[i])
            c = lanczos_expm(keff_matvec(Ls[i], Rcur), jnp.conj(rt).T, +0.5j * dt)
            ms[i - 1] = jnp.einsum("asb,bc->asc", ms[i - 1], c)
    return ms


def to_dense(ms):
    psi = ms[0]
    for m in ms[1:]:
        psi = jnp.einsum("...a,asb->...sb", psi, m)
    return jnp.reshape(psi, (-1,))


def main():
    Ws = tfim_mpo(n, g_field)
    ms = random_right_canonical(jax.random.PRNGKey(7), n, D)

    @jax.jit
    def evolve(ms):
        for _ in range(steps):
            ms = tdvp_sweep(ms, Ws, dt)
        return ms

    t0 = time.time()
    out = evolve([m for m in ms])
    psi_t = np.asarray(to_dense(out))
    print(f"TDVP {steps} sweeps n={n} D={D}: {time.time()-t0:.1f} s "
          "(compile included)", flush=True)

    # dense oracle
    H = np.asarray(tc.quantum.PauliStringSum2Dense(
        [[3 if k in (i, i + 1) else 0 for k in range(n)] for i in range(n - 1)]
        + [[1 if k == i else 0 for k in range(n)] for i in range(n)],
        [-1.0] * (n - 1) + [-g_field] * n,
    ))
    psi0 = np.asarray(to_dense(ms))
    import scipy.linalg as sl
    psi_exact = sl.expm(-1j * H * dt * steps) @ psi0
    ov = abs(np.vdot(psi_exact, psi_t)) / (
        np.linalg.norm(psi_exact) * np.linalg.norm(psi_t))
    e0 = np.real(np.vdot(psi0, H @ psi0))
    et = np.real(np.vdot(psi_t, H @ psi_t)) / np.real(np.vdot(psi_t, psi_t))
    print(f"overlap with expm oracle: {ov:.8f}")
    print(f"energy conservation: E0 {e0:.8f} -> E(t) {et:.8f} "
          f"(drift {abs(et-e0):.2e})")
    assert ov > 1 - 1e-6, ov
    assert abs(et - e0) < 1e-6
    print("OK")


if __name__ == "__main__":
    main()
