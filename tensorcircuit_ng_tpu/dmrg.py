"""Two-site DMRG ground-state solver on MPS/MPO tensors.

The reference rides external DMRG engines (quimb/tenpy) for MPS ground
states (e.g. ``examples/challenge_suite/problem_1.md``, ``problem_12.md``);
this is a self-contained counterpart: nearest-neighbor + on-site MPO
construction, left/right environment sweeps, dense effective-Hamiltonian
eigensolves (the two-site block is (chi d)^2-dimensional — tiny for
practical chi), and SVD truncation back to the bond budget.

Host-side numpy by design: DMRG is a sequential sweep algorithm (the
"compile" of an MPS initial state); the resulting tensors feed jit-side
consumers (overlap losses, MPSCircuit inputs) as numpy constants.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

Tensor = Any

__all__ = ["nn_mpo", "xxz_mpo", "dmrg", "mps_energy", "mps_overlap"]


def nn_mpo(
    n: int,
    bond_terms: Sequence[Tuple[np.ndarray, np.ndarray, float]],
    site_terms: Optional[Sequence[Tuple[np.ndarray, Any]]] = None,
    d: int = 2,
) -> List[np.ndarray]:
    """MPO for H = Σ_i Σ_t w_t A_t^i B_t^{i+1} + Σ_i Σ_s c_s(i) O_s^i.

    Site tensors have shape (l, out, in, r); ``site_terms`` coefficients may
    be callables of the site index (e.g. staggered fields).
    """
    site_terms = site_terms or []
    k = len(bond_terms)
    D = k + 2
    eye = np.eye(d)

    def w_at(i: int) -> np.ndarray:
        w = np.zeros((D, d, d, D), dtype=complex)
        w[0, :, :, 0] = eye
        w[D - 1, :, :, D - 1] = eye
        for t, (a, b, wt) in enumerate(bond_terms):
            w[0, :, :, 1 + t] = wt * a
            w[1 + t, :, :, D - 1] = b
        for op, coef in site_terms:
            c = coef(i) if callable(coef) else coef
            w[0, :, :, D - 1] += c * op
        return w

    ws = [w_at(i) for i in range(n)]
    ws[0] = ws[0][:1]  # left boundary row
    ws[-1] = ws[-1][:, :, :, -1:]  # right boundary column
    return ws


def xxz_mpo(n: int, delta: float = 1.0, stag: float = 0.0) -> List[np.ndarray]:
    """H = Σ (XX + YY + Δ ZZ) + stag Σ (-1)^i Z (challenge problems 2/12)."""
    x = np.array([[0, 1], [1, 0]], dtype=complex)
    y = np.array([[0, -1j], [1j, 0]], dtype=complex)
    z = np.diag([1.0, -1.0]).astype(complex)
    return nn_mpo(
        n,
        [(x, x, 1.0), (y, y, 1.0), (z, z, delta)],
        [(z, lambda i: stag * (-1.0) ** i)],
    )


def _left_env(envs: List[np.ndarray], a: List[np.ndarray], w: List[np.ndarray], i: int) -> np.ndarray:
    """L_{i} from L_{i-1}: contract site i-1 (a: (l, d, r))."""
    L = envs[i - 1] if i > 0 else np.ones((1, 1, 1), dtype=complex)
    t = a[i - 1]
    wi = w[i - 1]
    # L (al, wl, al*) ; t (al, p, ar) ; w (wl, p', p, wr) ; conj t (al*, p', ar*)
    tmp = np.einsum("abc,apr->bcpr", L, t)
    tmp = np.einsum("bcpr,bqpw->cqrw", tmp, wi)
    return np.einsum("cqrw,cqs->rws", tmp, t.conj())


def _right_env(envs: List[np.ndarray], a: List[np.ndarray], w: List[np.ndarray], i: int, n: int) -> np.ndarray:
    R = envs[i + 1] if i < n - 1 else np.ones((1, 1, 1), dtype=complex)
    t = a[i + 1]
    wi = w[i + 1]
    tmp = np.einsum("abc,lpa->lpbc", R, t)
    tmp = np.einsum("lpbc,wqpb->lwqc", tmp, wi)
    return np.einsum("lwqc,mqc->lwm", tmp, t.conj())


def dmrg(
    mpo: List[np.ndarray],
    chi: int = 16,
    sweeps: int = 4,
    init: Optional[List[np.ndarray]] = None,
    tol: float = 1e-9,
    seed: int = 0,
) -> Tuple[float, List[np.ndarray]]:
    """Two-site DMRG: returns (energy, MPS site tensors (l, d, r))."""
    n = len(mpo)
    d = mpo[0].shape[1]
    rng = np.random.default_rng(seed)
    if init is None:
        a = []
        bl = 1
        for i in range(n):
            br = min(chi, d ** min(i + 1, n - i - 1), bl * d)
            a.append(rng.normal(size=(bl, d, br)) + 0j)
            bl = br
    else:
        a = [np.asarray(t, dtype=complex) for t in init]
    # right-canonicalize
    for i in range(n - 1, 0, -1):
        l, p, r = a[i].shape
        m = a[i].reshape(l, p * r)
        q, rr = np.linalg.qr(m.conj().T)
        a[i] = q.conj().T.reshape(-1, p, r)
        a[i - 1] = np.einsum("lpr,rm->lpm", a[i - 1], rr.conj().T)

    Ls: List[np.ndarray] = [None] * n  # L-env to the LEFT of site i
    Rs: List[np.ndarray] = [None] * n  # R-env to the RIGHT of site i
    Ls[0] = np.ones((1, 1, 1), dtype=complex)
    Rs[n - 1] = np.ones((1, 1, 1), dtype=complex)
    for i in range(n - 2, -1, -1):
        Rs[i] = _right_env(Rs, a, mpo, i, n)

    energy = 0.0
    for _ in range(sweeps):
        # left-to-right
        for i in range(n - 1):
            energy, a = _two_site_update(a, mpo, Ls, Rs, i, chi, to_right=True)
            Ls[i + 1] = _left_env(Ls, a, mpo, i + 1)
        # right-to-left
        for i in range(n - 2, -1, -1):
            energy, a = _two_site_update(a, mpo, Ls, Rs, i, chi, to_right=False)
            Rs[i] = _right_env(Rs, a, mpo, i, n)
    return float(energy), a


def _two_site_update(a, mpo, Ls, Rs, i, chi, to_right):
    n = len(a)
    L = Ls[i]
    R = Rs[i + 1]
    w1, w2 = mpo[i], mpo[i + 1]
    l = a[i].shape[0]
    d = a[i].shape[1]
    r = a[i + 1].shape[2]
    # effective two-site H as a dense (l d d r)^2 matrix
    heff = np.einsum("awb,wpqx->abpqx", L, w1)
    heff = np.einsum("abpqx,xsty->abpqsty", heff, w2)
    heff = np.einsum("abpqsty,cyf->abpqstcf", heff, R)
    # axes of heff: (a=ket-l, b=bra-l, p=out1, q=in1, s=out2, t=in2,
    # c=ket-r, f=bra-r); rows = bra (b, p, s, f), cols = ket (a, q, t, c)
    h = heff.transpose(1, 2, 4, 7, 0, 3, 5, 6).reshape(l * d * d * r, l * d * d * r)
    h = (h + h.conj().T) / 2.0
    vals, vecs = np.linalg.eigh(h)
    e0 = float(vals[0].real)
    theta = vecs[:, 0].reshape(l, d, d, r)
    m = theta.reshape(l * d, d * r)
    u, s, vh = np.linalg.svd(m, full_matrices=False)
    keep = min(chi, int(np.sum(s > 1e-12)) or 1)
    u, s, vh = u[:, :keep], s[:keep], vh[:keep]
    s = s / np.linalg.norm(s)
    if to_right:
        a[i] = u.reshape(l, d, keep)
        a[i + 1] = (np.diag(s) @ vh).reshape(keep, d, r)
    else:
        a[i] = (u @ np.diag(s)).reshape(l, d, keep)
        a[i + 1] = vh.reshape(keep, d, r)
    return e0, a


def mps_energy(a: List[np.ndarray], mpo: List[np.ndarray]) -> float:
    """<psi|H|psi> for a normalized MPS."""
    n = len(a)
    L = np.ones((1, 1, 1), dtype=complex)
    for i in range(1, n + 1):
        t, wi = a[i - 1], mpo[i - 1]
        tmp = np.einsum("abc,apr->bcpr", L, t)
        tmp = np.einsum("bcpr,bqpw->cqrw", tmp, wi)
        L = np.einsum("cqrw,cqs->rws", tmp, t.conj())
    return float(L.reshape(-1)[0].real)


def mps_overlap(a: List[np.ndarray], b: List[np.ndarray]) -> complex:
    """<a|b> transfer contraction of two (l, d, r) MPS."""
    E = np.ones((1, 1), dtype=complex)
    for ta, tb in zip(a, b):
        E = np.einsum("xy,xpa,ypb->ab", E, np.asarray(ta).conj(), np.asarray(tb))
    return complex(E.reshape(-1)[0])
