"""AD-safe linear algebra primitives.

The reference defines custom-VJP SVD/QR/RQ/eigh so that gradients stay finite
at degenerate singular values / repeated eigenvalues (reference
``backends/jax_ops.py:19-183``).  These are re-derived here for JAX using the
standard regularized-inverse-spacing formulations (complex SVD VJP per
arXiv:1909.02659; QR VJP per the differentiable-TN literature), written
TPU-first: static shapes only, pad-and-mask truncation.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_EPS_DEFAULT = 1e-12


def _safe_inverse(x: jnp.ndarray, eps: float = _EPS_DEFAULT) -> jnp.ndarray:
    return x / (x * x + eps)


def _H(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.conj(jnp.swapaxes(x, -1, -2))


# ---------------------------------------------------------------- SVD


@jax.custom_vjp
def adaware_svd(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reduced SVD ``a = u @ diag(s) @ vh`` with degenerate-safe gradients."""
    u, s, vh = jnp.linalg.svd(a, full_matrices=False)
    return u, s, vh


def _svd_fwd(a):
    u, s, vh = jnp.linalg.svd(a, full_matrices=False)
    return (u, s, vh), (a, u, s, vh)


def _svd_bwd(res, g):
    # JAX passes cotangents in the plain-linear convention; the adjoint below
    # is derived for the dL = Re tr(gA^H dA) convention, so conjugate in/out.
    a, u, s, vh = res
    du, ds, dvh = (jnp.conj(x) for x in g)
    return (jnp.conj(_svd_bwd_conjconv(a, u, s, vh, du, ds, dvh)),)


def _svd_bwd_conjconv(a, u, s, vh, du, ds, dvh):
    dtype = a.dtype
    m, n = a.shape[-2], a.shape[-1]
    k = s.shape[-1]
    v = _H(vh)
    dv = _H(dvh)

    s_c = s.astype(dtype)
    s2 = s * s
    # F[i, j] = 1 / (s_j^2 - s_i^2), zero diagonal (regularized)
    f = _safe_inverse(s2[..., None, :] - s2[..., :, None]).astype(dtype)
    eye_k = jnp.eye(k, dtype=dtype)
    f = f * (1.0 - eye_k)

    sigma_mat = eye_k * s_c[..., None, :]
    s_inv = _safe_inverse(s).astype(dtype)
    sigma_inv_mat = eye_k * s_inv[..., None, :]

    da = u @ (eye_k * ds.astype(dtype)[..., None, :]) @ vh

    uhdu = _H(u) @ du
    u_term = (f * (uhdu - _H(uhdu))) @ sigma_mat
    if m > k:
        proj_u = jnp.eye(m, dtype=dtype) - u @ _H(u)
        da = da + proj_u @ du @ sigma_inv_mat @ vh
    da = da + u @ u_term @ vh

    vhdv = vh @ dv
    v_term = sigma_mat @ (f * (vhdv - _H(vhdv)))
    if n > k:
        proj_v = jnp.eye(n, dtype=dtype) - v @ _H(v)
        da = da + u @ sigma_inv_mat @ _H(dv) @ proj_v
    da = da + u @ v_term @ vh

    if jnp.iscomplexobj(a):
        # diagonal gauge (phase) correction, split symmetrically between U and
        # V (arXiv:1909.02659): i*Im(diag(U^H gU) - diag(V^H gV)) / (2 s)
        gu_diag = jnp.diagonal(uhdu, axis1=-2, axis2=-1)
        gv_diag = jnp.diagonal(vhdv, axis1=-2, axis2=-1)
        imag_corr = (
            (gu_diag - jnp.conj(gu_diag)) - (gv_diag - jnp.conj(gv_diag))
        ) / 4.0 * s_inv
        da = da + u @ (eye_k * imag_corr[..., None, :]) @ vh
    return da


adaware_svd.defvjp(_svd_fwd, _svd_bwd)


@jax.custom_vjp
def gram_svd(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reduced SVD via eigh of the Gram matrix — the TPU TEBD fast path.

    One Hermitian eigendecomposition of the smaller-side Gram matrix plus an
    MXU matmul replaces the full one-sided-Jacobi SVD (2-5x faster on TPU for
    the (χd, χd) theta matrices of two-site MPS updates).  Singular values
    below ~sqrt(eps)·s_max lose relative accuracy — exactly the tail that
    bond truncation discards; the backward reuses the degenerate-safe SVD
    adjoint, which only needs a consistent (u, s, vh) triple.
    """
    return _gram_svd_impl(a)


def _gram_svd_impl(a):
    m, n = a.shape[-2], a.shape[-1]
    eps = jnp.asarray(1e-30, dtype=jnp.real(a).dtype)
    if n <= m:
        g = _H(a) @ a
        evals, v = jnp.linalg.eigh(g)  # ascending
        evals = evals[..., ::-1]
        v = v[..., ::-1]
        s = jnp.sqrt(jnp.clip(jnp.real(evals), 0.0, None))
        u = (a @ v) * _safe_inverse(s + eps)[..., None, :].astype(a.dtype)
        return u, s, _H(v)
    g = a @ _H(a)
    evals, u = jnp.linalg.eigh(g)
    evals = evals[..., ::-1]
    u = u[..., ::-1]
    s = jnp.sqrt(jnp.clip(jnp.real(evals), 0.0, None))
    vh = _H((_H(a) @ u) * _safe_inverse(s + eps)[..., None, :].astype(a.dtype))
    return u, s, vh


def _gram_svd_fwd(a):
    u, s, vh = _gram_svd_impl(a)
    return (u, s, vh), (a, u, s, vh)


gram_svd.defvjp(_gram_svd_fwd, _svd_bwd)

#: route truncated_svd through the Gram-eigh fast path (TEBD hot-loop knob).
#: None = auto (gram on TPU — measured 39.8 -> 31.0 ms and 4x faster compile
#: for the n=60 chi=64 trotter step; exact SVD elsewhere). True/False force.
USE_GRAM_SVD = None


# ------------------------------------------------------- one-sided Jacobi


def _jacobi_svd_impl(a: jnp.ndarray, sweeps: int = 10) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched one-sided (Hestenes) Jacobi SVD in pure XLA-friendly ops.

    XLA's TPU eigh/svd custom calls are latency-bound and extremely slow to
    compile for the small-batched matrices of TEBD truncation (measured:
    batched complex eigh 30x128x128 = 58 ms/iter, 930 s compile).  This
    routine uses only reductions, elementwise math, and column slicing —
    a round-robin tournament pairs columns so all n/2 rotations of a round
    apply simultaneously, and the between-round re-pairing is a static
    slice/concat (no gathers, no custom calls).

    ``a``: (..., m, n); requires n even (callers pad odd n).  Returns the
    full (u, s, vh) with s descending.
    """
    m, n = a.shape[-2], a.shape[-1]
    if n % 2:
        raise ValueError("jacobi_svd: trailing dimension must be even")
    h = n // 2
    rdtype = jnp.finfo(a.dtype).dtype if jnp.iscomplexobj(a) else a.dtype
    rdtype = jnp.real(jnp.zeros((), a.dtype)).dtype
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape[:-2] + (n, n))
    tiny = jnp.asarray(1e-30, rdtype)

    def round_step(carry, _):
        x, v = carry
        # pair slot i with slot n-1-i: left half vs reversed right half
        xl, xr = x[..., :h], x[..., h:][..., ::-1]
        vl, vr = v[..., :h], v[..., h:][..., ::-1]
        app = jnp.sum(jnp.abs(xl) ** 2, axis=-2)  # (..., h) real
        aqq = jnp.sum(jnp.abs(xr) ** 2, axis=-2)
        apq = jnp.sum(jnp.conj(xl) * xr, axis=-2)  # complex
        mod = jnp.abs(apq)
        phase = apq / (mod + tiny).astype(a.dtype)  # e^{i phi}
        # real Jacobi angle on (p, q e^{-i phi})
        tau = (aqq - app) / (2.0 * mod + tiny)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = c * t
        # skip negligible rotations (keeps padded zero columns fixed)
        skip = mod <= 1e-12 * jnp.sqrt(app * aqq) + tiny
        c = jnp.where(skip, 1.0, c)
        s = jnp.where(skip, 0.0, s)
        cc = c[..., None, :].astype(a.dtype)
        ss = s[..., None, :].astype(a.dtype)
        ph = phase[..., None, :]
        #   p' = c p - s e^{-i phi} q ;  q' = s e^{i phi} p + c q
        xl2 = cc * xl - ss * jnp.conj(ph) * xr
        xr2 = ss * ph * xl + cc * xr
        vl2 = cc * vl - ss * jnp.conj(ph) * vr
        vr2 = ss * ph * vl + cc * vr
        x = jnp.concatenate([xl2, xr2[..., ::-1]], axis=-1)
        v = jnp.concatenate([vl2, vr2[..., ::-1]], axis=-1)
        # round-robin advance: slot 0 fixed, slots 1..n-1 cycle by one
        x = jnp.concatenate([x[..., :1], x[..., -1:], x[..., 1:-1]], axis=-1)
        v = jnp.concatenate([v[..., :1], v[..., -1:], v[..., 1:-1]], axis=-1)
        return (x, v), None

    (x, v), _ = jax.lax.scan(
        round_step, (a, eye), None, length=sweeps * (n - 1)
    )
    s = jnp.sqrt(jnp.sum(jnp.abs(x) ** 2, axis=-2))
    order = jnp.argsort(-s, axis=-1)
    s = jnp.take_along_axis(s, order, axis=-1)
    x = jnp.take_along_axis(x, order[..., None, :], axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    u = x * _safe_inverse(s + tiny)[..., None, :].astype(a.dtype)
    return u, s, _H(v)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def jacobi_svd(a: jnp.ndarray, sweeps: int = 10) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-sided Jacobi SVD (see :func:`_jacobi_svd_impl`); SVD-adjoint VJP."""
    return _jacobi_svd_impl(a, sweeps)


def _jacobi_svd_fwd(a, sweeps):
    u, s, vh = _jacobi_svd_impl(a, sweeps)
    return (u, s, vh), (a, u, s, vh)


def _jacobi_svd_bwd(sweeps, res, g):
    return _svd_bwd(res, g)


jacobi_svd.defvjp(_jacobi_svd_fwd, _jacobi_svd_bwd)


# ---------------------------------------------------------------- QR / RQ


def _copyltu(m: jnp.ndarray) -> jnp.ndarray:
    """Lower triangle (incl. diag) plus conj-transpose of strictly-lower."""
    return jnp.tril(m) + _H(jnp.tril(m, -1))


def _tri_solve_rh(x: jnp.ndarray, r: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Compute ``x @ r^{-H}`` via a triangular solve (r upper triangular).

    Tiny diagonal entries of r are bumped to ``eps`` so gradients stay finite
    for rank-deficient inputs (common in MPS canonicalization where bonds are
    rank-deficient by construction); the bumped directions carry zero data so
    the regularization does not bias nonzero gradient components.
    """
    import jax.scipy.linalg as jsl

    k = r.shape[-1]
    diag = jnp.diagonal(r, axis1=-2, axis2=-1)
    bump = jnp.where(jnp.abs(diag) < eps, jnp.asarray(eps, dtype=r.dtype), jnp.zeros((), dtype=r.dtype))
    r = r + jnp.eye(k, dtype=r.dtype) * bump[..., None, :]
    # y = x r^{-H}  <=>  r y^H = x^H  with r upper triangular
    yh = jsl.solve_triangular(r, _H(x), lower=False)
    return _H(yh)


@jax.custom_vjp
def adaware_qr(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reduced QR with gradients defined for tall and wide matrices."""
    q, r = jnp.linalg.qr(a)
    return q, r


def _qr_fwd(a):
    q, r = jnp.linalg.qr(a)
    return (q, r), (a, q, r)


def _qr_square_bwd(q, r, dq, dr):
    """QR adjoint for m >= n, in the dL = Re tr(g^H dA) convention."""
    qdq = _H(q) @ dq
    qdq_skew = qdq - _H(qdq)
    rdr = r @ _H(dr)
    rdr_skew = rdr - _H(rdr)
    tril = jnp.tril(qdq_skew + rdr_skew)
    grad_a = q @ (dr + _tri_solve_rh(tril, r))
    grad_b = _tri_solve_rh(dq - q @ qdq, r)
    ret = grad_a + grad_b
    if jnp.iscomplexobj(q):
        # imaginary-diagonal gauge correction (cf. TF's QrGrad complex case)
        m_diag = jnp.diagonal(rdr - _H(qdq), axis1=-2, axis2=-1)
        corr = 1j * jnp.imag(m_diag)
        eye = jnp.eye(r.shape[-1], dtype=q.dtype)
        ret = ret + _tri_solve_rh(q @ (eye * jnp.conj(corr)[..., None, :]), r)
    return ret


def _qr_bwd(res, g):
    # conjugate in/out: see _svd_bwd convention note
    a, q, r = res
    dq, dr = (jnp.conj(x) for x in g)
    m, n = a.shape[-2], a.shape[-1]
    if m >= n:
        return (jnp.conj(_qr_square_bwd(q, r, dq, dr)),)
    # wide: a = [x | y], x = q u, y = q v
    y = a[..., :, m:]
    u = r[..., :, :m]
    du = dr[..., :, :m]
    dv = dr[..., :, m:]
    dy = q @ dv
    dq_eff = dq + y @ _H(dv)
    dx = _qr_square_bwd(q, u, dq_eff, du)
    return (jnp.conj(jnp.concatenate([dx, dy], axis=-1)),)


adaware_qr.defvjp(_qr_fwd, _qr_bwd)


def adaware_rq(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RQ decomposition ``a = r @ q`` built from QR of the flipped matrix."""
    q, r = adaware_qr(a[..., ::-1, ::-1].swapaxes(-1, -2))
    rr = r.swapaxes(-1, -2)[..., ::-1, ::-1]
    qq = q.swapaxes(-1, -2)[..., ::-1, ::-1]
    return rr, qq


# ---------------------------------------------------------------- eigh


@jax.custom_vjp
def adaware_eigh(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hermitian eigendecomposition with degenerate-safe gradients."""
    e, v = jnp.linalg.eigh(a)
    return e, v


def _eigh_fwd(a):
    e, v = jnp.linalg.eigh(a)
    return (e, v), (e, v)


def _eigh_bwd(res, g):
    # conjugate in/out: see _svd_bwd convention note
    e, v = res
    de, dv = (jnp.conj(x) for x in g)
    k = e.shape[-1]
    f = _safe_inverse(e[..., None, :] - e[..., :, None]).astype(v.dtype)
    eye_k = jnp.eye(k, dtype=v.dtype)
    f = f * (1.0 - eye_k)
    vhdv = _H(v) @ dv
    mid = eye_k * de.astype(v.dtype)[..., None, :] + f * vhdv
    da = v @ mid @ _H(v)
    return (jnp.conj(da),)


adaware_eigh.defvjp(_eigh_fwd, _eigh_bwd)


# ---------------------------------------------------------------- truncation


def truncated_svd(
    a: jnp.ndarray,
    max_singular_values: int,
    max_truncation_err: float = 0.0,
    relative: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jit-safe truncated SVD with *static* output rank.

    Returns ``(u, s, vh, mask)``: arrays keep the static
    rank-``max_singular_values`` shape; entries beyond the effective rank are
    zeroed via boolean ``mask``.  TPU-native replacement for the reference's
    dynamic-shape truncation (reference ``mps_base.py:33-176``): dynamic
    shapes cannot live under jit, so pad-and-mask instead.
    """
    use_gram = (
        USE_GRAM_SVD
        if USE_GRAM_SVD is not None
        else jax.default_backend() == "tpu"
    )
    u, s, vh = (gram_svd if use_gram else adaware_svd)(a)
    k = min(max_singular_values, s.shape[-1])
    u = u[..., :, :k]
    s_k = s[..., :k]
    vh = vh[..., :k, :]
    if max_truncation_err > 0.0:
        # discarded weight if we keep indices < i:  sqrt(sum_{j>=i} s_j^2)
        tail = jnp.sqrt(jnp.cumsum((s * s)[..., ::-1], axis=-1)[..., ::-1])
        bound = jnp.asarray(max_truncation_err, dtype=tail.dtype)
        if relative:
            bound = bound * s[..., :1]
        keep = tail > bound  # keep s_i while remaining weight still above bound
        keep = keep.at[..., 0].set(True)
        mask = keep[..., :k]
    else:
        mask = jnp.ones(s_k.shape, dtype=bool)
    s_k = jnp.where(mask, s_k, 0.0)
    u = jnp.where(mask[..., None, :], u, 0.0)
    vh = jnp.where(mask[..., :, None], vh, 0.0)
    return u, s_k, vh, mask


def lobpcg(a: jnp.ndarray, k: int = 1, x0=None, maxiter: int = 100, tol: float = 0.0):
    """Smallest-eigenpair LOBPCG on a dense matrix (real symmetric)."""
    from jax.experimental.sparse.linalg import lobpcg_standard

    n = a.shape[-1]
    if x0 is None:
        x0 = jax.random.normal(jax.random.PRNGKey(0), (n, k), dtype=a.dtype)
    theta, u, _ = lobpcg_standard(lambda x: -(a @ x), x0, m=maxiter)
    return -theta, u
