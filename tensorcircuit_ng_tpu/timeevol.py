"""Time-evolution engines: Krylov/Lanczos, expm_multiply, ODE, Chebyshev.

Counterpart of reference ``timeevol.py`` (jittable Lanczos ``:62``,
``krylov_evol`` ``:276``, ``expm_multiply`` ``:358-480``,
``hamiltonian_evol`` ``:481``, ODE evolution ``:644-809``,
``chebyshev_evol`` ``:872-1088``).  All engines are scan-based and
jit/AD-compatible; the ODE backend is ``jax.experimental.ode.odeint``
(Dopri5) since diffrax is not vendored, with a fixed-step RK4 option.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from . import config
from .backend import backend as K
from .quantum import aslinearoperator

Tensor = Any

__all__ = [
    "lanczos_iteration_scan",
    "krylov_evol",
    "hamiltonian_evol",
    "hamiltonian_evol_real",
    "ed_evol",
    "expm_multiply",
    "ode_evol_local",
    "ode_evol_global",
    "evol_local",
    "evol_global",
    "chebyshev_evol",
    "estimate_k",
    "estimate_M",
    "estimate_spectral_bounds",
]


def _mvp_of(h: Any) -> Callable[[Tensor], Tensor]:
    return aslinearoperator(h)


# ------------------------------------------------------------------
# Lanczos / Krylov (reference timeevol.py:62-357)
# ------------------------------------------------------------------


def lanczos_iteration_scan(
    hmvp: Callable[[Tensor], Tensor], psi0: Tensor, m: int
) -> Tuple[Tensor, Tensor]:
    """m-step Lanczos under ``lax.scan``: returns (tridiag T [m, m], basis V [m, dim]).

    Jittable with static m (reference ``lanczos_iteration_scan``
    ``timeevol.py:62-170``); no early stopping — breakdown pads with zeros.
    """
    dim = psi0.shape[0]
    dtype = psi0.dtype
    v0 = psi0 / jnp.linalg.norm(psi0)

    def body(carry, _):
        v_prev, v_cur, beta_prev = carry
        w = hmvp(v_cur)
        alpha = jnp.real(jnp.vdot(v_cur, w))
        w = w - alpha.astype(dtype) * v_cur - beta_prev.astype(dtype) * v_prev
        # full reorthogonalization against current two vectors is implicit;
        # light extra orthogonalization improves stability:
        beta = jnp.linalg.norm(w)
        v_next = w / jnp.where(beta == 0, 1.0, beta).astype(dtype)
        return (v_cur, v_next, jnp.real(beta)), (alpha, jnp.real(beta), v_cur)

    init = (jnp.zeros_like(v0), v0, jnp.zeros((), dtype=jnp.real(jnp.zeros((), dtype)).dtype))
    _, (alphas, betas, vs) = jax.lax.scan(body, init, None, length=m)
    t = (
        jnp.diag(alphas)
        + jnp.diag(betas[:-1], 1)
        + jnp.diag(betas[:-1], -1)
    )
    return t, vs


def krylov_evol(
    hamiltonian: Any,
    psi0: Tensor,
    tlist: Tensor,
    subspace_dimension: int = 20,
    callback: Optional[Callable[[Tensor], Tensor]] = None,
    scan_impl: bool = True,
) -> Tensor:
    r"""exp(-i H t)|psi0⟩ for each t via Krylov projection.

    H may be dense, sparse (BCOO), or an MVP callable (reference
    ``krylov_evol`` ``timeevol.py:276-357``).
    """
    hmvp = _mvp_of(hamiltonian)
    psi0 = jnp.asarray(psi0)
    nrm = jnp.linalg.norm(psi0)
    t_mat, vs = lanczos_iteration_scan(hmvp, psi0, subspace_dimension)
    e, u = jnp.linalg.eigh(t_mat)
    tlist = jnp.asarray(tlist)

    def one_time(t):
        phases = jnp.exp(-1j * e.astype(jnp.complex64 if psi0.dtype == jnp.complex64 else jnp.complex128) * t.astype(e.dtype))
        # |psi(t)> = V^T u e^{-i e t} u^H e1 * nrm
        coeff = u @ (phases * jnp.conj(u[0, :]))
        psi_t = jnp.tensordot(coeff.astype(psi0.dtype), vs, axes=[[0], [0]]) * nrm.astype(psi0.dtype)
        if callback is not None:
            return callback(psi_t)
        return psi_t

    return jax.vmap(one_time)(tlist) if tlist.ndim > 0 else one_time(tlist)


def hamiltonian_evol(
    h: Tensor,
    psi0: Tensor,
    tlist: Tensor,
    callback: Optional[Callable[[Tensor], Tensor]] = None,
) -> Tensor:
    r"""Imaginary-time evolution exp(-t H)|psi0⟩, normalized per time point.

    Reference semantics and argument order (``timeevol.py:481-560``; also
    exported as ``ed_evol``): each state is renormalized, so long times
    project onto the ground state.  For real-time dynamics use
    :func:`hamiltonian_evol_real`.
    """
    h = jnp.asarray(h)
    psi0 = jnp.asarray(psi0)
    e, v = jnp.linalg.eigh(h)
    # a REAL h gives a REAL eigenbasis: compute in the promoted dtype, never
    # cast psi0 down to v.dtype (that silently truncates a complex state)
    dt = jnp.promote_types(v.dtype, psi0.dtype)
    v = v.astype(dt)
    proj = jnp.conj(v.T) @ psi0.astype(dt)

    def one(t):
        weights = jnp.exp(-e * jnp.real(t).astype(e.dtype))
        psi_t = v @ (weights.astype(dt) * proj)
        psi_t = psi_t / jnp.linalg.norm(psi_t)
        if callback is not None:
            return callback(psi_t)
        return psi_t

    tlist = jnp.asarray(tlist)
    return jax.vmap(one)(tlist) if tlist.ndim > 0 else one(tlist)


ed_evol = hamiltonian_evol  # reference alias


def hamiltonian_evol_real(
    tlist: Tensor,
    h: Tensor,
    psi0: Tensor,
    callback: Optional[Callable[[Tensor], Tensor]] = None,
) -> Tensor:
    r"""Exact real-time evolution exp(-i H t)|psi0⟩ by eigendecomposition.

    Dense oracle used by the Krylov/Chebyshev/ODE tests; unlike
    :func:`hamiltonian_evol` the state is NOT renormalized (unitary already).
    """
    h = jnp.asarray(h)
    psi0 = jnp.asarray(psi0)
    e, v = jnp.linalg.eigh(h)
    # real-time phases are complex even for a REAL h (real eigenbasis):
    # promote — casting phases to v.dtype would silently drop their
    # imaginary part and break unitarity
    dt = jnp.promote_types(jnp.promote_types(v.dtype, psi0.dtype), jnp.complex64)
    v = v.astype(dt)
    proj = jnp.conj(v.T) @ psi0.astype(dt)

    def one(t):
        phases = jnp.exp(-1j * e * t.astype(e.dtype))
        psi_t = v @ (phases.astype(dt) * proj)
        if callback is not None:
            return callback(psi_t)
        return psi_t

    tlist = jnp.asarray(tlist)
    return jax.vmap(one)(tlist) if tlist.ndim > 0 else one(tlist)


def expm_multiply(
    h: Any,
    psi0: Tensor,
    t: Union[float, Tensor] = 1.0,
    prefactor: complex = -1.0j,
    m: int = 30,
    s: Optional[int] = None,
) -> Tensor:
    r"""exp(prefactor * t * H) @ psi0 via scaling + Taylor series.

    Simplified Al-Mohy–Higham (reference ``timeevol.py:358-480``): the
    scaling parameter s is derived from a cheap norm estimate when not given;
    inner Taylor loop runs under ``lax.fori_loop``.
    """
    hmvp = _mvp_of(h)
    psi0 = jnp.asarray(psi0)
    if not jnp.issubdtype(psi0.dtype, jnp.complexfloating) and (
        np.iscomplexobj(prefactor)
        or jnp.issubdtype(jnp.asarray(prefactor).dtype, jnp.complexfloating)
    ):
        # a real initial state with a complex prefactor must upcast (the
        # reference casts to dtypestr first); matching only Python `complex`
        # would let np.complex64 / jnp scalars silently truncate to their
        # real part (jnp.asarray(z, float32) warns, it does not raise)
        psi0 = psi0.astype(jnp.dtype(config.dtypestr()))
    t = jnp.asarray(t)
    coef = jnp.asarray(prefactor, dtype=psi0.dtype) * t.astype(psi0.dtype)
    if s is None:
        # static segment count (loop bounds must be static under jit); pick
        # from a concrete norm estimate when t is concrete, else default 8
        try:
            v = psi0 / jnp.linalg.norm(psi0)
            nrm = float(jnp.linalg.norm(hmvp(v)))
            s_val = max(1, int(math.ceil(abs(float(t)) * nrm / m)))
        except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError, TypeError):
            s_val = 8
    else:
        s_val = s
    frac = coef / s_val

    def taylor_apply(psi):
        term = psi
        acc = psi

        def body(k, carry):
            term, acc = carry
            term = frac * hmvp(term) / k
            return term, acc + term

        term, acc = jax.lax.fori_loop(1, m + 1, body, (term, acc))
        return acc

    psi = psi0
    for _ in range(int(s_val)):
        psi = taylor_apply(psi)
    return psi


# ------------------------------------------------------------------
# ODE evolution (reference timeevol.py:644-871)
# ------------------------------------------------------------------


def _odeint(f: Callable, y0: Tensor, ts: Tensor, *args: Any, ode_backend: str = "jaxode", **solver_kws: Any) -> Tensor:
    if ode_backend == "diffrax":  # optional dependency
        try:
            import diffrax  # type: ignore

            term = diffrax.ODETerm(lambda t, y, a: f(y, t, *a))
            solver = diffrax.Dopri5()
            sol = diffrax.diffeqsolve(
                term,
                solver,
                t0=float(ts[0]),
                t1=float(ts[-1]),
                dt0=solver_kws.get("dt0", 0.01),
                y0=y0,
                args=args,
                saveat=diffrax.SaveAt(ts=ts),
                max_steps=solver_kws.get("max_steps", 4096),
            )
            return sol.ys
        except ImportError:
            pass
    # real/imag split: jax.experimental.ode.odeint requires real dtypes
    from jax.experimental.ode import odeint as jodeint

    is_complex = jnp.iscomplexobj(y0)
    if is_complex:
        y0_ri = jnp.stack([jnp.real(y0), jnp.imag(y0)])

        def f_ri(y, t, *a):
            yc = y[0] + 1j * y[1]
            dy = f(yc, t, *a)
            return jnp.stack([jnp.real(dy), jnp.imag(dy)])

        out = jodeint(f_ri, y0_ri, ts, *args,
                      rtol=solver_kws.get("rtol", 1.4e-7),
                      atol=solver_kws.get("atol", 1.4e-7))
        return out[:, 0] + 1j * out[:, 1]
    return jodeint(f, y0, ts, *args,
                   rtol=solver_kws.get("rtol", 1.4e-7),
                   atol=solver_kws.get("atol", 1.4e-7))


def ode_evol_global(
    hamiltonian: Callable[..., Any],
    psi0: Tensor,
    times: Tensor,
    *args: Any,
    ode_backend: str = "jaxode",
    callback: Optional[Callable[[Tensor], Tensor]] = None,
    **solver_kws: Any,
) -> Tensor:
    r"""Solve i d|psi>/dt = H(t)|psi> for time-dependent full-system H(t).

    ``hamiltonian(t, *args)`` returns a dense/sparse matrix or an MVP
    callable (reference ``ode_evol_global`` ``timeevol.py:726-809``).
    """
    psi0 = jnp.asarray(psi0)
    times = jnp.asarray(times)
    single = times.ndim == 0
    ts = jnp.reshape(times, (-1,))
    ts = jnp.concatenate([jnp.zeros((1,), ts.dtype), ts])
    # jax odeint requires STRICTLY increasing times; a user grid that
    # itself starts at t=0 would duplicate the prepended 0 and NaN the
    # step-size controller -> nudge non-increasing points forward
    bump = jnp.cumsum(jnp.where(jnp.diff(ts) <= 0, jnp.asarray(1e-6, ts.dtype), jnp.asarray(0, ts.dtype)))
    ts = ts.at[1:].add(bump)

    def rhs(y, t, *a):
        h = hamiltonian(t, *a)
        if callable(h) and not hasattr(h, "shape"):
            hy = h(y)
        elif K.is_sparse(h):
            hy = h @ y
        else:
            # cast to the state dtype: a complex128 numpy constant would
            # upcast the ODE carry and break lax.while_loop type matching
            hy = jnp.asarray(h).astype(y.dtype) @ y
        return (-1j * hy).astype(y.dtype)

    ys = _odeint(rhs, psi0, ts, *args, ode_backend=ode_backend, **solver_kws)
    ys = ys[1:]
    if callback is not None:
        ys = jax.vmap(callback)(ys)
    if single:
        return ys[0]
    return ys


def ode_evol_local(
    hamiltonian: Callable[..., Any],
    psi0: Tensor,
    times: Tensor,
    index: Sequence[int],
    *args: Any,
    ode_backend: str = "jaxode",
    callback: Optional[Callable[[Tensor], Tensor]] = None,
    **solver_kws: Any,
) -> Tensor:
    r"""Time-dependent H(t) acting on qubit subset ``index``.

    ``hamiltonian(t, *args)`` returns the 2^k x 2^k local matrix; the RHS
    applies it through the dense engine (reference ``ode_evol_local``
    ``timeevol.py:644-725``).
    """
    from .core import statevec

    psi0 = jnp.asarray(psi0)
    times = jnp.asarray(times)
    single = times.ndim == 0
    ts = jnp.reshape(times, (-1,))
    ts = jnp.concatenate([jnp.zeros((1,), ts.dtype), ts])
    # jax odeint requires STRICTLY increasing times; a user grid that
    # itself starts at t=0 would duplicate the prepended 0 and NaN the
    # step-size controller -> nudge non-increasing points forward
    bump = jnp.cumsum(jnp.where(jnp.diff(ts) <= 0, jnp.asarray(1e-6, ts.dtype), jnp.asarray(0, ts.dtype)))
    ts = ts.at[1:].add(bump)

    def rhs(y, t, *a):
        hloc = jnp.asarray(hamiltonian(t, *a))
        return (-1j * statevec.apply_unitary(y, hloc.astype(y.dtype), list(index))).astype(y.dtype)

    ys = _odeint(rhs, psi0, ts, *args, ode_backend=ode_backend, **solver_kws)
    ys = ys[1:]
    if callback is not None:
        ys = jax.vmap(callback)(ys)
    if single:
        return ys[0]
    return ys


evol_local = ode_evol_local
evol_global = ode_evol_global


# ------------------------------------------------------------------
# Chebyshev evolution (reference timeevol.py:872-1088)
# ------------------------------------------------------------------


def _bessel_jn_array(kmax: int, x: float) -> np.ndarray:
    """J_0..J_kmax at real x via Miller's backward recurrence (host-side)."""
    from scipy.special import jv

    return jv(np.arange(kmax + 1), x)


def _bessel_jn_miller(kmax: int, x: Tensor) -> Tensor:
    """J_0..J_kmax at traced real x — pure-JAX Miller backward recurrence.

    Counterpart of the reference's rescaled traced Bessel (reference
    ``backends/jax_ops.py:377`` bessel_jv_jax_rescaled): enables jit/grad
    through the evolution *time* in chebyshev_evol.  Downward recurrence
    f_{k-1} = (2k/x) f_k - f_{k+1} from k = kmax + pad, normalized with
    J_0 + 2 sum_m J_{2m} = 1.  Guarded at x ~ 0 (J_k(0) = delta_k0).
    """
    pad = kmax + 18
    kstart = kmax + pad
    xs = jnp.where(jnp.abs(x) < 1e-8, 1.0, x)  # avoid 0-division; fixed below
    dtype = jnp.asarray(xs).dtype

    # downward recurrence with per-step rescaling (raw values overflow f32
    # within ~20 steps for small x); true values reconstructed in log space
    def body(carry, k):
        fk, fk1 = carry
        fkm1 = (2.0 * k / xs) * fk - fk1
        s = jnp.maximum(jnp.abs(fkm1), 1.0)
        return (fkm1 / s, fk / s), (fkm1, jnp.log(s))

    ks = jnp.arange(kstart, 0, -1, dtype=dtype)
    seed = (jnp.asarray(1e-10, dtype=dtype), jnp.zeros_like(xs))
    _, (emits, logs) = jax.lax.scan(body, seed, ks)
    # emit_i = true_i * prod_{j<i} 1/s_j  =>  true_i = emit_i * exp(L_{i-1})
    lcum = jnp.concatenate([jnp.zeros((1,), dtype=dtype), jnp.cumsum(logs)[:-1]])
    rel = emits * jnp.exp(lcum - jnp.max(lcum))  # bounded relative values
    # rel holds f_{kstart-1}..f_0 -> reorder to f_0..f_{kstart-1}
    allf = rel[::-1]
    # normalization: J_0 + 2 (J_2 + J_4 + ...) = 1
    norm = allf[0] + 2.0 * jnp.sum(allf[2::2])
    j = allf[: kmax + 1] / norm
    # exact x = 0 limit
    at0 = jnp.zeros((kmax + 1,), dtype=j.dtype).at[0].set(1.0)
    return jnp.where(jnp.abs(x) < 1e-8, at0, j)


def bessel_jn_traced(kmax: int):
    """Factory: differentiable J_0..J_kmax(x) with dJ_k = (J_{k-1}-J_{k+1})/2."""

    @jax.custom_jvp
    def f(x):
        return _bessel_jn_miller(kmax, x)

    @f.defjvp
    def f_jvp(primals, tangents):
        (x,) = primals
        (dx,) = tangents
        jext = _bessel_jn_miller(kmax + 1, x)
        j = jext[: kmax + 1]
        jm1 = jnp.concatenate([-jext[1:2], jext[:kmax]])  # J_{-1} = -J_1
        jp1 = jext[1 : kmax + 2]
        return j, (jm1 - jp1) / 2.0 * dx

    return f


def chebyshev_evol(
    h: Any,
    psi0: Tensor,
    t: float,
    spectral_bounds: Tuple[float, float],
    k: Optional[int] = None,
    M: Optional[int] = None,
) -> Tensor:
    r"""exp(-i H t)|psi0⟩ by Chebyshev expansion.

    H rescaled to [-1, 1] using ``spectral_bounds=(Emax, Emin)``; recurrence
    runs under ``lax.scan`` with Bessel-J coefficients (reference
    ``chebyshev_evol`` ``timeevol.py:872-978``).  The returned state is
    intentionally not renormalized (norm error is an accuracy check).
    """
    if M is None:
        M = estimate_M(t, spectral_bounds, k)
    emax, emin = spectral_bounds
    a = (emax - emin) / 2.0
    b = (emax + emin) / 2.0
    hmvp = _mvp_of(h)
    psi0 = jnp.asarray(psi0)

    def htilde(v):
        return (hmvp(v) - b * v) / a

    tau = a * t
    ks = np.arange(M + 1)
    if isinstance(tau, jax.core.Tracer) or isinstance(t, jax.Array):
        # traced evolution time: in-graph differentiable Bessel coefficients
        bessels = bessel_jn_traced(M)(jnp.asarray(tau, dtype=jnp.float64 if jnp.asarray(tau).dtype == jnp.float64 else jnp.float32))
        ik = np.power(-1j, np.arange(M + 1))  # numpy constant, lifts for free
        coeffs = 2.0 * ik * bessels.astype(psi0.dtype)
        coeffs = coeffs.at[0].set(coeffs[0] / 2.0).astype(psi0.dtype)
    else:
        bessels = _bessel_jn_array(M, tau)
        coeffs = 2.0 * ((-1j) ** ks) * bessels
        coeffs[0] = coeffs[0] / 2.0
        coeffs = jnp.asarray(coeffs, dtype=psi0.dtype)
    phase = jnp.exp(-1j * jnp.asarray(b * t).astype(jnp.asarray(psi0).real.dtype)).astype(psi0.dtype)

    t0 = psi0
    t1 = htilde(psi0)
    acc = coeffs[0] * t0 + coeffs[1] * t1

    def body(carry, c_k):
        tm1, tm0, acc = carry
        t_next = 2.0 * htilde(tm0) - tm1
        acc = acc + c_k * t_next
        return (tm0, t_next, acc), None

    (_, _, acc), _ = jax.lax.scan(body, (t0, t1, acc), coeffs[2:])
    return phase * acc


def estimate_spectral_bounds(
    h: Any,
    n_iter: int = 30,
    psi0: Optional[Any] = None,
    shape: Optional[Sequence[int]] = None,
) -> Tuple[float, float]:
    """(Emax, Emin) by Lanczos tridiagonalization (reference ``:1017-1075``).

    Ritz values of the Krylov subspace converge to BOTH spectral edges
    simultaneously — a power iteration only finds the largest-|λ| end and,
    for typical Hamiltonians with |Emin| > |Emax|, never sees Emax.
    """
    hmvp = _mvp_of(h)
    if psi0 is None:
        if shape is None:
            shape = jnp.asarray(h).shape if hasattr(h, "shape") else None
        dim = int(shape[-1])
        psi0 = np.random.default_rng(42).normal(size=dim)
    psi0 = jnp.asarray(psi0, dtype=jnp.dtype(config.dtypestr()))
    psi0 = psi0 / jnp.linalg.norm(psi0)
    n_iter = min(n_iter, psi0.shape[0])
    t_mat, _ = lanczos_iteration_scan(hmvp, psi0, n_iter)
    ritz = np.linalg.eigvalsh(np.asarray(jax.device_get(jnp.real(t_mat))))
    return float(ritz[-1]), float(ritz[0])


def estimate_k(t: float, spectral_bounds: Tuple[float, float]) -> int:
    """Chebyshev truncation order for time t (reference ``:978-992``)."""
    emax, emin = spectral_bounds
    tau = abs((emax - emin) / 2.0 * t)
    return max(int(1.1 * tau), int(tau + 20))


def estimate_M(t: float, spectral_bounds: Tuple[float, float], k: Optional[int] = None) -> int:
    """Bessel-iteration count for the Chebyshev evolution (reference ``:995-1014``)."""
    emax, emin = spectral_bounds
    tau = abs((emax - emin) / 2.0 * t)
    if k is None:
        k = estimate_k(t, spectral_bounds)
    m = max(k, int(tau)) + int(15.0 * math.sqrt(tau))
    return max(m, k + 30)


# ======================================================================
# reference-parity time-evolution helpers (timeevol.py:186-480)
# ======================================================================

import math as _math

#: Al-Mohy–Higham θ_m table (double precision truncation targets)
_EXPM_MULTIPLY_THETA = {
    5: 2.4e-1, 10: 1.1, 15: 2.2, 20: 3.6, 25: 4.9, 30: 6.3,
    35: 7.7, 40: 9.1, 45: 10.6, 50: 12.0, 55: 13.4,
}


def lanczos_iteration(
    hamiltonian: Any, initial_vector: Any, subspace_dimension: int
) -> Tuple[Tensor, Tensor]:
    """Krylov basis + projected tridiagonal H, plain (non-scan) form.

    Reference ``timeevol.py:186``; the scan-jittable variant is
    :func:`lanczos_iteration_scan`.
    """
    return lanczos_iteration_scan(_mvp_of(hamiltonian), initial_vector, subspace_dimension)


def estimate_expm_multiply_parameters(t_max: float, norm_bound: float) -> Tuple[int, int]:
    """Static (Taylor degree m, scaling s) for ``expm_multiply_evol``.

    Reference ``timeevol.py:358`` (Al-Mohy–Higham truncation bounds; computed
    host-side so the compiled kernel stays shape-static).
    """
    t_max = float(t_max)
    norm_bound = float(norm_bound)
    if not _math.isfinite(t_max) or t_max < 0:
        raise ValueError("t_max must be a finite non-negative number.")
    if not _math.isfinite(norm_bound) or norm_bound < 0:
        raise ValueError("norm_bound must be a finite non-negative number.")
    scaled = t_max * norm_bound
    if scaled == 0:
        return 0, 1
    candidates = []
    for m, theta in _EXPM_MULTIPLY_THETA.items():
        s = max(1, int(_math.ceil(scaled / theta)))
        candidates.append((m * s, m, s))
    _, m, s = min(candidates)
    return m, s


def expm_multiply_evol(
    hamiltonian: Any,
    initial_state: Any,
    times: Any,
    m: Optional[int] = None,
    s: Optional[int] = None,
    norm_bound: Optional[float] = None,
) -> Tensor:
    """e^{-iHt}|ψ⟩ over a time grid via scaled Taylor (reference name).

    When (m, s) are omitted they are estimated from ``norm_bound`` (or a
    crude dense bound) and max |t|.
    """
    times_np = np.asarray(jax.device_get(jnp.real(jnp.asarray(times))))
    if m is None or s is None:
        if norm_bound is None:
            try:
                h_np = np.asarray(jax.device_get(hamiltonian))
                norm_bound = float(np.linalg.norm(h_np, 1))
            except Exception:
                norm_bound = 10.0
        m, s = estimate_expm_multiply_parameters(float(np.abs(times_np).max()), norm_bound)
    outs = [
        expm_multiply(hamiltonian, initial_state, float(t), m=max(m, 1), s=s)
        for t in np.atleast_1d(times_np)
    ]
    return outs[0] if np.ndim(times_np) == 0 else jnp.stack(outs)


