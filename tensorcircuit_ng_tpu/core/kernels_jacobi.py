"""Pallas one-sided Jacobi SVD: the whole sweep loop inside ONE kernel.

XLA's TPU eigh/svd custom calls are latency-bound for TEBD-sized batches
(measured: batched complex eigh 30x128x128 = 58.5 ms and 930 s compile;
direct svd 68 ms; an XLA-level Jacobi scan 69 ms because its ~1000 tiny ops
pay per-op dispatch).  Here the full Hestenes iteration lives in VMEM:

- **transposed layout**: each matrix is stored as (n, m) so a *column* of A
  is a sublane ROW — the n/2 simultaneous plane rotations are elementwise
  ops at full lane occupancy, and the Brent–Luk re-pairing between rounds
  is three sublane rolls + index selects (no gathers, no matmuls).
- **Brent–Luk tournament**: slot 0 fixed, slots cycle top->bottom; all
  n(n-1)/2 column pairs meet exactly once per (n-1)-round sweep (verified
  by enumeration).
- one ``fori_loop`` runs sweeps*(n-1) rounds with zero HBM traffic; the
  batch dimension is the grid.

The wrapper pads rows to a lane multiple and columns to a sublane-pair
multiple (zero columns are fixed points of the iteration: their pair
rotations hit the |a_pq| skip guard), sorts the spectrum descending, and
returns (u, s, vh) like ``jnp.linalg.svd(full_matrices=False)`` for m >= n.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Tensor = Any

__all__ = ["jacobi_svd_pallas", "jacobi_svd", "jacobi_svd_warm"]

_INTERPRET = False


def _jacobi_kernel(
    xr_ref,
    xi_ref,
    oxr_ref,
    oxi_ref,
    ovr_ref=None,
    ovi_ref=None,
    *,
    n: int,
    m: int,
    sweeps: int,
    with_v: bool = True,
):
    from jax.experimental.pallas import tpu as pltpu

    h = n // 2
    f32 = jnp.float32
    # transposed storage: row j holds column j; top slots 0..h-1, bottom h..n-1
    xtr = xr_ref[0, :h, :]
    xbr = xr_ref[0, h:, :]
    xti = xi_ref[0, :h, :]
    xbi = xi_ref[0, h:, :]
    rows_m = jax.lax.broadcasted_iota(jnp.int32, (h, m), 0)
    rows_n = jax.lax.broadcasted_iota(jnp.int32, (h, n), 0)
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (h, n), 1)
    # V starts as the identity (transposed = identity): top rows j -> e_j,
    # bottom rows j -> e_{h+j}
    if with_v:
        vtr = jnp.where(cols_n == rows_n, 1.0, 0.0).astype(f32)
        vbr = jnp.where(cols_n == rows_n + h, 1.0, 0.0).astype(f32)
        vti = jnp.zeros((h, n), f32)
        vbi = jnp.zeros((h, n), f32)
    else:  # fast path: V recovered afterwards as S^-1 U^H A
        vtr = vbr = vti = vbi = jnp.zeros((8, 128), f32)  # dummy carry
    tiny = f32(1e-30)

    # NOTE a carried-norm variant (app' = app - t*mod exact 2x2 update) was
    # tried and REVERTED: the carried error is ABSOLUTE at s_max^2 scale
    # while small-norm pairs need RELATIVE accuracy in (aqq - app) — the
    # warm-subspace chain collapsed to 0.77 overlap.  Norms stay fresh.
    def body(_, carry):
        xtr, xti, xbr, xbi, vtr, vti, vbr, vbi = carry
        app = jnp.sum(xtr * xtr + xti * xti, axis=1, keepdims=True)
        aqq = jnp.sum(xbr * xbr + xbi * xbi, axis=1, keepdims=True)
        # a_pq = <p, q> (conjugate on p)
        pr = jnp.sum(xtr * xbr + xti * xbi, axis=1, keepdims=True)
        pi = jnp.sum(xtr * xbi - xti * xbr, axis=1, keepdims=True)
        mod2 = pr * pr + pi * pi
        # epsilon at the f32 min-normal floor: meaningful small rotations
        # (mod ~ 1e-15, mod2 ~ 1e-30) must keep accurate phase/angle
        # NOTE: the epsilon must be a NORMAL f32 (min normal 1.18e-38):
        # a denormal constant is flushed to zero by XLA, making rsqrt(0)=inf
        # and 0*inf=NaN downstream (cost: one NaN'd debugging session)
        inv_mod = jax.lax.rsqrt(mod2 + f32(1e-36))
        cph = pr * inv_mod  # cos(phi), sin(phi) of the pair phase
        sph = pi * inv_mod
        tau = (aqq - app) * 0.5 * inv_mod
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        c = jax.lax.rsqrt(1.0 + t * t)
        s = c * t
        # relative guard only (threshold underflows to 0 for tiny columns,
        # leaving exact-zero pairs as the only skips there — matches the
        # old mod <= 1e-12 sqrt(app aqq) + 1e-30 behavior)
        skip = mod2 <= 1e-24 * (app * aqq)
        c = jnp.where(skip, 1.0, c)
        s = jnp.where(skip, 0.0, s)
        scph = s * cph
        ssph = s * sph

        def rot(tr, ti, br, bi):
            # p' = c p - s e^{-i phi} q ;  q' = s e^{i phi} p + c q
            # expanded form: 12 plane muls instead of 16
            ntr = c * tr - scph * br - ssph * bi
            nti = c * ti - scph * bi + ssph * br
            nbr = c * br + scph * tr - ssph * ti
            nbi = c * bi + scph * ti + ssph * tr
            return ntr, nti, nbr, nbi

        xtr, xti, xbr, xbi = rot(xtr, xti, xbr, xbi)
        if with_v:
            vtr, vti, vbr, vbi = rot(vtr, vti, vbr, vbi)

        def shuffle(top, bot):
            # Brent-Luk: new_top = [top0, bot0, top1..top_{h-2}],
            #            new_bot = [bot1..bot_{h-1}, top_{h-1}]
            rows = rows_m if top.shape[1] == m else rows_n
            nt = jnp.where(
                rows == 1,
                pltpu.roll(bot, 1, 0),
                jnp.where(rows == 0, top, pltpu.roll(top, 1, 0)),
            )
            nb = jnp.where(rows == h - 1, top, pltpu.roll(bot, h - 1, 0))
            return nt, nb

        xtr, xbr = shuffle(xtr, xbr)
        xti, xbi = shuffle(xti, xbi)
        if with_v:
            vtr, vbr = shuffle(vtr, vbr)
            vti, vbi = shuffle(vti, vbi)
        return xtr, xti, xbr, xbi, vtr, vti, vbr, vbi

    carry = (xtr, xti, xbr, xbi, vtr, vti, vbr, vbi)
    carry = jax.lax.fori_loop(0, sweeps * (n - 1), body, carry)
    xtr, xti, xbr, xbi, vtr, vti, vbr, vbi = carry
    oxr_ref[0, :h, :] = xtr
    oxr_ref[0, h:, :] = xbr
    oxi_ref[0, :h, :] = xti
    oxi_ref[0, h:, :] = xbi
    if with_v:
        ovr_ref[0, :h, :] = vtr
        ovr_ref[0, h:, :] = vbr
        ovi_ref[0, :h, :] = vti
        ovi_ref[0, h:, :] = vbi


def _jacobi_kernel_packed(
    xr_ref,
    xi_ref,
    oxr_ref,
    oxi_ref,
    ovr_ref=None,
    ovi_ref=None,
    *,
    b: int,
    n: int,
    m: int,
    sweeps: int,
    with_v: bool = True,
):
    """Batch-packed variant: the whole batch lives in ONE kernel invocation.

    Planes are (n, b*m): row j holds column j of ALL b matrices side by side
    (segment q occupies lanes [q*m, (q+1)*m)).  The Brent–Luk tournament is
    identical for every matrix, so the sublane rolls/selects act on all
    segments at once — and the per-pair SCALAR chain (norms → angle → c/s,
    ~22 VPU ops that a (h, 1) layout pads to full 128-lane tiles) is computed
    ONCE for the batch on (h, b) tiles instead of once per matrix.  That
    chain measured ~25% of the per-matrix round cost at b=30.
    """
    from jax.experimental.pallas import tpu as pltpu

    h = n // 2
    f32 = jnp.float32
    xtr = xr_ref[:h, :]
    xbr = xr_ref[h:, :]
    xti = xi_ref[:h, :]
    xbi = xi_ref[h:, :]
    rows_bm = jax.lax.broadcasted_iota(jnp.int32, (h, b * m), 0)
    rows_bn = jax.lax.broadcasted_iota(jnp.int32, (h, b * n), 0)
    if with_v:
        # per-segment identity: V[j, q*n + k] = (k == j)
        colmod = jax.lax.broadcasted_iota(jnp.int32, (h, b * n), 1) % n
        vtr = jnp.where(colmod == rows_bn, 1.0, 0.0).astype(f32)
        vbr = jnp.where(colmod == rows_bn + h, 1.0, 0.0).astype(f32)
        vti = jnp.zeros((h, b * n), f32)
        vbi = jnp.zeros((h, b * n), f32)
    else:
        vtr = vbr = vti = vbi = jnp.zeros((8, 128), f32)

    def seg_sum(x):  # (h, b*m) -> (h, b) per-segment lane reduction
        return jnp.sum(jnp.reshape(x, (h, b, m)), axis=2)

    def expand(sc, w):  # (h, b) -> (h, b*w) segment broadcast
        return jnp.reshape(jnp.broadcast_to(sc[:, :, None], (h, b, w)), (h, b * w))

    def body(_, carry):
        xtr, xti, xbr, xbi, vtr, vti, vbr, vbi = carry
        app = seg_sum(xtr * xtr + xti * xti)
        aqq = seg_sum(xbr * xbr + xbi * xbi)
        pr = seg_sum(xtr * xbr + xti * xbi)
        pi = seg_sum(xtr * xbi - xti * xbr)
        mod2 = pr * pr + pi * pi
        inv_mod = jax.lax.rsqrt(mod2 + f32(1e-36))  # eps must be NORMAL f32
        cph = pr * inv_mod
        sph = pi * inv_mod
        tau = (aqq - app) * 0.5 * inv_mod
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        c = jax.lax.rsqrt(1.0 + t * t)
        s = c * t
        skip = mod2 <= 1e-24 * (app * aqq)
        c = jnp.where(skip, 1.0, c)
        s = jnp.where(skip, 0.0, s)
        scph = s * cph
        ssph = s * sph
        cm, scphm, ssphm = expand(c, m), expand(scph, m), expand(ssph, m)
        if with_v:
            cn, scphn, ssphn = expand(c, n), expand(scph, n), expand(ssph, n)

        def rot(tr, ti, br, bi, cc, sc_, ss_):
            ntr = cc * tr - sc_ * br - ss_ * bi
            nti = cc * ti - sc_ * bi + ss_ * br
            nbr = cc * br + sc_ * tr - ss_ * ti
            nbi = cc * bi + sc_ * ti + ss_ * tr
            return ntr, nti, nbr, nbi

        xtr, xti, xbr, xbi = rot(xtr, xti, xbr, xbi, cm, scphm, ssphm)
        if with_v:
            vtr, vti, vbr, vbi = rot(vtr, vti, vbr, vbi, cn, scphn, ssphn)

        def shuffle(top, bot):
            rows = rows_bm if top.shape[1] == b * m else rows_bn
            nt = jnp.where(
                rows == 1,
                pltpu.roll(bot, 1, 0),
                jnp.where(rows == 0, top, pltpu.roll(top, 1, 0)),
            )
            nb = jnp.where(rows == h - 1, top, pltpu.roll(bot, h - 1, 0))
            return nt, nb

        xtr, xbr = shuffle(xtr, xbr)
        xti, xbi = shuffle(xti, xbi)
        if with_v:
            vtr, vbr = shuffle(vtr, vbr)
            vti, vbi = shuffle(vti, vbi)
        return xtr, xti, xbr, xbi, vtr, vti, vbr, vbi

    carry = (xtr, xti, xbr, xbi, vtr, vti, vbr, vbi)
    carry = jax.lax.fori_loop(0, sweeps * (n - 1), body, carry)
    xtr, xti, xbr, xbi, vtr, vti, vbr, vbi = carry
    oxr_ref[:h, :] = xtr
    oxr_ref[h:, :] = xbr
    oxi_ref[:h, :] = xti
    oxi_ref[h:, :] = xbi
    if with_v:
        ovr_ref[:h, :] = vtr
        ovr_ref[h:, :] = vbr
        ovi_ref[:h, :] = vti
        ovi_ref[h:, :] = vbi


#: pack the whole batch into one kernel invocation (lane-axis segments) when
#: m and n are lane-tile multiples; default OFF until the on-chip A/B
#: (examples/ab_jacobi_packed.py) proves it — flip if it wins
PACKED = False
#: cap on lanes per packed call (VMEM: ~8 planes x n x lanes x 4 B)
_PACKED_MAX_LANES = 128 * 64


def _jacobi_kernel_lanes(
    xr_ref,
    xi_ref,
    oxr_ref,
    oxi_ref,
    ovr_ref=None,
    ovi_ref=None,
    *,
    b: int,
    n: int,
    m: int,
    sweeps: int,
    with_v: bool = True,
):
    """Lane-major variant: pair SLOTS along lanes, column ELEMENTS along
    sublanes.

    The sublane-major kernel stores a column as a sublane row, which makes
    rotations full-lane elementwise ops but leaves the ~22-op per-pair
    scalar chain (norms -> angle -> c/s) on (h, 1) tiles that lane-pad to
    the full (h, 128) footprint — measured ~25% of round cost.  The packed
    variant amortized that across the batch but had to reshape
    (h, b*m) <-> (h, b, m) every round (a Mosaic relayout) and LOST on chip
    (42.75 vs 30.27 ms, examples/ab_jacobi_packed.py).

    Here column j of matrix q lives in LANE q*h+j (top plane) with its m
    elements along SUBLANES:

    - the scalar chain runs once per round on ONE (1, b*h) tile row —
      8x fewer tile-ops than (h, 1), amortized over the whole group;
    - norms are native sublane reductions (no reshape, no relayout);
    - the Brent–Luk shuffle is two ±1 LANE rolls + segment-position
      selects (wraparound at segment boundaries is overridden by the
      same boundary selects the tournament already needs).

    Group size ``b`` trades VMEM footprint against per-op Mosaic overhead;
    gated to (b*h) % 128 == 0 so planes tile exactly.
    """
    from jax.experimental.pallas import tpu as pltpu

    h = n // 2
    bh = b * h
    f32 = jnp.float32
    xtr = xr_ref[0, :, :bh]
    xbr = xr_ref[0, :, bh:]
    xti = xi_ref[0, :, :bh]
    xbi = xi_ref[0, :, bh:]
    # within-segment pair position of each lane
    pos_m = jax.lax.broadcasted_iota(jnp.int32, (m, bh), 1) % h
    pos_n = jax.lax.broadcasted_iota(jnp.int32, (n, bh), 1) % h
    if with_v:
        rows_n = jax.lax.broadcasted_iota(jnp.int32, (n, bh), 0)
        vtr = jnp.where(rows_n == pos_n, 1.0, 0.0).astype(f32)
        vbr = jnp.where(rows_n == pos_n + h, 1.0, 0.0).astype(f32)
        vti = jnp.zeros((n, bh), f32)
        vbi = jnp.zeros((n, bh), f32)
    else:
        vtr = vbr = vti = vbi = jnp.zeros((8, 128), f32)

    def body(_, carry):
        xtr, xti, xbr, xbi, vtr, vti, vbr, vbi = carry
        # per-pair scalars on ONE (1, bh) tile row (sublane reductions)
        app = jnp.sum(xtr * xtr + xti * xti, axis=0, keepdims=True)
        aqq = jnp.sum(xbr * xbr + xbi * xbi, axis=0, keepdims=True)
        pr = jnp.sum(xtr * xbr + xti * xbi, axis=0, keepdims=True)
        pi = jnp.sum(xtr * xbi - xti * xbr, axis=0, keepdims=True)
        mod2 = pr * pr + pi * pi
        inv_mod = jax.lax.rsqrt(mod2 + f32(1e-36))  # eps must be NORMAL f32
        cph = pr * inv_mod
        sph = pi * inv_mod
        tau = (aqq - app) * 0.5 * inv_mod
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        c = jax.lax.rsqrt(1.0 + t * t)
        s = c * t
        skip = mod2 <= 1e-24 * (app * aqq)
        c = jnp.where(skip, 1.0, c)
        s = jnp.where(skip, 0.0, s)
        scph = s * cph
        ssph = s * sph

        def rot(tr, ti, br, bi):
            # (1, bh) scalars broadcast over sublanes — native
            ntr = c * tr - scph * br - ssph * bi
            nti = c * ti - scph * bi + ssph * br
            nbr = c * br + scph * tr - ssph * ti
            nbi = c * bi + scph * ti + ssph * tr
            return ntr, nti, nbr, nbi

        xtr, xti, xbr, xbi = rot(xtr, xti, xbr, xbi)
        if with_v:
            vtr, vti, vbr, vbi = rot(vtr, vti, vbr, vbi)

        def shuffle(top, bot):
            # Brent–Luk in lane space: nt[0]=top0, nt[1]=bot0, nt[p]=top[p-1];
            # nb[p]=bot[p+1] (p<h-1), nb[h-1]=top[h-1].  Segment wraparound of
            # the ±1 rolls lands only on boundary positions already overridden
            # by the selects.
            pos = pos_m if top.shape[0] == m else pos_n
            merged = jnp.where(pos == 0, bot, top)
            nt = jnp.where(pos == 0, top, pltpu.roll(merged, 1, 1))
            # roll by -1 == roll by lanes-1 (pltpu.roll requires shift >= 0)
            nb = jnp.where(pos == h - 1, top, pltpu.roll(bot, bh - 1, 1))
            return nt, nb

        xtr, xbr = shuffle(xtr, xbr)
        xti, xbi = shuffle(xti, xbi)
        if with_v:
            vtr, vbr = shuffle(vtr, vbr)
            vti, vbi = shuffle(vti, vbi)
        return xtr, xti, xbr, xbi, vtr, vti, vbr, vbi

    carry = (xtr, xti, xbr, xbi, vtr, vti, vbr, vbi)
    carry = jax.lax.fori_loop(0, sweeps * (n - 1), body, carry)
    xtr, xti, xbr, xbi, vtr, vti, vbr, vbi = carry
    oxr_ref[0, :, :bh] = xtr
    oxr_ref[0, :, bh:] = xbr
    oxi_ref[0, :, :bh] = xti
    oxi_ref[0, :, bh:] = xbi
    if with_v:
        ovr_ref[0, :, :bh] = vtr
        ovr_ref[0, :, bh:] = vbr
        ovi_ref[0, :, :bh] = vti
        ovi_ref[0, :, bh:] = vbi


#: lane-major kernel (see :func:`_jacobi_kernel_lanes`); default ON — the
#: on-chip A/B (examples/ab_jacobi_lanes.py, v5e 2026-08-20) measured the
#: production n=60 chi=64 TEBD trotter step at 22.49 ms vs 28.82 for the
#: sublane-major grid (1.28x); group=2 beat 8 (23.53) and 16 (24.10).
#: Kernel-level parity vs the grid kernel is interpret-exact and on-chip
#: equal-quality on random/decaying/rank-deficient/degenerate batches and
#: on true mid-evolution TEBD thetas (|ds| 1.2e-7 vs f64 LAPACK).
LANES = True
#: matrices per lane-major kernel invocation (grid covers ceil(B/group))
LANE_GROUP = 2


def _run_kernel_lanes(
    xr: Tensor, xi: Tensor, sweeps: int, with_v: bool
) -> Tuple[Tensor, ...]:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, m = xr.shape
    h = n // 2
    b = min(LANE_GROUP, B)
    G = -(-B // b)
    pad_b = G * b - B
    if pad_b:  # zero matrices are fixed points (skip guard)
        xr = jnp.pad(xr, ((0, pad_b), (0, 0), (0, 0)))
        xi = jnp.pad(xi, ((0, pad_b), (0, 0), (0, 0)))
    bh = b * h

    def pk(z):  # (G*b, n, m) -> (G, m, 2*bh): [top lanes | bottom lanes]
        def lane(y):  # (G*b, h, m) -> (G, m, bh)
            y = y.reshape(G, b, h, m)
            return jnp.transpose(y, (0, 3, 1, 2)).reshape(G, m, bh)

        return jnp.concatenate([lane(z[:, :h, :]), lane(z[:, h:, :])], axis=-1)

    def upk(z, w):  # (G, w, 2*bh) -> (B, n, w)
        def unlane(y):  # (G, w, bh) -> (G*b, h, w)
            y = y.reshape(G, w, b, h)
            return jnp.transpose(y, (0, 2, 3, 1)).reshape(G * b, h, w)

        out = jnp.concatenate([unlane(z[:, :, :bh]), unlane(z[:, :, bh:])], axis=1)
        return out[:B]

    spec_x = pl.BlockSpec((1, m, 2 * bh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, n, 2 * bh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_specs = [spec_x, spec_x] + ([spec_v, spec_v] if with_v else [])
    out_shape = [
        jax.ShapeDtypeStruct((G, m, 2 * bh), jnp.float32),
        jax.ShapeDtypeStruct((G, m, 2 * bh), jnp.float32),
    ] + (
        [
            jax.ShapeDtypeStruct((G, n, 2 * bh), jnp.float32),
            jax.ShapeDtypeStruct((G, n, 2 * bh), jnp.float32),
        ]
        if with_v
        else []
    )
    vmem_bytes = (2 + len(out_specs) + 8) * max(m, n) * 2 * bh * 4 + 2 * 1024 * 1024
    f = pl.pallas_call(
        partial(_jacobi_kernel_lanes, b=b, n=n, m=m, sweeps=sweeps, with_v=with_v),
        grid=(G,),
        in_specs=[spec_x, spec_x],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes * 1.5), 120 * 1024 * 1024)
        ),
    )
    out = f(pk(xr), pk(xi))
    out = list(out) if isinstance(out, (tuple, list)) else [out]
    res = [upk(out[0], m), upk(out[1], m)]
    if with_v:
        res += [upk(out[2], n), upk(out[3], n)]
    return tuple(res)


def _run_kernel_packed(
    xr: Tensor, xi: Tensor, sweeps: int, with_v: bool
) -> Tuple[Tensor, ...]:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, m = xr.shape
    # pack: (b, n, m) -> (n, b*m) with segment q at lanes [q*m, (q+1)*m)
    pk = lambda z: jnp.swapaxes(z, 0, 1).reshape(n, b * m)
    upk_m = lambda z: jnp.swapaxes(z.reshape(n, b, m), 0, 1)
    upk_n = lambda z: jnp.swapaxes(z.reshape(n, b, n), 0, 1)
    spec_m = pl.BlockSpec((n, b * m), lambda: (0, 0), memory_space=pltpu.VMEM)
    spec_n = pl.BlockSpec((n, b * n), lambda: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [spec_m, spec_m] + ([spec_n, spec_n] if with_v else [])
    out_shape = [
        jax.ShapeDtypeStruct((n, b * m), jnp.float32),
        jax.ShapeDtypeStruct((n, b * m), jnp.float32),
    ] + (
        [
            jax.ShapeDtypeStruct((n, b * n), jnp.float32),
            jax.ShapeDtypeStruct((n, b * n), jnp.float32),
        ]
        if with_v
        else []
    )
    vmem_bytes = (2 + len(out_specs)) * n * b * max(m, n) * 4 + 2 * 1024 * 1024
    f = pl.pallas_call(
        partial(_jacobi_kernel_packed, b=b, n=n, m=m, sweeps=sweeps, with_v=with_v),
        in_specs=[spec_m, spec_m],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem_bytes * 1.5), 120 * 1024 * 1024)
        ),
    )
    out = f(pk(xr), pk(xi))
    out = list(out) if isinstance(out, (tuple, list)) else [out]
    res = [upk_m(out[0]), upk_m(out[1])]
    if with_v:
        res += [upk_n(out[2]), upk_n(out[3])]
    return tuple(res)


def _run_kernel(
    xr: Tensor, xi: Tensor, sweeps: int, with_v: bool
) -> Tuple[Tensor, ...]:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, m = xr.shape
    if (
        PACKED
        and m % 128 == 0
        and n % 128 == 0
        and b * max(m, n) <= _PACKED_MAX_LANES
        and b > 1
    ):
        return _run_kernel_packed(xr, xi, sweeps, with_v)
    if (
        LANES
        and m % 8 == 0
        and (min(LANE_GROUP, b) * (n // 2)) % 128 == 0
        and n % 2 == 0
    ):
        return _run_kernel_lanes(xr, xi, sweeps, with_v)

    spec_nm = pl.BlockSpec((1, n, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    spec_nn = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_specs = [spec_nm, spec_nm] + ([spec_nn, spec_nn] if with_v else [])
    out_shape = [
        jax.ShapeDtypeStruct((b, n, m), jnp.float32),
        jax.ShapeDtypeStruct((b, n, m), jnp.float32),
    ] + (
        [
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        ]
        if with_v
        else []
    )
    f = pl.pallas_call(
        partial(_jacobi_kernel, n=n, m=m, sweeps=sweeps, with_v=with_v),
        grid=(b,),
        in_specs=[spec_nm, spec_nm],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )
    out = f(xr, xi)
    return tuple(out) if isinstance(out, (tuple, list)) else (out,)


def jacobi_svd_pallas(
    a: Tensor, sweeps: int = 10, accumulate_v: bool = False, presort: bool = False
) -> Tuple[Tensor, Tensor, Tensor]:
    """Full SVD of batched (..., m, n) complex matrices, m >= n, s descending.

    In-kernel one-sided Jacobi (see module docstring); returns (u, s, vh)
    with static shapes (..., m, n), (..., n), (..., n, n).

    ``accumulate_v=False`` (~25% faster at equal sweeps) recovers
    ``vh = S^-1 U^H A`` by one MXU matmul afterwards.  CAVEAT: that
    recovery amplifies U's residual non-orthogonality by s_max/s_i, so for
    truncation-grade vh it needs ~16 sweeps where the in-kernel V
    (``True``) needs only ~10 — measured on a chi=12 TEBD quench the
    10-sweep fast path drops fidelity to 0.93 while 10-sweep ``True``
    holds 0.999995.  Prefer ``True`` unless only u/s are consumed.

    ``presort=True`` applies de Rijk column-norm pivoting: columns are
    permuted into descending-norm order before the kernel (one permutation
    matmul each way) so the Brent–Luk tournament starts nearly sorted —
    the same property that makes the warm path converge in fewer sweeps.
    """
    a = jnp.asarray(a)
    batch = a.shape[:-2]
    m, n = a.shape[-2], a.shape[-1]
    if m < n:
        raise ValueError("jacobi_svd_pallas requires m >= n (pass a.T instead)")
    # pad columns so h = n/2 is a sublane multiple, rows to a lane multiple
    n_pad = -(-max(n, 16) // 16) * 16
    m_pad = -(-max(m, 128) // 128) * 128
    ar = jnp.real(a).astype(jnp.float32)
    ai = jnp.imag(a).astype(jnp.float32)
    # transposed layout: (B, n, m) rows are columns of a
    ar = jnp.swapaxes(ar, -1, -2).reshape((-1, n, m))
    ai = jnp.swapaxes(ai, -1, -2).reshape((-1, n, m))
    pin = None
    if presort:
        # de Rijk pivot: rows of the transposed planes = columns of a;
        # Pin[j, k] = 1 iff k == order[j], so Pin @ x reorders rows by
        # descending column norm.  0/1 matmuls are exact in f32 "highest".
        norms = jnp.sum(ar * ar + ai * ai, axis=-1)  # (B, n)
        order = jnp.argsort(-norms, axis=-1)  # (B, n)
        pin = (
            order[..., :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        ).astype(jnp.float32)  # (B, n, n)
        ar = jnp.matmul(pin, ar, precision="highest")
        ai = jnp.matmul(pin, ai, precision="highest")
    ar = jnp.pad(ar, ((0, 0), (0, n_pad - n), (0, m_pad - m)))
    ai = jnp.pad(ai, ((0, 0), (0, n_pad - n), (0, m_pad - m)))
    out = _run_kernel(ar, ai, sweeps, accumulate_v)
    xr, xi = out[0], out[1]
    s = jnp.sqrt(jnp.sum(xr * xr + xi * xi, axis=-1))  # (B, n_pad)
    order = jnp.argsort(-s, axis=-1)[..., :n]
    s_sorted = jnp.take_along_axis(s, order, axis=-1)
    # apply the sort as a permutation MATMUL (MXU) — per-batch row gathers on
    # (B, n, m) planes are slow on TPU
    perm = (
        order[..., :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, s.shape[-1]), 2)
    ).astype(jnp.float32)  # (B, n, n_pad) one-hot rows
    # full f32: the TPU bf16 default rounds u/vh elements at ~1e-2 relative,
    # which breaks the isometry Vidal-form consumers rely on step over step
    take = lambda z: jnp.matmul(perm, z, precision="highest")
    inv_s = jnp.where(s_sorted > 1e-30, 1.0 / (s_sorted + 1e-30), 0.0)[..., None]
    ur = take(xr)[..., :m] * inv_s
    ui = take(xi)[..., :m] * inv_s
    u = jnp.swapaxes(ur + 1j * ui, -1, -2).astype(a.dtype)
    s_out = s_sorted.astype(jnp.real(jnp.zeros((), a.dtype)).dtype)
    if accumulate_v:
        vr, vi = out[2], out[3]
        vhr = take(vr)[..., :n]  # rows of V^T sorted
        vhi = take(vi)[..., :n]
        if pin is not None:
            # un-pivot: A = A' Pin, so vh(A) = vh(A') @ Pin (exact 0/1 matmul)
            vhr = jnp.matmul(vhr, pin, precision="highest")
            vhi = jnp.matmul(vhi, pin, precision="highest")
        vh = (vhr - 1j * vhi).astype(a.dtype)  # vh = conj(V^T)
    else:
        a_flat = a.reshape((-1, m, n))
        vh = inv_s.astype(a.dtype) * jnp.matmul(
            jnp.conj(jnp.swapaxes(u, -1, -2)), a_flat, precision="highest"
        )  # S^-1 U^H A
    return (
        u.reshape(batch + (m, n)),
        s_out.reshape(batch + (n,)),
        vh.reshape(batch + (n, n)),
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def jacobi_svd(
    a: Tensor, sweeps: int = 10, accumulate_v: bool = False, presort: bool = False
) -> Tuple[Tensor, Tensor, Tensor]:
    """AD-aware :func:`jacobi_svd_pallas` (degenerate-safe SVD adjoint)."""
    return jacobi_svd_pallas(a, sweeps, accumulate_v, presort)


def _kjacobi_fwd(a, sweeps, accumulate_v, presort):
    u, s, vh = jacobi_svd_pallas(a, sweeps, accumulate_v, presort)
    return (u, s, vh), (a, u, s, vh)


def _kjacobi_bwd(sweeps, accumulate_v, presort, res, g):
    from . import linalg as _linalg

    return _linalg._svd_bwd(res, g)


jacobi_svd.defvjp(_kjacobi_fwd, _kjacobi_bwd)


def jacobi_svd_warm(
    a: Tensor, sweeps: int, accumulate_v: bool, vh0: Tensor
) -> Tuple[Tensor, Tensor, Tensor]:
    """:func:`jacobi_svd` warm-started by a previous decomposition's ``vh0``.

    In time-evolution loops (TEBD trotter steps) consecutive thetas on the
    same bond differ by O(dt): pre-rotating ``a @ vh0^H`` puts the iteration
    in Jacobi's quadratic basin, so ~3-5 sweeps match a 10-sweep cold start
    (the 59-matrix n=60 chi=64 batch is VPU-throughput bound — sweeps are
    the entire cost, measured 30.2 of a 32.6 ms trotter step).

    ``vh0``: (..., n, n) complex, typically the full (pre-truncation) ``vh``
    returned by the previous call on this bond.  It is a convergence hint
    only — gradients do not flow through it, and the returned (u, s, vh)
    satisfy ``a = u @ diag(s) @ vh`` exactly like the cold path, so the
    SVD-adjoint VJP inside :func:`jacobi_svd` composes with the two rotation
    matmuls by the ordinary chain rule.
    """
    vh0 = jax.lax.stop_gradient(jnp.asarray(vh0))
    aw = jnp.matmul(a, jnp.conj(jnp.swapaxes(vh0, -1, -2)), precision="highest")
    u, s, vhp = jacobi_svd(aw, sweeps, accumulate_v)
    return u, s, jnp.matmul(vhp, vh0, precision="highest")


# ---------------------------------------------------------------------------
# MXU-dominated truncated SVD: subspace iteration + Jacobi on the compressed
# panel.  The full 128-column Jacobi is VPU-throughput bound (measured
# 30.5 ms of the 32.7 ms n=60 chi=64 TEBD step, examples/tebd_anatomy.py);
# compressing theta to a (m, chi) panel first quarters the rotation work
# (sweeps x (chi-1) rounds on half-height blocks) and moves the subspace
# capture onto the MXU (batched matmuls + Newton-Schulz orthonormalization).
# ---------------------------------------------------------------------------

#: Newton-Schulz orthonormalization rounds AFTER column normalization.
#: The subspace path only ever orthonormalizes NEAR-ORTHOGONAL panels
#: (warm start: A·V_prev columns ~ sigma_j u_j + O(dt) drift), where
#: column normalization makes kappa ~ O(1) and NS converges quadratically.
#: Ill-conditioned panels (cold random seeds -> near-parallel columns)
#: are NOT handled — cold calls run the full-width Jacobi instead
#: (measured: NS-based cold capture collapsed a chi=8 quench to overlap
#: 0.011; Frobenius-prescaled NS at 18 iters silently dropped
#: sigma/sigma1 < 1e-3 directions, a 2e-4 per-bond reconstruction error).
NS_ITERS = 8


def _ns_orth(vr, vi, iters=NS_ITERS):
    """Orthonormalize batched (B, n, k) complex planes: V <- V(3I - V^H V)/2.

    Per-column normalization first (scale-invariant: direction information
    survives any sigma dynamic range; exact-zero columns stay zero), then
    a damped NS iteration inside the sqrt(3) convergence window.  ONLY
    accurate for near-orthogonal columns — see :data:`NS_ITERS`."""
    f32 = jnp.float32
    cn = jnp.sqrt(jnp.sum(vr * vr + vi * vi, axis=-2, keepdims=True))
    vr = vr / (cn + 1e-30)
    vi = vi / (cn + 1e-30)
    k = vr.shape[-1]
    eye = jnp.eye(k, dtype=f32)

    def gram(vr, vi):
        gr = jnp.einsum("bnk,bnl->bkl", vr, vr, precision="highest") + jnp.einsum(
            "bnk,bnl->bkl", vi, vi, precision="highest"
        )
        gi = jnp.einsum("bnk,bnl->bkl", vr, vi, precision="highest") - jnp.einsum(
            "bnk,bnl->bkl", vi, vr, precision="highest"
        )
        return gr, gi

    # certified spectral bound sigma_max^2 <= ||G||_1: near-parallel panels
    # (rank-deficient thetas) have sigma_max up to sqrt(k) after column
    # normalization, and NS DIVERGES (inf -> NaN) outside (0, sqrt(3)) —
    # a fixed damping cannot cover that, the bound always does
    g0r, g0i = gram(vr, vi)
    bound = jnp.max(jnp.sum(jnp.sqrt(g0r * g0r + g0i * g0i), axis=-2), axis=-1)
    scale = (0.99 / jnp.sqrt(bound + 1e-30))[:, None, None]
    vr = vr * scale
    vi = vi * scale

    def body(_, vv):
        vr, vi = vv
        gr, gi = gram(vr, vi)  # G = V^H V (planes)
        ar = 1.5 * eye - 0.5 * gr
        ai = -0.5 * gi
        nr = jnp.einsum("bnk,bkl->bnl", vr, ar, precision="highest") - jnp.einsum(
            "bnk,bkl->bnl", vi, ai, precision="highest"
        )
        ni = jnp.einsum("bnk,bkl->bnl", vr, ai, precision="highest") + jnp.einsum(
            "bnk,bkl->bnl", vi, ar, precision="highest"
        )
        return nr, ni

    vr, vi = jax.lax.fori_loop(0, iters, body, (vr, vi))
    return vr, vi


#: extra captured directions beyond chi (randomized-SVD oversampling): the
#: subspace error scales as (sigma_{chi+p}/sigma_chi)^(2*refine) instead of
#: (sigma_{chi+1}/sigma_chi)^(2*refine), which rescues slowly-decaying
#: spectra; 16 keeps the panel a sublane-pair multiple.
OVERSAMPLE = 16


def subspace_svd(
    a: Tensor,
    chi: int,
    sweeps: int = 10,
    refine: int = 2,
    v0: Optional[Tensor] = None,
    oversample: int = OVERSAMPLE,
    inject: int = 0,
    return_basis: bool = False,
) -> Tuple[Tensor, ...]:
    """Truncated SVD of batched (B, m, n) complex ``a``: top-``chi`` triple.

    1. capture the top right-singular subspace V (n, chi+p): warm ``v0`` or
       a fixed seed, refined by ``refine`` rounds of alternating orthogonal
       iteration (U = orth(A V), V = orth(A^H U)) — batched MXU matmuls;
    2. compress B = A V (m, chi+p) and run the in-kernel one-sided Jacobi
       on the PANEL (sweeps x (chi+p-1) rounds instead of sweeps x (n-1));
    3. lift vh = W^H V^H and keep the top chi.

    ``inject`` (warm only) widens the panel with that many FIXED random
    directions, orthogonalized against ``v0`` (randomized subspace
    tracking): directions GROWING into the top-chi spectrum — invisible
    to a basis rotated purely within its own span, and destroyed by the
    NS refine rounds when their sigma sits at the f32 noise floor — enter
    through the random block and are then tracked exactly by the panel
    Jacobi.  With ``refine=0, inject>0`` no data column ever passes
    through NS (only the well-conditioned random block does), which
    sidesteps the small-sigma bleed entirely.

    Returns (u (B,m,chi), s (B,chi), vh (B,chi,n)).  Near-degenerate
    directions AT the truncation edge may mix between kept/discarded —
    physically equivalent for truncation (same discarded weight).
    """
    a = jnp.asarray(a)
    b, m, n = a.shape
    k = min(n, chi + oversample)
    if v0 is None:
        # COLD: the NS orthonormalizer cannot rescue the near-parallel
        # panels a random seed produces (see NS_ITERS note) — run the
        # robust full-width Jacobi and hand back its right basis as the
        # next step's warm start
        u, s, vh = jacobi_svd(a, sweeps, True)
        out = (u[..., :, :chi], s[..., :chi], vh[..., :chi, :])
        if return_basis:
            basis = jnp.conj(jnp.swapaxes(vh, -1, -2))[..., :, :k]
            return out + (jax.lax.stop_gradient(basis),)
        return out
    ar = jnp.real(a).astype(jnp.float32)
    ai = jnp.imag(a).astype(jnp.float32)
    v0 = jax.lax.stop_gradient(jnp.asarray(v0))
    vr = jnp.real(v0).astype(jnp.float32)
    vi = jnp.imag(v0).astype(jnp.float32)

    def mm(xr, xi, yr, yi, sub):  # complex matmul in planes
        rr = jnp.einsum(sub, xr, yr, precision="highest") - jnp.einsum(
            sub, xi, yi, precision="highest"
        )
        ii = jnp.einsum(sub, xr, yi, precision="highest") + jnp.einsum(
            sub, xi, yr, precision="highest"
        )
        return rr, ii

    if inject:
        p = min(inject, n - vr.shape[-1])
        if p > 0:
            # randomized RANGE-FINDER probes (HMT): Y = A^H Om for a fixed
            # (trace-constant, numpy — axon complex rule) Gaussian Om.
            # Y's span concentrates on A's dominant ROW space with
            # sigma-weighting, so a direction GROWING into the top-chi
            # spectrum enters Y with coefficient ~ sigma_new — unlike raw
            # probes, whose uniform span captures only a p/(n-k) sliver
            # (measured: raw probes COLLAPSED a chi=64 quench, S 1.53 ->
            # 0.45; see examples/ab_tebd_subspace.py).
            rng_ = np.random.default_rng(20260819)
            omr = jnp.asarray(
                np.broadcast_to(
                    rng_.standard_normal((m, p), dtype=np.float32), (b, m, p)
                )
            )
            omi = jnp.asarray(
                np.broadcast_to(
                    rng_.standard_normal((m, p), dtype=np.float32), (b, m, p)
                )
            )
            # Y = A^H Om: planes of conj(A)^T are (ar^T, -ai^T)
            yr, yi = mm(jnp.swapaxes(ar, -1, -2), -jnp.swapaxes(ai, -1, -2),
                        omr, omi, "bnm,bmp->bnp")
            # project out span(v0): Y' = Y - V (V^H Y)  (planes)
            pr, pi = mm(jnp.swapaxes(vr, -1, -2), -jnp.swapaxes(vi, -1, -2),
                        yr, yi, "bkn,bnp->bkp")
            dr, di = mm(vr, vi, pr, pi, "bnk,bkp->bnp")
            yr = yr - dr
            yi = yi - di
            # the residual block mixes the NON-captured row space through
            # random weights — near-orthogonal with comparable norms, the
            # regime where NS orthonormalization is safe
            yr, yi = _ns_orth(yr, yi)
            vr = jnp.concatenate([vr, yr], axis=-1)
            vi = jnp.concatenate([vi, yi], axis=-1)

    for _ in range(refine):
        # U = orth(A V)  (m, chi)
        ur, ui = mm(ar, ai, vr, vi, "bmn,bnk->bmk")
        ur, ui = _ns_orth(ur, ui)
        # V = orth(A^H U): A^H = conj(A)^T -> planes (ar^T, -ai^T)
        vr_n, vi_n = mm(
            jnp.swapaxes(ar, -1, -2), -jnp.swapaxes(ai, -1, -2), ur, ui,
            "bnm,bmk->bnk",
        )
        vr, vi = _ns_orth(vr_n, vi_n)
    # B = A V  (m, chi+p)
    br_, bi_ = mm(ar, ai, vr, vi, "bmn,bnk->bmk")
    panel = (br_ + 1j * bi_).astype(a.dtype)
    u, s, wh = jacobi_svd(panel, sweeps, True)
    # vh = W^H V^H  (chi+p, n), then keep the top chi
    v = (vr + 1j * vi).astype(a.dtype)
    vh = jnp.matmul(wh, jnp.conj(jnp.swapaxes(v, -1, -2)), precision="highest")
    out = (u[..., :, :chi], s[..., :chi], vh[..., :chi, :])
    if return_basis:
        # the captured basis is the next step's warm start (``v0``); rotate
        # it by W so the leading columns track the current singular order,
        # and keep a CONSTANT width k (injected probes, once rotated into
        # the spectrum order, survive only if they carried weight)
        v_sorted = jnp.matmul(
            v, jnp.conj(jnp.swapaxes(wh, -1, -2)), precision="highest"
        )[..., :, :k]
        return out + (jax.lax.stop_gradient(v_sorted),)
    return out


__all__ += ["subspace_svd"]
