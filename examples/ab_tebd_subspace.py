"""A/B record: every fast-TEBD-truncation candidate vs the full Jacobi.

n=60 chi=64 real-time TFIM quench from neel, ONE process (axon timing
rules: K steps in one jit via lax.scan, fresh inputs, host fetch).
Physics check: mid-chain Schmidt entropy + spectrum vs the cold-jacobi
baseline after K steps.

FINAL VERDICT (2026-08-19, v5e, 15 variants measured): the 32.7 ms cold
full-width Jacobi stays the production default — every faster path loses
on physics in this entanglement-growth regime:

  warm subspace r1/r2/r3     16.6/17.7/18.5 ms  S 1.342/1.390/1.149  (leak)
  ... oversample 32/48       21-28 ms   S BIT-IDENTICAL to os16 (leak is
                             in the NS refine, not the buffer width)
  raw / range-finder probes  20-21 ms   S 0.04-0.62 (fresh un-sorted panel
                             columns defeat the 10-sweep panel Jacobi)
  hybrid cold-refresh m2/m3  24.5/21.9  S 0.19/0.67 (WORSE with more
                             refreshes; CPU interpret hybrid is exact ->
                             chip-scale effect of re-consuming the cold
                             jacobi's half-converged small-sigma columns)
  warm FULL jacobi s5/s6/s8  17.5/20.9/27.0 ms  S 0.13/0.03/0.50 (the
                             vh0-rotated near-diagonal start does NOT
                             rescue reduced sweeps at chi=64)

  baseline jacobi S_mid 1.526.  "subspace" stays available as an opt-in
  speed mode for decaying-spectrum workloads (imaginary time / weak
  entanglement growth), where its warm capture is oracle-grade (see
  tests/test_mpscircuit.py::test_parallel_tebd_subspace_mode_matches_gram).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.linalg as sl
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.models import tebd as tebd_mod

from tensorcircuit_ng_tpu.core import kernels_jacobi as _kj

_kj.LANES = False  # record predates the lane-major kernel (ab_jacobi_lanes.py) - pin
# the sublane-major grid so the documented numbers reproduce

n, chi, K = 60, 64, 48  # 48: divisible by the hybrid cadences
X = np.array([[0, 1], [1, 0.0]])
Z = np.diag([1.0, -1.0])
h = -np.kron(Z, Z) - 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
gate = sl.expm(-0.05j * h).astype(np.complex64)
even = np.stack([gate] * len(range(0, n - 1, 2)))
odd = np.stack([gate] * len(range(1, n - 1, 2)))
eng0 = tc.ParallelTEBD(n, chi, initial="neel")
g0r = np.ascontiguousarray(np.real(eng0.gammas)).astype(np.float32)
g0i = np.ascontiguousarray(np.imag(eng0.gammas)).astype(np.float32)
lam0 = np.asarray(eng0.lambdas, dtype=np.float32)


def make_cold(mode):
    def stepfn(carry, _):
        gr, gi, lam = carry
        tebd_mod.SVD_MODE = mode  # trace-time read
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam)
        eng.trotter_step(even, odd)
        return (
            jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas,
        ), jnp.real(eng.lambdas[n // 2, 0])

    def run(gr, gi, lam):
        carry, ys = jax.lax.scan(stepfn, (gr, gi, lam), None, length=K)
        return ys[-1], carry[2][n // 2]

    return jax.jit(run)


def make_warm(mode, refine=1, inject=0, oversample=16, sweeps_warm=None):
    def setk():
        tebd_mod.SVD_MODE = mode  # trace-time reads
        tebd_mod.SUBSPACE_REFINE_WARM = refine
        tebd_mod.SUBSPACE_INJECT = inject
        tebd_mod.SUBSPACE_OVERSAMPLE = oversample
        if sweeps_warm is not None:
            tebd_mod.JACOBI_SWEEPS_WARM = sweeps_warm

    def cold0(gr, gi, lam):
        setk()
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam, warm={})
        eng.trotter_step(even, odd)
        return (jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas,
                eng.warm_state())

    def stepfn(carry, _):
        gr, gi, lam, warm = carry
        setk()
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam, warm=warm)
        eng.trotter_step(even, odd)
        return (jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas,
                eng.warm_state()), jnp.real(eng.lambdas[n // 2, 0])

    def run(gr, gi, lam):
        carry = cold0(gr, gi, lam)
        carry, ys = jax.lax.scan(stepfn, carry, None, length=K - 1)
        return ys[-1], carry[2][n // 2]

    return jax.jit(run)


def make_hybrid(mode, m, refine=1, inject=0):
    """Cold-refresh every m steps: scan over K//m segments of [1 cold +
    (m-1) warm] unrolled steps — bounds warm-capture drift to m-1 steps."""

    def setk():
        tebd_mod.SVD_MODE = mode
        tebd_mod.SUBSPACE_REFINE_WARM = refine
        tebd_mod.SUBSPACE_INJECT = inject

    def one(gr, gi, lam, warm):
        setk()
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam, warm=warm)
        eng.trotter_step(even, odd)
        return (jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas,
                eng.warm_state())

    def segment(carry, _):
        gr, gi, lam = carry
        gr, gi, lam, warm = one(gr, gi, lam, {})  # cold refresh
        for _ in range(m - 1):
            gr, gi, lam, warm = one(gr, gi, lam, warm)
        return (gr, gi, lam), jnp.real(lam[n // 2, 0])

    def run(gr, gi, lam):
        carry, ys = jax.lax.scan(segment, (gr, gi, lam), None, length=K // m)
        return ys[-1], carry[2][n // 2]

    return jax.jit(run)


def timed(tag, fk):
    t0 = time.time()
    out = fk(g0r, g0i, lam0)
    _ = float(out[0])
    ct = time.time() - t0
    best = float("inf")
    for k in range(1, 4):
        t0 = time.time()
        o = fk(g0r + 1e-7 * k, g0i, lam0)
        _ = float(o[0])
        best = min(best, (time.time() - t0) / K)
    lam_mid = np.asarray(out[1])
    print(f"{tag:9s} {best*1000:7.3f} ms/step (compile {ct:.0f}s)", flush=True)
    return best * 1000, lam_mid


def entropy(lam_mid):
    p = np.asarray(lam_mid) ** 2
    p = p[p > 1e-14]
    p = p / p.sum()
    return float(-(p * np.log(p)).sum())


def main():
    tj, lam_j = timed("jacobi", make_cold("jacobi"))
    sj = entropy(lam_j)
    # measured 2026-08-19 (this script, v5e): w r1 i0 16.6 ms but S_mid
    # 1.34 vs 1.53 (growth-phase leak); RAW probe injection REFUTED
    # (S collapsed to 0.45/0.06); hybrid cold-refresh REFUTED on chip
    # (m2 S=0.19, m3 S=0.67 — WORSE with more refreshes: each cold->warm
    # handoff re-consumes the chip jacobi's half-converged small-sigma
    # columns; CPU interpret hybrid is exact, so it is a scale effect).
    # inject now means RANGE-FINDER probes (A^H Omega, sigma-weighted).
    # sigma-weighted probes ALSO refuted (r0 i8 S=0.04, r1 i8 S=0.56,
    # r1 i16 S=0.62 vs plain r1 S=1.34): ANY un-sorted panel columns defeat
    # the 10-sweep panel Jacobi.  Remaining lever: the oversample buffer.
    # oversample sweep result (2026-08-19): S_mid BIT-IDENTICAL across
    # os16/32/48 while time scales with width (16.6/21.1/28.4 ms r1) — the
    # warm leak lives in the NS refine itself, and is NON-monotone in
    # refine (r1 1.342, r2 1.390, r3 1.149 vs jacobi 1.526).  Last lever:
    # warm FULL-width jacobi (theta pre-rotated by vh0, near-diagonal
    # input) with more than the old 4 sweeps.
    variants = [
        ("jw s6", None, dict(mode="jacobi", sweeps_warm=6)),
        ("jw s8", None, dict(mode="jacobi", sweeps_warm=8)),
        ("jw s5", None, dict(mode="jacobi", sweeps_warm=5)),
    ]
    for tag, m, kw in variants:
        mode = kw.pop("mode", "subspace")
        fk = make_warm(mode, **kw) if m is None else make_hybrid(mode, m, **kw)
        t, lam = timed(tag, fk)
        dl = float(np.max(np.abs(np.sort(lam)[::-1] - np.sort(lam_j)[::-1])))
        print(
            f"{tag}: {tj:.2f} -> {t:.2f} ms/step ({tj/t:.2f}x); "
            f"S_mid {entropy(lam):.6f} vs jacobi {sj:.6f}; max|dlam| {dl:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
