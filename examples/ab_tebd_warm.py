"""A/B: warm-started Jacobi TEBD vs the 10-sweep cold path, on the chip.

Two measurements in ONE process (axon timing rules: K steps in one jit via
lax.scan, fresh float inputs per call, host fetch; empty-scan calibration):

1. SPEED at n=60 chi=64 (the bench workload): cold scan (10 sweeps every
   step) vs warm scan (one cold step, then K-1 steps at JACOBI_SWEEPS_WARM
   with each bond's previous full vh threaded through the carry).

2. ACCURACY at n=12 chi=64 (exact: max Schmidt rank 2^6 = 64, so TEBD is
   truncation-free and any deviation is pure SVD error): K=40 real-time
   TFIM quench from Neel, fidelity of warm and cold wavefunctions against a
   numpy dense-evolution oracle, plus warm-vs-cold mid-chain entropy drift
   at n=60 (where truncation is active and cold is the reference).

Run on the real chip; background, no timeout kill.
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

X = np.array([[0, 1], [1, 0.0]])
Z = np.diag([1.0, -1.0])
HB = -np.kron(Z, Z) - 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
DT = 0.05


def bond_gates(n):
    gate = sl.expm(-1j * DT * HB).astype(np.complex64)
    even = np.stack([gate] * len(range(0, n - 1, 2)))
    odd = np.stack([gate] * len(range(1, n - 1, 2)))
    return even, odd


def make_cold(n, chi, K, even, odd, return_state=False):
    def stepfn(carry, _):
        gr, gi, lam = carry
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam)
        eng.trotter_step(even, odd)
        return (jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas), (
            jnp.real(eng.lambdas[n // 2, 0])
        )

    def run(gr, gi, lam):
        carry, ys = jax.lax.scan(stepfn, (gr, gi, lam), None, length=K)
        # timing mode returns only scalars: full-state jit outputs ride the
        # tunnel back and distort per-step numbers
        return carry if return_state else (ys[-1], carry[2][n // 2])

    return jax.jit(run)


def make_warm(n, chi, K, even, odd, return_state=False):
    def cold0(gr, gi, lam):
        # warm={} opts in to RECORDING vh (cold sweeps this step)
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam, warm={})
        eng.trotter_step(even, odd)
        return (
            jnp.real(eng.gammas),
            jnp.imag(eng.gammas),
            eng.lambdas,
            eng.warm_state(),
        )

    def stepfn(carry, _):
        gr, gi, lam, warm = carry
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam, warm=warm)
        eng.trotter_step(even, odd)
        return (
            jnp.real(eng.gammas),
            jnp.imag(eng.gammas),
            eng.lambdas,
            eng.warm_state(),
        ), jnp.real(eng.lambdas[n // 2, 0])

    def run(gr, gi, lam):
        carry = cold0(gr, gi, lam)
        carry, ys = jax.lax.scan(stepfn, carry, None, length=K - 1)
        if return_state:
            return carry[0], carry[1], carry[2]
        return ys[-1], carry[2][n // 2]

    return jax.jit(run)


def timed(tag, fk, args, K):
    t0 = time.time()
    out = fk(*args)
    _ = float(out[0])
    ct = time.time() - t0
    best = float("inf")
    for k in range(1, 4):
        t0 = time.time()
        o = fk(args[0] + 1e-7 * k, args[1], args[2])
        _ = float(o[0])
        best = min(best, time.time() - t0)
    print(f"{tag:6s} {best/K*1000:7.3f} ms/step (compile {ct:.0f}s)", flush=True)
    return out, best / K * 1000


def fidelity_check():
    n, chi, K = 12, 64, 40
    even, odd = bond_gates(n)
    eng0 = tc.ParallelTEBD(n, chi, initial="neel")
    g0r = np.real(eng0.gammas).astype(np.float32)
    g0i = np.imag(eng0.gammas).astype(np.float32)
    lam0 = np.asarray(eng0.lambdas, dtype=np.float32)

    # numpy dense oracle: build H, evolve the trotterized circuit EXACTLY
    # (apply the same bond gates, so only SVD error differs)
    psi = np.zeros(2**n, np.complex128)
    # neel: |1> on even sites, site 0 is the most significant axis
    idx = 0
    for i in range(n):
        idx = 2 * idx + (1 - i % 2)
    psi[idx] = 1.0
    psi = psi.reshape((2,) * n)
    gate = sl.expm(-1j * DT * HB).reshape(2, 2, 2, 2)
    for _ in range(K):
        for p in (0, 1):
            for b in range(p, n - 1, 2):
                psi = np.tensordot(gate, psi, axes=[[2, 3], [b, b + 1]])
                psi = np.moveaxis(psi, [0, 1], [b, b + 1])
    psi = psi.reshape(-1)

    def wf(mk):
        gr, gi, lam = mk(n, chi, K, even, odd, return_state=True)(g0r, g0i, lam0)

        def dense(gr, gi, lam):
            eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam)
            w = eng.wavefunction()
            return jnp.real(w), jnp.imag(w)

        re, im = jax.jit(dense)(gr, gi, lam)
        return np.asarray(re) + 1j * np.asarray(im)

    for tag, mk in (("cold", make_cold), ("warm", make_warm)):
        w = wf(mk)
        f = abs(np.vdot(w, psi)) ** 2 / max(np.vdot(w, w).real, 1e-30)
        print(f"n=12 exact fidelity {tag}: {f:.8f}", flush=True)


def speed_and_drift():
    n, chi, K = 60, 64, 50
    even, odd = bond_gates(n)
    eng0 = tc.ParallelTEBD(n, chi, initial="neel")
    g0r = np.real(eng0.gammas).astype(np.float32)
    g0i = np.imag(eng0.gammas).astype(np.float32)
    lam0 = np.asarray(eng0.lambdas, dtype=np.float32)
    args = (jnp.asarray(g0r), jnp.asarray(g0i), jnp.asarray(lam0))
    cold_out, cold_ms = timed("cold", make_cold(n, chi, K, even, odd), args, K)
    warm_out, warm_ms = timed("warm", make_warm(n, chi, K, even, odd), args, K)

    def entropy(lam_mid):
        p = np.asarray(lam_mid) ** 2
        p = p[p > 1e-14]
        p = p / p.sum()
        return float(-(p * np.log(p)).sum())

    sc = entropy(np.asarray(cold_out[1]))
    sw = entropy(np.asarray(warm_out[1]))
    dlam = float(jnp.max(jnp.abs(cold_out[1] - warm_out[1])))
    print(
        f"n=60 chi=64: cold {cold_ms:.2f} ms/step, warm {warm_ms:.2f} ms/step "
        f"({cold_ms/warm_ms:.2f}x); S_mid cold {sc:.6f} warm {sw:.6f}; "
        f"max|dlam| {dlam:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    speed_and_drift()
    fidelity_check()
