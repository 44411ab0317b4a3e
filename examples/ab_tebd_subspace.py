"""A/B: subspace-compressed panel Jacobi vs full 128-column Jacobi TEBD.

n=60 chi=64 real-time trotter step, ONE process (axon timing rules: K steps
in one jit via lax.scan, fresh inputs, host fetch, empty-scan calibration):

  jacobi     SVD_MODE='jacobi' cold (the round-3 production path, ~32.6 ms)
  subspace   SVD_MODE='subspace' cold (refine=2 capture + (128,80) panel)
  sub-warm   subspace with the V basis threaded through the scan carry
             (refine=1 warm capture)

Physics check: mid-chain Schmidt spectrum and entropy of every variant vs
the jacobi baseline after K steps.

Run on the real chip; background, no timeout kill.  Flip tebd.SVD_MODE
"auto" to the winner.
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

n, chi, K = 60, 64, 50
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


def make_warm(mode):
    def cold0(gr, gi, lam):
        tebd_mod.SVD_MODE = mode
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam, warm={})
        eng.trotter_step(even, odd)
        return (jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas,
                eng.warm_state())

    def stepfn(carry, _):
        gr, gi, lam, warm = carry
        tebd_mod.SVD_MODE = mode
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam, warm=warm)
        eng.trotter_step(even, odd)
        return (jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas,
                eng.warm_state()), jnp.real(eng.lambdas[n // 2, 0])

    def run(gr, gi, lam):
        carry = cold0(gr, gi, lam)
        carry, ys = jax.lax.scan(stepfn, carry, None, length=K - 1)
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
    ts, lam_s = timed("subspace", make_cold("subspace"))
    tw, lam_w = timed("sub-warm", make_warm("subspace"))
    sj = entropy(lam_j)
    for tag, t, lam in (("subspace", ts, lam_s), ("sub-warm", tw, lam_w)):
        dl = float(np.max(np.abs(np.sort(lam)[::-1] - np.sort(lam_j)[::-1])))
        print(
            f"{tag}: {tj:.2f} -> {t:.2f} ms/step ({tj/t:.2f}x); "
            f"S_mid {entropy(lam):.6f} vs jacobi {sj:.6f}; max|dlam| {dl:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
