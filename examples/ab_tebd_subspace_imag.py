"""A/B: warm-subspace truncation in its VALID regime — imaginary time.

The real-time quench A/B (examples/ab_tebd_subspace.py) refuted
SVD_MODE='subspace' as a default: entanglement GROWTH leaks through the
warm capture.  Imaginary-time evolution is the opposite regime — the
Schmidt spectrum decays monotonically toward the ground state's, exactly
where a warm-threaded subspace capture is oracle-grade (interpret-mode
tests).  This A/B measures, on chip, whether the ~2x panel-Jacobi saving
holds there WITHOUT the physics penalty:

  jacobi    cold full-width Jacobi every step (production default)
  sub-warm  subspace with the captured basis threaded through the scan

n=60 chi=64 TFIM imaginary-time trotter (tau=0.05, K=48 steps from a
neel product state), ONE process, axon timing rules.  Physics check:
mid-bond Schmidt spectrum + sampled bond-energy sum after K steps, both
variants against each other (the dense oracle is unreachable at n=60;
the jacobi path's correctness is pinned by the n=10 imaginary-time
example against exact diagonalization).

MEASURED (2026-08-19, v5e): jacobi 33.18 ms/step vs sub-warm 16.69
(1.99x); sampled-bond energy agrees to |dE|=3.5e-2 on |E|~12 (0.29%,
within the documented cross-engine band) while max|dlam| is still 0.31 —
at beta=2.4 the mid-chain spectrum is an unconverged transient (the
post-quench entanglement growth phase), so the spectrum comparison
inherits the same growth-phase sensitivity as the real-time A/B.  The
honest summary: 2x speed with percent-level energetics in imaginary
time; use jacobi when Schmidt-resolved observables matter.
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

n, chi, K, g, tau = 60, 64, 48, 1.0, 0.05
X = np.array([[0, 1], [1, 0.0]])
Z = np.diag([1.0, -1.0])
h = -np.kron(Z, Z) - g * 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
gate = sl.expm(-tau * h).astype(np.complex64)
even = np.stack([gate] * len(range(0, n - 1, 2)))
odd = np.stack([gate] * len(range(1, n - 1, 2)))
eng0 = tc.ParallelTEBD(n, chi, initial="neel")
g0r = np.ascontiguousarray(np.real(eng0.gammas)).astype(np.float32)
g0i = np.ascontiguousarray(np.imag(eng0.gammas)).astype(np.float32)
lam0 = np.asarray(eng0.lambdas, dtype=np.float32)


def make(mode, warm):
    def setk():
        tebd_mod.SVD_MODE = mode
        tebd_mod.SUBSPACE_REFINE_WARM = 1
        tebd_mod.SUBSPACE_INJECT = 0
        tebd_mod.SUBSPACE_OVERSAMPLE = 16

    def cold0(gr, gi, lam):
        setk()
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam, warm={})
        eng.trotter_step(even, odd)
        return (jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas,
                eng.warm_state())

    def stepfn(carry, _):
        gr, gi, lam, w = carry
        setk()
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam,
                                         warm=(w if warm else None))
        eng.trotter_step(even, odd)
        nw = eng.warm_state() if warm else w
        return (jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas, nw), None

    def run(gr, gi, lam):
        carry = cold0(gr, gi, lam)
        carry, _ = jax.lax.scan(stepfn, carry, None, length=K - 1)
        gr, gi, lam, _ = carry
        setk()
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam)
        eb = jnp.stack([
            jnp.real(eng.expectation_two_site(jnp.asarray(h, jnp.complex64), i))
            for i in range(0, n - 1, 6)  # sampled bonds: enough for parity
        ])
        return jnp.sum(eb), lam[n // 2]

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
    print(f"{tag:9s} {best*1000:7.3f} ms/step (compile {ct:.0f}s)", flush=True)
    return best * 1000, float(out[0]), np.asarray(out[1])


def main():
    tj, ej, lam_j = timed("jacobi", make("jacobi", warm=False))
    tw, ew, lam_w = timed("sub-warm", make("subspace", warm=True))
    dl = float(np.max(np.abs(np.sort(lam_w)[::-1] - np.sort(lam_j)[::-1])))
    print(f"imag-time: jacobi {tj:.2f} ms/step E_sample {ej:.6f} | "
          f"sub-warm {tw:.2f} ms/step ({tj/tw:.2f}x) E_sample {ew:.6f}")
    print(f"max|dlam| {dl:.2e}; |dE| {abs(ew-ej):.2e}")


if __name__ == "__main__":
    main()
