"""f32 TEBD trajectory stability: dense-oracle tracking + the INV_S_REL fix.

Investigation record (v5e, 2026-08-20).  Symptom: the lane-major and
sublane-major Jacobi kernels produced trajectories differing by |dlam| ~
2e-2 after K=50 trotter steps of the n=60 chi=64 TFIM quench, although
kernel-level parity is interpret-exact and on-chip equal-quality on
identical inputs (including true mid-evolution thetas: |ds| = 1.19e-7 vs
f64 LAPACK for BOTH kernels).

Diagnosis chain (each step reproducible with this script):

1. n=16, chi=64 is an effectively-exact regime (discarded weight < 1e-29
   through K=40), so a dense f64 statevector evolution is a true oracle.
   The f32 engine left the oracle's Schmidt spectrum by 1.3e-2 @ K=10 and
   2.1e-1 @ K=20 — IDENTICALLY for both kernels.  Not a kernel bug.
2. A pure-numpy f32 TEBD with LAPACK SVDs tracks the oracle at ~1e-7
   through K=40 (both the Vidal 1/lambda unwrap and the inverse-free
   theta V S^-1 unwrap).  Not an f32-precision limit.  The difference is
   the SVD *engine*: one-sided Jacobi recovers u_i = q_i / s_i, so
   columns whose s_i sits at the f32 noise floor are nowhere near
   orthonormal-to-eps (LAPACK's U is, by construction, at every scale).
   The unwrap multiplies by S^-1 exactly there, injecting O(1) garbage
   into kept-but-noise-floor Schmidt directions that the next step's
   gate mixes into real ones — ~30-180x error growth per step.
3. Fix: a RELATIVE floor on the inverse (``tebd.INV_S_REL``, auto 1e-6
   in f32) — directions below rel * s_max are DROPPED (Schmidt weight
   < rel^2, physically negligible) instead of inverted.  Extra Jacobi
   sweeps do NOT fix it (sweeps=14 diverges identically): the
   noise-floor columns cannot converge in any sweep count, they carry
   no signal.

Measured (n=16 oracle, max|dlam| at the mid bond vs dense; this script's
protocol — K=30, snapshots at 10/20/30):

    sweeps=10 rel=0       K10: 1.3e-02  K20: 2.1e-01  K30: 7.4e-02
    sweeps=14 rel=0       K10: 4.8e-02  K20: 2.3e-01  K30: 1.1e-01
    sweeps=10 rel=1e-6    K10: 6.4e-07  K20: 1.3e-06  K30: 1.5e-06
    sweeps=10 rel=1e-5    K10: 1.0e-05  K20: 1.7e-05  K30: 1.3e-05
    numpy-f32 LAPACK ref  K10: 1.2e-07  K20: 1.5e-07  K30: 1.1e-07

Follow-up hypothesis REFUTED: the fix does NOT rescue the warm-start
chain (round-4 refutation stands for its own reasons) — warm Jacobi with
the rel floor still drifts (n=16 oracle, max|dlam| mid-bond: 3.0e-4 @K20
and 6.1e-2 @K40 at 8 sweeps; worse at 6/5/4) while cold-10 stays at
1.3e-6/1.8e-6.  The warm pre-rotation error is a separate accumulation
channel, not the noise-floor inversion.

With rel=1e-6 the f32 engine is LAPACK-f32-grade.  n=60 per-step f64
tracking (K=14, max over ALL bonds, measured on chip 2026-08-20):

    old (rel=0):  1.6e-07 @K7  6.0e-06 @K8  3.0e-03 @K9  4.8e-01 @K10
    fix (auto):   6.7e-07 @K7  9.0e-07 @K8  9.0e-07 @K9  9.0e-07 @K10
                  ... 1.0e-06 @K14 (flat at the f32 rounding floor)

Run on TPU (no PYTHONPATH; axon preset): python examples/ab_tebd_f32_stability.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.linalg as sl
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.models import tebd as T

n, chi, K = 16, 64, 30
X = np.array([[0, 1], [1, 0.0]])
Z = np.diag([1.0, -1.0])
hb = -np.kron(Z, Z) - 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
g64 = sl.expm(-0.05j * hb)
gate32 = g64.astype(np.complex64)

# dense f64 oracle
psi = np.zeros(2**n, complex)
psi[int("".join("01"[(1 - i % 2)] for i in range(n)), 2)] = 1.0
snaps = {}
for k in range(1, K + 1):
    for p in (0, 1):
        for i in range(p, n - 1, 2):
            t = psi.reshape(2**i, 4, 2 ** (n - i - 2))
            psi = np.einsum("pq,aqb->apb", g64, t).reshape(-1)
    if k in (10, 20, 30):
        snaps[k] = np.linalg.svd(
            psi.reshape(2 ** (n // 2), -1), compute_uv=False
        )[:chi]


def run_variant(rel):
    T.INV_S_REL = rel
    eng = tc.ParallelTEBD(n, chi, initial="neel")
    even = np.stack([gate32] * len(range(0, n - 1, 2)))
    odd = np.stack([gate32] * len(range(1, n - 1, 2)))

    def step(gr_, gi_, lam_):
        e = tc.ParallelTEBD.from_state(gr_ + 1j * gi_, lam_)
        e.trotter_step(even, odd)
        return jnp.real(e.gammas), jnp.imag(e.gammas), e.lambdas

    fj = jax.jit(step)
    st = (
        np.ascontiguousarray(np.real(eng.gammas)).astype(np.float32),
        np.ascontiguousarray(np.imag(eng.gammas)).astype(np.float32),
        np.asarray(eng.lambdas, dtype=np.float32),
    )
    errs = {}
    for k in range(1, K + 1):
        st = fj(*st)
        if k in snaps:
            lam = np.asarray(jax.device_get(st[2]))[n // 2]
            errs[k] = np.abs(np.sort(lam)[::-1] - snaps[k]).max()
    return errs


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    for rel in (0.0, None):
        errs = run_variant(rel)
        tag = "abs 1e-12 floor (old)" if rel == 0.0 else "auto rel 1e-6 (fix) "
        print(
            f"{tag}: "
            + " ".join(f"K{k}:{e:.1e}" for k, e in errs.items()),
            flush=True,
        )
    T.INV_S_REL = None
