"""On-chip A/B: batch-packed Jacobi kernel vs per-matrix grid (round 5).

The packed variant computes the per-pair scalar chain once per round on
(h, b) tiles instead of once per matrix on lane-padded (h, 1) tiles
(~25% of round cost at b=30).  Parity is interpret-exact; this script
measures the production TEBD trotter step both ways on the real chip.

Run on TPU (no PYTHONPATH; axon preset): python examples/ab_jacobi_packed.py

RESULT (v5e, 2026-08-20): REFUTED — packed LOSES.
  packed=False: 30.27 ms/step (compile 11 s)
  packed=True:  42.75 ms/step (compile 17 s)   -> 0.708x, |dlam| = 0
Lane-packing the per-pair scalar chain across the batch replaces b
sequential (h,1)-tile chains with one (h,b) chain, but the packed kernel
must then keep ALL b matrices' planes live through the rotation stage;
Mosaic spills, and the wider tiles slow every rotation.  PACKED stays
default-False; the per-matrix grid (sequential TPU grid keeps each
matrix VMEM-resident) remains the production path.
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
from tensorcircuit_ng_tpu.core import kernels_jacobi as kj

kj.LANES = False  # record predates the lane-major kernel (ab_jacobi_lanes.py) - pin the
# sublane-major grid so the documented numbers reproduce

n, chi, K = 60, 64, 50
X = np.array([[0, 1], [1, 0.0]])
Z = np.diag([1.0, -1.0])
h = -np.kron(Z, Z) - 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
gate = sl.expm(-0.05j * h).astype(np.complex64)


def run_mode(packed: bool):
    kj.PACKED = packed
    eng = tc.ParallelTEBD(n, chi, initial="neel")
    even = np.stack([gate] * len(range(0, n - 1, 2)))
    odd = np.stack([gate] * len(range(1, n - 1, 2)))

    def stepfn(carry, _):
        gr, gi, lam = carry
        eng.gammas, eng.lambdas = gr + 1j * gi, lam
        eng.trotter_step(even, odd)
        return (
            jnp.real(eng.gammas),
            jnp.imag(eng.gammas),
            eng.lambdas,
        ), jnp.real(eng.lambdas[n // 2, 0])

    # FRESH closure per mode: re-wrapping the same fn object after a flag
    # flip silently reuses the old executable (round-4 lesson)
    def scan_k(gr, gi, lam):
        return jax.lax.scan(stepfn, (gr, gi, lam), None, length=K)[1]

    fk = jax.jit(scan_k)
    g0r = np.ascontiguousarray(np.real(eng.gammas)).astype(np.float32)
    g0i = np.ascontiguousarray(np.imag(eng.gammas)).astype(np.float32)
    lam0 = np.asarray(eng.lambdas, dtype=np.float32)

    t0 = time.time()
    out = fk(g0r, g0i, lam0)
    lam_final = float(out[-1])
    compile_s = time.time() - t0
    best = float("inf")
    for k in range(1, 4):
        t0 = time.time()
        out = fk(g0r + 1e-7 * k, g0i, lam0)
        _ = float(out[-1])
        best = min(best, time.time() - t0)
    ms = best / K * 1000
    print(
        f"packed={packed}: {ms:.2f} ms/step  (compile {compile_s:.0f} s, "
        f"lambda_mid[K] = {lam_final:.6f})",
        flush=True,
    )
    return ms, lam_final


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    ms_g, lam_g = run_mode(False)
    ms_p, lam_p = run_mode(True)
    print(f"speedup packed vs grid: {ms_g / ms_p:.3f}x; |dlam| = {abs(lam_g - lam_p):.2e}")
