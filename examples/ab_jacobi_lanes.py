"""On-chip A/B: lane-major Jacobi kernel vs sublane-major per-matrix grid.

The sublane-major kernel's per-pair scalar chain (norms -> angle -> c/s,
~22 VPU ops) runs on (h, 1) tiles that lane-pad to the full (h, 128)
footprint — measured ~25% of round cost.  The lane-major kernel
(kernels_jacobi._jacobi_kernel_lanes) stores pair slots along LANES so the
chain runs on ONE (1, b*h) tile row, reductions become native sublane
reductions (no relayout — the packed variant's downfall), and Brent–Luk
is two ±1 lane rolls.  Parity is interpret-exact (|ds| = 0).

Run on TPU (no PYTHONPATH; axon preset): python examples/ab_jacobi_lanes.py

RESULT (v5e, 2026-08-20): lane-major WINS — LANES default flipped True.
  grid (baseline): 28.82 ms/step  (compile 44 s)
  lanes grp=2:     22.49 ms/step  (compile 17 s)  -> 1.281x
  lanes grp=4:     22.95 ms/step  (compile 284 s!) (1.256x)
  lanes grp=8:     23.53 ms/step  (1.225x)
  lanes grp=16:    24.10 ms/step  (1.196x)
Group 2 is both fastest and far cheapest to compile — wider groups grow
the Mosaic program (more live tiles per round) for no VPU win.
The |dlam| ~ 2e-2 trajectory difference at K=50 is NOT a kernel defect:
per-step tracking vs a float64 numpy reference showed BOTH modes leaving
the f64 trajectory at K~9-12 of this quench (max|dlam| over bonds:
6.0e-6 @K8 -> 3.0e-3 @K9 -> 4.8e-1 @K10; lanes saturates 1-2 steps
earlier) — noise-floor singular directions inverted by the S^-1 unwrap.
Root cause + fix (tebd.INV_S_REL relative floor, trajectory then flat at
~1e-6 vs f64 through K=14): see examples/ab_tebd_f32_stability.py.
On identical inputs the two kernels are equal quality (true K=8 thetas:
|ds| = 1.19e-7 vs f64 LAPACK, identical truncated reconstruction).
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

n, chi, K = 60, 64, 50
X = np.array([[0, 1], [1, 0.0]])
Z = np.diag([1.0, -1.0])
h = -np.kron(Z, Z) - 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
gate = sl.expm(-0.05j * h).astype(np.complex64)


def run_mode(lanes: bool, group: int = 8):
    kj.LANES = lanes
    kj.LANE_GROUP = group
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
    tag = f"lanes grp={group}" if lanes else "grid (baseline)"
    print(
        f"{tag}: {ms:.2f} ms/step  (compile {compile_s:.0f} s, "
        f"lambda_mid[K] = {lam_final:.6f})",
        flush=True,
    )
    return ms, lam_final


if __name__ == "__main__":
    print("device:", jax.devices(), flush=True)
    ms_g, lam_g = run_mode(False)
    results = {}
    for grp in (2, 8, 16):
        ms_l, lam_l = run_mode(True, grp)
        results[grp] = (ms_l, lam_l)
        print(
            f"  grp={grp}: speedup vs grid {ms_g / ms_l:.3f}x; "
            f"|dlam| = {abs(lam_g - lam_l):.2e}",
            flush=True,
        )
    kj.LANES = True  # restore the production default (lanes won)
    kj.LANE_GROUP = 2
