"""Benchmark: N=20 TFIM VQE training step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology (see CLAUDE.md "axon timing"): K optimizer steps run inside ONE
jit via ``lax.scan`` with a host fetch at the end — per-dispatch tunnel
latency and the tunnel's request memoization would otherwise corrupt the
numbers.  vs_baseline = speedup over BENCH_BASELINE.json: the earliest
engine variant that compiles on this toolchain at all (the
reference-architecture per-gate engine OOMs the TPU compile helper even for
a single AD step — examples/measure_unfused_baseline.py).  The current path
uses ``zzrx_layer`` (the fused Pallas kernel: in-kernel zz product phase +
theta-native rx butterflies, ONE HBM round trip per layer fwd and bwd, with
dθ for both parameter sets produced inside the backward kernel) plus the
lane-kron MXU matmul and block-sandwich energy sums.

Floor anatomy (VERDICT r4 task #1, measured 2026-08-19 via
examples/ab_kernel_interior.py stage stubs): of the 1.447 ms step, the
HUSK — identical HBM traffic and op schedule with ALL kernel compute
stubbed (zz trig, roll chains, grad reductions, even the lane MXU dots) —
measures 1.024 ms.  The step is glue-bound, not compute-bound: interior
compute adds only ~0.42 above the husk (rolls 0.29, zz 0.23, grads 0.16
as isolated deltas, largely overlapped), lane dots are 0.04, and the husk
itself decomposes as ~0.49 modeled traffic (residuals, inter-layer round
trips, outer stage, conversions) + ~0.14 fixed tunnel round trip per call
(36 ms amortized over K=250) + ~0.4 per-op overhead/unmodeled.  The grand
fusion was then BUILT and measured (kernels_grand.py behind FUSE_GRAND,
examples/ab_grand_fused.py): ONE kernel for all L layers, whole-state
VMEM residency, in-kernel outer dots — isolated-fwd micro-bench 0.333 vs
~0.6 ms, but fwd-only IN-STEP it measured 1.450 vs 1.404 (0.969x): the
double block writes (residual + ping-pong) and 3x predicated code offset
the saved dispatches/reads WHEN the backward stays per-layer.  Round 5
(2026-08-20) finished the program: the grand BACKWARD (one kernel for the
whole L-layer adjoint, cotangent VMEM-resident, dtheta_outer computed
in-kernel, theta-level custom-vjp boundary) alone wins 1.419 -> 1.390,
and grand fwd + grand bwd TOGETHER drop the step to 1.235 -> bench 1.223
ms/step (examples/ab_grand_bwd.py; parity |dE| 1.9e-6, |dgrad| 2.8e-3),
with the step compile falling 161 s -> ~35 s.  Both flags default True.
Remaining decomposition at 1.22 ms: ~0.13 fixed tunnel round trip, two
kernel dispatches + conversions + optimizer XLA glue, and the in-kernel
compute itself.

Run-to-run variance (VERDICT r3 weak #5, "1.54 vs 1.615 drift"): three
captures of the IDENTICAL committed program (commit 9e9f44e..e354850, no
kernel change in between) measured 1.542 (FUSE_LANE A/B, 2026-08-18),
1.615 (driver capture, 2026-08-19 01:36) and 1.561 ms/step (re-run,
2026-08-19 08:59) — a ±2.3% spread around 1.57 with best-of-3 K=250 scans
inside each process.  The drift is tunnel/run variance, not a program
change; treat single-capture deltas below ~5% as noise.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _tpu_reachable(timeout_s: int = 120) -> bool:
    """Probe backend init in a SUBPROCESS with a hard timeout.

    When the axon tunnel is down, ``jax.devices()`` hangs indefinitely at
    backend init (observed 2026-08-17 outage) — a hung bench would stall the
    driver, so fail fast and report honestly instead.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s,
            capture_output=True,
        )
        return b"ok" in r.stdout
    except Exception:
        return False


def bench_tebd() -> float:
    """Second driver-tracked metric: ParallelTEBD trotter step, n=60 chi=64.

    One jitted function runs K real-time trotter steps (even+odd two-site
    layers with the Pallas Jacobi SVD truncation on TPU) via lax.scan; fresh
    gammas per call + host fetch defeat the axon tunnel memoization.
    """
    import time

    import numpy as np
    import scipy.linalg as sl
    import jax
    import jax.numpy as jnp

    import tensorcircuit_ng_tpu as tc

    # K=50: the ~36 ms axon call round trip is FIXED per dispatch, not
    # per-iteration work — at K=10 it inflated the metric by ~3.6 ms/step
    # (same amortization rule as the K=250 VQE metric).
    n, chi, K = 60, 64, 50
    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])
    h = -np.kron(Z, Z) - 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
    # gates stay NUMPY: complex closed over a jit must lift numpy -> MLIR
    # constant; a complex DEVICE constant would be fetched at lowering and
    # die UNIMPLEMENTED on axon (CLAUDE.md complex rule)
    gate = sl.expm(-0.05j * h).astype(np.complex64)
    eng = tc.ParallelTEBD(n, chi, initial="neel")
    even = np.stack([gate] * len(range(0, n - 1, 2)))
    odd = np.stack([gate] * len(range(1, n - 1, 2)))

    # only REAL arrays may cross the axon jit boundary in either direction
    # (complex rule part 2): thread gammas as (real, imag) float pairs and
    # recombine/split inside the trace.
    def stepfn(carry, _):
        gr, gi, lam = carry
        eng.gammas, eng.lambdas = gr + 1j * gi, lam
        eng.trotter_step(even, odd)
        return (
            jnp.real(eng.gammas),
            jnp.imag(eng.gammas),
            eng.lambdas,
        ), jnp.real(eng.lambdas[n // 2, 0])

    fk = jax.jit(
        lambda gr, gi, lam: jax.lax.scan(stepfn, (gr, gi, lam), None, length=K)[1]
    )
    # split in NUMPY: an eager jnp.real(complex device array) would itself
    # be a complex-input executable and die UNIMPLEMENTED on axon (the
    # constructor keeps gammas host-side for exactly this)
    g0r = np.ascontiguousarray(np.real(eng.gammas)).astype(np.float32)
    g0i = np.ascontiguousarray(np.imag(eng.gammas)).astype(np.float32)
    lam0 = np.asarray(eng.lambdas, dtype=np.float32)

    def run(eps: float) -> float:
        t0 = time.time()
        out = fk(g0r + eps, g0i, lam0)
        _ = float(out[-1])
        return time.time() - t0

    run(0.0)  # compile
    best = min(run(1e-7 * k) for k in range(1, 4))
    return best / K * 1000.0


V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth

# best-engineered per-gate A100 competitor (cuStateVec + CUDA graphs,
# L2-resident state): ~700 state-touching kernels x 16.8 MB at ~5 TB/s L2
# + ~1 us graph-replay per node ≈ 2.9 ms.  Scenarios + sources: BASELINE.md.
A100_ESTIMATE_MS = 2.9


def _vqe_roofline(n: int, nlayers: int, step_ms: float) -> dict:
    """Model the minimal HBM traffic of one fused VQE step and compare.

    The workload is bandwidth-bound (2^n-state elementwise kernels; the only
    MXU work is the tiny lane kron).  Explicit accounting, all in bytes:

    - state = two f32 planes (real, imag) = 2 * 2^n * 4 B
    - forward, per zzrx layer: read + write the state      (2 passes)
    - residual save for the custom VJP, per layer: write   (1 pass)
      (backward reads it back: 1 pass)
    - backward, per layer: read + write the cotangent      (2 passes)
    - ends: h-fold init write (1) + fused readout fwd+bwd  (~3 passes)

    => (6 * nlayers + 4) state passes.  Anything below this would require
    fusing across layers, which the layer-sequential scan cannot express.
    utilization = modeled minimum time / measured time.
    """
    state_bytes = 2 * (2**n) * 4
    passes = 6 * nlayers + 4
    total_bytes = passes * state_bytes
    min_ms = total_bytes / (V5E_HBM_GBPS * 1e9) * 1e3
    return {
        "model": f"{passes} state passes x {state_bytes / 1e6:.1f} MB",
        "hbm_bytes_per_step": total_bytes,
        "hbm_peak_gbps": V5E_HBM_GBPS,
        "roofline_ms": round(min_ms, 4),
        "hbm_utilization": round(min_ms / step_ms, 4) if step_ms else None,
    }


def main() -> None:
    if not _tpu_reachable():
        print(
            json.dumps(
                {
                    "metric": "tfim_vqe_n20_l4_step_ms",
                    "value": None,
                    "unit": "ms/step",
                    "vs_baseline": None,
                    "error": "TPU backend unreachable (axon tunnel down); "
                    "last measured 2026-08-20: 1.213 ms/step = 14.39x, "
                    "tebd 22.5 ms",
                }
            )
        )
        return

    import jax
    import jax.numpy as jnp

    import tensorcircuit_ng_tpu as tc

    n = 20
    nlayers = 4
    # K amortizes the FIXED axon dispatch round trip (~36 ms per call, i.e.
    # a 0.7 ms/step floor at K=50); K=250 measures steady-state throughput
    K = 250

    pairs = [(i, i + 1) for i in range(n - 1)]

    def energy(params):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(nlayers):
            c.zzrx_layer(pairs, params[l, 0, : n - 1], params[l, 1])
        # fused readout: layers + ZZ/X energy in ONE custom-VJP boundary
        # (== Re(c.expectation_zz_sum(pairs)) - c.expectation_x_sum())
        return c.expectation_zzx_energy(pairs, 1.0, -1.0)

    vg = jax.value_and_grad(energy)

    def body(p, _):
        v, g = vg(p)
        return p - 0.01 * g, v

    fk = jax.jit(lambda p: jax.lax.scan(body, p, None, length=K))

    rng = np.random.default_rng(42)
    p0 = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, dtype=jnp.float32)
    t0 = time.time()
    out = fk(p0)
    final_e = float(out[1][-1])  # host fetch forces execution
    compile_time = time.time() - t0

    best = float("inf")
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, dtype=jnp.float32)
        t0 = time.time()
        out = fk(p)
        _ = float(out[1][-1])
        best = min(best, (time.time() - t0) / K)
    step_ms = best * 1000.0

    # empty-scan calibration (VERDICT r4 #10): the fixed dispatch+scan floor
    # that silently sits inside every per-step number at this K
    def _empty_body(x, _):
        return x + 1e-7, x[0, 0, 0]

    fe = jax.jit(lambda p: jax.lax.scan(_empty_body, p, None, length=K))
    _ = float(fe(p0)[1][-1])  # compile
    cal = float("inf")
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, dtype=jnp.float32)
        t0 = time.time()
        _ = float(fe(p)[1][-1])
        cal = min(cal, (time.time() - t0) / K)
    calibration_ms = cal * 1000.0

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        baseline_ms = base["step_ms"]
    else:
        baseline_ms = step_ms
        with open(baseline_path, "w") as f:
            json.dump(
                {
                    "metric": "tfim_vqe_n20_l4_step_ms",
                    "step_ms": step_ms,
                    "methodology": "scan50-in-jit + host fetch",
                    "variant": "fused (no unfused baseline recorded)",
                    "compile_s": compile_time,
                    "device": str(jax.devices()[0]),
                },
                f,
            )

    out = {
        "metric": "tfim_vqe_n20_l4_step_ms",
        "value": round(step_ms, 3),
        "unit": "ms/step",
        "vs_baseline": round(baseline_ms / step_ms, 3),
        # external competitor estimate: best-engineered per-gate A100 path
        # (cuStateVec + CUDA graphs, L2-resident state) = 2.9 ms/step —
        # full derivation + scenarios in BASELINE.md "A100 external estimate"
        "vs_a100_estimate": round(A100_ESTIMATE_MS / step_ms, 3),
        # fixed dispatch+scan floor inside every per-step number at this K
        "calibration_empty_scan_ms": round(calibration_ms, 4),
        # judge perf against physics, not only vs_baseline (VERDICT r2 #1)
        "roofline": _vqe_roofline(n, nlayers, step_ms),
    }
    try:
        tebd_ms = bench_tebd()
        out["extra"] = {
            "tebd_trotter_n60_chi64_ms": round(tebd_ms, 2),
            # round-1 recorded 32.6 ms/step for this workload
            "tebd_vs_r1": round(32.6 / tebd_ms, 3),
        }
    except Exception as e:  # pragma: no cover - secondary metric only
        out["extra"] = {"tebd_error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
