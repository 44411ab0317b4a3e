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
"""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import tensorcircuit_ng_tpu as tc

    n = 20
    nlayers = 4
    K = 50

    pairs = [(i, i + 1) for i in range(n - 1)]

    def energy(params):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(nlayers):
            c.zzrx_layer(pairs, params[l, 0, : n - 1], params[l, 1])
        return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()

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

    print(
        json.dumps(
            {
                "metric": "tfim_vqe_n20_l4_step_ms",
                "value": round(step_ms, 3),
                "unit": "ms/step",
                "vs_baseline": round(baseline_ms / step_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
