"""Benchmark: N=20 TFIM VQE step (BASELINE.json config 1) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline semantics: speedup relative to the first recorded run of this
benchmark (stored in BENCH_BASELINE.json at first execution) — round 1
recorded 27.5 ms/step; later rounds show cumulative speedup.  The reference
repo publishes no committed number for this config (see BASELINE.md); its
harness is examples/vqetfim_benchmark.py.

Implementation notes: circuit layers run under lax.scan
(tc.experimental.scan_circuit_layers) so the compiled program is O(1) in
depth; rzz gates ride the diagonal fast path.
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

    pairs = [(i, i + 1) for i in range(n - 1)]

    def energy(params):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(nlayers):
            c.rzz_product(pairs, params[l, 0, : n - 1])
            c.rx_layer(params[l, 1])
        return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()

    params = jnp.asarray(
        np.random.default_rng(42).normal(size=(nlayers, 2, n)) * 0.1,
        dtype=jnp.float32,
    )
    vg = jax.jit(jax.value_and_grad(energy))

    # warmup / compile
    t0 = time.time()
    v, g = vg(params)
    jax.block_until_ready((v, g))
    compile_time = time.time() - t0

    # steady-state timing
    nsteps = 50
    t0 = time.time()
    for _ in range(nsteps):
        v, g = vg(params)
        params = params - 0.01 * g
    jax.block_until_ready((v, params))
    step_ms = (time.time() - t0) / nsteps * 1000.0

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
