"""Contraction-path quality benchmark: treesa vs opt_einsum baselines.

SURVEY §7 "hard part 1": path quality is the perf ceiling of the einsum-IR
architecture (the reference leans on cotengra's hypergraph optimizer +
slicing_reconf_opts, reference cons.py:1166-1190).  This benchmark contracts
nothing — it scores planned paths on log10(FLOPs) and log2(peak intermediate
size) for 40-60 qubit random brickwork circuits, and writes
``benchmarks/path_quality_results.json`` for round-over-round tracking.

Run: PYTHONPATH=. python benchmarks/path_quality.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# planning is CPU-native; stay off the axon tunnel unless the on-chip
# contract-seconds column was explicitly requested (PQ_ONCHIP=1)
if os.environ.get("PQ_ONCHIP") != "1":
    jax.config.update("jax_platforms", "cpu")

import opt_einsum as oe

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core.native import TreeSAOptimizer, treesa_available


def build_grid_circuit(rows, cols, depth, seed):
    """2D brickwork — the regime where greedy-class planners collapse."""
    n = rows * cols
    rng = np.random.default_rng(seed)
    c = tc.Circuit(n)

    def q(r, cc):
        return r * cols + cc

    for i in range(n):
        c.h(i)
    for l in range(depth):
        if l % 2 == 0:
            pairs = [
                (q(r, a), q(r, a + 1))
                for r in range(rows)
                for a in range(l // 2 % 2, cols - 1, 2)
            ]
        else:
            pairs = [
                (q(a, cc), q(a + 1, cc))
                for cc in range(cols)
                for a in range((l // 2) % 2, rows - 1, 2)
            ]
        for a, b in pairs:
            c.cnot(a, b)
        for i in range(n):
            c.rz(i, theta=float(rng.normal()))
            c.rx(i, theta=float(rng.normal()))
    return c


def build_circuit(n, depth, seed):
    rng = np.random.default_rng(seed)
    th = rng.normal(size=(depth, n, 2)).astype(np.float32)
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for l in range(depth):
        for i in range(l % 2, n - 1, 2):
            c.cnot(i, i + 1)
        for i in range(n):
            c.rz(i, theta=th[l, i, 0])
            c.rx(i, theta=th[l, i, 1])
    return c


def score(ir, optimizer, name):
    t0 = time.time()
    path, info = oe.contract_path(
        ir.to_subscripts(), *ir.shapes(), shapes=True, optimize=optimizer
    )
    dt = time.time() - t0
    return {
        "optimizer": name,
        "log10_flops": round(float(np.log10(float(info.opt_cost))), 3),
        "log2_size": round(float(np.log2(float(info.largest_intermediate))), 2),
        "search_s": round(dt, 2),
    }


def score_repo_auto(ir):
    """Score the path the REPO actually uses for optimizer='auto': routed
    through core.contractor.find_path so the hard-network treesa escalation
    (contractor.py:84-105) fires exactly as in production.  The plain
    opt_einsum 'auto' column (``oe_auto``) is kept as the external baseline;
    this column is the shipped behavior."""
    from tensorcircuit_ng_tpu.core import contractor as _ctr

    _ctr._PATH_CACHE.pop((ir.signature(), "auto"), None)  # time a cold search
    t0 = time.time()
    _, info = _ctr.find_path(ir, "auto")
    dt = time.time() - t0
    return {
        "optimizer": "repo_auto",
        "log10_flops": round(float(np.log10(float(info.opt_cost))), 3),
        "log2_size": round(float(np.log2(float(info.largest_intermediate))), 2),
        "search_s": round(dt, 2),
    }


def onchip_contract_seconds(results):
    """Measure the 40q depth-4 sliced-amplitude workload as ACTUAL contract
    seconds per optimizer (the VERDICT r2 #6 column) — planner FLOPs are a
    model; this is the ground truth.  Requires a reachable accelerator
    (skipped silently on CPU-only boxes: CPU contract times do not predict
    TPU ones).  Run with JAX_PLATFORMS unset (axon) when the tunnel is up.
    """
    import jax as _jax

    if _jax.devices()[0].platform not in ("tpu", "axon"):
        print("onchip column skipped: no accelerator platform")
        return results
    from tensorcircuit_ng_tpu.parallel.distributed import DistributedContractor

    n, depth = 40, 4
    rng = np.random.default_rng(40)
    import jax.numpy as jnp

    th = jnp.asarray(rng.normal(size=(depth, n, 2)) * 0.5, dtype=jnp.float32)

    def build40(thetas):
        c = tc.Circuit(n)
        for i in range(n):
            c.h(i)
        for l in range(depth):
            for i in range(l % 2, n - 1, 2):
                c.cnot(i, i + 1)
            for i in range(n):
                c.rz(i, theta=thetas[l, i, 0])
                c.rx(i, theta=thetas[l, i, 1])
        return c.amplitude_before("0" * n)

    row = {"kind": "onchip_40q_sliced_amplitude", "n": n, "depth": depth, "onchip": {}}
    for name, opt in (
        ("greedy", "greedy"),
        ("treesa", TreeSAOptimizer(n_iters=400000, seed=7, restarts=2, size_weight=0.5)),
    ):
        dc = DistributedContractor(
            build40, th, options={"target_size": 2**24, "optimizer": opt}
        )
        # axon complex rule: only REAL arrays may cross the jit boundary —
        # split the amplitude inside the compiled program via ``op``
        as_planes = lambda v: (jnp.real(v), jnp.imag(v))
        vr, vi = dc.value(th, op=as_planes)  # compile + first contract
        _ = (float(vr), float(vi))
        t0 = time.time()
        vr, vi = dc.value(th * 1.0001, op=as_planes)  # fresh input: defeat memoization
        # host fetch forces remote execution (block_until_ready does not)
        _ = (float(vr), float(vi))
        row["onchip"][name] = {"contract_s": round(time.time() - t0, 3)}
        print("onchip", name, row["onchip"][name])
    results.append(row)
    return results


def main():
    assert treesa_available(), "native treesa library unavailable"
    cases = [
        ("chain", (40, 16)),
        ("chain", (48, 20)),
        ("chain", (60, 24)),
        ("grid", (6, 6, 12)),
        ("grid", (8, 8, 16)),
        ("grid", (10, 10, 16)),
    ]
    results = []
    for kind, spec in cases:
        if kind == "chain":
            n, depth = spec
            c = build_circuit(n, depth, seed=n)
            row = {"kind": kind, "n": n, "depth": depth}
        else:
            rows_, cols_, depth = spec
            n = rows_ * cols_
            c = build_grid_circuit(rows_, cols_, depth, seed=n)
            row = {"kind": kind, "n": n, "grid": f"{rows_}x{cols_}", "depth": depth}
        ir = c.amplitude_before("0" * n)
        row["operands"] = len(ir.inputs)
        row["greedy"] = score(ir, "greedy", "greedy")
        row["oe_auto"] = score(ir, "auto", "oe_auto")
        row["auto"] = score_repo_auto(ir)
        row["treesa"] = score(
            ir,
            TreeSAOptimizer(n_iters=600000, seed=7, restarts=3, size_weight=0.5),
            "treesa",
        )
        results.append(row)
        print(json.dumps(row))
    results = onchip_contract_seconds(results)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "path_quality_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
