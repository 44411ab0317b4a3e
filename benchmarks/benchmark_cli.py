"""Benchmark sweep CLI (reference ``benchmarks/scripts_v2/benchmark_cli.py``).

Example::

    python benchmarks/benchmark_cli.py -n 16 -nlayers 4 --operation exps \
        --use-grad --nitrs 5

Prints one JSON line per configuration with staging + per-iteration times.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def arg() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="tensorcircuit-ng-tpu benchmark sweep")
    p.add_argument("-n", "--nqubits", type=int, default=12)
    p.add_argument("-nlayers", "--nlayers", type=int, default=3)
    p.add_argument("--lx", type=int, default=0)
    p.add_argument("--ly", type=int, default=0)
    p.add_argument("--circuit-type", default="circuit",
                   choices=["circuit", "dmcircuit", "mpscircuit"])
    p.add_argument("--bond-dim", type=int, default=16)
    p.add_argument("--layout-type", default="1d", choices=["1d", "2d"])
    p.add_argument("--operation", default="state", choices=["state", "sample", "exps"])
    p.add_argument("--noisy", action="store_true")
    p.add_argument("--noisy-type", default="depolarizing",
                   choices=["depolarizing", "amplitudedamping"])
    p.add_argument("--use-grad", action="store_true")
    p.add_argument("--use-vmap", action="store_true")
    p.add_argument("--vmap-batch", type=int, default=8)
    p.add_argument("--contractor", default=None)
    p.add_argument("--nitrs", type=int, default=10)
    p.add_argument("--time-limit", type=float, default=120.0)
    p.add_argument("--path", default=None, help="append JSON results to this file")
    p.add_argument("--cpu", action="store_true", help="force the CPU platform")
    return p.parse_args()


def timing(f, params, nitrs: int, time_limit: float):
    t0 = time.time()
    out = f(params)
    jax.block_until_ready(out)
    staging = time.time() - t0
    times = []
    for _ in range(nitrs):
        t0 = time.time()
        out = f(params)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
        if sum(times) > time_limit:
            break
    return staging, float(np.mean(times)), float(np.std(times))


def main() -> None:
    a = arg()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    from benchmark_core import benchmark_mega_function

    f = benchmark_mega_function(
        a.nqubits, a.nlayers, a.lx, a.ly,
        circuit_type=a.circuit_type, bond_dim=a.bond_dim,
        layout_type=a.layout_type, operation=a.operation,
        noisy=a.noisy, noisy_type=a.noisy_type,
        use_grad=a.use_grad, use_vmap=a.use_vmap,
        contractor=a.contractor,
    )
    rng = np.random.default_rng(42)
    shape = (a.nlayers, a.nqubits)
    if a.use_vmap:
        shape = (a.vmap_batch,) + shape
    params = jnp.asarray(rng.normal(size=shape) * 0.1, dtype=jnp.float32)
    staging, mean_t, std_t = timing(f, params, a.nitrs, a.time_limit)
    record = {
        "uuid": str(uuid.uuid4()),
        "config": {k: v for k, v in vars(a).items() if k != "path"},
        "staging_s": round(staging, 4),
        "iter_s": round(mean_t, 6),
        "iter_std_s": round(std_t, 6),
        "platform": jax.devices()[0].platform,
    }
    line = json.dumps(record)
    print(line)
    if a.path:
        with open(a.path, "a") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
