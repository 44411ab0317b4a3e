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
    p.add_argument("--sweep", action="store_true",
                   help="ignore the single-config flags and run the full "
                        "grid: circuit type x layout x operation x noise x "
                        "grad x vmap (reference scripts_v2 sweep)")
    p.add_argument("--sweep-fast", action="store_true",
                   help="with --sweep: smaller n and fewer iterations")
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


def run_one(a, cfg: dict) -> dict:
    """Build + time one configuration; cfg overrides the CLI namespace."""
    from benchmark_core import benchmark_mega_function

    get = lambda k, d=None: cfg.get(k, getattr(a, k, d))
    f = benchmark_mega_function(
        get("nqubits"), get("nlayers"), get("lx"), get("ly"),
        circuit_type=get("circuit_type"), bond_dim=get("bond_dim"),
        layout_type=get("layout_type"), operation=get("operation"),
        noisy=get("noisy"), noisy_type=get("noisy_type"),
        use_grad=get("use_grad"), use_vmap=get("use_vmap"),
        contractor=get("contractor"),
    )
    rng = np.random.default_rng(42)
    shape = (get("nlayers"), get("nqubits"))
    if get("use_vmap"):
        shape = (a.vmap_batch,) + shape
    params = jnp.asarray(rng.normal(size=shape) * 0.1, dtype=jnp.float32)
    staging, mean_t, std_t = timing(f, params, a.nitrs, a.time_limit)
    return {
        "uuid": str(uuid.uuid4()),
        "config": {k: v for k, v in {**{k: v for k, v in vars(a).items() if k != "path"}, **cfg}.items()},
        "staging_s": round(staging, 4),
        "iter_s": round(mean_t, 6),
        "iter_std_s": round(std_t, 6),
        "platform": jax.devices()[0].platform,
    }


def sweep_grid(a) -> list:
    """The reference scripts_v2 grid: circuit type x layout x op x noise x
    grad x vmap.  Infeasible combos are skipped: grad-through-sample, MPS
    noise channels, DM above n=12, and the 2d layout when n is odd (the
    2 x (n//2) grid needs even n)."""
    n = 10 if a.sweep_fast else a.nqubits
    if a.sweep_fast:
        a.nitrs = min(a.nitrs, 3)
    lx, ly = (2, n // 2)
    cfgs = []
    for ct in ("circuit", "dmcircuit", "mpscircuit"):
        for layout in ("1d", "2d"):
            if layout == "2d" and n % 2:
                continue  # the 2 x (n//2) grid needs even n
            for op in ("state", "exps", "sample"):
                for noisy in (False, True):
                    for grad in (False, True):
                        for vmap in (False, True):
                            if grad and op == "sample":
                                continue  # sampling is not differentiable
                            if noisy and ct == "mpscircuit":
                                continue  # MPS engine has no channels (ref parity)
                            if ct == "dmcircuit" and n > 12:
                                continue
                            if vmap and (noisy or ct != "circuit"):
                                continue  # keep the sweep tractable
                            cfgs.append(dict(
                                nqubits=n, nlayers=2, lx=lx, ly=ly,
                                circuit_type=ct, layout_type=layout,
                                operation=op, noisy=noisy, use_grad=grad,
                                use_vmap=vmap,
                            ))
    return cfgs


def main() -> None:
    a = arg()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    if a.sweep:
        cfgs = sweep_grid(a)
        print(f"# sweeping {len(cfgs)} configurations", file=sys.stderr)
        for cfg in cfgs:
            try:
                record = run_one(a, cfg)
            except Exception as exc:  # record, don't abort the sweep
                record = {"config": cfg, "error": repr(exc)[:200]}
            line = json.dumps(record)
            print(line, flush=True)
            if a.path:
                with open(a.path, "a") as fh:
                    fh.write(line + "\n")
        return
    record = run_one(a, {})
    line = json.dumps(record)
    print(line)
    if a.path:
        with open(a.path, "a") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
