"""Visualize a contraction path over the framework's own EinsumIR trees.

Reference role: ``examples/cotengra_visualize_path.py`` — extract the
``(inputs, output, size_dict)`` topology from a circuit (``tc.get_tn_info``,
reference ``cons.py:804``), search a contraction tree, report FLOPs /
max-intermediate, and render the tree.  The reference leans on cotengra's
``plot_ring``/``plot_tent``; offline here the tree comes from the repo's own
optimizers (opt_einsum greedy vs the native C++ simulated-annealing
``TreeSAOptimizer``) and the two standard views are drawn directly:

  * a *tent* plot of the winning tree — leaves on the baseline in wire
    order, each internal contraction node at its tree depth, marker area
    proportional to log2 of the intermediate it produces;
  * the per-step intermediate-size profile of both optimizers.

Self-validating: a from-scratch replay of each pairwise path must reproduce
opt_einsum's ``largest_intermediate`` exactly, and the annealer must never
be worse than greedy on this network (find_path escalation contract).
"""

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
from tensorcircuit_ng_tpu.core import einsum_ir
from tensorcircuit_ng_tpu.core.contractor import find_path
from tensorcircuit_ng_tpu.core.native import TreeSAOptimizer, treesa_available

# fixed categorical assignment (validated pair): greedy=blue, treesa=orange
C_GREEDY, C_TREESA = "#2a78d6", "#eb6834"
INK, MUTED = "#333333", "#888888"

n, depth = 12, 4
c = tc.Circuit(n)
for i in range(n):
    c.h(i)
for layer in range(depth):
    for i in range(n - 1):
        c.cnot(i, i + 1)
    for i in range(n):
        c.rx(i, theta=0.1 * (layer + 1))

inputs, output, size_dict = tc.get_tn_info(c)
print(f"{n}-qubit depth-{depth} circuit -> {len(inputs)} input tensors, "
      f"{len(size_dict)} distinct indices")

ir = einsum_ir.circuit_state_ir(c._expanded_qir(), n)


def replay(path):
    """Walk a pairwise path, tracking index sets; return per-step output
    sizes and the tree as (left, right, step_size) triples over node ids."""
    frees = [set(t) for t in ir.inputs]
    out_ids = set(ir.output)
    # histogram of index occurrences so shared indices survive until last use
    remaining: dict = {}
    for t in frees:
        for e in t:
            remaining[e] = remaining.get(e, 0) + 1
    nodes = list(range(len(frees)))
    nxt = len(frees)
    sizes, tree = [], []
    for (i, j) in path:
        i, j = (i, j) if i < j else (j, i)
        ti, tj = frees[i], frees[j]
        for e in ti | tj:
            remaining[e] -= ti.__contains__(e) + tj.__contains__(e)
        keep = {e for e in ti | tj if remaining[e] > 0 or e in out_ids}
        for e in keep:
            remaining[e] += 1
        size = int(np.prod([size_dict[e] for e in keep], dtype=object)) if keep else 1
        sizes.append(size)
        li, lj = nodes[i], nodes[j]
        # remove j first (higher position) so i's slot stays valid
        for pos in (j, i):
            frees.pop(pos)
            nodes.pop(pos)
        frees.append(keep)
        nodes.append(nxt)
        tree.append((li, lj, size))
        nxt += 1
    return sizes, tree


assert treesa_available(), "native treesa library unavailable"
plans = {}
for name, opt in (
    ("greedy", "greedy"),
    ("treesa", TreeSAOptimizer(n_iters=200000, seed=7, restarts=2,
                               size_weight=0.5)),
):
    path, info = find_path(ir, opt)
    sizes, tree = replay(path)
    assert max(sizes) == int(info.largest_intermediate), (
        name, max(sizes), info.largest_intermediate)
    plans[name] = dict(path=path, info=info, sizes=sizes, tree=tree)
    print(f"{name:7s} log10[FLOPs]={np.log10(float(info.opt_cost)):.2f}  "
          f"log2[SIZE]={np.log2(max(sizes)):.1f}")

g, t = plans["greedy"]["info"].opt_cost, plans["treesa"]["info"].opt_cost
assert float(t) <= float(g) * 1.001, "annealer worse than greedy"
best = "treesa" if float(t) < float(g) else "greedy"

# ---- tent plot of the winning tree ------------------------------------
nleaf = len(inputs)
tree = plans[best]["tree"]
x = {i: float(i) for i in range(nleaf)}       # leaf positions, wire order
y = {i: 0.0 for i in range(nleaf)}
fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(13, 5))
for li, lj, size in tree:
    nid = len(x)
    x[nid] = 0.5 * (x[li] + x[lj])
    y[nid] = max(y[li], y[lj]) + 1.0
    for child in (li, lj):
        ax0.plot([x[child], x[nid]], [y[child], y[nid]],
                 lw=1.2, color=MUTED, zorder=1)
    ax0.scatter([x[nid]], [y[nid]], s=14 + 9 * np.log2(max(size, 2)),
                color=C_TREESA if best == "treesa" else C_GREEDY,
                edgecolors="white", linewidths=0.8, zorder=2)
ax0.scatter(list(range(nleaf)), [0.0] * nleaf, s=12, color=INK, zorder=2)
ax0.set_title(f"contraction tent — {best} "
              f"(marker area ∝ log2 intermediate size)", fontsize=10)
ax0.set_xlabel("leaf tensors (wire order)")
ax0.set_ylabel("tree depth")
ax0.spines[["top", "right"]].set_visible(False)
ax0.grid(axis="y", lw=0.4, alpha=0.3)

# ---- per-step intermediate-size profile --------------------------------
for name, color in (("greedy", C_GREEDY), ("treesa", C_TREESA)):
    prof = np.log2(np.maximum(plans[name]["sizes"], 1))
    ax1.plot(prof, lw=2, color=color, label=name)
    peak = int(np.argmax(prof))
    ax1.annotate(f"{name} peak 2^{prof[peak]:.0f}",
                 (peak, prof[peak]), textcoords="offset points",
                 xytext=(6, 6), fontsize=9, color=INK)
ax1.set_title("intermediate size per contraction step", fontsize=10)
ax1.set_xlabel("contraction step")
ax1.set_ylabel("log2 size")
ax1.legend(frameon=False)
ax1.spines[["top", "right"]].set_visible(False)
ax1.grid(lw=0.4, alpha=0.3)

out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "contraction_path.png")
fig.tight_layout()
fig.savefig(out, dpi=150)
print(f"saved {out}")
print("OK")
