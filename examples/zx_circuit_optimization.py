"""ZX-calculus circuit optimization: convert, reduce, verify, count T gates.

Reference role: ``examples/zx_transform.py`` — round a circuit through the
ZX representation, run the simplification pipeline, and verify the
optimized diagram still implements the same unitary.  The reference shells
out to pyzx; here the whole pipeline is the repo's own ZX subsystem
(``zx.circuit_to_zx`` -> ``zx.simplify``/``full_reduce`` ->
``ZXGraph.to_matrix`` via the einsum engine).

Three checks on a deliberately redundant Clifford+T circuit:
  1. spider-count reduction from fusion + identity removal is real (>30%);
  2. the reduced diagram's matrix stays proportional to the original
     circuit unitary (global phase is not an observable);
  3. ``t_count`` after phase fusion matches the hand-counted irreducible
     T phases (adjacent t;t pairs merge into s spiders).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.zx import circuit_to_zx
from tensorcircuit_ng_tpu.zx.simplifier import full_reduce, simplify, t_count


def assert_proportional(a, b, atol=1e-4):
    a = np.asarray(a).reshape(-1)
    b = np.asarray(b).reshape(-1)
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    assert abs(abs(np.vdot(a, b)) - 1.0) < atol


# a redundant 3-qubit Clifford+T circuit: rz chains, hh pairs, t;t = s
c = tc.Circuit(3)
c.h(0)
c.t(0)
c.t(0)          # fuses into a single s-phase spider
c.rz(1, theta=0.3)
c.rz(1, theta=0.4)  # fuses into rz(0.7)
c.cnot(0, 1)
c.h(2)
c.h(2)          # identity pair
c.t(2)          # one irreducible T
c.cz(1, 2)
c.s(1)
c.sd(1)         # cancels to identity
c.cnot(0, 1)

u_ref = np.asarray(c.matrix())

g = circuit_to_zx(c)
n0 = g.num_spiders()
simplify(g, graph_like=False)  # fusion + identity removal, no color change
n1 = g.num_spiders()
print(f"spiders: {n0} -> {n1} after fusion/identity removal "
      f"({100 * (1 - n1 / n0):.0f}% reduction)")
assert n1 < 0.7 * n0, (n0, n1)
assert_proportional(np.asarray(g.to_matrix()), u_ref)

tc_after = t_count(g)
print(f"t-count after phase fusion: {tc_after}")
# hand count: t;t on wire 0 merged to s (not a T), wire 2 keeps one T
assert tc_after == 1, tc_after

# the full graph-like reduction must also preserve the unitary
g2 = circuit_to_zx(c)
full_reduce(g2)
n2 = g2.num_spiders()
print(f"full_reduce: {n0} -> {n2} spiders")
assert_proportional(np.asarray(g2.to_matrix()), u_ref)
assert n2 <= n1

print("OK")
