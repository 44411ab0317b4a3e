"""40-qubit sliced random-circuit amplitude (BASELINE config 5 harness).

Single-chip version of the v5e-16 target: the DistributedContractor slices
the contraction so each slice fits, and scans slices sequentially on one
device (on a 16-chip mesh the same code spreads slices over ICI).
"""


import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import contractor as ctr

n = 40
depth = 6


def build(thetas):
    # thetas may be concrete numpy (gate matrices then stay numpy and lift
    # into the jit program as constants — axon-safe) or traced under jit.
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for l in range(depth):
        for i in range(l % 2, n - 1, 2):
            c.cnot(i, i + 1)
        for i in range(n):
            c.rz(i, theta=thetas[l, i, 0])
            c.rx(i, theta=thetas[l, i, 1])
    return c


if __name__ == "__main__":
    rng = np.random.default_rng(7)
    th = jnp.asarray(rng.normal(size=(depth, n, 2)), dtype=jnp.float32)
    c = build(np.asarray(th))
    bits = "0" * n
    t0 = time.time()
    ir = c.amplitude_before(bits)
    info = ctr.contraction_info(ir)
    print(f"path found in {time.time()-t0:.1f}s: log2 size {info['log2[SIZE]']:.1f}, "
          f"log10 flops {info['log10[FLOPs]']:.1f}")
    sliced = ctr.choose_slices(ir, target_size=2**26)
    print("sliced indices:", len(sliced), "-> slices:", 2 ** len(sliced))
    # The contraction runs under jit, closing over the eagerly-built IR:
    # gate tensors are numpy, so complex constants lift into the program
    # directly (complex buffers cannot cross the axon tunnel, so outputs
    # come back as floats).
    @jax.jit
    def run(dummy):
        if sliced:
            v = ctr.sliced_contract_ir(ir, sliced)
        else:
            v = ctr.contract_ir(ir)
        return jnp.real(v) + dummy, jnp.imag(v)

    t0 = time.time()
    vr, vi = run(0.0)
    vr, vi = float(vr), float(vi)
    compile_and_run = time.time() - t0
    t0 = time.time()
    vr, vi = run(1e-30)
    vr, vi = float(vr), float(vi)
    dt = time.time() - t0
    print(f"amplitude = {vr:.3e} + {vi:.3e}j  "
          f"(first {compile_and_run:.1f}s incl. compile, repeat {dt:.1f}s)")
