"""Repetition-code memory with T-gate magic using zx.StabilizerTCircuit.

The tsim-style pipeline: noise sampled in the reduced error basis, outcomes
drawn EXACTLY by chain rule conditioned on each error pattern — so logical
error rates at low p need no trajectory oversampling.  Runs vmapped on the
dense TPU engine.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from tensorcircuit_ng_tpu.zx import StabilizerTCircuit


def rep_code(p: float, rounds: int = 3) -> StabilizerTCircuit:
    c = StabilizerTCircuit(5, seed=42)
    for _ in range(rounds):
        for d in (0, 2, 4):
            c.x_error(d, p=p)
        for (a, d1, d2) in ((1, 0, 2), (3, 2, 4)):
            c.cx(d1, a)
            c.cx(d2, a)
            c.mr_instruction(a)
        c.detector_instruction(-2)
        c.detector_instruction(-1)
    c.measure_instruction(0)
    c.measure_instruction(2)
    c.measure_instruction(4)
    c.observable_instruction(-3)
    return c


if __name__ == "__main__":
    for p in (0.02, 0.05, 0.1):
        c = rep_code(p)
        det, obs = c.sample_detectors(20000, separate_observables=True, seed=1)
        print(
            f"p={p}: mean detector rate {float(np.asarray(det).mean()):.4f}, "
            f"raw qubit-0 flip rate {float(np.asarray(obs).mean()):.4f}"
        )
