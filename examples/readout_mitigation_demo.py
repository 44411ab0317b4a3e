"""Readout-error mitigation (reference ``results/readout_mitigation.py`` role).

``ReadoutMit`` self-calibrates by running basis-state circuits through the
same noisy executor, builds per-qubit calibration matrices, and corrects
measured counts; the mitigated Bell correlator recovers the ideal value.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.results import counts as counts_mod
from tensorcircuit_ng_tpu.results.readout_mitigation import ReadoutMit

n, shots = 2, 100000
# asymmetric flips per qubit: [P(read 0 | true 0), P(read 1 | true 1)]
readout_error = [[0.95, 0.90], [0.96, 0.88]]


def execute(circuits, shots=shots):
    """Noisy-measurement executor (the 'hardware')."""
    out = []
    for c in circuits:
        out.append(
            c.sample(
                batch=shots,
                allow_state=True,
                readout_error=readout_error,
                format="count_dict_bin",
            )
        )
    return out


mit = ReadoutMit(execute)
mit.cals_from_system(n, shots=shots, method="local")

c = tc.Circuit(n)
c.h(0)
c.cnot(0, 1)
raw = execute([c], shots)[0]

e_raw = counts_mod.expectation(raw, z=[0, 1])
e_mit = mit.expectation(raw, z=[0, 1], method="inverse")
e_ideal = float(np.real(np.asarray(c.expectation_ps(z=[0, 1]))))

print(f"ideal <Z0 Z1>:     {e_ideal:+.4f}")
print(f"raw (noisy reads): {e_raw:+.4f}")
print(f"mitigated:         {e_mit:+.4f}")
assert abs(e_mit - e_ideal) < abs(e_raw - e_ideal) / 2
print("self-calibrated inversion recovers the ideal correlator")
