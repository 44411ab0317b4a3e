"""Readout mitigation at n=30: the M3 subspace solver never touches a
2^n object (reference ``examples/rem_super_large_scale.py`` role).

A sparse 30-qubit "measurement outcome" distribution (a GHZ-like pair of
peaks plus satellites) is corrupted by per-qubit asymmetric readout error
applied analytically (binary-symmetric channel per qubit on the counts),
then inverted with the scalable M3 machinery of ``ReadoutMit`` — the
reduced calibration matrix lives ONLY on the observed bitstrings
(~hundreds), built from per-qubit calibration factors in rank-structured
log form.

Self-validating checks:

1. The mitigated <Z Z ... Z> (30-qubit parity) recovers the true value
   with < 10x less bias than the corrupted counts.
2. The mitigated probability of the two GHZ peaks recovers > 80% of the
   corruption-lost mass (corrupted: down by > 20 points; the observed
   subspace bounds a perfect recovery).
3. SCALABILITY: the reduced calibration matrix has shape
   (n_observed, n_observed) — explicitly asserted << 2^30 — and the whole
   mitigation runs in seconds.
4. distance=4 truncation changes the mitigated peak mass by < 1 point
   (the correction is local in Hamming distance).

Reference behavior anchor: ``results/readout_mitigation.py`` M3 subspace
(reference mitigation.py:560-770 role).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from tensorcircuit_ng_tpu.results import counts as ct
from tensorcircuit_ng_tpu.results.readout_mitigation import ReadoutMit

N, SHOTS = 30, 20000


def true_distribution(rng):
    """Two GHZ peaks (0.42 + 0.38) plus 30 low-weight satellites."""
    probs = {"0" * N: 0.42, "1" * N: 0.38}
    rest = 0.20
    for _ in range(30):
        k = rng.integers(1, 4)
        base = list("0" * N) if rng.random() < 0.5 else list("1" * N)
        for q in rng.choice(N, k, replace=False):
            base[q] = "1" if base[q] == "0" else "0"
        key = "".join(base)
        probs[key] = probs.get(key, 0.0) + rest / 30
    z = sum(probs.values())
    return {k: v / z for k, v in probs.items()}


def sample_counts(probs, rng, shots):
    keys = list(probs)
    idx = rng.choice(len(keys), size=shots, p=np.array([probs[k] for k in keys]))
    out = {}
    for i in idx:
        out[keys[i]] = out.get(keys[i], 0) + 1
    return out


def corrupt(counts, cals, rng):
    out = {}
    flip0 = np.array([c[1, 0] for c in cals])  # P(read 1 | true 0)
    flip1 = np.array([c[0, 1] for c in cals])  # P(read 0 | true 1)
    for k, v in counts.items():
        bits = np.frombuffer(k.encode(), np.uint8) - ord("0")
        for _ in range(int(v)):
            r = rng.random(N)
            flipped = np.where(bits == 0, r < flip0, r < flip1)
            kk = "".join("1" if (b ^ f) else "0" for b, f in zip(bits, flipped))
            out[kk] = out.get(kk, 0) + 1
    return out


def parity(counts):
    return ct.expectation(counts, z=list(range(N)))


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    probs = true_distribution(rng)
    ideal = sample_counts(probs, rng, SHOTS)

    cals = [
        np.array([[1 - e0, e1], [e0, 1 - e1]])
        for e0, e1 in zip(rng.uniform(0.01, 0.05, N), rng.uniform(0.02, 0.08, N))
    ]
    noisy = corrupt(ideal, cals, rng)

    mit = ReadoutMit(execute=None)
    mit.set_local_cals({q: cals[q] for q in range(N)})

    t0 = time.time()
    corrected = mit.apply_correction(noisy, qubits=list(range(N)), method="M3_auto")
    dt = time.time() - t0

    # [3] scalability evidence
    a, keys = mit.reduced_cal_matrix(noisy, qubits=list(range(N)))
    print(
        f"[3] reduced matrix shape {a.shape} over {len(noisy)} observed strings "
        f"(vs 2^{N} = {2**N:.1e}); mitigation took {dt:.2f} s"
    )
    assert a.shape[0] == len(noisy) and a.shape[0] < 5000

    # [1] 30-qubit parity
    p_true, p_noisy, p_mit = parity(ideal), parity(noisy), parity(corrected)
    print(f"[1] <Z^30>: true {p_true:+.4f}, corrupted {p_noisy:+.4f}, mitigated {p_mit:+.4f}")
    assert abs(p_noisy - p_true) > 0.3  # corruption kills the parity
    assert abs(p_mit - p_true) < 0.1 * abs(p_noisy - p_true) + 0.02

    # [2] GHZ peak mass
    def peak_mass(c):
        tot = sum(c.values())
        return (c.get("0" * N, 0) + c.get("1" * N, 0)) / tot

    m_true, m_noisy, m_mit = peak_mass(ideal), peak_mass(noisy), peak_mass(corrected)
    recovered = (m_mit - m_noisy) / (m_true - m_noisy)
    print(
        f"[2] peak mass: true {m_true:.3f}, corrupted {m_noisy:.3f}, "
        f"mitigated {m_mit:.3f} ({recovered:.0%} of the lost mass recovered)"
    )
    assert m_true - m_noisy > 0.2
    # the subspace solver can only move mass between OBSERVED strings, so
    # shots scattered outside the observed set bound the recovery below 100%
    assert recovered > 0.8

    # [4] Hamming-distance truncation stability
    corrected_d4 = mit.apply_correction(
        noisy, qubits=list(range(N)), method="M3_direct", distance=4
    )
    m_d4 = peak_mass(corrected_d4)
    print(f"[4] distance-4 truncated mitigation: peak mass {m_d4:.3f} (full {m_mit:.3f})")
    assert abs(m_d4 - m_mit) < 0.01
    print("OK: M3 subspace mitigation recovers 30-qubit observables without any 2^n object")
