"""Distance-3 rotated surface code: detector sampling + lookup decoding.

Reference examples surface_code_circuit_detector.py / surface_code_tn_decoder.py
role, built on this repo's native bit-packed tableau engine
(models/stabilizercircuit.py sample_detectors — the stim workflow).

The d=3 rotated code: 9 data qubits on a 3x3 grid, 4 Z-stabilizers and 4
X-stabilizers (weight-4 bulk + weight-2 boundary), logical Z = Z0 Z1 Z2.
A code-capacity memory-Z experiment: one depolarizing layer on the data,
two full stabilizer-measurement rounds (ancilla reset -> CX fan-in ->
measure, Hadamard-framed for the X-type checks), time-like detectors, and a
final data-measurement round whose reconstructed Z-checks close the last
detector layer.  The X part of each error is decoded from the first-round
Z-syndrome with a minimum-weight lookup table (enumerated to weight 2).

Self-validating:
- with perfect measurements the 2nd-round detectors never fire;
- the decoded logical error rate is far below the undecoded one and
  consistent with the exact code-capacity expectation (enumerated over the
  single-layer error model).
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import tensorcircuit_ng_tpu as tc

# data qubits 0..8 laid out row-major on a 3x3 grid; ancillas 9..16
Z_STABS = [(0, 1, 3, 4), (4, 5, 7, 8), (2, 5), (3, 6)]
X_STABS = [(1, 2, 4, 5), (3, 4, 6, 7), (0, 1), (7, 8)]
LOGICAL_Z = (0, 1, 2)  # top row
N_DATA = 9


def check_css():
    """Every X-check overlaps every Z-check on an even number of qubits."""
    for xs in X_STABS:
        for zs in Z_STABS:
            assert len(set(xs) & set(zs)) % 2 == 0, (xs, zs)
        assert len(set(xs) & set(LOGICAL_Z)) % 2 == 0, xs


def build_memory(p, rounds=2):
    c = tc.StabilizerCircuit(N_DATA + len(Z_STABS) + len(X_STABS))
    z_anc = list(range(N_DATA, N_DATA + len(Z_STABS)))
    x_anc = list(range(N_DATA + len(Z_STABS), N_DATA + len(Z_STABS) + len(X_STABS)))
    nrec = 0  # running measurement-record length, for negative rec offsets
    z_recs, x_recs = [], []  # absolute record indices per round

    def measure_round():
        nonlocal nrec
        zr, xr = [], []
        for a, stab in zip(z_anc, Z_STABS):
            c.reset_instruction(a)
            for q in stab:
                c.cx(q, a)
            c.measure_instruction(a)
            zr.append(nrec)
            nrec += 1
        for a, stab in zip(x_anc, X_STABS):
            c.reset_instruction(a)
            c.h(a)
            for q in stab:
                c.cx(a, q)
            c.h(a)
            c.measure_instruction(a)
            xr.append(nrec)
            nrec += 1
        z_recs.append(zr)
        x_recs.append(xr)

    # code-capacity noise: one depolarizing layer on the data qubits
    c.depolarize1(*range(N_DATA), p=p)
    for r in range(rounds):
        measure_round()
        if r == 0:
            # Z-checks are deterministic from |0..0>: absolute detectors
            for rec in z_recs[0]:
                c.detector(rec - nrec)
        else:
            for rec0, rec1 in zip(z_recs[r - 1], z_recs[r]):
                c.detector(rec0 - nrec, rec1 - nrec)
            # X-check first round is random (projection): compare from r>=1
            for rec0, rec1 in zip(x_recs[r - 1], x_recs[r]):
                c.detector(rec0 - nrec, rec1 - nrec)
    # final data measurement closes the Z-detector lattice
    data_recs = {}
    for q in range(N_DATA):
        c.measure_instruction(q)
        data_recs[q] = nrec
        nrec += 1
    for rec_anc, stab in zip(z_recs[-1], Z_STABS):
        c.detector(rec_anc - nrec, *[data_recs[q] - nrec for q in stab])
    c.observable_include(*[data_recs[q] - nrec for q in LOGICAL_Z])
    return c


def zsyndrome_of(xerr):
    """4-bit Z-check syndrome of an X-error set."""
    return tuple(len(set(stab) & xerr) % 2 for stab in Z_STABS)


def build_lookup():
    """Min-weight X-correction for every reachable Z-syndrome (weight <= 2)."""
    table = {zsyndrome_of(frozenset()): frozenset()}
    for w in (1, 2):
        for err in itertools.combinations(range(N_DATA), w):
            s = zsyndrome_of(set(err))
            if s not in table:
                table[s] = frozenset(err)
    return table


def decode(dets, table):
    """First-round Z-syndrome lookup; returns predicted logical-Z flips."""
    flips = np.zeros(dets.shape[0], dtype=np.uint8)
    for i, row in enumerate(dets):
        corr = table.get(tuple(int(b) for b in row[:4]), frozenset())
        flips[i] = len(corr & set(LOGICAL_Z)) % 2
    return flips


def exact_rates(p):
    """Enumerate the iid depolarizing layer exactly (9 qubits, X-part only).

    Per qubit: P(X-part flip) = 2p/3 (X or Y).  Logical-Z errors depend only
    on each qubit's X-part, so enumerate the 2^9 X-part patterns.
    """
    q = 2.0 * p / 3.0
    table = build_lookup()
    undec = dec = 0.0
    for bits in itertools.product((0, 1), repeat=N_DATA):
        err = {i for i, b in enumerate(bits) if b}
        prob = q ** len(err) * (1 - q) ** (N_DATA - len(err))
        raw = len(err & set(LOGICAL_Z)) % 2
        corr = table.get(zsyndrome_of(err), frozenset())
        residual = (len(err & set(LOGICAL_Z)) + len(corr & set(LOGICAL_Z))) % 2
        undec += prob * raw
        dec += prob * residual
    return undec, dec


def main():
    check_css()
    p, shots = 0.08, 4000
    c = build_memory(p)
    dets, obs = c.sample_detectors(shots, seed=7)
    n_z1, n_cmp = len(Z_STABS), len(Z_STABS) + len(X_STABS)
    # with perfect measurements the round-2 comparison detectors are silent
    second_round = dets[:, n_z1 : n_z1 + n_cmp]
    assert second_round.sum() == 0, "comparison detectors fired w/o meas noise"
    # ... and the final layer (last ancilla round XOR data-reconstructed
    # checks) is silent too: both sides read the same stabilizer value
    final_layer = dets[:, n_z1 + n_cmp :]
    assert final_layer.sum() == 0

    table = build_lookup()
    pred = decode(dets, table)
    raw_ler = obs[:, 0].mean()
    dec_ler = (obs[:, 0] ^ pred).mean()
    exact_raw, exact_dec = exact_rates(p)
    print(f"d=3 surface code memory-Z, depolarizing p={p}, {shots} shots")
    print(f"  undecoded logical error rate {raw_ler:.4f} (exact {exact_raw:.4f})")
    print(f"  decoded   logical error rate {dec_ler:.4f} (exact {exact_dec:.4f})")
    assert abs(raw_ler - exact_raw) < 0.02
    assert abs(dec_ler - exact_dec) < 0.015
    assert dec_ler < 0.5 * raw_ler, "decoding must beat raw memory"
    print("OK")


if __name__ == "__main__":
    main()
