"""C++ bit-packed tableau vs the numpy CHP engine (cross-implementation oracle).

Reference test strategy §4: exact small-system oracles; here every random
Clifford circuit is replayed on both engines and all observables compared.
"""

import numpy as np
import pytest

from tensorcircuit_ng_tpu.core.tableau import Tableau
from tensorcircuit_ng_tpu.core.native_tableau import (
    NativeTableau,
    native_tableau_available,
)

pytestmark = pytest.mark.skipif(
    not native_tableau_available(), reason="no g++ / native lib"
)

GATES1 = ["h", "s", "sd", "x_gate", "y_gate", "z_gate", "sx"]
GATES2 = ["cnot", "cz", "cy", "swap", "iswap"]


def random_pair(n, depth, seed):
    rng = np.random.default_rng(seed)
    a, b = Tableau(n), NativeTableau(n)
    for _ in range(depth):
        if rng.random() < 0.5:
            g = GATES1[rng.integers(len(GATES1))]
            q = int(rng.integers(n))
            getattr(a, g)(q)
            getattr(b, g)(q)
        else:
            g = GATES2[rng.integers(len(GATES2))]
            q1, q2 = rng.choice(n, size=2, replace=False)
            getattr(a, g)(int(q1), int(q2))
            getattr(b, g)(int(q1), int(q2))
    return a, b


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_tableau_planes_match(seed):
    a, b = random_pair(6, 40, seed)
    ax, az, ar = a.stabilizers()
    bx, bz, br = b.stabilizers()
    np.testing.assert_array_equal(ax, bx)
    np.testing.assert_array_equal(az, bz)
    np.testing.assert_array_equal(ar, br)


@pytest.mark.parametrize("seed", [0, 5, 9])
def test_expectations_match(seed):
    n = 6
    a, b = random_pair(n, 30, seed)
    rng = np.random.default_rng(seed + 100)
    for _ in range(20):
        codes = rng.integers(0, 4, size=n)
        xs = [i for i, c in enumerate(codes) if c == 1]
        ys = [i for i, c in enumerate(codes) if c == 2]
        zs = [i for i, c in enumerate(codes) if c == 3]
        assert a.expectation_pauli(xs, zs, ys) == b.expectation_pauli(xs, zs, ys)


@pytest.mark.parametrize("seed", [0, 7])
def test_measurements_match(seed):
    n = 5
    a, b = random_pair(n, 25, seed)
    rng = np.random.default_rng(seed)
    for q in range(n):
        st = float(rng.random())
        assert a.is_random(q) == b.is_random(q)
        assert a.measure(q, status=st) == b.measure(q, status=st)
    # post-measurement states identical
    ax, az, ar = a.stabilizers()
    bx, bz, br = b.stabilizers()
    np.testing.assert_array_equal(ax, bx)
    np.testing.assert_array_equal(az, bz)
    np.testing.assert_array_equal(ar, br)


def test_entropy_matches():
    for seed in range(3):
        a, b = random_pair(8, 50, seed)
        for region in ([0, 1], [0, 1, 2, 3], [2, 5, 7]):
            assert abs(a.entanglement_entropy(region) - b.entanglement_entropy(region)) < 1e-9


def test_native_sampling_distribution():
    # GHZ: outcomes must be all-0 or all-1, ~50/50
    n = 8
    t = NativeTableau(n)
    t.h(0)
    for i in range(n - 1):
        t.cnot(i, i + 1)
    shots = 4000
    out = t.sample(shots, seed=12345)
    rowsum = out.sum(axis=1)
    assert set(np.unique(rowsum)) <= {0, n}
    frac = float(np.mean(rowsum == n))
    assert 0.45 < frac < 0.55
    # sampling must not mutate the tableau
    assert t.expectation_pauli([], [0]) == 0


def test_native_sampling_speed_large_n():
    # the stim-role requirement: hundreds of qubits, thousands of shots
    import time

    n, depth, shots = 200, 400, 200
    rng = np.random.default_rng(3)
    t = NativeTableau(n)
    for _ in range(depth):
        t.h(int(rng.integers(n)))
        q1, q2 = rng.choice(n, size=2, replace=False)
        t.cnot(int(q1), int(q2))
    t0 = time.time()
    out = t.sample(shots, seed=99)
    dt = time.time() - t0
    assert out.shape == (shots, n)
    assert dt < 10.0  # bit-packed engine: typically well under 1s
