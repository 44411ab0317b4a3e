"""Randomized cross-simulator property tests (reference test strategy §4).

Every engine simulating the same random circuit must agree: dense Circuit
is the oracle; StabilizerCircuit (Clifford subsets), MPSCircuit (exact bond
budget), DMCircuit (pure-state evolution), QuditCircuit (d=2), U1Circuit
(number-conserving subsets), and QIR replay across engines are checked
against it.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

CLIFFORD1 = ["h", "s", "sd", "x", "y", "z", "sx"]
CLIFFORD2 = ["cnot", "cz", "cy", "swap", "iswap"]


def random_clifford(c, n, depth, rng):
    for _ in range(depth):
        if rng.random() < 0.5:
            getattr(c, CLIFFORD1[rng.integers(len(CLIFFORD1))])(int(rng.integers(n)))
        else:
            q1, q2 = map(int, rng.choice(n, 2, replace=False))
            getattr(c, CLIFFORD2[rng.integers(len(CLIFFORD2))])(q1, q2)
    return c


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stabilizer_matches_dense_on_random_clifford(seed):
    n, depth = 6, 40
    rng = np.random.default_rng(seed)
    ops = []
    c_dense = tc.Circuit(n)
    c_stab = tc.StabilizerCircuit(n)
    for _ in range(depth):
        if rng.random() < 0.5:
            g = CLIFFORD1[rng.integers(len(CLIFFORD1))]
            q = int(rng.integers(n))
            getattr(c_dense, g)(q)
            getattr(c_stab, g)(q)
        else:
            g = CLIFFORD2[rng.integers(len(CLIFFORD2))]
            q1, q2 = map(int, rng.choice(n, 2, replace=False))
            getattr(c_dense, g)(q1, q2)
            getattr(c_stab, g)(q1, q2)
    for _ in range(15):
        codes = rng.integers(0, 4, size=n)
        kw = {
            "x": [i for i, v in enumerate(codes) if v == 1],
            "y": [i for i, v in enumerate(codes) if v == 2],
            "z": [i for i, v in enumerate(codes) if v == 3],
        }
        ev_d = float(np.real(np.asarray(c_dense.expectation_ps(**kw))))
        ev_s = float(np.asarray(c_stab.expectation_ps(**kw)))
        np.testing.assert_allclose(ev_d, ev_s, atol=1e-5)


@pytest.mark.parametrize("seed", [3, 4])
def test_mps_exact_budget_matches_dense(seed):
    n, depth = 6, 14
    rng = np.random.default_rng(seed)
    c_dense = tc.Circuit(n)
    c_mps = tc.MPSCircuit(n)
    for _ in range(depth):
        r = rng.random()
        if r < 0.4:
            q = int(rng.integers(n))
            th = float(rng.normal())
            c_dense.rx(q, theta=th)
            c_mps.rx(q, theta=th)
        elif r < 0.7:
            q = int(rng.integers(n - 1))
            th = float(rng.normal())
            c_dense.rzz(q, q + 1, theta=th)
            c_mps.rzz(q, q + 1, theta=th)
        else:
            q = int(rng.integers(n - 1))
            c_dense.cnot(q, q + 1)
            c_mps.cnot(q, q + 1)
    np.testing.assert_allclose(
        np.asarray(c_mps.wavefunction()).reshape(-1),
        np.asarray(c_dense.state()),
        atol=1e-5,
    )


@pytest.mark.parametrize("seed", [5])
def test_dm_pure_matches_dense(seed):
    n, depth = 5, 12
    rng = np.random.default_rng(seed)
    c = tc.Circuit(n)
    dm = tc.DMCircuit(n)
    for _ in range(depth):
        q = int(rng.integers(n))
        th = float(rng.normal())
        c.ry(q, theta=th)
        dm.ry(q, theta=th)
        if q < n - 1:
            c.cnot(q, q + 1)
            dm.cnot(q, q + 1)
    psi = np.asarray(c.state())
    rho = np.asarray(dm.densitymatrix())
    np.testing.assert_allclose(rho, np.outer(psi, psi.conj()), atol=1e-5)


def test_qudit_d2_matches_circuit():
    n = 4
    rng = np.random.default_rng(7)
    c = tc.Circuit(n)
    q = tc.QuditCircuit(n, dim=2)
    for _ in range(10):
        i = int(rng.integers(n))
        th = float(rng.normal())
        c.rx(i, theta=th)
        q.rx(i, theta=th)
        j = int(rng.integers(n - 1))
        c.cnot(j, j + 1)
        q.csum(j, j + 1)  # csum at d=2 == cnot
    np.testing.assert_allclose(np.asarray(q.state()), np.asarray(c.state()), atol=1e-5)


def test_qir_replay_across_engines():
    rng = np.random.default_rng(11)
    c = tc.Circuit(5)
    random_clifford(c, 5, 20, rng)
    qir = c.to_qir()
    # dense -> dense replay
    c2 = tc.Circuit.from_qir(qir, {"nqubits": 5})
    np.testing.assert_allclose(np.asarray(c2.state()), np.asarray(c.state()), atol=1e-6)
    # dense -> DM replay
    dm = tc.DMCircuit(5)
    dm.append_from_qir([dict(x) for x in qir])
    psi = np.asarray(c.state())
    np.testing.assert_allclose(
        np.asarray(dm.densitymatrix()), np.outer(psi, psi.conj()), atol=1e-5
    )
    # dense -> stabilizer replay (all gates Clifford by construction)
    st = tc.StabilizerCircuit(5)
    for item in qir:
        getattr(st, item["name"])(*item["index"])
    for i in range(5):
        ev_d = float(np.real(np.asarray(c.expectation_ps(z=[i]))))
        ev_s = float(np.asarray(st.expectation_ps(z=[i])))
        np.testing.assert_allclose(ev_d, ev_s, atol=1e-5)


def test_u1_matches_dense_on_conserving_circuit():
    n, k = 6, 3
    rng = np.random.default_rng(13)
    c = tc.Circuit(n)
    for q in range(0, n, 2):
        c.x(q)
    u1 = tc.U1Circuit(n, filled=[0, 2, 4])
    for _ in range(8):
        i = int(rng.integers(n - 1))
        th = float(rng.normal())
        c.iswap(i, i + 1)
        u1.iswap(i, i + 1)
        c.rzz(i, i + 1, theta=th)
        u1.rzz(i, i + 1, theta=th)
    for i in range(n):
        np.testing.assert_allclose(
            float(np.real(np.asarray(u1.expectation_ps(z=[i])))),
            float(np.real(np.asarray(c.expectation_ps(z=[i])))),
            atol=1e-5,
        )


def test_inverse_stabilizer_and_qudit():
    rng = np.random.default_rng(9)
    st = tc.StabilizerCircuit(4)
    random_clifford(st, 4, 30, rng)
    inv = st.inverse()
    comb = tc.StabilizerCircuit(4)
    for item in st.to_qir():
        getattr(comb, item["name"])(*item["index"])
    for item in inv.to_qir():
        getattr(comb, item["name"])(*item["index"])
    assert all(float(comb.expectation_ps(z=[i])) == 1.0 for i in range(4))

    qc = tc.QuditCircuit(2, dim=3)
    qc.h(0)
    qc.csum(0, 1)
    inv = qc.inverse()
    comb = tc.QuditCircuit(2, dim=3)
    comb.append_from_qir([dict(i) for i in qc.to_qir()])
    comb.append_from_qir([dict(i) for i in inv.to_qir()])
    s = np.asarray(comb.state())
    np.testing.assert_allclose(abs(s[0]), 1.0, atol=1e-5)
