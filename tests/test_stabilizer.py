"""StabilizerCircuit vs dense statevector cross-checks (reference strategy)."""

import numpy as np
import pytest

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.models.stabilizercircuit import StabilizerCircuit


def random_clifford_ops(seed, n, depth=20):
    rng = np.random.default_rng(seed)
    ops = []
    names1 = ["h", "x", "y", "z", "s", "sd", "sx"]
    names2 = ["cnot", "cz", "swap", "cy", "iswap"]
    for _ in range(depth):
        if rng.uniform() < 0.5:
            ops.append((rng.choice(names1), (int(rng.integers(n)),)))
        else:
            a, b = rng.choice(n, size=2, replace=False)
            ops.append((rng.choice(names2), (int(a), int(b))))
    return ops


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_stabilizer_vs_statevector_expectation(seed):
    n = 4
    ops = random_clifford_ops(seed, n)
    sc = StabilizerCircuit(n)
    dc = tc.Circuit(n)
    for name, idx in ops:
        getattr(sc, name)(*idx)
        getattr(dc, name)(*idx)
    rng = np.random.default_rng(seed + 100)
    for _ in range(10):
        ps = rng.integers(0, 4, size=n)
        v_stab = float(sc.expectation_ps(ps=list(ps)))
        v_dense = float(np.real(np.asarray(dc.expectation_ps(ps=list(ps)))))
        np.testing.assert_allclose(v_stab, v_dense, atol=1e-5), (ps,)


def test_stabilizer_state_matches_dense():
    n = 3
    sc = StabilizerCircuit(n)
    dc = tc.Circuit(n)
    for c in (sc, dc):
        c.h(0)
        c.cnot(0, 1)
        c.s(1)
        c.cz(1, 2)
    np.testing.assert_allclose(
        np.asarray(sc.state()), np.asarray(dc.state()), atol=1e-6
    )


def test_stabilizer_measurement_ghz():
    n = 5
    sc = StabilizerCircuit(n)
    sc.h(0)
    for i in range(n - 1):
        sc.cnot(i, i + 1)
    res, p = sc.measure(*range(n), with_prob=True, status=[0.7] * n)
    res = np.asarray(res)
    assert np.all(res == res[0])  # GHZ correlations
    np.testing.assert_allclose(p, 0.5, atol=1e-9)
    # deterministic after the first qubit
    res2, _ = sc.measure(*range(n), with_prob=True, status=[0.2] * n)
    assert np.all(np.asarray(res2) == np.asarray(res2)[0])


def test_stabilizer_sampling_statistics():
    n = 2
    sc = StabilizerCircuit(n)
    sc.h(0)
    sc.cnot(0, 1)
    rng = np.random.default_rng(0)
    cv = sc.sample(batch=200, format="count_vector", status=rng.uniform(size=(200, 2)))
    cv = np.asarray(cv)
    assert cv[1] == 0 and cv[2] == 0
    assert abs(int(cv[0]) - 100) < 50


def test_stabilizer_entropy():
    n = 4
    sc = StabilizerCircuit(n)
    sc.h(0)
    sc.cnot(0, 1)
    np.testing.assert_allclose(sc.entanglement_entropy([0]), np.log(2), atol=1e-9)
    np.testing.assert_allclose(sc.entanglement_entropy([2]), 0.0, atol=1e-9)
    sc.h(2)
    sc.cnot(2, 3)
    np.testing.assert_allclose(sc.entanglement_entropy([0, 2]), 2 * np.log(2), atol=1e-9)


def test_cond_measurement_collapse():
    sc = StabilizerCircuit(2)
    sc.h(0)
    out = sc.cond_measurement(0, status=0.9)
    sc.cnot(0, 1)
    res, _ = sc.measure(0, 1, status=[0.3, 0.3])
    assert int(res[0]) == out
    assert int(res[1]) == out


def test_non_clifford_raises():
    sc = StabilizerCircuit(2)
    with pytest.raises(ValueError):
        sc.rx(0, theta=0.3)
    with pytest.raises(ValueError):
        sc.toffoli(0, 1)


def test_detector_sampling_repetition_code():
    """stim-style QEC program: noise + parity checks + detectors (MC rates)."""
    import numpy as np
    from tensorcircuit_ng_tpu import translation as tr

    prog = """
    R 0 1 2 3 4
    X_ERROR(0.1) 0 2 4
    CX 0 1 2 1
    CX 2 3 4 3
    M 1 3
    DETECTOR rec[-2]
    DETECTOR rec[-1]
    M 0 2 4
    OBSERVABLE_INCLUDE(0) rec[-3]
    """
    c = tr.stim2tc(prog)
    dets, obs = c.sample_detectors(4000, seed=7)
    assert dets.shape == (4000, 2)
    # each detector fires iff exactly one of its two data qubits had an X
    # error: p = 2 * 0.1 * 0.9 = 0.18
    assert abs(float(dets[:, 0].mean()) - 0.18) < 0.03
    assert abs(float(dets[:, 1].mean()) - 0.18) < 0.03
    assert abs(float(obs[:, 0].mean()) - 0.1) < 0.02


def test_detector_sampling_instructions_api():
    import numpy as np
    import tensorcircuit_ng_tpu as tc

    c = tc.StabilizerCircuit(2)
    c.h(0)
    c.cnot(0, 1)
    c.depolarize2(0, 1, p=0.0)
    c.measure_instruction(0, 1)
    c.detector(-1, -2)  # Bell pair: ZZ parity always even
    dets, _ = c.sample_detectors(500, seed=1)
    assert dets.shape == (500, 1)
    assert float(dets.mean()) == 0.0
    # with z_error on one arm the parity detector stays silent (Z commutes
    # with Z measurement) but x_error flips it half the... exactly p
    c2 = tc.StabilizerCircuit(2)
    c2.h(0)
    c2.cnot(0, 1)
    c2.x_error(0, p=0.25)
    c2.measure_instruction(0, 1)
    c2.detector(-1, -2)
    dets2, _ = c2.sample_detectors(6000, seed=3)
    assert abs(float(dets2.mean()) - 0.25) < 0.02
