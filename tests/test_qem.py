"""Quantum error mitigation: ZNE, DD scheduling, randomized compiling.

Counterpart of reference ``tests/test_qem.py`` (which exercises mitiq);
ours is self-contained: noisy executors are DMCircuit replays with
depolarizing noise after every two-qubit gate.
"""

import numpy as np
import pytest

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.results import qem


def noisy_executor(p=0.01, obs=("z", (0,))):
    """Executor: replay circuit on DMCircuit with depolarizing after 2q gates."""

    def run(c):
        dm = tc.DMCircuit(c._nqubits)
        for item in c.to_qir():
            dm._apply_qir_item(dict(item))
            if len(item["index"]) == 2:
                for q in item["index"]:
                    dm.depolarizing(q, px=p / 3, py=p / 3, pz=p / 3)
        kind, wires = obs
        return float(np.real(np.asarray(dm.expectation_ps(**{kind: list(wires)}))))

    return run


def bell_pair():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    return c


def test_fold_global_preserves_unitary():
    c = bell_pair()
    for scale in (1.0, 3.0, 5.0):
        cf = qem.fold_global(c, scale)
        np.testing.assert_allclose(
            np.asarray(cf.state()), np.asarray(c.state()), atol=1e-5
        )
        assert len(cf.to_qir()) == int(scale) * len(c.to_qir())


def test_fold_random_preserves_unitary():
    c = bell_pair()
    cf = qem.fold_gates_at_random(c, 2.2, seed=4)
    np.testing.assert_allclose(np.asarray(cf.state()), np.asarray(c.state()), atol=1e-5)
    assert len(cf.to_qir()) > len(c.to_qir())


def test_zne_improves_noisy_expectation():
    c = bell_pair()
    exact = 0.0  # <Z0> on Bell state
    # use ZZ observable instead: <Z0 Z1> = 1 ideally, depolarizing shrinks it
    ex = noisy_executor(p=0.03, obs=("z", (0, 1)))
    noisy = ex(c)
    mitigated = qem.apply_zne(
        c, ex, factory=qem.RichardsonFactory((1.0, 3.0, 5.0)),
        scale_noise=qem.fold_global,
    )
    # noise does not commute through the folds, so ZNE improves (~4x here)
    # but is not exact: 0.078 noisy error -> ~0.02 mitigated
    assert abs(mitigated - 1.0) < 0.5 * abs(noisy - 1.0)
    assert abs(mitigated - 1.0) < 0.03


def test_zne_factories():
    scales = [1.0, 2.0, 3.0]
    values = [1.0 - 0.1 * s for s in scales]
    assert abs(qem.LinearFactory(scales).extrapolate(scales, values) - 1.0) < 1e-9
    assert abs(qem.RichardsonFactory(scales).extrapolate(scales, values) - 1.0) < 1e-7
    assert abs(qem.PolyFactory(scales, order=1).extrapolate(scales, values) - 1.0) < 1e-9


def test_dd_insertion_and_semantics():
    # qubit 0 idles between two gates; DD should fill with X X (identity net)
    c = tc.Circuit(2)
    c.h(0)
    c.h(1)
    c.s(1)
    c.t(1)
    c.cnot(0, 1)
    cdd = qem.add_dd(c, qem.dd_option.rules.xx)
    names = [d.get("name") for d in cdd.to_qir()]
    assert names.count("x") >= 2
    np.testing.assert_allclose(
        np.abs(np.asarray(cdd.state())), np.abs(np.asarray(c.state())), atol=1e-5
    )
    val = qem.apply_dd(
        c, noisy_executor(p=0.0, obs=("z", (0, 1))), rule=["X", "X"]
    )
    exact = noisy_executor(p=0.0, obs=("z", (0, 1)))(c)
    np.testing.assert_allclose(val, exact, atol=1e-5)


def test_apply_dd_count_output():
    c = bell_pair()

    def count_exec(cc):
        return {"00": 50, "11": 50}

    res = qem.apply_dd(c, count_exec, rule=["X", "X"], num_trials=2, iscount=True)
    assert res == {"00": 50.0, "11": 50.0}


def test_rc_candidates_cnot():
    cand = qem.rc_candidates(tc.gates.cnot())
    # CNOT twirling group has 16 Pauli sandwiches
    assert len(cand) == 16
    assert (0, 0, 0, 0) in cand


def test_rc_circuit_preserves_state_up_to_global_phase():
    c = bell_pair()
    for _ in range(5):
        crc = qem.rc_circuit(c)
        s0 = np.asarray(c.state())
        s1 = np.asarray(crc.state())
        fid = abs(np.vdot(s0, s1))
        np.testing.assert_allclose(fid, 1.0, atol=1e-5)


def test_apply_rc_mean():
    c = bell_pair()
    ex = noisy_executor(p=0.0, obs=("z", (0, 1)))
    val, circuits = qem.apply_rc(c, ex, num_to_average=4, simplify=True)
    np.testing.assert_allclose(val, 1.0, atol=1e-5)
    assert len(circuits) == 4


@pytest.mark.slow  # QEM benchmark builders; mitigation math stays in the fast gate
def test_benchmark_circuits():
    c, ideal = qem.ghz_circuit(4)
    p = np.abs(np.asarray(c.state())) ** 2
    np.testing.assert_allclose(p[0], 0.5, atol=1e-6)
    c, ideal = qem.w_circuit(5)
    p = np.abs(np.asarray(c.state())) ** 2
    for b, v in ideal.items():
        np.testing.assert_allclose(p[int(b, 2)], v, atol=1e-6)
    c, ideal = qem.rb_circuit(1, 20, seed=3)
    p = np.abs(np.asarray(c.state())) ** 2
    np.testing.assert_allclose(p[0], 1.0, atol=1e-5)
    c, ideal = qem.mirror_circuit(4, 0.6, [(0, 1), (1, 2)], seed=7)
    p = np.abs(np.asarray(c.state())) ** 2
    np.testing.assert_allclose(p[int(list(ideal)[0], 2)], 1.0, atol=1e-5)
    c = qem.QAOA_circuit([(0, 1), (1, 2)], [1.0, 0.5], np.ones((2, 2)) * 0.3)
    assert c._nqubits == 3
