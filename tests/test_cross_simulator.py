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


@pytest.mark.slow  # stabilizer parity covered by test_stabilizer + refparity_stabilizer in the gate
@pytest.mark.parametrize("seed", [0])  # seeds 1,2 in the slow sweep
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


@pytest.mark.slow  # 5 s; test_mpscircuit exact-vs-dense covers the engine
@pytest.mark.parametrize("seed", [3])  # seed 4 in the slow sweep
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


# ---------------- round-1 parity batch: misc simulator methods ----------------


def test_circuit_parity_methods():
    np.random.seed(0)
    c = tc.Circuit(2)
    c.h(0); c.cx(0, 1)
    # measure_reference agrees with Bell statistics
    outs = [c.measure_reference(0, 1, with_prob=True) for _ in range(40)]
    assert all(s in ("00", "11") and abs(p - 0.5) < 1e-5 for s, p in outs)
    assert c.is_valid()
    # get_quoperator reproduces the unitary
    qop = c.get_quoperator()
    np.testing.assert_allclose(
        np.asarray(qop.eval_matrix()), np.asarray(c.matrix()), atol=1e-5
    )
    # depolarizing_reference branch selection at fixed status
    c2 = tc.Circuit(1)
    w = c2.depolarizing_reference(0, px=0.2, py=0.3, pz=0.1, status=jnp.asarray(0.25))
    assert int(w) == 1
    assert int(tc.Circuit(1).depolarizing_reference(0, px=0.2, py=0.3, pz=0.1, status=jnp.asarray(0.95))) == 3
    # unitary_kraus2 selects by cdf
    from tensorcircuit_ng_tpu.ops import channels as ch

    c3 = tc.Circuit(1); c3.h(0)
    idx = c3.unitary_kraus2(ch.depolarizingchannel(0.1, 0.05, 0.02), 0, status=jnp.asarray(0.95))
    assert int(idx) == 2
    # replace_mps_inputs
    from tensorcircuit_ng_tpu.models.mpscircuit import MPSCircuit

    mps = MPSCircuit(2); mps.h(0); mps.cx(0, 1)
    c4 = tc.Circuit(2); c4.z(0)
    c4.replace_mps_inputs(mps.tensors)
    np.testing.assert_allclose(
        np.asarray(c4.state()), np.array([1, 0, 0, -1]) / np.sqrt(2), atol=1e-6
    )
    # delayed channel registration
    meth = tc.Circuit.apply_general_kraus_delayed(ch.resetchannel(), name="reset")
    c5 = tc.Circuit(1); c5.x(0)
    meth(c5, 0, status=jnp.asarray(0.1))
    assert abs(np.asarray(c5.state())[0]) > 0.99


def test_dm_and_stabilizer_parity_methods():
    from tensorcircuit_ng_tpu.ops import channels as ch

    dm = tc.DMCircuit(2); dm.h(0); dm.cx(0, 1)
    tc.DMCircuit.check_density_matrix(np.asarray(dm.densitymatrix()))
    with pytest.raises(ValueError):
        tc.DMCircuit.check_density_matrix(np.eye(4))
    assert tc.DMCircuit.check_kraus(ch.resetchannel())
    qop = dm.get_dm_as_quoperator()
    np.testing.assert_allclose(
        np.asarray(qop.eval_matrix()), np.asarray(dm.densitymatrix()), atol=1e-6
    )
    sc = tc.StabilizerCircuit(3)
    sc.h(0); sc.cx(0, 1)
    assert sc.current_simulator() is sc.get_tableau()
    assert "h 0" in sc.current_circuit().lower()
    sc.random_gate(0, 1)  # must not raise nor record
    sc2 = tc.StabilizerCircuit(2)
    sc2.tableau_gate(0, 1, tableau=[("h", (0,)), ("cnot", (0, 1))])
    r = sc2.cond_measure_many(0, 1)
    assert r[0] == r[1]
    # inverse tableau replay runs
    sc3 = tc.StabilizerCircuit(2); sc3.h(0); sc3.cx(0, 1)
    sc3.current_inverse_tableau()


@pytest.mark.slow  # cross-engine audit; the U1 engine has its own fast-gate file
def test_u1_parity_methods():
    u1 = tc.U1Circuit(4, k=2, filled=[0, 2])
    assert abs(float(np.asarray(u1.expectation_z(2))) + 1.0) < 1e-5
    assert abs(float(np.asarray(u1.expectation_z(1))) - 1.0) < 1e-5
    pf = np.asarray(u1.probability_full())
    assert abs(pf.sum() - 1) < 1e-5
    bits, p = u1.measure(0, 2, with_prob=True, status=jnp.asarray([0.3]))
    assert int(bits[0]) == 1 and int(bits[1]) == 1
    rho = np.asarray(u1.reduced_density_matrix(subsystem_to_keep=[0, 1]))
    assert abs(np.trace(rho) - 1) < 1e-5
    blocks = u1.reduced_density_matrix(subsystem_to_keep=[0, 1], return_blocks=True)
    assert abs(sum(np.trace(np.asarray(b)).real for b in blocks) - 1) < 1e-5
    e = float(np.real(np.asarray(u1.expectation_pss([[3, 0, 0, 0], [0, 0, 3, 0]], [0.5, 0.5]))))
    assert abs(e + 1.0) < 1e-5  # (Z0 + Z2)/2 = -1 on |1010>


@pytest.mark.slow  # cross-engine audit; pauliprop covered in its own fast-gate file
def test_pauliprop_parity_methods():
    from tensorcircuit_ng_tpu.models.pauliprop import (
        PauliPropagationEngine,
        SparsePauliPropagationEngine,
    )

    c = tc.Circuit(3)
    c.h(0); c.cx(0, 1); c.rx(2, theta=0.3)
    exact = float(np.real(np.asarray(c.expectation_ps(z=[0, 1]))))
    eng = PauliPropagationEngine(3, k=3)
    assert abs(float(np.asarray(eng.expectation(c, [3, 3, 0]))) - exact) < 1e-5
    sp = SparsePauliPropagationEngine(3)
    assert abs(complex(sp.expectation(c, [3, 3, 0])).real - exact) < 1e-6
    # sparse truncation: k=1 kills the two-body correlator
    sp1 = SparsePauliPropagationEngine(3, k=1)
    val = complex(sp1.expectation(c, [3, 3, 0]))
    assert abs(val) < 1.0  # truncated value differs from exact=1 path
    assert eng.string_to_code([3, 3, 0]) != eng.SINK
    assert np.asarray(eng.get_ptm_1q(np.array([[0, 1], [1, 0]]))).shape == (4, 4)
    assert np.asarray(eng.get_ptm_2q(np.eye(4))).shape == (16, 16)
    traj = np.asarray(eng.compute_expectation_scan([c.to_qir()], [3, 3, 0]))
    assert traj.shape == (2,) and abs(traj[-1] - exact) < 1e-5


def test_noiseconf_channel_count_and_apply_qir():
    from tensorcircuit_ng_tpu.ops import channels as ch
    from tensorcircuit_ng_tpu.noisemodel import NoiseConf, apply_qir_with_noise

    nc = NoiseConf()
    nc.add_noise("h", ch.depolarizingchannel(0.05, 0.05, 0.05))
    cc = tc.Circuit(2)
    cc.h(0); cc.h(1); cc.cx(0, 1)
    assert nc.channel_count(cc) == 2
    c_new = tc.Circuit(2)
    apply_qir_with_noise(c_new, cc.to_qir(), nc, status=jnp.asarray([0.99, 0.99]))
    assert np.asarray(c_new.state()).shape == (4,)


@pytest.mark.slow  # cross-engine audit; analog engine covered in its own fast-gate file
def test_analog_parity_methods():
    from tensorcircuit_ng_tpu.models.analogcircuit import AnalogCircuit

    ac = AnalogCircuit(2)
    ac.h(0)
    assert ac.current_digital_circuit() is ac.digital_circuits[-1]
    zz = np.diag([1.0, -1.0, -1.0, 1.0]).astype(complex)
    ac.add_analog_block(lambda t: zz, 0.3)
    ac.set_solver_options(rtol=1e-8, atol=1e-8)
    p = np.asarray(ac.probability())
    assert abs(p.sum() - 1) < 1e-4
    eff = ac.effective_circuit()
    np.testing.assert_allclose(np.asarray(eff.state()), np.asarray(ac.state()), atol=1e-6)
    bits, _ = ac.measure_jit(0, status=jnp.asarray([0.2]))
    # appended circuit composes onto the last segment
    extra = tc.Circuit(2); extra.x(1)
    ac.append(extra)
    s = np.asarray(ac.state()).reshape(2, 2)
    assert np.abs(s[:, 0]).max() < 1e-6  # qubit 1 flipped to 1


def test_qudit_nqudits_rxx():
    qd = tc.QuditCircuit(2, dim=3)
    assert qd.nqudits == 2
    qd.rxx(0, 1, theta=0.3)
    s = np.asarray(qd.state())
    assert abs(np.linalg.norm(s) - 1) < 1e-5
