"""DMCircuit, channels, and noise-model tests.

Mirrors reference tests/test_dmcircuit.py and test_noisemodel.py strategy:
DM-exact vs Monte-Carlo-trajectory consistency, CPTP checks, closed forms.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.ops import channels


def test_channels_cptp():
    for kraus in [
        channels.depolarizingchannel(0.1, 0.1, 0.1),
        channels.amplitudedampingchannel(0.3, 0.8),
        channels.phasedampingchannel(0.2),
        channels.resetchannel(),
        channels.thermalrelaxationchannel(300, 400, 100, "AUTO", 0.1),
        channels.thermalrelaxationchannel(300, 250, 100, "ByKraus", 0.0),
        channels.generaldepolarizingchannel(0.02, 2),
    ]:
        channels.kraus_identity_check(kraus)


def test_rep_transform_roundtrip():
    kraus = channels.amplitudedampingchannel(0.25, 0.9)
    sup = channels.kraus_to_super(kraus)
    choi = channels.kraus_to_choi(kraus)
    np.testing.assert_allclose(
        np.asarray(channels.super_to_choi(sup)), np.asarray(choi), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(channels.choi_to_super(choi)), np.asarray(sup), atol=1e-6
    )
    kraus2 = channels.choi_to_kraus(choi)
    sup2 = channels.kraus_to_super(kraus2)
    np.testing.assert_allclose(np.asarray(sup2), np.asarray(sup), atol=1e-5)


def test_super_action_convention():
    # apply channel via superoperator on vec(rho) row-major == direct kraus sum
    kraus = channels.amplitudedampingchannel(0.3, 1.0)
    rho = np.array([[0.25, 0.1 - 0.05j], [0.1 + 0.05j, 0.75]], dtype=complex)
    direct = sum(
        np.asarray(k.matrix()) @ rho @ np.asarray(k.matrix()).conj().T for k in kraus
    )
    sup = np.asarray(channels.kraus_to_super(kraus))
    via_super = (sup @ rho.reshape(-1)).reshape(2, 2)
    np.testing.assert_allclose(via_super, direct, atol=1e-6)


def test_dmcircuit_pure_matches_circuit():
    def build(c):
        c.h(0)
        c.rx(1, theta=0.4)
        c.cnot(0, 1)
        return c

    c = build(tc.Circuit(2))
    dm = build(tc.DMCircuit(2))
    rho = np.asarray(dm.densitymatrix())
    psi = np.asarray(c.state())
    np.testing.assert_allclose(rho, np.outer(psi, psi.conj()), atol=1e-6)
    np.testing.assert_allclose(float(np.real(np.asarray(dm.purity()))), 1.0, atol=1e-6)
    for ps in [dict(z=[0]), dict(x=[0, 1]), dict(z=[1], x=[0])]:
        np.testing.assert_allclose(
            np.asarray(dm.expectation_ps(**ps)),
            np.asarray(c.expectation_ps(**ps)),
            atol=1e-6,
        )


def test_dm_exact_depolarizing_closed_form():
    p = 0.2
    dm = tc.DMCircuit(1)
    dm.h(0)
    dm.depolarizing(0, px=p / 3, py=p / 3, pz=p / 3)
    # <X> = (1 - 4p/3) for depolarizing with total p
    x = np.real(np.asarray(dm.expectation_ps(x=[0])))
    np.testing.assert_allclose(x, 1 - 4 * p / 3, atol=1e-6)


def test_mc_vs_dm_consistency():
    px = 0.15

    def make(c):
        c.h(0)
        c.cnot(0, 1)
        c.rx(1, theta=0.5)
        return c

    dm = make(tc.DMCircuit(2))
    dm.depolarizing(1, px=px, py=0.0, pz=0.0)
    exact = np.real(np.asarray(dm.expectation_ps(z=[1])))

    nmc = 2000
    status = np.random.default_rng(3).uniform(size=[nmc])

    def traj(st):
        c = make(tc.Circuit(2))
        c.depolarizing(1, px=px, py=0.0, pz=0.0, status=st)
        return jnp.real(c.expectation_ps(z=[1]))

    vals = jax.vmap(traj)(jnp.asarray(status))
    mc = float(jnp.mean(vals))
    np.testing.assert_allclose(mc, exact, atol=0.05)


def test_general_kraus_amplitude_damping_trajectory():
    gamma = 0.3
    dm = tc.DMCircuit(1)
    dm.h(0)
    dm.amplitudedamping(0, gamma=gamma, p=1.0)
    exact = np.real(np.asarray(dm.expectation_ps(z=[0])))

    nmc = 3000
    status = np.random.default_rng(5).uniform(size=[nmc])

    def traj(st):
        c = tc.Circuit(1)
        c.h(0)
        c.amplitudedamping(0, gamma=gamma, p=1.0, status=st)
        return jnp.real(c.expectation_ps(z=[0]))

    vals = jax.vmap(traj)(jnp.asarray(status))
    np.testing.assert_allclose(float(jnp.mean(vals)), exact, atol=0.05)


def test_noiseconf_expectation_dispatch():
    nc = tc.NoiseConf()
    nc.add_noise("h", channels.depolarizingchannel(0.05, 0.05, 0.05))

    cdm = tc.DMCircuit(1)
    cdm.h(0)
    exact = np.real(
        np.asarray(tc.noisemodel.expectation_noisfy(cdm, (tc.gates.x(), [0]), noise_conf=nc))
    )
    np.testing.assert_allclose(exact, 1 - 4 * 0.15 / 3, atol=1e-6)

    c = tc.Circuit(1)
    c.h(0)
    mc = np.real(
        np.asarray(
            tc.noisemodel.expectation_noisfy(
                c,
                (tc.gates.x(), [0]),
                noise_conf=nc,
                nmc=2000,
                status=jnp.asarray(np.random.default_rng(11).uniform(size=[2000, 1])),
            )
        )
    )
    np.testing.assert_allclose(mc, exact, atol=0.05)


def test_readout_error_sampling():
    c = tc.Circuit(1)  # |0>
    p = c.probability()
    p2 = np.asarray(c.readouterror_bs([[0.9, 0.8]], p))
    np.testing.assert_allclose(p2, [0.9, 0.1], atol=1e-6)


def test_cond_measurement():
    c = tc.Circuit(2)
    c.h(0)
    r = c.cond_measurement(0, status=jnp.asarray(0.9))
    c.cnot(0, 1)
    s = np.asarray(c.state())
    assert int(np.asarray(r)) == 1
    np.testing.assert_allclose(np.abs(s[3]), 1.0, atol=1e-5)


def test_dm_sample():
    dm = tc.DMCircuit(2)
    dm.h(0)
    dm.cnot(0, 1)
    dm.depolarizing(0, px=0.01, py=0.01, pz=0.01)
    r, _ = dm.measure_jit(0, 1, status=jnp.asarray([0.2, 0.6]))
    arr = np.asarray(r)
    assert arr.shape == (2,)


def test_thermal_relaxation_t2_gt_t1():
    kraus = channels.thermalrelaxationchannel(200, 300, 100, "AUTO", 0.0)
    channels.kraus_identity_check(kraus)
    # coherence decays as exp(-t/t2)
    dm = tc.DMCircuit(1)
    dm.h(0)
    dm.thermalrelaxation(0, t1=200, t2=300, time=100, method="AUTO", excitedstatepopulation=0.0)
    x = np.real(np.asarray(dm.expectation_ps(x=[0])))
    np.testing.assert_allclose(x, np.exp(-100 / 300), atol=1e-5)


def _build_noisy_chain(cls, n, theta=0.7):
    c = cls(n)
    for i in range(n):
        c.rx(i, theta=theta)
    for i in range(0, n - 1, 2):
        c.cnot(i, i + 1)
    for i in range(0, n, 2):  # even qubits: enough channels to exercise
        c.depolarizing(i, px=0.02, py=0.01, pz=0.03)  # the superop path,
    for i in range(1, n - 1, 2):  # half the planning cost
        c.cnot(i, i + 1)
    for i in range(1, n, 2):
        c.phasedamping(i, gamma=0.05)
    return c


def test_dmcircuit2_lazy_superop_expectation():
    """DMCircuit2 contracts the doubled network lazily (channels as
    superoperator tensors, light-cone pruned) — reference
    densitymatrix.py:398-430 / channels.py:542 role."""
    build = _build_noisy_chain

    from tensorcircuit_ng_tpu.core import contractor as ctr

    # small n: lazy IR contraction == dense rho for 1- and 2-site observables
    n = 6
    cd = build(tc.DMCircuit, n)
    cl = build(tc.DMCircuit2, n)
    for ops in ([(tc.gates.z(), [2]), (tc.gates.z(), [3])],):
        e1 = complex(np.asarray(cd.expectation(*ops)))
        e2 = complex(np.asarray(ctr.contract_ir(cl.expectation_before(*ops))))
        assert abs(e1 - e2) < 1e-5



@pytest.mark.slow  # 7 s; the small-n lazy parity above guards the path in the gate
def test_dmcircuit2_lazy_superop_wide_lightcone():
    """Wide shallow: 16 qubits, depth 4 with 32 channels — the dense path
    would need a 2^32-element rho; the lazy path is a light-cone
    contraction.  The cone of Z8 Z9 spans qubits 6..11, so an 8-qubit
    window (global 4..11 — even start keeps the cnot pair layers aligned —
    observable at window (4,5)) reproduces it exactly on the dense engine."""
    import time

    build = _build_noisy_chain
    n = 16
    c = build(tc.DMCircuit2, n)
    t0 = time.time()
    e = complex(np.asarray(c.expectation_ps(z=[8, 9])))
    dt = time.time() - t0
    cw = build(tc.DMCircuit, 8)
    ew = complex(np.asarray(cw.expectation_ps(z=[4, 5])))
    np.testing.assert_allclose(e, ew, atol=1e-5)
    assert dt < 60.0
