"""NoiseConf dispatch depth: conditions, readout error, MC-vs-exact agreement."""

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import noisemodel as nm
from tensorcircuit_ng_tpu.ops import channels as CH


def build(c):
    c.h(0)
    c.cnot(0, 1)
    c.rx(1, theta=0.4)
    return c


def test_noise_conf_conditions_and_counts():
    conf = nm.NoiseConf()
    dep = CH.depolarizingchannel(0.01, 0.01, 0.01)
    conf.add_noise("h", [dep])
    conf.add_noise_by_condition(lambda item: len(item["index"]) == 2, [dep])
    c = build(tc.Circuit(2))
    # h -> 1 status site; 1-qubit dep on the 2-qubit cnot broadcasts -> 2
    # sites; the count equals what the MC apply loop consumes
    assert nm.channel_count(c, conf) == 3
    assert nm.channel_count(c, conf) == conf.channel_count(c) == nm._mc_channel_count(c, conf)


def test_mc_trajectories_converge_to_exact_dm():
    conf = nm.NoiseConf()
    dep = CH.depolarizingchannel(0.02, 0.01, 0.015)
    conf.add_noise("rx", [dep])
    conf.add_noise("cnot", [dep])

    dmc = nm.circuit_with_noise(build(tc.DMCircuit(2)), conf)
    exact = float(np.real(np.asarray(dmc.expectation_ps(z=[0, 1]))))

    nmc = 1200  # statistical: atol widened accordingly (suite budget)
    c = build(tc.Circuit(2))
    num = nm._mc_channel_count(c, conf)
    assert num == 3  # rx on one qubit + cnot noised on both qubits
    status = jnp.asarray(
        np.random.default_rng(0).uniform(size=(nmc, num)), jnp.float32
    )
    mc = float(
        nm.expectation_noisfy(
            c, (tc.gates.z(), [0]), (tc.gates.z(), [1]),
            noise_conf=conf, status=status,
        )
    )
    np.testing.assert_allclose(mc, exact, atol=0.08)


def test_readout_error_in_sampling():
    c = tc.Circuit(1)
    c.x(0)
    # ideal: always "1"; with 20% 1->0 readout flip: ~80% ones
    res = c.sample(
        batch=1500,
        allow_state=True,
        readout_error=[[1.0, 0.8]],  # p(correct | 0), p(correct | 1)
        status=jnp.asarray(np.random.default_rng(1).uniform(size=(1500,))),
        format="sample_bin",
    )
    ones = float(np.asarray(res).mean())
    assert abs(ones - 0.8) < 0.03
