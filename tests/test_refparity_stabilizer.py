"""Behavioral parity tests against reference tests/test_stabilizer.py and
tests/test_backends.py extras."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc


def test_post_select():
    """reference test_stabilizer.py:123."""
    c = tc.StabilizerCircuit(2)
    c.h(0)
    c.s(0)
    c.cx(0, 1)
    c.post_select(1, keep=1)
    np.testing.assert_allclose(float(np.asarray(c.expectation_ps(z=[0]))), -1, atol=1e-5)
    # the dense state reflects the collapse too
    psi = np.asarray(c.state())
    np.testing.assert_allclose(np.abs(psi) ** 2, [0, 0, 0, 1.0], atol=1e-6)


def test_tableau_inputs_roundtrip():
    """reference test_stabilizer.py:206 — inverse tableau initialization."""
    c = tc.StabilizerCircuit(2)
    c.x(1)
    c.s(1)
    it = c.current_inverse_tableau()
    c1 = tc.StabilizerCircuit(2, tableau_inputs=it)
    c1.s(1)
    c1.x(1)
    np.testing.assert_allclose(abs(np.asarray(c1.state())[0]), 1, atol=1e-6)


def test_depolarize_statistics():
    """reference test_stabilizer.py:195 — trajectory depolarizing flips <X>."""
    r = []
    rng = np.random.default_rng(0)
    for k in range(40):
        c = tc.StabilizerCircuit(2)
        c.h(0)
        c.depolarizing(0, 1, p=0.2, status=jnp.asarray(rng.uniform(size=2)))
        c.h(0)
        r.append(float(np.asarray(c.expectation_ps(z=[0]))))
    assert 4 < np.sum(r) < 39


@pytest.mark.slow  # sibling: test_cross_simulator stabilizer-vs-dense + detector tests
def test_tableau_state_matches_replay_up_to_phase():
    """The stabilizer-group state reconstruction (used after collapses /
    tableau inputs) agrees with circuit replay on random Cliffords."""
    rng = np.random.default_rng(1)
    names1 = ["h", "s", "x", "y", "z", "sd"]
    for trial in range(6):
        n = 4
        sc = tc.StabilizerCircuit(n)
        for _ in range(15):
            k = rng.integers(0, 8)
            if k < 6:
                getattr(sc, names1[k])(int(rng.integers(n)))
            else:
                a, b = rng.choice(n, size=2, replace=False)
                (sc.cnot if k == 6 else sc.cz)(int(a), int(b))
        psi_replay = np.asarray(sc.state())
        sc._replayable = False
        psi_tab = np.asarray(sc.state())
        assert abs(np.vdot(psi_replay, psi_tab)) > 1 - 1e-5


def test_cond_measure_state_consistency():
    """After cond_measure the dense state matches the recorded outcome."""
    for s0 in (0.1, 0.9):
        c = tc.StabilizerCircuit(2)
        c.h(0)
        c.cnot(0, 1)
        out = int(c.cond_measure(0, status=s0))
        psi = np.asarray(c.state())
        want = np.zeros(4)
        want[out * 3] = 1.0  # |00> or |11>
        np.testing.assert_allclose(np.abs(psi) ** 2, want, atol=1e-6)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_backend_reshaped_and_special_jv():
    """reference test_backends.py:140,721 — reshaped edge cases, Miller jv."""
    import scipy.special as ss

    K = tc.backend
    r1 = K.reshaped(jnp.arange(27), 3)
    assert r1.shape == (3, 3, 3)
    assert K.reshaped(jnp.asarray([]), 3).shape == (0,)
    mat = jnp.arange(64.0).reshape(8, 8)
    assert K.reshaped(mat, 4).shape == (4, 4, 4)
    f = np.asarray(K.special_jv(20, 10.0, 80))
    np.testing.assert_allclose(f, ss.jv(np.arange(20), 10.0), atol=1e-6)
    # f32 large-recurrence rescaling regression (reference :158)
    f2 = np.asarray(K.special_jv(301, jnp.asarray(273.645, jnp.float32), 549))
    assert np.all(np.isfinite(f2))
    np.testing.assert_allclose(f2, ss.jv(np.arange(301), 273.645), atol=1e-5)
