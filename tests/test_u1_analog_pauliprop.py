"""U1Circuit, AnalogCircuit, and Pauli-propagation tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.models.u1circuit import U1Circuit
from tensorcircuit_ng_tpu.models.analogcircuit import AnalogCircuit
from tensorcircuit_ng_tpu.models.pauliprop import PauliPropagationEngine, pauli_propagation


def test_u1_sector_dim_and_init():
    c = U1Circuit(4, filled=[0, 2])
    assert c.sector_dim == 6
    dense = np.asarray(c.to_dense())
    # |1010> = int 10
    assert abs(dense[0b1010]) > 0.99


def test_u1_diagonal_gates_match_dense():
    n = 4
    u1 = U1Circuit(n, filled=[0, 2])
    dc = tc.Circuit(n)
    dc.x(0)
    dc.x(2)
    for c in (u1, dc):
        c.rz(0, theta=0.3)
        c.rzz(1, 2, theta=0.7)
        c.cz(0, 3)
        c.cphase(2, 3, theta=0.4)
    np.testing.assert_allclose(
        np.asarray(u1.to_dense()), np.asarray(dc.state()), atol=1e-6
    )


def test_u1_swap_iswap_match_dense():
    n = 4
    u1 = U1Circuit(n, filled=[0, 2])
    dc = tc.Circuit(n)
    dc.x(0)
    dc.x(2)
    for c in (u1, dc):
        c.swap(0, 1)
        c.iswap(2, 3)
        c.rzz(0, 2, theta=0.2)
    np.testing.assert_allclose(
        np.asarray(u1.to_dense()), np.asarray(dc.state()), atol=1e-5
    )


def test_u1_number_violation_raises():
    u1 = U1Circuit(3, filled=[0])
    with pytest.raises(ValueError):
        u1.x(1)
    with pytest.raises(ValueError):
        u1.h(0)


def test_u1_rxx_not_conserving_raises():
    u1 = U1Circuit(3, filled=[0])
    with pytest.raises(ValueError):
        u1.rxx(0, 1, theta=0.8)


def test_u1_xy_rotation():
    import scipy.linalg as sl

    n = 3
    theta = 0.8
    xy = np.zeros((4, 4), dtype=complex)
    xy[1, 2] = 1.0
    xy[2, 1] = 1.0
    u = sl.expm(-1j * theta / 2 * xy)
    u1 = U1Circuit(n, filled=[0])
    dc = tc.Circuit(n)
    dc.x(0)
    u1.any(0, 1, unitary=jnp.asarray(u))
    dc.any(0, 1, unitary=jnp.asarray(u))
    np.testing.assert_allclose(
        np.asarray(u1.to_dense()), np.asarray(dc.state()), atol=1e-5
    )
    np.testing.assert_allclose(
        float(np.real(np.asarray(u1.expectation_ps(z=[0])))),
        float(np.real(np.asarray(dc.expectation_ps(z=[0])))),
        atol=1e-5,
    )


def test_u1_entropy_and_sample():
    n = 4
    u1 = U1Circuit(n, filled=[0, 2])
    s = float(np.real(np.asarray(u1.entanglement_entropy([0, 1]))))
    np.testing.assert_allclose(s, 0.0, atol=1e-5)
    res = u1.sample(batch=20, format="count_vector",
                    status=jnp.asarray(np.random.default_rng(0).uniform(size=20)))
    cv = np.asarray(res)
    assert cv[0b1010] == 20


def test_analog_circuit_rabi():
    n = 2
    x = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)

    ac = AnalogCircuit(n)
    ac.h(0)
    ac.add_analog_block(lambda t: 0.5 * jnp.asarray(x), time=0.9, index=[1])
    # equivalent digital circuit: h(0), rx(1, 0.9)
    dc = tc.Circuit(n)
    dc.h(0)
    dc.rx(1, theta=0.9)
    np.testing.assert_allclose(
        np.asarray(ac.state()), np.asarray(dc.state()), atol=1e-4
    )
    # continue with digital gates after the block
    ac.cnot(0, 1)
    dc.cnot(0, 1)
    np.testing.assert_allclose(
        np.asarray(ac.state()), np.asarray(dc.state()), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ac.expectation_ps(z=[1])), np.asarray(dc.expectation_ps(z=[1])), atol=1e-4
    )


def test_analog_global_time_dependent():
    n = 1
    z = np.diag([1.0, -1.0]).astype(complex)

    # H(t) = t * Z: phase = exp(-i Z t^2/2)
    ac = AnalogCircuit(n)
    ac.h(0)
    ac.add_analog_block(lambda t: jnp.asarray(z) * t, time=1.0)
    psi = np.asarray(ac.state())
    expected = np.array([np.exp(-1j * 0.5), np.exp(1j * 0.5)]) / np.sqrt(2)
    np.testing.assert_allclose(psi, expected, atol=1e-4)


def test_pauliprop_matches_dense():
    n = 4
    rng = np.random.default_rng(5)
    c = tc.Circuit(n)
    for i in range(n):
        c.rx(i, theta=float(rng.normal()) * 0.5)
    for i in range(n - 1):
        c.cnot(i, i + 1)
    for i in range(n):
        c.rz(i, theta=float(rng.normal()) * 0.5)
    # weight-2 observable, k=n guarantees exactness
    val = float(np.real(np.asarray(pauli_propagation(c, [3, 0, 0, 3], k=n))))
    exact = float(np.real(np.asarray(c.expectation_ps(z=[0, 3]))))
    np.testing.assert_allclose(val, exact, atol=1e-4)


def test_pauliprop_truncation_runs():
    n = 6
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for i in range(n - 1):
        c.cnot(i, i + 1)
    val = pauli_propagation(c, [1] + [0] * (n - 1), k=2)
    assert np.isfinite(float(val))
