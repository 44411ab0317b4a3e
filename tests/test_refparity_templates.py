"""Behavioral parity tests against reference tests/test_templates.py and
tests/test_gates.py."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # audit pins -> full CI tier (see module note)

import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu
from tensorcircuit_ng_tpu.ops import gates
from tensorcircuit_ng_tpu.templates import blocks, dataset, measurements


def test_parameterized_local_measurements():
    """reference test_templates.py:30 — per-wire Pauli stack, jittable."""
    c = tc.Circuit(3)
    c.x(0)
    c.cnot(0, 1)
    c.h(-1)
    r = measurements.parameterized_local_measurements(
        c, structures=jnp.asarray([3, 3, 1]), onehot=True
    )
    np.testing.assert_allclose(np.real(np.asarray(r)), [-1, -1, 1], atol=1e-5)

    @jax.jit
    def f(basis):
        c = tc.Circuit(3)
        c.x(0)
        c.cnot(0, 1)
        c.h(-1)
        return measurements.parameterized_local_measurements(
            c, structures=basis, onehot=True
        )

    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray([3, 3, 1]))), [-1, -1, 1], atol=1e-5
    )


def test_bell_pair_block_singlet():
    """reference test_templates.py:62,145 — singlet convention + state_centric."""
    c = tc.Circuit(4)
    c = blocks.Bell_pair_block(c)
    for k in range(6):
        s = np.asarray(
            c.perfect_sampling(
                status=jnp.asarray(np.random.default_rng(k).uniform(size=4))
            )[0]
        )
        assert s[0] != s[1] and s[2] != s[3]
    f = blocks.state_centric(blocks.Bell_pair_block)
    s = np.asarray(f(jnp.asarray(np.array([1.0, 0, 0, 0], np.complex64))))
    np.testing.assert_allclose(s, [0, 0.70710677, -0.70710677, 0], atol=1e-5)


def test_qft_matrix_and_inverse():
    """reference test_templates.py:71 — QFT unitary == DFT matrix; inverse."""
    n = 4
    c = tc.Circuit(n)
    c = blocks.qft(c, *range(n))
    mat = np.asarray(c.quoperator().eval()).reshape(2**n, -1)
    N = 2**n
    ref = np.exp(
        1j * 2 * np.pi * np.arange(N).reshape(-1, 1) * np.arange(N) / N
    ) / np.sqrt(N)
    np.testing.assert_allclose(mat, ref, atol=1e-6)
    c = tc.Circuit(n)
    c = blocks.qft(c, *range(n), inverse=True)
    mat = np.asarray(c.quoperator().eval()).reshape(2**n, -1)
    np.testing.assert_allclose(mat, ref.T.conj(), atol=1e-6)


def test_amplitude_encoding_reference_semantics():
    """reference test_templates.py:156 — non-batch + index gather after norm."""
    batched = jax.vmap(lambda fig: dataset.amplitude_encoding(fig, 3))
    figs = jnp.asarray(np.stack([np.eye(2), np.ones([2, 2])]), jnp.float32)
    states = batched(figs)
    np.testing.assert_allclose(
        np.asarray(states[1]), [0.5, 0.5, 0.5, 0.5, 0, 0, 0, 0], atol=1e-6
    )
    out = dataset.amplitude_encoding(figs[0], 2, jnp.asarray([0, 3, 1, 2], jnp.int32))
    np.testing.assert_allclose(
        np.asarray(out), np.array([1, 1, 0, 0]) / np.sqrt(2), atol=1e-6
    )


def test_operator_expectation_three_forms():
    """reference test_templates.py:192 — dense / sparse / MPO agree."""
    X = np.array([[0, 1], [1, 0.0]])
    mpo = qu.QuOperator.from_local_tensor(X, [2, 2], [0])
    dense = jnp.asarray(np.kron(X, np.eye(2)), jnp.complex64)
    sparse = qu.PauliString2COO([1, 0])
    for h in [dense, sparse, mpo]:

        def f(theta):
            c = tc.Circuit(2)
            c.ry(0, theta=theta)
            c.h(1)
            return jnp.real(measurements.operator_expectation(c, h))

        v, g = jax.jit(jax.value_and_grad(f))(jnp.ones(()))
        np.testing.assert_allclose(float(v), 0.84147, atol=1e-4)
        np.testing.assert_allclose(float(g), 0.54032, atol=1e-4)


def test_gate_ctrl_attribute():
    """reference test_gates.py:127 — controlled() tracks the ctrl pattern."""
    cx = gates.GATES["x"].controlled()
    ccx = cx.controlled()
    assert ccx.n == "ccx"
    assert ccx.ctrl == [1, 1]
    assert cx.ocontrolled().ctrl == [0, 1]
    toffoli = np.asarray(gates.GATES["toffoli"]().matrix())
    np.testing.assert_allclose(np.asarray(ccx().matrix()), toffoli, atol=1e-6)
    # 0-controlled CX via any(): control wire 1 (|0> active), target 2
    ocx = cx.ocontrolled()
    c = tc.Circuit(3)
    c.x(0)
    c.any(1, 0, 2, unitary=ocx().matrix())
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(z=[2]))), -1, atol=1e-5
    )


def test_fsim_and_iswap():
    """reference test_gates.py:77,115 — fsim decomposition and iswap(theta)."""
    th, ph = 0.2, 0.3
    c = tc.Circuit(2)
    c.iswap(0, 1, theta=-th)
    c.cphase(0, 1, theta=-ph)
    m = np.asarray(c.matrix())
    ans = np.array(
        [
            [1, 0, 0, 0],
            [0, 0.95105654, -0.309017j, 0],
            [0, -0.309017j, 0.95105654, 0],
            [0, 0, 0, 0.9553365 - 0.29552022j],
        ]
    )
    np.testing.assert_allclose(m, ans, atol=1e-5)
    t0 = np.asarray(gates.iswap_matrix(theta=0))
    np.testing.assert_allclose(t0.reshape(4, 4), np.eye(4), atol=1e-5)


def test_get_u_parameter_roundtrip():
    """reference test_gates.py:50 — u-gate Euler angles recovered."""
    import scipy.linalg as sl

    rng = np.random.default_rng(0)
    for _ in range(4):
        herm = rng.uniform(size=(2, 2))
        herm = herm + herm.T
        u = sl.expm(1j * herm)
        params = gates.get_u_parameter(u)
        u2 = np.asarray(gates.u_matrix(theta=params[0], phi=params[1], lbd=params[2]))
        u = u / np.exp(1j * np.angle(u[0, 0]))
        np.testing.assert_allclose(u, u2, atol=1e-3)
