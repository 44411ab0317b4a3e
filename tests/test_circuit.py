"""Core Circuit tests: states, expectation, grad/jit/vmap, sampling.

Modeled on reference tests/test_circuit.py: closed-form cross-checks and
statistical assertions.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc


def test_bell_state():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    s = np.asarray(c.state())
    np.testing.assert_allclose(
        s, np.array([1, 0, 0, 1]) / np.sqrt(2), atol=1e-6
    )


def test_ghz_and_amplitude():
    n = 5
    c = tc.Circuit(n)
    c.h(0)
    for i in range(n - 1):
        c.cnot(i, i + 1)
    np.testing.assert_allclose(np.asarray(c.amplitude("0" * n)), 1 / np.sqrt(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.amplitude("1" * n)), 1 / np.sqrt(2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.amplitude("10000")), 0.0, atol=1e-6)


def test_single_qubit_gates_closed_form():
    # rx rotation expectation: <Z> = cos(theta)
    theta = 0.37
    c = tc.Circuit(1)
    c.rx(0, theta=theta)
    z = np.asarray(c.expectation_ps(z=[0]))
    np.testing.assert_allclose(np.real(z), np.cos(theta), atol=1e-6)
    # <Y> = -sin(theta)
    y = np.asarray(c.expectation_ps(y=[0]))
    np.testing.assert_allclose(np.real(y), -np.sin(theta), atol=1e-6)


def test_gate_matrix_values():
    g = tc.gates.h()
    np.testing.assert_allclose(
        np.asarray(g.matrix()), np.array([[1, 1], [1, -1]]) / np.sqrt(2), atol=1e-6
    )
    rz = tc.gates.rz(theta=np.pi)
    np.testing.assert_allclose(
        np.abs(np.asarray(rz.matrix())), np.eye(2), atol=1e-6
    )


def test_exp1_gate():
    # exp1 with ZZ generator equals rzz-like evolution
    theta = 0.5
    zz = np.kron(np.diag([1, -1]), np.diag([1, -1]))
    c = tc.Circuit(2)
    c.h(0)
    c.h(1)
    c.exp1(0, 1, theta=theta, unitary=zz)
    c2 = tc.Circuit(2)
    c2.h(0)
    c2.h(1)
    c2.rzz(0, 1, theta=2 * theta)
    np.testing.assert_allclose(np.asarray(c.state()), np.asarray(c2.state()), atol=1e-5)


def test_expectation_two_qubit():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    zz = np.asarray(c.expectation_ps(z=[0, 1]))
    np.testing.assert_allclose(np.real(zz), 1.0, atol=1e-6)
    xx = np.asarray(c.expectation_ps(x=[0, 1]))
    np.testing.assert_allclose(np.real(xx), 1.0, atol=1e-6)
    zi = np.asarray(c.expectation_ps(z=[0]))
    np.testing.assert_allclose(np.real(zi), 0.0, atol=1e-6)


def test_expectation_general_ops():
    c = tc.Circuit(2)
    c.h(0)
    val = c.expectation((tc.gates.z(), [0]))
    np.testing.assert_allclose(np.real(np.asarray(val)), 0.0, atol=1e-6)
    val2 = c.expectation((tc.gates.x(), [0]), (tc.gates.z(), [1]))
    np.testing.assert_allclose(np.real(np.asarray(val2)), 1.0, atol=1e-6)


def tfim_energy(c, n, j=1.0, h=-1.0):
    e = 0.0
    for i in range(n):
        e += h * c.expectation_ps(x=[i])
    for i in range(n - 1):
        e += j * c.expectation_ps(z=[i, i + 1])
    return jnp.real(e)


def build_vqe_circuit(n, nlayers, params):
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for l in range(nlayers):
        for i in range(n - 1):
            c.rzz(i, i + 1, theta=params[2 * l, i])
        for i in range(n):
            c.rx(i, theta=params[2 * l + 1, i])
    return c


def test_vqe_value_and_grad_jit():
    n, nlayers = 6, 2

    def loss(params):
        c = build_vqe_circuit(n, nlayers, params)
        return tfim_energy(c, n)

    params = jnp.asarray(np.random.default_rng(42).normal(size=(2 * nlayers, n)), dtype=jnp.float32)
    vg = jax.jit(jax.value_and_grad(loss))
    v1, g1 = vg(params)
    assert np.isfinite(float(v1))
    # finite-difference check of one gradient entry
    eps = 1e-3
    dp = np.zeros((2 * nlayers, n), dtype=np.float32)
    dp[0, 0] = eps
    v_plus = loss(params + dp)
    v_minus = loss(params - dp)
    fd = (float(v_plus) - float(v_minus)) / (2 * eps)
    np.testing.assert_allclose(fd, float(np.asarray(g1)[0, 0]), atol=1e-2)


def test_vmap_over_params():
    n = 4

    def loss(params):
        c = tc.Circuit(n)
        for i in range(n):
            c.rx(i, theta=params[i])
        return jnp.real(c.expectation_ps(z=[0]))

    batch = jnp.asarray(np.random.default_rng(0).normal(size=(7, n)), dtype=jnp.float32)
    vals = jax.vmap(loss)(batch)
    expected = np.cos(np.asarray(batch)[:, 0])
    np.testing.assert_allclose(np.asarray(vals), expected, atol=1e-5)


@pytest.mark.slow  # sibling: test_timeevol_experimental vvag edges + vqe_value_and_grad_jit
def test_vvag():
    n = 4
    K = tc.backend

    def loss(params, x):
        c = tc.Circuit(n)
        for i in range(n):
            c.rx(i, theta=params[i] + x[i])
        return jnp.real(c.expectation_ps(z=[0]))

    vvag = K.vectorized_value_and_grad(loss, argnums=0, vectorized_argnums=1)
    params = jnp.zeros((n,), dtype=jnp.float32)
    xs = jnp.asarray(np.random.default_rng(1).normal(size=(5, n)), dtype=jnp.float32)
    vals, grads = vvag(params, xs)
    assert vals.shape == (5,)
    assert grads.shape == (n,)
    # grad wrt params[0] = sum over batch of -sin(x)
    np.testing.assert_allclose(
        float(grads[0]), float(np.sum(-np.sin(np.asarray(xs)[:, 0]))), atol=1e-4
    )


def test_matrix():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    m = np.asarray(c.matrix())
    psi0 = np.zeros(4)
    psi0[0] = 1
    np.testing.assert_allclose(m @ psi0, np.asarray(c.state()), atol=1e-6)
    # unitarity
    np.testing.assert_allclose(m @ m.conj().T, np.eye(4), atol=1e-5)


def test_inverse():
    c = tc.Circuit(3)
    c.h(0)
    c.rx(1, theta=0.3)
    c.cnot(0, 2)
    cinv = c.inverse()
    ctot = c.copy()
    ctot.append(cinv)
    s = np.asarray(ctot.state())
    expected = np.zeros(8)
    expected[0] = 1
    np.testing.assert_allclose(s, expected, atol=1e-5)


@pytest.mark.slow  # statistical; sampling surfaces covered exactly by refparity + readout tests
def test_sampling_statistics():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    # allow_state path
    res = c.sample(batch=1024, allow_state=True, format="count_vector", status=np.random.default_rng(7).uniform(size=[1024]))
    cv = np.asarray(res)
    assert cv.sum() == 1024
    assert cv[1] == 0 and cv[2] == 0
    assert abs(cv[0] - 512) < 120
    # trajectory path
    res2 = c.sample(batch=64, allow_state=False, format="sample_bin", status=np.random.default_rng(9).uniform(size=[64, 2]))
    arr = np.asarray(res2)
    assert arr.shape == (64, 2)
    assert np.all(arr[:, 0] == arr[:, 1])  # bell correlation


def test_measure_jit():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    r, p = c.measure_jit(0, 1, with_prob=True, status=jnp.asarray([0.3, 0.7]))
    r = np.asarray(r)
    assert r[0] == r[1]
    np.testing.assert_allclose(float(p), 0.5, atol=1e-6)


def test_perfect_sampling_determinism():
    c = tc.Circuit(3)
    c.h(0)
    c.cnot(0, 1)
    c.rx(2, theta=0.8)
    s1, p1 = c.perfect_sampling(status=jnp.asarray([0.1, 0.5, 0.9]))
    s2, p2 = c.perfect_sampling(status=jnp.asarray([0.1, 0.5, 0.9]))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))


def test_gate_broadcast():
    n = 4
    c = tc.Circuit(n)
    c.h(range(n))
    c.cx(range(n - 1), range(1, n))
    assert c.gate_count() == 2 * n - 1
    c2 = tc.Circuit(n)
    for i in range(n):
        c2.h(i)
    for i in range(n - 1):
        c2.cx(i, i + 1)
    np.testing.assert_allclose(np.asarray(c.state()), np.asarray(c2.state()), atol=1e-6)


def test_lightcone_expectation():
    n = 6
    c = tc.Circuit(n)
    for i in range(n):
        c.rx(i, theta=0.2 * (i + 1))
    for i in range(n - 1):
        c.cnot(i, i + 1)
    exact = np.asarray(c.expectation_ps(z=[0]))
    lc = np.asarray(c.expectation((tc.gates.z(), [0]), enable_lightcone=True))
    np.testing.assert_allclose(exact, lc, atol=1e-6)


def test_mid_measurement_postselect():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    c.mid_measurement(0, keep=1)
    s = np.asarray(c.state())
    # unnormalized post-selected state: amplitude 1/sqrt(2) on |11>
    np.testing.assert_allclose(np.abs(s[3]), 1 / np.sqrt(2), atol=1e-6)
    np.testing.assert_allclose(np.abs(s[0]), 0.0, atol=1e-6)


def test_qir_roundtrip():
    c = tc.Circuit(3)
    c.h(0)
    c.rx(1, theta=0.5)
    c.cnot(0, 2)
    qir = c.to_qir()
    c2 = tc.Circuit.from_qir(qir, {"nqubits": 3})
    np.testing.assert_allclose(np.asarray(c.state()), np.asarray(c2.state()), atol=1e-6)


def test_negative_index():
    c = tc.Circuit(3)
    c.x(-1)
    s = np.asarray(c.state())
    assert abs(s[1]) > 0.99  # |001>


def test_gate_count_and_summary():
    c = tc.Circuit(3)
    c.h(0)
    c.h(1)
    c.cnot(0, 1)
    c.rx(2, theta=0.1)
    assert c.gate_count() == 4
    assert c.gate_count(["h"]) == 2
    assert c.gate_count(["cx"]) == 1
    assert c.gate_summary()["h"] == 2


def test_multicz_and_zz_exponential():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.core import statevec as sv
    from tensorcircuit_ng_tpu.ops.gates import multicontrol_matrix

    # multicz == dense multicontrol-Z, and differentiable through params
    def amp(theta):
        c = tc.Circuit(4)
        for i in range(4):
            c.h(i)
        c.rx(1, theta=theta)
        c.multicz(0, 2, 3)
        return jnp.real(c.state()[0])

    g = jax.grad(amp)(0.3)
    fd = (amp(0.3 + 1e-3) - amp(0.3 - 1e-3)) / 2e-3
    np.testing.assert_allclose(float(g), float(fd), atol=1e-3)

    c = tc.Circuit(4)
    for i in range(4):
        c.h(i)
    c.multicz(0, 2, 3)
    c2 = tc.Circuit(4)
    for i in range(4):
        c2.h(i)
    z = np.diag([1.0, -1.0])
    c2.any(0, 2, 3, unitary=multicontrol_matrix(z, [1, 1]), name="ccz")
    np.testing.assert_allclose(np.asarray(c.state()), np.asarray(c2.state()), atol=1e-6)

    # apply_zz_exponential == scipy expm of b*ZZ (non-unitary)
    import scipy.linalg as sl

    psi = np.random.default_rng(0).normal(size=8) + 1j * np.random.default_rng(1).normal(size=8)
    psi = (psi / np.linalg.norm(psi)).astype(np.complex64)
    out = sv.apply_zz_exponential(jnp.asarray(psi), [(0, 2)], jnp.asarray([0.37]))
    zz = np.kron(np.kron(np.diag([1, -1]), np.eye(2)), np.diag([1, -1]))
    expected = sl.expm(0.37 * zz) @ psi
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_inverse_and_matrix_with_fused_items():
    import numpy as np
    import jax.numpy as jnp

    import tensorcircuit_ng_tpu as tc

    c = tc.Circuit(4)
    c.h_layer()
    c.rzz_product([(0, 1), (2, 3)], jnp.asarray([0.3, 0.5]))
    c.rx_layer(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    c.multicz(0, 1, 2)
    inv = c.inverse()
    comb = tc.Circuit(4)
    comb.append_from_qir([dict(i) for i in c.to_qir()])
    comb.append_from_qir([dict(i) for i in inv.to_qir()])
    s = np.asarray(comb.state())
    np.testing.assert_allclose(abs(s[0]), 1.0, atol=1e-5)
    m = np.asarray(c.matrix())
    np.testing.assert_allclose(m @ m.conj().T, np.eye(16), atol=1e-5)


def test_sample_above_dense_cliff_uses_ir_path():
    """sample() above _DENSE_MAX_QUBITS runs IR-based autoregressive
    sampling (no 2^n object) — the scalable perfect_sampling role."""
    from tensorcircuit_ng_tpu.models import basecircuit

    old = basecircuit.BaseCircuit._DENSE_MAX_QUBITS
    basecircuit.BaseCircuit._DENSE_MAX_QUBITS = 4
    try:
        n = 6
        c = tc.Circuit(n)
        c.h(0)
        for i in range(n - 1):
            c.cnot(i, i + 1)
        c.rx(2, theta=0.6)
        status = jnp.asarray(np.random.default_rng(0).uniform(size=(120, n)))
        out = c.sample(batch=120, allow_state=True, format="sample_bin", status=status)
        samples = np.asarray(out)
    finally:
        basecircuit.BaseCircuit._DENSE_MAX_QUBITS = old
    # GHZ backbone: q0 and q5 perfectly correlated despite rx(2) noise leg
    z = 1 - 2 * samples
    np.testing.assert_allclose(np.mean(z[:, 0] * z[:, 5]), 1.0, atol=1e-9)
    assert abs(np.mean(samples[:, 0] == 0) - 0.5) < 0.15


def test_sample_large_n_readout_error_and_generator():
    """The above-the-cliff branch honors readout_error (stochastic per-bit
    confusion) and random_generator (regression: both were silently ignored)."""
    from tensorcircuit_ng_tpu.models import basecircuit

    old = basecircuit.BaseCircuit._DENSE_MAX_QUBITS
    basecircuit.BaseCircuit._DENSE_MAX_QUBITS = 3
    try:
        n = 5
        c = tc.Circuit(n)  # |00000>: any 1 observed must come from readout error
        err = jnp.asarray([[0.7, 1.0]] * n)  # P(0|0)=0.7 -> ~30% flips 0->1
        status = jnp.asarray(np.random.default_rng(1).uniform(size=(200, n)))
        out = c.sample(batch=200, format="sample_bin", status=status, readout_error=err)
        flips = float(np.mean(np.asarray(out)))
        assert 0.2 < flips < 0.4, flips
        # without readout error all-zero; generator supplies the status
        g = jax.random.PRNGKey(3) if hasattr(jax.random, "PRNGKey") else None
        out2 = c.sample(batch=8, format="sample_bin", random_generator=g)
        assert np.all(np.asarray(out2) == 0)
    finally:
        basecircuit.BaseCircuit._DENSE_MAX_QUBITS = old
