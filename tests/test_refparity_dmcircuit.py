"""Behavioral parity tests against reference tests/test_dmcircuit.py scenarios."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.ops import gates


def test_state_inputs():
    """reference test_dmcircuit.py:27 — pure-state inputs into DMCircuit."""
    w = np.zeros(8, np.complex64)
    w[1] = 1.0
    c = tc.DMCircuit(3, inputs=jnp.asarray(w))
    c.cnot(2, 1)
    np.testing.assert_allclose(float(jnp.real(c.expectation_ps(z=[1]))), -1.0, atol=1e-6)
    np.testing.assert_allclose(float(jnp.real(c.expectation_ps(z=[2]))), -1.0, atol=1e-6)
    np.testing.assert_allclose(float(jnp.real(c.expectation_ps(z=[0]))), 1.0, atol=1e-6)

    s2 = np.sqrt(2.0)
    w = np.array([1 / s2, 0, 0, 1.0j / s2], np.complex64)
    c = tc.DMCircuit(2, inputs=jnp.asarray(w))
    c.y(0)
    answer = np.array(
        [[0, 0, 0, 0], [0, 0.5, -0.5j, 0], [0, 0.5j, 0.5, 0], [0, 0, 0, 0]]
    )
    np.testing.assert_allclose(np.asarray(c.densitymatrix()), answer, atol=1e-6)


def test_dm_inputs_and_kraus():
    """reference test_dmcircuit.py:53 — dminputs + manual Kraus application."""
    rho0 = np.array(
        [[0, 0, 0, 0], [0, 0.5, 0, -0.5j], [0, 0, 0, 0], [0, 0.5j, 0, 0.5]],
        np.complex64,
    )
    b1 = np.array([[0, 1.0j], [0, 0]], np.complex64)
    b2 = np.array([[0, 0], [1.0j, 0]], np.complex64)
    ib1 = np.kron(np.eye(2), b1)
    ib2 = np.kron(np.eye(2), b2)
    rho1 = ib1 @ rho0 @ ib1.conj().T + ib2 @ rho0 @ ib2.conj().T
    iy = np.kron(np.eye(2), np.array([[0, -1.0j], [1.0j, 0]]))
    rho2 = iy @ rho1 @ iy.conj().T
    c = tc.DMCircuit(nqubits=2, dminputs=jnp.asarray(rho0))
    c.apply_general_kraus([b1, b2], [(1,)])
    np.testing.assert_allclose(np.asarray(c.densitymatrix()), rho1, atol=1e-4)
    c.y(1)
    np.testing.assert_allclose(np.asarray(c.densitymatrix()), rho2, atol=1e-4)


def test_to_circuit():
    """reference test_dmcircuit.py:267 — strip channels back to a Circuit."""
    c = tc.DMCircuit(2)
    c.x(0)
    c.depolarizing(0, px=0.1, py=0.1, pz=0.1)
    c.cnot(0, 1)
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(z=[1]))), -0.6, atol=1e-5
    )
    c2 = c.to_circuit()
    np.testing.assert_allclose(
        float(jnp.real(c2.expectation_ps(z=[1]))), -1.0, atol=1e-5
    )


def test_dmcircuit_inverse():
    """reference test_dmcircuit.py:281 — inverse drops channels, reverses
    unitaries."""
    c = tc.DMCircuit2(3)
    c.h(0)
    c.rx(1, theta=0.5)
    c.amplitudedamping(1, gamma=0.1, p=0.9)
    c.amplitudedamping(2, gamma=0.1, p=0.9)
    c.rzz(0, 2, theta=-1.0)
    ci = c.inverse()
    r = float(jnp.real(ci.expectation_ps(z=[2])))
    c2 = tc.DMCircuit2(3)
    c2.rzz(0, 2, theta=1.0)
    c2.rx(1, theta=-0.5)
    c2.h(0)
    r2 = float(jnp.real(c2.expectation_ps(z=[2])))
    np.testing.assert_allclose(r, r2, atol=1e-5)


def test_dm_amplitude():
    """reference test_dmcircuit.py:401 — DM 'amplitude' is the diagonal
    probability <s|rho|s>, jittable with a tensor bitstring."""
    c = tc.DMCircuit(2)
    c.h(0)
    c.cnot(0, 1)
    np.testing.assert_allclose(float(jnp.real(c.amplitude("11"))), 0.5, atol=1e-5)
    c.depolarizing(1, px=0.2, py=0.0, pz=0.0)
    np.testing.assert_allclose(float(jnp.real(c.amplitude("11"))), 0.4, atol=1e-5)

    @jax.jit
    def m(s):
        c = tc.DMCircuit(2)
        c.h(0)
        c.cnot(0, 1)
        c.depolarizing(1, px=0.2, py=0.0, pz=0.0)
        return jnp.real(c.amplitude(s))

    np.testing.assert_allclose(float(m(jnp.asarray([1, 1]))), 0.4, atol=1e-5)
    np.testing.assert_allclose(float(m(jnp.asarray([1, 0]))), 0.1, atol=1e-5)


def test_dm_cond_measure():
    """reference test_dmcircuit.py:473 — collapse kills coherence."""
    c = tc.DMCircuit(2)
    c.h(0)
    np.testing.assert_allclose(float(jnp.real(c.expectation_ps(x=[0]))), 1.0, atol=1e-5)
    c.cond_measure(0, status=jnp.asarray(0.3))
    np.testing.assert_allclose(float(jnp.real(c.expectation_ps(x=[0]))), 0.0, atol=1e-5)


def test_prepend_append_dmcircuit():
    """reference test_dmcircuit.py:482 — append/prepend order semantics."""
    c = tc.DMCircuit(2)
    c.h(0)
    c1 = tc.DMCircuit(2)
    c1.cnot(0, 1)
    c2 = c1.append(c)
    c3 = c2.prepend(c)
    qir = c3.to_qir()
    assert [item["name"] for item in qir] == ["h", "cnot", "h"]
    s = np.asarray(c3.wavefunction())
    np.testing.assert_allclose(s[0], s[1], atol=1e-5)


def test_dm_channel_qir_roundtrip():
    """reference test_dmcircuit.py:497 — channels survive the QIR round trip."""
    c = tc.DMCircuit(1)
    c.depolarizing(0, px=0.1, py=0.0, pz=0.0)
    qir = c.to_qir()
    assert qir[-1]["is_channel"] is True
    assert qir[-1]["name"] == "depolarizing"
    c2 = tc.DMCircuit.from_qir(qir, circuit_params={"nqubits": 1}, allow_channel=True)
    np.testing.assert_allclose(
        np.asarray(c.state()), np.asarray(c2.state()), atol=1e-5
    )


def test_dm_sample_expectation_ps():
    """reference test_dmcircuit.py:508 — shot vs exact sample_expectation_ps."""
    c = tc.DMCircuit(1, inputs=jnp.asarray(
        (np.array([1.0, 1.0j]) / np.sqrt(2)).astype(np.complex64)
    ))
    exact = float(jnp.real(c.expectation_ps(y=[0])))
    np.testing.assert_allclose(exact, 1.0, atol=1e-5)
    y_exact = float(jnp.real(c.sample_expectation_ps(y=[0])))
    np.testing.assert_allclose(y_exact, 1.0, atol=1e-5)
    status = jnp.asarray(np.random.default_rng(0).uniform(size=(4096,)))
    y_shots = float(jnp.real(c.sample_expectation_ps(y=[0], shots=4096, status=status)))
    np.testing.assert_allclose(y_shots, 1.0, atol=0.05)


def test_noise_param_ad():
    """reference test_dmcircuit.py:178 — d<Z>/d(gamma) through a channel."""

    def f(gamma):
        c = tc.DMCircuit(1)
        c.x(0)
        c.amplitudedamping(0, gamma=gamma, p=1.0)
        return jnp.real(c.expectation_ps(z=[0]))

    # <Z> = -(1-gamma) + gamma = 2 gamma - 1 -> d/dgamma = 2
    v, g = jax.value_and_grad(f)(jnp.asarray(0.3))
    np.testing.assert_allclose(float(v), -0.4, atol=1e-5)
    np.testing.assert_allclose(float(g), 2.0, atol=1e-4)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_wide_noisy_superop_with_hyperedges():
    """Channels AND k-local hyperedges through the lazy superop IR at n=16
    (forced above the dense-DM cliff) match the small-n dense oracle."""
    X = np.array([[0, 1], [1, 0.0]])

    def build(cls, n):
        c = cls(n)
        for q in range(4):
            c.h(q)
        c.multicz(0, 1, 2)
        c.rzm(1, 2, 3, theta=0.5)
        c.depolarizing(0, px=0.05, py=0.05, pz=0.05)
        return c

    v = float(np.real(np.asarray(build(tc.DMCircuit2, 16).expectation((X, [1])))))
    vd = float(np.real(np.asarray(build(tc.DMCircuit, 8).expectation((X, [1])))))
    np.testing.assert_allclose(v, vd, atol=1e-5)


def test_lazy_dm_probability_measure_amplitude_parity():
    """DMCircuit2 sampling surfaces above the dense cliff (boundary'd doubled
    network, reference basecircuit.py:449-560,626 on DM) match the dense
    engine exactly when forced lazy at small n."""
    import jax.numpy as jnp

    def build(cls, n):
        c = cls(n)
        for i in range(n):
            c.rx(i, theta=0.3 + 0.1 * i)
        for i in range(0, n - 1, 2):
            c.cnot(i, i + 1)
        for i in range(n):
            c.depolarizing(i, px=0.02, py=0.01, pz=0.03)
        for i in range(1, n - 1, 2):
            c.cz(i, i + 1)
        c.phasedamping(2, gamma=0.05)
        return c

    n = 5
    cd = build(tc.DMCircuit, n)
    cl = build(tc.DMCircuit2, n)
    cl._DENSE_MAX_QUBITS_DM = 0  # force every surface onto the lazy path
    pd = np.asarray(cd.probability())
    np.testing.assert_allclose(np.asarray(cl.probability()), pd, atol=1e-6)
    marg = pd.reshape((2,) * n).sum(axis=(0, 2, 4))
    np.testing.assert_allclose(np.asarray(cl.probability(1, 3)), marg.reshape(-1), atol=1e-6)
    st = jnp.asarray([0.3, 0.7, 0.1])
    sd, pp_d = cd.measure_jit(0, 2, 4, with_prob=True, status=st)
    sl, pp_l = cl.measure_jit(0, 2, 4, with_prob=True, status=st)
    assert (np.asarray(sd) == np.asarray(sl)).all()
    np.testing.assert_allclose(float(pp_d), float(pp_l), atol=1e-6)
    for bits in ("01011",):
        np.testing.assert_allclose(
            complex(np.asarray(cl.amplitude(bits))),
            complex(np.asarray(cd.amplitude(bits))),
            atol=1e-6,
        )


@pytest.mark.slow  # 12 s statistical check; the exact-parity sibling above
# covers the lazy sampling surfaces in the fast gate
def test_lazy_dm_sampling_statistics_and_wide_smoke():
    """12q lazy autoregressive sampling statistics match dense-diagonal
    probabilities; a 24q depth-4 noisy circuit samples without any 4^n
    object (the VERDICT r2 #4 scenario)."""
    import jax
    import jax.numpy as jnp

    def build(cls, n):
        c = cls(n)
        for i in range(n):
            c.h(i)
        for i in range(0, n - 1, 2):
            c.cnot(i, i + 1)
        for i in range(n):
            c.depolarizing(i, px=0.05, py=0.02, pz=0.02)
        for i in range(n):
            c.rx(i, theta=0.4)
        return c

    n = 12
    c = build(tc.DMCircuit2, n)
    c._DENSE_MAX_QUBITS_DM = 0
    # statistics on 2 wires: lazy batch sampling vs exact marginal (vmapped
    # over the status batch: ONE compile, one execution)
    nshots = 512
    status = jnp.asarray(np.random.default_rng(7).uniform(size=(nshots, 2)))
    f = jax.jit(jax.vmap(lambda st: c.measure_jit(3, 4, status=st)[0]))
    samples = np.asarray(f(status))
    freq = np.bincount(samples[:, 0] * 2 + samples[:, 1], minlength=4) / nshots
    exact = np.array(c.probability(3, 4)).reshape(-1)
    exact = exact / exact.sum()
    assert np.abs(freq - exact).max() < 0.08, (freq, exact)
    # 24q depth-4: dense rho would be 2^48 — lazy path samples fine
    cw = build(tc.DMCircuit2, 24)
    s, p = cw.measure_jit(10, 11, with_prob=True, status=jnp.asarray([0.6, 0.2]))
    assert s.shape == (2,) and 0.0 < float(p) <= 1.0
    amp = cw.amplitude("0" * 24)
    assert 0.0 <= float(np.real(np.asarray(amp))) <= 1.0
