"""Behavioral parity tests against reference tests/test_circuit.py scenarios.

Each test re-derives the reference's asserted physics through OUR API
(fresh implementations, reference file:line cited per test) so name-level
apidiff parity is backed by behavior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.ops import gates


def test_expectation_between_two_states():
    """reference test_circuit.py:405 — cross-state matrix elements."""
    zp = np.array([1.0, 0.0])
    zd = np.array([0.0, 1.0])
    e = tc.expectation((gates.GATES["y"]().matrix(), [0]), ket=zp, bra=zd)
    np.testing.assert_allclose(complex(e), 1j, atol=1e-6)

    c = tc.Circuit(3)
    c.h(0)
    c.ry(1, theta=0.8)
    c.cnot(1, 2)
    state = c.state()
    ops = [(gates.GATES["x"]().matrix(), [0]), (gates.GATES["z"]().matrix(), [1])]
    e1 = c.expectation(*ops)
    e2 = tc.expectation(*ops, ket=state, bra=state, normalization=True)
    np.testing.assert_allclose(complex(e2), complex(e1), atol=1e-6)

    # <s2| X0 X1 |s1> with s1=|01>, s2=|10>
    c1 = tc.Circuit(2)
    c1.x(1)
    c2 = tc.Circuit(2)
    c2.x(0)
    c3 = tc.Circuit(2)
    c3.h(1)
    xx = [(gates.GATES["x"]().matrix(), [0]), (gates.GATES["x"]().matrix(), [1])]
    e = tc.expectation(*xx, ket=c1.state(), bra=c2.state())
    np.testing.assert_allclose(complex(e), 1.0, atol=1e-6)
    e2 = tc.expectation(*xx, ket=c3.state(), bra=c2.state())
    np.testing.assert_allclose(complex(e2), 1.0 / np.sqrt(2), atol=1e-6)


def test_any_inputs_state():
    """reference test_circuit.py:449 — arbitrary input states."""
    for inp, z0_want in [
        ([0.0, 0.0, 0.0, 1.0], 1.0),
        ([0.0, 0.0, 1.0, 0.0], 1.0),
        ([1.0, 0.0, 0.0, 0.0], -1.0),
    ]:
        c = tc.Circuit(2, inputs=jnp.asarray(np.asarray(inp, np.complex64)))
        c.x(0)
        np.testing.assert_allclose(
            float(jnp.real(c.expectation_ps(z=[0]))), z0_want, atol=1e-5
        )
    c = tc.Circuit(
        2, inputs=jnp.asarray(np.asarray([1, 0, 1, 0], np.complex64) / np.sqrt(2))
    )
    c.x(0)
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(z=[0]))), 0.0, atol=1e-5
    )


def test_circuit_add_and_replace_mps_inputs():
    """reference test_circuit.py:692 — quvector chaining and replacement."""
    c = tc.Circuit(2)
    c.x(0)
    c2 = tc.Circuit(2, mps_inputs=c.quvector())
    c2.x(0)
    np.testing.assert_allclose(np.asarray(c2.state()), [1.0, 0, 0, 0], atol=1e-4)
    c3 = tc.Circuit(2)
    c3.x(0)
    c3.replace_mps_inputs(c.quvector())
    np.testing.assert_allclose(np.asarray(c3.state()), [1.0, 0, 0, 0], atol=1e-4)


def test_circuit_replace_inputs():
    """reference test_circuit.py:706 — swap the input state post hoc."""
    n = 3
    c = tc.Circuit(n, inputs=jnp.asarray(np.zeros(2**n, np.complex64).at if False else np.zeros(2**n, np.complex64)))
    for i in range(n):
        c.h(i)
    even = np.ones(2**n) / np.sqrt(2**n)
    c.replace_inputs(jnp.asarray(even.astype(np.complex64)))
    # H^n on the uniform state = |0..0>: <Z_i> = 1
    for i in range(n):
        np.testing.assert_allclose(
            float(jnp.real(c.expectation_ps(z=[i]))), 1.0, atol=1e-5
        )


def test_apply_multicontrol_gate():
    """reference test_circuit.py:1023 — multicontrol with 0/1 control mask."""
    c = tc.Circuit(3)
    c.x(2)
    c.multicontrol(0, 2, 1, ctrl=[0, 1], unitary=gates.GATES["x"]().matrix())
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(z=[1]))), -1, atol=1e-5
    )
    c = tc.Circuit(3)
    c.x(0)
    c.multicontrol(0, 2, 1, ctrl=[0, 1], unitary=gates.GATES["x"]().matrix())
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(z=[1]))), 1, atol=1e-5
    )
    c = tc.Circuit(4)
    c.x(0)
    c.x(2)
    c.multicontrol(0, 1, 2, 3, ctrl=[1, 0], unitary=gates.GATES["swap"]().matrix())
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(z=[3]))), -1, atol=1e-5
    )


def test_multicontrol_qir_roundtrip_and_inverse():
    """reference test_circuit.py:1040 — qir round trip + inverse to identity."""
    c = tc.Circuit(3)
    c.x(0)
    c.x(2)
    c.multicontrol(0, 2, 1, ctrl=[1, 1], unitary=gates.GATES["y"]().matrix())
    qir = c.to_qir()
    c2 = tc.Circuit.from_qir(qir)
    np.testing.assert_allclose(
        np.asarray(c.state()), np.asarray(c2.state()), atol=1e-5
    )
    c_inv = c2.inverse()
    c3 = tc.Circuit(3)
    c3.append_from_qir(qir)
    c3.append_from_qir(c_inv.to_qir())
    expected = np.zeros(8)
    expected[0] = 1.0
    np.testing.assert_allclose(np.abs(np.asarray(c3.state())), expected, atol=1e-5)


def test_circuit_quoperator_matches_matrix():
    """reference test_circuit.py:1055 — lazy operator == dense matrix."""
    c = tc.Circuit(3)
    c.x(0)
    c.cnot(0, 1)
    c.cz(1, 2)
    c.y(2)
    c.exp1(0, 2, theta=1.0, unitary=np.kron(gates.GATES["x"]().matrix(), gates.GATES["x"]().matrix()))
    c.h(1)
    c.multicontrol(0, 2, 1, ctrl=[1, 0], unitary=gates.GATES["z"]().matrix())
    qo = c.quoperator()
    np.testing.assert_allclose(
        np.asarray(qo.eval_matrix()), np.asarray(c.matrix()), atol=1e-5
    )


def test_perm_matrix():
    """reference test_circuit.py:1068 — qiskit little-endian permutation."""
    from tensorcircuit_ng_tpu.translation import perm_matrix

    p2 = np.asarray(perm_matrix(2))
    np.testing.assert_allclose(
        p2, np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]])
    )
    p3 = np.asarray(perm_matrix(3))
    v = np.arange(8)
    np.testing.assert_allclose(p3 @ v, np.array([0, 4, 2, 6, 1, 5, 3, 7]))


def test_teleportation():
    """reference test_circuit.py:950 — cond_measure + conditional_gate moves
    an arbitrary state from wire 0 to wire 2."""
    theta, phi = 0.7, 0.4

    def teleport(status0, status1):
        c = tc.Circuit(3)
        c.ry(0, theta=theta)
        c.rz(0, theta=phi)
        # Bell pair on 1, 2
        c.h(1)
        c.cnot(1, 2)
        # Bell measurement of 0, 1
        c.cnot(0, 1)
        c.h(0)
        m0 = c.cond_measure(0, status=status0)
        m1 = c.cond_measure(1, status=status1)
        # classical corrections
        c.conditional_gate(m1, [gates.GATES["i"]().matrix(), gates.GATES["x"]().matrix()], 2)
        c.conditional_gate(m0, [gates.GATES["i"]().matrix(), gates.GATES["z"]().matrix()], 2)
        return c

    ref = tc.Circuit(1)
    ref.ry(0, theta=theta)
    ref.rz(0, theta=phi)
    want_z = float(jnp.real(ref.expectation_ps(z=[0])))
    want_x = float(jnp.real(ref.expectation_ps(x=[0])))
    for s0 in (0.1, 0.9):
        for s1 in (0.2, 0.8):
            c = teleport(jnp.asarray(s0), jnp.asarray(s1))
            np.testing.assert_allclose(
                float(jnp.real(c.expectation_ps(z=[2]))), want_z, atol=1e-5
            )
            np.testing.assert_allclose(
                float(jnp.real(c.expectation_ps(x=[2]))), want_x, atol=1e-5
            )


def test_projected_subsystem():
    """reference test_circuit.py:1945 — reference signature: length-n digit
    tensor (jittable) + static keep tuple; pure state normalized by norm,
    DM branch trace-normalized (d^k, d^k)."""

    def build(cls):
        c = cls(3)
        c.h(0)
        c.cnot(0, 1)
        c.rx(1, theta=0.9)
        c.cy(1, 2)
        return c

    c = build(tc.Circuit)
    psi = np.asarray(c.state())
    # oracle: slice qubits 1, 2 at digit 1 and normalize
    want = psi.reshape(2, 2, 2)[:, 1, 1]
    want = want / np.linalg.norm(want)
    got = np.asarray(c.projected_subsystem(jnp.asarray([1, 1, 1.0]), (0,)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # jit with a traced digit tensor
    f = jax.jit(lambda t: build(tc.Circuit).projected_subsystem(t, (0,)))
    np.testing.assert_allclose(np.asarray(f(jnp.asarray([1, 1, 1]))), want, atol=1e-5)

    # DM branch: keep (0,), project qubits 1, 2 onto |1>
    cdm = build(tc.DMCircuit)
    rho = np.asarray(cdm.densitymatrix()).reshape(2, 2, 2, 2, 2, 2)
    sub = rho[:, 1, 1, :, 1, 1]
    sub = sub / np.trace(sub)
    got = np.asarray(cdm.projected_subsystem(jnp.asarray([1, 1, 1.0]), (0,)))
    assert got.shape == (2, 2)
    np.testing.assert_allclose(got, sub, atol=1e-5)
    got2 = np.asarray(cdm.projected_subsystem(jnp.asarray([1, 1, 1.0]), (1, 2)))
    assert got2.shape == (4, 4)
    sub2 = rho[1, :, :, 1, :, :].reshape(4, 4)
    sub2 = sub2 / np.trace(sub2)
    np.testing.assert_allclose(got2, sub2, atol=1e-5)


def test_circuit_copy_independent():
    """reference test_circuit.py:1936 — copy() detaches instruction list."""
    c = tc.Circuit(2)
    c.h(0)
    c2 = c.copy()
    c2.x(1)
    assert len(c.to_qir()) == 1
    assert len(c2.to_qir()) == 2
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(z=[1]))), 1.0, atol=1e-6
    )
    np.testing.assert_allclose(
        float(jnp.real(c2.expectation_ps(z=[1]))), -1.0, atol=1e-6
    )


@pytest.mark.slow  # kraus surfaces covered by test_gates_channels + dm tests
def test_general_kraus_with_prob_and_negative_weights():
    """reference test_circuit.py:1890,1919 — kraus selection with external
    probs and stability under tiny negative weights."""
    gamma = 0.3
    k0 = np.array([[1.0, 0.0], [0.0, np.sqrt(1 - gamma)]], np.complex64)
    k1 = np.array([[0.0, np.sqrt(gamma)], [0.0, 0.0]], np.complex64)
    # exact channel action via DMCircuit as oracle
    dm = tc.DMCircuit(1)
    dm.h(0)
    dm.general_kraus([k0, k1], 0)
    rho = np.asarray(dm.densitymatrix())
    # MC average over the status grid reproduces it
    rhos = []
    for s in np.linspace(0.001, 0.999, 400):
        c = tc.Circuit(1)
        c.h(0)
        c.general_kraus([k0, k1], 0, status=jnp.asarray(s))
        psi = np.asarray(c.state())
        rhos.append(np.outer(psi, psi.conj()))
    np.testing.assert_allclose(np.mean(rhos, axis=0), rho, atol=2e-2)
    # numerical-noise negative weights must not NaN
    c = tc.Circuit(1)
    c.h(0)
    eps = 1e-9
    k0e = np.sqrt(max(1 - gamma - eps, 0)) * np.eye(2, dtype=np.complex64)
    k1e = np.sqrt(gamma + eps) * np.array([[0, 1], [1, 0]], np.complex64)
    c.general_kraus([k0e, k1e], 0, status=jnp.asarray(0.5))
    assert np.isfinite(np.asarray(c.state())).all()


def test_positional_logical_mapping():
    """reference test_circuit.py:1815 — measure-order mappings."""
    c = tc.Circuit(3)
    c.h(0)
    c.measure_instruction(2)
    c.measure_instruction(0)
    m = tc.Circuit.get_positional_logical_mapping(c)
    assert m == {0: 2, 1: 0}


def test_minus_index_gates():
    """reference test_circuit.py:1610 — negative wire indices wrap."""
    c = tc.Circuit(3)
    c.x(-1)
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(z=[2]))), -1.0, atol=1e-6
    )
    c.cnot(-3, -2)
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(z=[1]))), 1.0, atol=1e-6
    )


def test_expectation_y_parity():
    """reference test_circuit.py:1501 — <Y> sign convention."""
    c = tc.Circuit(1)
    c.rx(0, theta=np.pi / 2)
    np.testing.assert_allclose(
        float(jnp.real(c.expectation_ps(y=[0]))), -1.0, atol=1e-6
    )


def test_exp1_minus_generator_equals_inverse():
    """reference test_circuit.py:339 — exp1(θ) · exp1(−θ) == identity."""
    xx = np.kron(gates.GATES["x"]().matrix(), gates.GATES["x"]().matrix())
    c = tc.Circuit(2)
    c.h(0)
    c.exp1(0, 1, theta=0.6, unitary=xx)
    c.exp1(0, 1, theta=-0.6, unitary=xx)
    want = tc.Circuit(2)
    want.h(0)
    np.testing.assert_allclose(
        np.asarray(c.state()), np.asarray(want.state()), atol=1e-5
    )


def test_rzm_and_cmz_gates():
    """reference test_hyperedge.py:589,631 — multi-qubit Z-string rotation
    and multi-controlled Z as diagonal hyperedge ops, both engines + AD."""
    n, theta = 4, 1.2
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    c.rzm(*range(n), theta=theta)
    for i in range(n):
        c.rx(i, theta=0.3)
    cd = tc.Circuit(n)
    for i in range(n):
        cd.h(i)
    diag = np.ones(2**n, np.complex64) * np.cos(theta / 2)
    zs = np.array([(-1) ** bin(i).count("1") for i in range(2**n)])
    diag = diag - 1j * np.sin(theta / 2) * zs
    cd.any(*range(n), unitary=np.diag(diag))
    for i in range(n):
        cd.rx(i, theta=0.3)
    np.testing.assert_allclose(
        np.asarray(c.state()), np.asarray(cd.state()), atol=1e-5
    )

    c2 = tc.Circuit(3)
    for i in range(3):
        c2.h(i)
    c2.cmz(0, 1, 2)
    c3 = tc.Circuit(3)
    for i in range(3):
        c3.h(i)
    dg = np.ones(8, np.complex64)
    dg[-1] = -1
    c3.any(0, 1, 2, unitary=np.diag(dg))
    np.testing.assert_allclose(
        np.asarray(c2.state()), np.asarray(c3.state()), atol=1e-6
    )

    # DM engine applies them exactly (densified diagonal for k<=8)
    cdm = tc.DMCircuit(3)
    cdm.h(0)
    cdm.h(1)
    cdm.rzm(0, 1, 2, theta=0.7)
    cdm.cmz(0, 1, 2)
    cp = tc.Circuit(3)
    cp.h(0)
    cp.h(1)
    cp.rzm(0, 1, 2, theta=0.7)
    cp.cmz(0, 1, 2)
    psi = np.asarray(cp.state())
    np.testing.assert_allclose(
        np.asarray(cdm.densitymatrix()), np.outer(psi, psi.conj()), atol=1e-5
    )

    # AD through theta: <X0> on |+++> after rzm = cos(theta)
    def f(th):
        c = tc.Circuit(3)
        for i in range(3):
            c.h(i)
        c.rzm(0, 1, 2, theta=th)
        return jnp.real(c.expectation_ps(x=[0]))

    v, g = jax.value_and_grad(f)(jnp.asarray(0.4))
    np.testing.assert_allclose(float(v), np.cos(0.4), atol=1e-5)
    np.testing.assert_allclose(float(g), -np.sin(0.4), atol=1e-5)


@pytest.mark.slow  # sibling: test_cross_simulator u1 parity tests
def test_u1_inverse_echo_and_sampling():
    """reference test_u1circuit.py:739,401 — sector-preserving inverse and
    conserved sampling with trajectory-convention status."""
    n, filled = 5, [0, 2]
    u1 = tc.U1Circuit(n, filled=filled)
    for i in range(n - 1):
        u1.rzz(i, i + 1, theta=0.2 + 0.1 * i)
    u1.swap(1, 2)
    u1.cphase(0, 3, theta=0.4)
    inv = u1.inverse()
    assert inv.k == len(filled)
    echo = tc.U1Circuit(n, filled=filled)
    echo.append_from_qir(u1.to_qir())
    echo.append_from_qir(inv.to_qir())
    init = np.asarray(tc.U1Circuit(n, filled=filled).to_dense())
    assert abs(abs(np.vdot(init, np.asarray(echo.to_dense()))) - 1) < 1e-5
    smp = u1.sample(
        batch=16,
        status=jnp.asarray(np.random.default_rng(0).uniform(size=(16, n))),
    )
    arr = np.asarray([np.asarray(b) for b, _ in smp])
    assert arr.shape == (16, n)
    assert np.all(arr.sum(axis=-1) == len(filled))
