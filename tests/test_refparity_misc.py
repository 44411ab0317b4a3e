"""Behavioral parity tests: cloud local provider, compiler merges, symbolic
workflows, qudit gate algebra, interfaces (reference tests/test_cloud.py,
test_compiler.py, test_symbolcircuit.py, test_quditgates.py,
test_interfaces.py scenarios)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # audit pins -> full CI tier (see module note)
import sympy

import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc


def test_cloud_local_submit_and_counts():
    """reference test_cloud.py:113-150 — local provider round trip."""
    from tensorcircuit_ng_tpu.cloud import apis

    ds = apis.list_devices(provider="local")
    assert ds
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    t = apis.submit_task(circuit=c, shots=1024, device="local::default")
    counts = t.results()
    assert sum(counts.values()) == 1024
    assert set(counts) <= {"00", "11"}


def test_cloud_batch_expectation_ps():
    """reference test_cloud.py:150 — batch_expectation_ps via local device."""
    from tensorcircuit_ng_tpu.cloud import wrapper

    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    v = wrapper.batch_expectation_ps(
        c, [[3, 3], [1, 1]], device="local::default", shots=8192
    )
    np.testing.assert_allclose(np.asarray(v), [1.0, 1.0], atol=0.1)


def test_compiler_rotation_merges():
    """reference test_compiler.py:150,168 — same-axis and two-qubit merges."""
    from tensorcircuit_ng_tpu.compiler import simple_compiler as scm

    c = tc.Circuit(1)
    c.rz(0, theta=0.3)
    c.rz(0, theta=0.4)
    c2, _ = scm.simple_compile(c)
    assert len(c2.to_qir()) == 1
    assert abs(np.vdot(np.asarray(c.state()), np.asarray(c2.state()))) > 1 - 1e-6

    c = tc.Circuit(2)
    c.rzz(0, 1, theta=0.3)
    c.rzz(0, 1, theta=0.5)
    c2, _ = scm.simple_compile(c)
    assert abs(np.vdot(np.asarray(c.state()), np.asarray(c2.state()))) > 1 - 1e-6

    # h h cancellation + rz(0) pruning
    c = tc.Circuit(2)
    c.h(0)
    c.h(0)
    c.cnot(0, 1)
    c.rz(1, theta=0.0)
    c2, _ = scm.simple_compile(c)
    assert len(c2.to_qir()) <= 2


def test_symbolic_gradient_matches_autodiff():
    """reference test_symbolcircuit.py workflows — symbolic d<Z>/dθ == AD."""
    th = sympy.Symbol("theta", real=True)
    ph = sympy.Symbol("phi", real=True)
    sc = tc.SymbolCircuit(2)
    sc.h(0)
    sc.rx(0, theta=th)
    sc.rz(1, theta=ph)
    sc.cnot(0, 1)
    half = sc.bind({ph: 0.3})
    assert half.free_symbols() == {th}
    ez = sympy.trigsimp(half.expectation_ps(z=[1]))
    dz = sympy.diff(ez, th)

    def f(t):
        c = tc.Circuit(2)
        c.h(0)
        c.rx(0, theta=t)
        c.rz(1, theta=0.3)
        c.cnot(0, 1)
        return jnp.real(c.expectation_ps(z=[1]))

    v, g = jax.value_and_grad(f)(jnp.asarray(0.7))
    np.testing.assert_allclose(float(ez.subs(th, 0.7)), float(v), atol=1e-6)
    np.testing.assert_allclose(float(dz.subs(th, 0.7)), float(g), atol=1e-5)
    # full binding clears symbols; to_circuit gives the numeric engine
    assert half.bind({th: 0.7}).free_symbols() == set()
    cn = half.to_circuit({th: 0.7})
    np.testing.assert_allclose(
        float(np.real(np.asarray(cn.expectation_ps(z=[1])))), float(v), atol=1e-6
    )


def test_qudit_clock_shift_algebra():
    """reference test_quditgates.py — ZX = ω XZ Weyl commutation."""
    from tensorcircuit_ng_tpu.ops import quditgates as qg

    for d in (3, 5):
        X = np.asarray(qg.x_matrix_func(d))
        Z = np.asarray(qg.z_matrix_func(d))
        w = np.exp(2j * np.pi / d)
        np.testing.assert_allclose(Z @ X, w * (X @ Z), atol=1e-6)
        np.testing.assert_allclose(X @ X.conj().T, np.eye(d), atol=1e-6)
        np.testing.assert_allclose(np.linalg.matrix_power(X, d), np.eye(d), atol=1e-6)


def test_scipy_interface_optimizes():
    """reference test_interfaces.py:286 — L-BFGS through the scipy bridge."""
    from tensorcircuit_ng_tpu.interfaces import scipy_optimize_interface
    from scipy.optimize import minimize

    def f(p):
        c = tc.Circuit(2)
        c.rx(0, theta=p[0])
        c.ry(1, theta=p[1])
        c.cnot(0, 1)
        return jnp.real(c.expectation_ps(z=[1]))

    fs = scipy_optimize_interface(f, shape=(2,), jit=True)
    r = minimize(fs, np.array([0.3, 0.2]), jac=True, method="L-BFGS-B")
    assert r.fun < -0.99


def test_torch_interface_grads():
    """reference test_interfaces.py:31 — torch autograd through jax."""
    import torch
    from tensorcircuit_ng_tpu.interfaces import torch_interface

    def f(p):
        c = tc.Circuit(2)
        c.rx(0, theta=p[0])
        c.ry(1, theta=p[1])
        return jnp.real(c.expectation_ps(z=[0]))

    ft = torch_interface(f, jit=True)
    p = torch.tensor([0.4, 0.1], requires_grad=True)
    v = ft(p)
    v.backward()
    np.testing.assert_allclose(v.detach().numpy(), np.cos(0.4), atol=1e-5)
    np.testing.assert_allclose(p.grad.numpy(), [-np.sin(0.4), 0.0], atol=1e-5)


@pytest.mark.slow  # sibling: test_shadows entropy + review snapshot-states tests
def test_entropy_shadow_dual_kwargs():
    """reference test_shadows.py:132 — dual subsystem kwargs + validation."""
    from tensorcircuit_ng_tpu import shadows

    nq, ns, repeat = 4, 800, 4
    c = tc.Circuit(nq)
    c.h(0)
    c.rx(1, theta=0.7)
    c.cx(0, 1)
    c.ry(2, theta=0.4)
    c.cx(1, 2)
    psi = c.state()
    rng = np.random.default_rng(0)
    strings = jnp.asarray(rng.integers(0, 3, size=(ns, nq)), jnp.int32)
    status = jnp.asarray(rng.uniform(size=(ns, repeat)))
    snaps = shadows.shadow_snapshots(psi, strings, status)
    e_sub = float(np.real(np.asarray(shadows.entropy_shadow(snaps, strings, sub=[0, 1]))))
    e_keep = float(
        np.real(np.asarray(shadows.entropy_shadow(snaps, strings, subsystem_to_keep=[0, 1])))
    )
    e_to = float(
        np.real(
            np.asarray(
                shadows.entropy_shadow(snaps, strings, subsystems_to_trace_out=[2, 3])
            )
        )
    )
    assert e_sub == e_keep == e_to
    with pytest.raises(ValueError):
        shadows.entropy_shadow(
            snaps, strings, subsystem_to_keep=[0], subsystems_to_trace_out=[1]
        )
    with pytest.raises(ValueError):
        shadows.entropy_shadow(snaps, strings, subsystem_to_keep=[nq])
