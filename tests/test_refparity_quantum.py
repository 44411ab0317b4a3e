"""Behavioral parity tests against reference tests/test_quantum.py."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # audit pins -> full CI tier (see module note)

import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu


def test_tensor_product_norm():
    """reference test_quantum.py:176 — |ψ⊗ψ| = |ψ|² as QuScalars."""
    rng = np.random.default_rng(0)
    psi = qu.QuVector.from_tensor(rng.random((2, 2)))
    pp = psi.tensor_product(psi)
    assert len(pp.subsystem_edges) == 4
    np.testing.assert_almost_equal(
        complex(pp.norm().eval()), complex(psi.norm().eval()) ** 2, decimal=5
    )


def test_mul_semantics():
    """reference test_quantum.py:194 — scalar-only multiply, ValueError
    otherwise, subclass preserved."""
    mat = np.eye(2)
    op = qu.QuOperator.from_tensor(mat, [0], [1])
    sc = qu.QuScalar.from_tensor(np.float64(0.5))
    np.testing.assert_allclose(np.asarray((op * sc).eval()), mat * 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray((sc * op).eval()), mat * 0.5, atol=1e-6)
    np.testing.assert_allclose(complex((sc * sc).eval()), 0.25, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray((op * np.float64(0.5)).eval()), mat * 0.5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray((np.float64(0.5) * op).eval()), mat * 0.5, atol=1e-6
    )
    with pytest.raises(ValueError):
        _ = op * op
    with pytest.raises(ValueError):
        _ = op * mat


def test_expectation_two_routes():
    """reference test_quantum.py:223 — ⟨ψ|O⊗I|ψ⟩ == tr(O ρ_1)."""
    rng = np.random.default_rng(1)
    pt = rng.random((2, 2, 2)) + 1j * rng.random((2, 2, 2))
    ot = rng.random((2, 2)) + 1j * rng.random((2, 2))
    psi = qu.QuVector.from_tensor(pt)
    op = qu.QuOperator.from_tensor(ot, [0], [1])
    op3 = op.tensor_product(qu.identity((2, 2), dtype="complex64"))
    r1 = complex((psi.adjoint() @ op3 @ psi).eval())
    rho1 = psi.reduced_density([1, 2])
    r2 = complex((op @ rho1).trace().eval())
    np.testing.assert_almost_equal(r1, r2, decimal=5)


def test_projector_idempotent():
    """reference test_quantum.py:240."""
    rng = np.random.default_rng(2)
    pt = rng.random((2, 2))
    pt /= np.linalg.norm(pt)
    psi = qu.QuVector.from_tensor(pt)
    P = psi.projector()
    np.testing.assert_allclose(np.asarray((P @ psi).eval()), pt, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray((P @ P).eval()), np.asarray(P.eval()), atol=1e-6
    )


def test_nonsquare_quop():
    """reference test_quantum.py:251."""
    op = qu.QuOperator.from_tensor(np.ones([2] * 5), [0, 1, 2], [3, 4])
    op2 = qu.QuOperator.from_tensor(np.ones([2] * 5), [0, 1], [2, 3, 4])
    np.testing.assert_allclose(
        np.asarray((op @ op2).eval()), 4 * np.ones([2] * 6), atol=1e-6
    )


def test_trace_product_mixed_args():
    """reference test_quantum.py:296 — tensors and QuOperators interchangeable."""
    o = np.ones([2, 2])
    h = np.eye(2)
    oq = qu.QuOperator.from_tensor(o)
    hq = qu.QuOperator.from_tensor(h)
    for a, b in [(o, h), (oq, hq), (oq, h), (o, hq)]:
        np.testing.assert_allclose(complex(qu.trace_product(a, b)), 2, atol=1e-6)


def test_free_energy_quoperator_h():
    """reference test_quantum.py:380 — h may be a QuOperator."""
    rho = np.array([[1.0, 0], [0, 0]])
    h = np.array([[-1.0, 0], [0, 1]])
    np.testing.assert_allclose(float(np.real(qu.free_energy(rho, h, 0.5))), -1, atol=1e-6)
    np.testing.assert_allclose(
        float(np.real(qu.renyi_free_energy(rho, h, 0.5))), -1, atol=1e-6
    )
    hq = qu.QuOperator.from_tensor(h)
    np.testing.assert_allclose(
        float(np.real(qu.free_energy(rho, hq, 0.5))), -1, atol=1e-6
    )


def test_measurement_counts_formats():
    """reference test_quantum.py:390 — count_tuple and vector formats."""
    state = np.ones([4])
    ct, cs = qu.measurement_counts(state, format="count_tuple")
    assert ct.shape[0] == 4
    assert int(np.sum(np.asarray(cs))) == 8192
    cv = qu.measurement_counts(np.array([1.0, 1.0, 0, 0]))
    assert tuple(np.shape(cv)) == (4,)
    np.testing.assert_allclose(float(np.sum(np.asarray(cv))), 8192, atol=1)


def test_extract_from_measure():
    """reference test_quantum.py:406 — spin_by_basis / correlations."""
    np.testing.assert_allclose(
        np.asarray(qu.spin_by_basis(2, 1)), [1, -1, 1, -1], atol=1e-6
    )
    state = jnp.asarray([0.6, 0.4, 0, 0])
    np.testing.assert_allclose(
        float(qu.correlation_from_counts([0, 1], state)), 0.2, atol=1e-6
    )
    np.testing.assert_allclose(
        float(qu.correlation_from_counts([1], state)), 0.2, atol=1e-6
    )
    samples = jnp.asarray([0, 0, 3, 3, 3], jnp.int32)
    np.testing.assert_allclose(
        float(qu.correlation_from_samples([0, 1], samples, n=2)), 1, atol=1e-5
    )


def test_heisenberg_ground_energy():
    """reference test_quantum.py:422 — Line1D(6) Heisenberg E0 = -11.2111."""
    g = tc.templates.graphs.Line1D(6)
    h = qu.heisenberg_hamiltonian(g, sparse=False)
    e = np.linalg.eigvalsh(np.asarray(h))
    np.testing.assert_allclose(e[0], -11.2111, atol=1e-4)


def test_entanglement_entropy_qudit_and_dual_args():
    """reference test_quantum.py:754 — dim-aware entropy, dual kwargs, int
    cut means [0, cut)."""
    d = 3
    schmidt = np.array([0.6, 0.3, 0.1], dtype="complex64")
    schmidt = schmidt / np.linalg.norm(schmidt)
    ref_entropy = -np.sum(np.abs(schmidt) ** 2 * np.log(np.abs(schmidt) ** 2))
    psi = np.zeros(d * d, dtype="complex64")
    for k in range(d):
        psi[k * d + k] = schmidt[k]
    rho = np.outer(psi, np.conj(psi))
    s_pure = qu.entanglement_entropy(psi, subsystems_to_trace_out=[0], dim=d)
    s_rho = qu.entanglement_entropy(rho, subsystems_to_trace_out=[0], dim=d)
    np.testing.assert_allclose(float(np.real(s_pure)), ref_entropy, atol=1e-5)
    np.testing.assert_allclose(float(np.real(s_rho)), ref_entropy, atol=1e-5)
    np.testing.assert_allclose(
        float(np.real(qu.entanglement_entropy(psi, subsystem_to_keep=[1], dim=d))),
        float(np.real(s_pure)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        float(np.real(qu.entanglement_entropy(psi, cut=1, dim=d))),
        float(np.real(s_pure)),
        atol=1e-5,
    )
    # pure bipartite: I(A:B) = 2 S(A)
    np.testing.assert_allclose(
        float(np.real(qu.mutual_information(psi, subsystems_to_trace_out=[0], dim=d))),
        2.0 * ref_entropy,
        atol=1e-5,
    )


def test_negativity_reference_values():
    """reference test_quantum.py:796 — negativity on a noisy Bell state."""
    c = tc.DMCircuit(2)
    c.h(0)
    c.cnot(0, 1)
    c.depolarizing(0, px=0.1, py=0.1, pz=0.1)
    dm = c.state()
    np.testing.assert_allclose(
        float(np.real(qu.log_negativity(dm, [0], base="2"))), 0.485427, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(qu.partial_transpose(qu.partial_transpose(dm, [0]), [0])),
        np.asarray(dm),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        float(np.real(qu.entanglement_negativity(dm, [1]))), 0.2, atol=1e-5
    )


@pytest.mark.slow  # sibling: test_quantum entropy/mutual-information units
def test_mutual_information_pure_vs_dm_route():
    """reference test_quantum.py:613 — ket and |psi><psi| agree."""
    n = 5
    rng = np.random.default_rng(4)
    w = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    w = (w / np.linalg.norm(w)).astype(np.complex64)
    rho = np.outer(w, w.conj())
    m1 = float(np.real(qu.mutual_information(jnp.asarray(w), cut=[1, 2, 3])))
    m2 = float(np.real(qu.mutual_information(jnp.asarray(rho), cut=[1, 2, 3])))
    np.testing.assert_allclose(m1, m2, atol=1e-4)
