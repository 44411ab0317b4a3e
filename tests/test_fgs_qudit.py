"""FGS simulator vs Jordan-Wigner oracle; QuditCircuit checks."""

import numpy as np
import pytest
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.models.fgs import FGSSimulator, FGSTestSimulator
from tensorcircuit_ng_tpu.models.quditcircuit import QuditCircuit


@pytest.fixture(autouse=True)
def highp_fgs():
    tc.set_dtype("complex128")
    yield
    tc.set_dtype("complex64")


def test_fgs_hopping_vs_oracle():
    L = 4
    h = np.zeros((L, L), dtype=complex)
    h[0, 1] = 0.7
    h[1, 0] = 0.7
    h[1, 2] = -0.4j
    h[2, 1] = 0.4j
    m = FGSSimulator.bdg(h, np.zeros((L, L), dtype=complex))
    sim = FGSSimulator(L, filled=[0, 2])
    ora = FGSTestSimulator(L, filled=[0, 2])
    sim.evol_hamiltonian(m, t=0.9)
    ora.evol(h, None, t=0.9)
    np.testing.assert_allclose(
        np.asarray(sim.get_cmatrix()), ora.get_cmatrix(), atol=1e-10
    )


def test_fgs_pairing_vs_oracle():
    L = 4
    h = 0.3 * np.eye(L, dtype=complex)
    d = np.zeros((L, L), dtype=complex)
    d[0, 1] = 0.6
    d[1, 0] = -0.6
    d[2, 3] = 0.3j
    d[3, 2] = -0.3j
    m = FGSSimulator.bdg(h, d)
    sim = FGSSimulator(L, filled=[1])
    ora = FGSTestSimulator(L, filled=[1])
    sim.evol_hamiltonian(m, t=0.5)
    ora.evol(h, d, t=0.5)
    np.testing.assert_allclose(
        np.asarray(sim.get_cmatrix()), ora.get_cmatrix(), atol=1e-10
    )
    np.testing.assert_allclose(
        float(sim.entropy([0, 1])), ora.entropy([0, 1]), atol=1e-8
    )


def test_fgs_ground_state():
    L = 3
    # hopping chain ground state at half filling
    h = np.zeros((L, L), dtype=complex)
    for i in range(L - 1):
        h[i, i + 1] = 1.0
        h[i + 1, i] = 1.0
    m = FGSSimulator.bdg(h, np.zeros((L, L), dtype=complex))
    gs = FGSSimulator(L, hc=m)
    # energy = sum over occupied: check <H> = sum h_ij <ci† cj>
    e = sum(
        float(np.real(np.asarray(gs.expectation_2body(i, j)))) * h[j, i].real
        for i in range(L)
        for j in range(L)
        if h[i, j] != 0
    )
    evals = np.linalg.eigvalsh(h)
    e_expected = float(np.sum(evals[evals < 0]))
    np.testing.assert_allclose(e, e_expected, atol=1e-8)


def test_fgs_overlap_and_postselect():
    L = 3
    s1 = FGSSimulator(L, filled=[0])
    s2 = FGSSimulator(L, filled=[0])
    np.testing.assert_allclose(float(s1.overlap(s2)), 1.0, atol=1e-8)
    s3 = FGSSimulator(L, filled=[1])
    np.testing.assert_allclose(float(s1.overlap(s3)), 0.0, atol=1e-8)
    # post-select: superpose then project occupation of site 0
    m = FGSSimulator.hopping(L, 0, 1, 1.0)
    s1.evol_hamiltonian(m, t=0.7)
    assert 0.0 < float(s1.occupation(0)) < 1.0
    s1.post_select(0, keep=1)
    np.testing.assert_allclose(float(s1.occupation(0)), 1.0, atol=1e-5)


def test_qudit_shift_clock():
    d = 3
    c = QuditCircuit(2, dim=d)
    c.x(0)
    psi = np.asarray(c.state())
    assert abs(psi[1 * d + 0]) > 0.99  # |10> in base-3
    c.x(0)
    c.x(0)
    psi = np.asarray(c.state())
    assert abs(psi[0]) > 0.99  # X^3 = I


def test_qudit_fourier_and_csum():
    d = 3
    c = QuditCircuit(2, dim=d)
    c.h(0)
    psi = np.asarray(c.state()).reshape(d, d)
    np.testing.assert_allclose(np.abs(psi[:, 0]), np.ones(d) / np.sqrt(d), atol=1e-6)
    c.csum(0, 1)
    # generalized bell state: sum_j |j, j>/sqrt(3)
    psi = np.asarray(c.state()).reshape(d, d)
    np.testing.assert_allclose(np.abs(np.diag(psi)), np.ones(d) / np.sqrt(d), atol=1e-6)
    # measurement correlations
    r, _ = c.measure_jit(0, 1, status=jnp.asarray([0.8, 0.0]))
    assert int(r[0]) == int(r[1])


def test_qudit_two_level_rotation():
    d = 3
    c = QuditCircuit(1, dim=d)
    c.ry(0, theta=np.pi, j=0, k=2)
    psi = np.asarray(c.state())
    np.testing.assert_allclose(abs(psi[2]), 1.0, atol=1e-6)


def test_qudit_sampling():
    d = 3
    c = QuditCircuit(2, dim=d)
    c.h(0)
    c.csum(0, 1)
    res = c.sample(batch=100, allow_state=True, format="count_vector",
                   status=jnp.asarray(np.random.default_rng(0).uniform(size=100)))
    cv = np.asarray(res)
    assert cv.sum() == 100
    # only diagonal outcomes 00, 11, 22 populated
    for j in range(d):
        for k in range(d):
            if j != k:
                assert cv[j * d + k] == 0
