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
    # reference op convention (fgs.py:885): <c_i† c_j> = e2b(i + L, j)
    e = sum(
        float(np.real(np.asarray(gs.expectation_2body(i + L, j)))) * h[j, i].real
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


# ---------------- round-1 parity batch: extended FGS API ----------------


def test_fgs_local_evolutions_vs_oracle():
    L = 4
    sim = FGSSimulator(L, filled=[0, 2])
    ora = FGSTestSimulator(L, filled=[0, 2])
    sim.evol_hp(0, 1, 0.7); ora.evol_hp(0, 1, 0.7)
    sim.evol_cp(2, 0.4); ora.evol_cp(2, 0.4)
    sim.evol_sp(1, 3, 0.3 + 0.2j); ora.evol_sp(1, 3, 0.3 + 0.2j)
    sim.evol_hp(2, 3, -0.5); ora.evol_hp(2, 3, -0.5)
    np.testing.assert_allclose(
        np.asarray(sim.get_cmatrix()), ora.get_cmatrix(), atol=1e-6
    )
    # local vs global generator route agree on the state
    sim2 = FGSSimulator(L, filled=[0, 2])
    sim2.evol_hamiltonian(FGSSimulator.hopping(L, 0, 1, 0.7))
    sim3 = FGSSimulator(L, filled=[0, 2])
    sim3.evol_hp(0, 1, 0.7)
    np.testing.assert_allclose(
        np.asarray(sim2.get_cmatrix()), np.asarray(sim3.get_cmatrix()), atol=1e-6
    )


def test_fgs_icp_vs_oracle():
    L = 3
    sim = FGSSimulator(L, filled=[0])
    ora = FGSTestSimulator(L, filled=[0])
    sim.evol_hp(0, 1, 0.9); ora.evol_hp(0, 1, 0.9)
    sim.evol_icp(1, 0.8)
    ora.evol_ihamiltonian(np.diag([0, 0.8, 0]).astype(complex))
    np.testing.assert_allclose(
        np.asarray(sim.get_cmatrix()), ora.get_cmatrix(), atol=1e-5
    )


def test_fgs_majorana_and_covariance():
    L = 3
    sim = FGSSimulator(L, filled=[1])
    ora = FGSTestSimulator(L, filled=[1])
    sim.evol_hp(0, 1, 0.4)
    ora.evol_hp(0, 1, 0.4)
    np.testing.assert_allclose(
        np.asarray(sim.get_cmatrix_majorana()), ora.get_cmatrix_majorana(), atol=1e-6
    )
    cov = np.asarray(sim.get_covariance_matrix())
    # reference normalization (unnormalized Majoranas): cov = 2 M_std - i I,
    # with M_std real antisymmetric and orthogonal for a pure Gaussian state
    np.testing.assert_allclose(cov.imag, -np.eye(2 * L), atol=1e-6)
    m_std = cov.real / 2.0
    np.testing.assert_allclose(m_std, -m_std.T, atol=1e-6)
    np.testing.assert_allclose(m_std @ m_std.T, np.eye(2 * L), atol=1e-5)


def test_fgs_4body_wick_vs_exact():
    L = 3
    sim = FGSSimulator(L, filled=[0, 1])
    ora = FGSTestSimulator(L, filled=[0, 1])
    for f, o in ((sim, ora),):
        f.evol_hp(0, 2, 0.6); o.evol_hp(0, 2, 0.6)
        f.evol_sp(0, 1, 0.2); o.evol_sp(0, 1, 0.2)
    # density-density: <n_0 n_1> = <c†_0 c_0 c†_1 c_1> -> ops (L+0, 0, L+1, 1)
    got = complex(np.asarray(sim.expectation_4body(L + 0, 0, L + 1, 1)))
    want = ora.expectation_4body(L + 0, 0, L + 1, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fgs_charge_moment_vs_dense():
    L = 4
    sim = FGSSimulator(L, filled=[0, 2])
    ora = FGSTestSimulator(L, filled=[0, 2])
    sim.evol_hp(0, 1, 0.5); ora.evol_hp(0, 1, 0.5)
    sim.evol_hp(2, 3, 1.1); ora.evol_hp(2, 3, 1.1)
    sim.evol_hp(1, 2, 0.3); ora.evol_hp(1, 2, 0.3)
    angles = [0.3, -0.8]
    z_fgs = complex(np.asarray(sim.charge_moment(jnp.asarray(angles), 2, [2, 3])))
    z_dense = ora.charge_moment(angles, 2, [2, 3])
    np.testing.assert_allclose(z_fgs, z_dense, atol=1e-3)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_fgs_asymmetry_semantics():
    # reference semantics: the return is S_n of the charge-dephased rho_A;
    # for a number-conserving state that equals the plain Renyi entropy of
    # the kept region, so the asymmetry (their difference) vanishes.
    L = 4
    sim = FGSSimulator(L, filled=[0, 1])
    sim.evol_hp(0, 1, 0.5)
    sim.evol_hp(1, 2, 0.7)
    sim.evol_hp(2, 3, 0.4)  # entangle across the cut so rho_A is mixed
    rng = np.random.default_rng(3)
    status = rng.uniform(-np.pi, np.pi, size=[256, 2])
    s_q = float(np.asarray(sim.renyi_entanglement_asymmetry(2, [3], status=status)))
    s_a = float(np.asarray(sim.renyi_entropy([0, 1, 2], 2)))
    assert s_a > 0.01  # mixed reduced state
    np.testing.assert_allclose(s_q, s_a, atol=5e-3)


def test_fgs_cond_measure_vs_oracle():
    L = 3
    for status in (0.05, 0.95):
        sim = FGSSimulator(L, filled=[0])
        ora = FGSTestSimulator(L, filled=[0])
        sim.evol_hp(0, 1, 0.8); ora.evol_hp(0, 1, 0.8)
        out1, p1 = sim.cond_measure(1, status, with_prob=True)
        out2, p2 = ora.cond_measure(1, status, with_prob=True)
        assert float(out1) == float(out2)
        np.testing.assert_allclose(np.asarray(p1), p2, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sim.get_cmatrix()), ora.get_cmatrix(), atol=1e-5
        )


def test_fgs_bogoliubov_and_diagonalization():
    L = 3
    h = np.zeros((L, L), dtype=complex)
    for i in range(L - 1):
        h[i, i + 1] = 1.0; h[i + 1, i] = 1.0
    m = FGSSimulator.bdg(h, np.zeros_like(h))
    es, u, alpha = FGSSimulator.fermion_diagonalization(m, L)
    gs = FGSSimulator(L, alpha=alpha)
    gs2 = FGSSimulator(L, hc=m)
    # both give a ground state of the quadratic H: same energy
    def energy(s):
        return sum(
            float(np.real(np.asarray(s.expectation_2body(i + L, j)))) * h[j, i].real
            for i in range(L) for j in range(L) if h[i, j] != 0
        )
    np.testing.assert_allclose(energy(gs), energy(gs2), atol=1e-6)
    u_m, v_m = gs.get_bogoliubov_uv()
    assert u_m.shape == (L, L) and v_m.shape == (L, L)
    # OTOC plumbing: initial-state cmatrix equals current before evolution
    c_now = np.asarray(gs.get_cmatrix())
    c_old = np.asarray(gs.get_cmatrix(False, False))
    np.testing.assert_allclose(c_now, c_old, atol=1e-8)


@pytest.mark.slow
def test_fgs_entropy_filled_modes_no_nan():
    """f32 regression: clip bound below eps made 0*log(0)=NaN for fully
    filled/empty modes (lambda exactly 1.0 at complex64)."""
    import tensorcircuit_ng_tpu as tc

    L = 8
    sim = tc.FGSSimulator(L, filled=list(range(L // 2)))
    ref = tc.FGSTestSimulator(L, filled=list(range(L // 2)))
    for i in range(L - 1):
        sim.evol_hp(i, i + 1, chi=0.3)
        ref.evol_hp(i, i + 1, chi=0.3)
    for i in range(0, L - 1, 2):
        sim.evol_sp(i, i + 1, chi=0.2)
        ref.evol_sp(i, i + 1, chi=0.2)
    s = float(np.real(np.asarray(sim.entropy(list(range(L // 2))))))
    s_ref = float(np.real(np.asarray(ref.entropy(list(range(L // 2))))))
    assert np.isfinite(s)
    np.testing.assert_allclose(s, s_ref, atol=1e-3)
