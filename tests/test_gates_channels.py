"""Gate-matrix identities and channel-representation algebra.

Counterpart of reference ``tests/test_gates.py`` + ``tests/test_channels.py``:
factory protocol (adjoint/controlled), rotation = expm identities, channel
completeness and kraus/choi/super round trips for every named channel.
"""

import numpy as np
import pytest
import scipy.linalg as sl

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.ops import gates as G
from tensorcircuit_ng_tpu.ops import channels as CH

I2 = np.eye(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.array([[1, 0], [0, -1]], dtype=complex)


def mat(g):
    return np.asarray(g.matrix() if hasattr(g, "matrix") else g)


def test_rotations_match_expm():
    th = 0.437
    for pauli, fn in [(X, G.rx_matrix), (Y, G.ry_matrix), (Z, G.rz_matrix)]:
        np.testing.assert_allclose(
            np.asarray(fn(th)), sl.expm(-1j * th / 2 * pauli), atol=1e-6
        )
    for pp, fn in [
        (np.kron(X, X), G.rxx_matrix),
        (np.kron(Y, Y), G.ryy_matrix),
        (np.kron(Z, Z), G.rzz_matrix),
    ]:
        np.testing.assert_allclose(
            np.asarray(fn(th)), sl.expm(-1j * th / 2 * pp), atol=1e-6
        )


def test_iswap_and_exponential():
    # standard iSWAP at theta=1
    expected = np.array(
        [[1, 0, 0, 0], [0, 0, 1j, 0], [0, 1j, 0, 0], [0, 0, 0, 1]], dtype=complex
    )
    np.testing.assert_allclose(np.asarray(G.iswap_matrix(1.0)), expected, atol=1e-6)
    # exponential_matrix == expm for a random hermitian generator
    rng = np.random.default_rng(0)
    h = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    h = (h + h.conj().T) / 2
    th = 0.3
    np.testing.assert_allclose(
        np.asarray(G.exponential_matrix(h, th)), sl.expm(-1j * th * h), atol=1e-5
    )
    # exp1 fast path for G^2 = I
    np.testing.assert_allclose(
        np.asarray(G.exp1_matrix(np.kron(Z, Z), th)),
        sl.expm(-1j * th * np.kron(Z, Z)),
        atol=1e-6,
    )


def test_u_gate_qasm_convention():
    th, phi, lbd = 0.3, 0.5, 0.7
    u = np.asarray(G.u_matrix(th, phi, lbd))
    expected = np.array(
        [
            [np.cos(th / 2), -np.exp(1j * lbd) * np.sin(th / 2)],
            [
                np.exp(1j * phi) * np.sin(th / 2),
                np.exp(1j * (phi + lbd)) * np.cos(th / 2),
            ],
        ]
    )
    np.testing.assert_allclose(u, expected, atol=1e-6)


def test_controlled_structure():
    th = 0.9
    for cfn, fn in [
        (G.crx_matrix, G.rx_matrix),
        (G.cry_matrix, G.ry_matrix),
        (G.crz_matrix, G.rz_matrix),
    ]:
        cm = np.asarray(cfn(th))
        np.testing.assert_allclose(cm[:2, :2], I2, atol=1e-7)
        np.testing.assert_allclose(cm[:2, 2:], 0, atol=1e-7)
        np.testing.assert_allclose(cm[2:, 2:], np.asarray(fn(th)), atol=1e-6)
    cp = np.asarray(G.cphase_matrix(th))
    np.testing.assert_allclose(np.diag(cp), [1, 1, 1, np.exp(1j * th)], atol=1e-6)


def test_gatef_adjoint_controlled_protocol():
    s = tc.gates.s
    sd = s.adjoint()
    np.testing.assert_allclose(
        mat(sd()) @ mat(s()), I2, atol=1e-6
    )
    ct = tc.gates.t.controlled()
    m = mat(ct())
    np.testing.assert_allclose(m[:2, :2], I2, atol=1e-7)
    np.testing.assert_allclose(m[2:, 2:], mat(tc.gates.t()), atol=1e-7)
    ox = tc.gates.x.ocontrolled()
    m = mat(ox())
    np.testing.assert_allclose(m[:2, :2], X, atol=1e-7)
    np.testing.assert_allclose(m[2:, 2:], I2, atol=1e-7)


def test_multicontrol_polarity():
    m = np.asarray(G.multicontrol_matrix(X, [0]))
    # control polarity 0: block 0 gets X
    np.testing.assert_allclose(m[:2, :2], X, atol=1e-7)
    np.testing.assert_allclose(m[2:, 2:], I2, atol=1e-7)
    m = np.asarray(G.multicontrol_matrix(X, [1, 1]))
    assert m.shape == (8, 8)
    np.testing.assert_allclose(m[6:, 6:], X, atol=1e-7)
    np.testing.assert_allclose(m[:6, :6], np.eye(6), atol=1e-7)


def test_su4_is_unitary():
    rng = np.random.default_rng(1)
    th = rng.normal(size=15)
    m = np.asarray(G.su4_matrix(th))
    np.testing.assert_allclose(m @ m.conj().T, np.eye(4), atol=1e-5)


def test_concrete_gate_tensors_are_numpy():
    # axon TPU constraint: concrete gate tensors must stay numpy so jit
    # programs can close over them (see CLAUDE.md complex rule)
    assert isinstance(tc.gates.t().tensor, np.ndarray)
    assert isinstance(tc.gates.rz(theta=0.3).tensor, np.ndarray)
    assert isinstance(np.asarray(G.rzz_matrix(0.5)), np.ndarray)
    import jax

    def f(t):
        return tc.gates.rz(theta=t).tensor.reshape(-1)[0].real

    jax.jit(f)(0.3)  # traced params still flow


ALL_CHANNELS = [
    ("depolarizing", lambda: CH.depolarizingchannel(0.02, 0.01, 0.03)),
    ("generaldep1", lambda: CH.generaldepolarizingchannel(0.02, 1)),
    ("generaldep2", lambda: CH.generaldepolarizingchannel(0.005, 2)),
    ("isotropic", lambda: CH.isotropicdepolarizingchannel(0.05, 1)),
    ("amplitudedamping", lambda: CH.amplitudedampingchannel(0.1, 0.2)),
    ("phasedamping", lambda: CH.phasedampingchannel(0.15)),
    ("reset", lambda: CH.resetchannel()),
    ("thermal_auto", lambda: CH.thermalrelaxationchannel(300, 400, 100, "AUTO", 0.05)),
    ("thermal_bykraus", lambda: CH.thermalrelaxationchannel(300, 250, 100, "ByKraus", 0.0)),
]


@pytest.mark.parametrize("name,maker", ALL_CHANNELS)
def test_channel_completeness(name, maker):
    raw = [np.asarray(getattr(k, "tensor", k)) for k in maker()]
    dim = int(round(np.sqrt(raw[0].size)))
    acc = np.zeros((dim, dim), dtype=complex)
    for k in raw:
        k = k.reshape(dim, dim)
        acc += k.conj().T @ k
    np.testing.assert_allclose(acc, np.eye(dim), atol=1e-5)


def test_kraus_identity_check_and_unitary():
    CH.kraus_identity_check(CH.depolarizingchannel(0.02, 0.01, 0.03))
    assert CH.is_unitary_kraus([tc.gates.x()])
    assert not CH.is_unitary_kraus(CH.amplitudedampingchannel(0.3, 0.0))


def test_composedkraus_matches_sequential_dm():
    k1 = CH.depolarizingchannel(0.02, 0.01, 0.03)
    k2 = CH.phasedampingchannel(0.1)
    comp = CH.composedkraus(k1, k2)
    dm1 = tc.DMCircuit(1)
    dm1.h(0)
    dm1.general_kraus(k1, 0)
    dm1.general_kraus(k2, 0)
    dm2 = tc.DMCircuit(1)
    dm2.h(0)
    dm2.general_kraus(comp, 0)
    np.testing.assert_allclose(
        np.asarray(dm1.densitymatrix()), np.asarray(dm2.densitymatrix()), atol=1e-6
    )


def test_choi_rank_of_unitary_channel():
    choi = np.asarray(CH.kraus_to_choi([tc.gates.h()]))
    vals = np.linalg.eigvalsh(choi)
    assert np.sum(vals > 1e-6) == 1  # unitary channel => rank-1 choi


def test_super_to_kraus_roundtrip_applies_identically():
    kraus = CH.amplitudedampingchannel(0.25, 0.1)
    sup = CH.kraus_to_super(kraus)
    kraus2 = CH.super_to_kraus(sup)
    rho = np.array([[0.7, 0.2 + 0.1j], [0.2 - 0.1j, 0.3]], dtype=complex)

    def apply(ks, r):
        out = np.zeros_like(r)
        for k in ks:
            k = np.asarray(getattr(k, "tensor", k)).reshape(2, 2)
            out += k @ r @ k.conj().T
        return out

    np.testing.assert_allclose(apply(kraus, rho), apply(kraus2, rho), atol=1e-6)


@pytest.mark.slow
def test_large_shallow_ghz_expectation_n100():
    # reference README.md:146-156 headline demo (n=500 there); n=100 runs the
    # same large-n light-cone code path at a fraction of the suite cost
    n = 100
    c = tc.Circuit(n)
    c.h(0)
    for i in range(n - 1):
        c.cnot(i, i + 1)
    v = c.expectation_ps(z=[0, 1])
    np.testing.assert_allclose(np.real(np.asarray(v)), 1.0, atol=1e-5)
    v2 = c.expectation_ps(z=[n - 2, n - 1])
    np.testing.assert_allclose(np.real(np.asarray(v2)), 1.0, atol=1e-5)


# ---------------- round-1 parity batch: channel rep helpers ----------------


def test_reshuffle_roundtrip():
    from tensorcircuit_ng_tpu.ops import channels as ch

    k = ch.phasedampingchannel(0.3)
    s = ch.kraus_to_super(k)
    # reshuffling twice with the same involutive order is identity
    r = ch.reshuffle(ch.reshuffle(s, (1, 0, 3, 2)), (1, 0, 3, 2))
    np.testing.assert_allclose(np.asarray(r), np.asarray(s), atol=1e-6)


def test_evol_kraus_vs_superop():
    from tensorcircuit_ng_tpu.ops import channels as ch

    rho = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=np.complex64)
    for k in (
        ch.phasedampingchannel(0.2),
        ch.amplitudedampingchannel(0.3, 0.9),
        ch.depolarizingchannel(0.1, 0.05, 0.02),
        ch.resetchannel(),
    ):
        dm1 = np.asarray(ch.evol_kraus(rho, k))
        dm2 = np.asarray(ch.evol_superop(rho, ch.kraus_to_super(k)))
        np.testing.assert_allclose(dm1, dm2, atol=1e-5)
        assert abs(np.trace(dm1) - 1.0) < 1e-5


def test_check_rep_transformation():
    from tensorcircuit_ng_tpu.ops import channels as ch

    rho = np.array([[0.7, 0.2], [0.2, 0.3]], dtype=np.complex64)
    ch.check_rep_transformation(ch.phasedampingchannel(0.2), rho)
    ch.check_rep_transformation(ch.thermalrelaxationchannel(300, 400, 100, "ByKraus", 0.1), rho)


def test_kraus_gate_matrix_conversion():
    from tensorcircuit_ng_tpu.ops import channels as ch

    k = ch.resetchannel()
    ms = ch.krausgate_to_krausmatrix(k)
    assert all(m.shape == (2, 2) for m in ms)
    gs = ch.krausmatrix_to_krausgate(ms)
    ms2 = ch.krausgate_to_krausmatrix(gs)
    for a, b in zip(ms, ms2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert ch.is_hermitian_matrix(np.eye(2))
    assert not ch.is_hermitian_matrix(np.array([[0.0, 1.0], [0.0, 0.0]]))
