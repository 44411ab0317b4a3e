"""MPSCircuit tests: exact-regime cross-checks vs dense Circuit, truncation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.models.mpscircuit import MPSCircuit


def build_pair(n, chi=None):
    c = tc.Circuit(n)
    m = MPSCircuit(n, split={"max_singular_values": chi})
    return c, m


def random_circuit_ops(c, seed=0, layers=3):
    rng = np.random.default_rng(seed)
    n = c.nqubits
    for i in range(n):
        c.h(i)
    for l in range(layers):
        for i in range(n):
            c.rx(i, theta=float(rng.normal()))
        for i in range(n - 1):
            c.cnot(i, i + 1)
        c.rzz(0, n - 1, theta=0.3)  # non-adjacent
    return c


def test_mps_exact_matches_dense():
    n = 5
    c, m = build_pair(n, chi=None)  # exact caps
    random_circuit_ops(c, 1, layers=2)
    random_circuit_ops(m, 1, layers=2)
    psi_c = np.asarray(c.state())
    psi_m = np.asarray(m.wavefunction())
    np.testing.assert_allclose(np.abs(np.vdot(psi_c, psi_m)), 1.0, atol=1e-4)
    for ps in [dict(z=[0]), dict(x=[2]), dict(z=[0, 4]), dict(x=[1], z=[3])]:
        np.testing.assert_allclose(
            np.asarray(m.expectation_ps(**ps)),
            np.asarray(c.expectation_ps(**ps)),
            atol=1e-4,
        )


def test_mps_amplitude_and_norm():
    n = 4
    c, m = build_pair(n)
    for cc in (c, m):
        cc.h(0)
        for i in range(n - 1):
            cc.cnot(i, i + 1)
    np.testing.assert_allclose(np.asarray(m.amplitude("0" * n)), 1 / np.sqrt(2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.amplitude("1" * n)), 1 / np.sqrt(2), atol=1e-5)
    np.testing.assert_allclose(float(m.norm()), 1.0, atol=1e-5)


def test_mps_truncation_fidelity():
    n = 8
    chi = 4
    c, m = build_pair(n, chi=chi)
    random_circuit_ops(c, 3)
    random_circuit_ops(m, 3)
    psi_c = np.asarray(c.state())
    psi_m = np.asarray(m.wavefunction())
    nrm = np.linalg.norm(psi_m)
    f = np.abs(np.vdot(psi_c, psi_m / nrm))
    assert f > 0.5  # truncated but overlapping
    assert max(m.get_bond_dimensions()) <= chi


def test_mps_entanglement_entropy():
    n = 4
    _, m = build_pair(n)
    m.h(0)
    for i in range(n - 1):
        m.cnot(i, i + 1)
    s = float(m.entanglement_entropy(2))
    np.testing.assert_allclose(s, np.log(2), atol=1e-4)


def test_mps_from_wavefunction():
    n = 5
    c = tc.Circuit(n)
    random_circuit_ops(c, 7)
    psi = c.state()
    m = MPSCircuit(n, wavefunction=psi)
    np.testing.assert_allclose(
        np.abs(np.vdot(np.asarray(psi), np.asarray(m.wavefunction()))), 1.0, atol=1e-4
    )


@pytest.mark.slow  # MPS grads covered by the CI-tier cross-simulator sweep + VC_mps examples
def test_mps_jit_grad():
    n = 5
    chi = 8

    def loss(params):
        m = MPSCircuit(n, split={"max_singular_values": chi})
        for i in range(n):
            m.h(i)
        for i in range(n):
            m.rx(i, theta=params[i])
        for i in range(n - 1):
            m.cnot(i, i + 1)
        return jnp.real(m.expectation_ps(z=[0, 1]))

    params = jnp.asarray(np.random.default_rng(0).normal(size=n) * 0.3, dtype=jnp.float32)
    v, g = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    # cross-check value vs dense
    def dense_loss(params):
        c = tc.Circuit(n)
        for i in range(n):
            c.h(i)
        for i in range(n):
            c.rx(i, theta=params[i])
        for i in range(n - 1):
            c.cnot(i, i + 1)
        return jnp.real(c.expectation_ps(z=[0, 1]))

    np.testing.assert_allclose(float(v), float(dense_loss(params)), atol=1e-4)
    g2 = jax.grad(dense_loss)(params)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), atol=1e-3)


def test_mps_3qubit_gate():
    n = 5
    c, m = build_pair(n)
    for cc in (c, m):
        cc.h(0)
        cc.h(1)
        cc.toffoli(0, 1, 3)
    np.testing.assert_allclose(
        np.abs(np.vdot(np.asarray(c.state()), np.asarray(m.wavefunction()))), 1.0, atol=1e-4
    )


def test_mps_perfect_sampling_matches_dense():
    n = 5
    c, m = build_pair(n)
    random_circuit_ops(c, 11)
    random_circuit_ops(m, 11)
    # identical status -> identical autoregressive outcomes as dense engine
    rng = np.random.default_rng(0)
    for _ in range(5):
        st = jnp.asarray(rng.uniform(size=n))
        bits_m, p_m = m.perfect_sampling(status=st)
        bits_c, p_c = c.perfect_sampling(status=st)
        np.testing.assert_allclose(np.asarray(bits_m), np.asarray(bits_c))
        np.testing.assert_allclose(float(p_m), float(p_c), atol=1e-4)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_mps_batch_sample_statistics():
    n = 3
    _, m = build_pair(n)
    m.h(0)
    m.cnot(0, 1)
    m.cnot(1, 2)
    rng = np.random.default_rng(3)
    cv = m.sample(batch=400, format="count_vector", status=jnp.asarray(rng.uniform(size=(400, n))))
    cv = np.asarray(cv)
    assert cv[0] + cv[7] == 400  # GHZ: only |000> and |111>
    assert abs(int(cv[0]) - 200) < 80


@pytest.mark.slow  # MPO application covered by quantum-module MPO tests in the gate
def test_gate_to_mpo_and_apply():
    n = 6
    theta = 0.7
    _, m = build_pair(n, chi=16)
    for i in range(n):
        m.h(i)
    # 3-site gate: rzz(0,1) ⊗ rz(2)-ish composite built densely
    import scipy.linalg as sl
    zz1 = np.kron(np.kron(np.diag([1, -1]), np.diag([1, -1])), np.eye(2))
    z3 = np.kron(np.eye(4), np.diag([1, -1]))
    gate = sl.expm(-1j * theta / 2 * (zz1 + 0.4 * z3))
    mpo = m.gate_to_mpo(jnp.asarray(gate), 3)
    # verify reconstruction
    acc = None
    for t in mpo:
        t = np.asarray(t)
        if acc is None:
            acc = t
        else:
            acc = np.einsum("...r,rois->...ois", acc, t)
    # acc: (1, o1,i1, o2,i2, o3,i3, 1)
    acc = acc.reshape(2, 2, 2, 2, 2, 2)
    acc = acc.transpose(0, 2, 4, 1, 3, 5).reshape(8, 8)
    np.testing.assert_allclose(acc, gate, atol=1e-5)

    m.apply_mpo(mpo, 1, 2, 3)
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    c.any(1, 2, 3, unitary=jnp.asarray(gate))
    f = abs(np.vdot(np.asarray(c.state()), np.asarray(m.wavefunction())))
    np.testing.assert_allclose(f, 1.0, atol=1e-4)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_mps_compress():
    n = 6
    _, m = build_pair(n, chi=None)  # exact
    random_circuit_ops(m, 5)
    nrm_before = float(m.norm())
    psi_before = np.asarray(m.wavefunction())
    m.compress(max_singular_values=4)
    assert max(m.get_bond_dimensions()) <= 4
    psi_after = np.asarray(m.wavefunction())
    overlap = abs(np.vdot(psi_before, psi_after)) / (np.linalg.norm(psi_before) * np.linalg.norm(psi_after))
    assert overlap > 0.5


# ---------------- round-1 parity batch: reference MPS API ----------------


def _build5(c):
    n = 5
    for i in range(n):
        c.h(i)
    for i in range(n - 1):
        c.cx(i, i + 1)
    for i in range(n):
        c.rz(i, theta=0.3 * i + 0.1)
    c.cx(0, 4)
    return c


def test_mps_parity_methods():
    from tensorcircuit_ng_tpu.models.mpscircuit import MPSCircuit, split_tensor
    from tensorcircuit_ng_tpu import quantum as qu

    n = 5
    mps = _build5(MPSCircuit(n))
    dense = _build5(tc.Circuit(n))
    psi_m = np.asarray(mps.wavefunction())
    psi_d = np.asarray(dense.state())
    assert mps.is_valid()
    assert mps.get_center_position() == mps._center
    np.testing.assert_allclose(float(mps.get_norm()), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mps.conj().wavefunction()), psi_m.conj(), atol=1e-6
    )
    shell = mps.copy_without_tensor()
    assert shell._nqubits == n and len(shell._qir) == len(mps._qir)
    # mid_measurement: unnormalized post-selection
    mm = mps.copy()
    mm.mid_measurement(2, keep=1)
    want = psi_d.reshape(4, 2, 4).copy()
    want[:, 0, :] = 0
    np.testing.assert_allclose(np.asarray(mm.wavefunction()), want.reshape(-1), atol=1e-6)
    # slice keeps a valid sub-chain
    sl = mps.slice(1, 3)
    assert sl._nqubits == 3 and sl.is_valid()
    # reduced_density_matrix (keep-convention, order-sensitive)
    rho = np.asarray(mps.reduced_density_matrix([1, 3]))
    rho_want = np.asarray(qu.reduced_density_matrix(psi_d, [0, 2, 4]))
    np.testing.assert_allclose(rho, rho_want, atol=1e-6)
    rho2 = np.asarray(mps.reduced_density_matrix([3, 1]))
    np.testing.assert_allclose(
        rho2, rho_want.reshape(2, 2, 2, 2).transpose(1, 0, 3, 2).reshape(4, 4), atol=1e-6
    )
    # split_tensor: QR and SVD paths reconstruct
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 4))
    for kw in ({}, {"split": {"max_singular_values": 4}}, {"split": {"max_truncation_err": 1e-12}}):
        for cl in (True, False):
            l, r = split_tensor(a, center_left=cl, **kw)
            np.testing.assert_allclose(np.asarray(l @ r), a, atol=1e-5, rtol=1e-4)


def test_mps_mpo_roundtrip_and_apply():
    from tensorcircuit_ng_tpu.models.mpscircuit import MPSCircuit

    n = 5
    rng = np.random.default_rng(0)
    qm, _ = np.linalg.qr(rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4)))
    mps = _build5(MPSCircuit(n))
    # gapped MPO factorization and exact inversion
    mpo, il = mps.gate_to_MPO(qm.reshape(2, 2, 2, 2), 1, 3)
    assert il == 1 and len(mpo) == 3
    back = np.asarray(MPSCircuit.MPO_to_gate(mpo).tensor).reshape(8, 8)
    gi = np.einsum("acbd,ef->aecbfd", qm.reshape(2, 2, 2, 2), np.eye(2)).reshape(8, 8)
    np.testing.assert_allclose(back, gi, atol=1e-6)
    # apply_MPO == dense application (regression for the lborc bond-order bug)
    m2 = mps.copy()
    m2.apply_MPO(mpo, 1)
    d2 = _build5(tc.Circuit(n))
    d2.any(1, 3, unitary=qm)
    np.testing.assert_allclose(
        np.asarray(m2.wavefunction()), np.asarray(d2.state()), atol=1e-6
    )
    # reduce_dimension at tiny truncation leaves the state intact
    m3 = mps.copy()
    m3.position(2)
    m3.reduce_dimension(2, split={"max_truncation_err": 1e-12})
    np.testing.assert_allclose(np.asarray(m3.wavefunction()), np.asarray(mps.wavefunction()), atol=1e-6)


# ---------------- parallel Vidal TEBD engine ----------------


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_parallel_tebd_exact_regime():
    import scipy.linalg as sl
    from tensorcircuit_ng_tpu.models.tebd import ParallelTEBD

    n, chi = 6, 16  # chi = 2^{n/2}: exact
    X = np.array([[0, 1], [1, 0]])
    Z = np.diag([1.0, -1.0])
    hb = 0.8 * np.kron(X, X) + 1.0 * np.kron(Z, Z)
    gm = sl.expm(-1j * 0.05 * hb)
    gate = jnp.asarray(gm.astype(np.complex64))

    def embed(gg, i):
        return np.kron(np.kron(np.eye(2**i), gg), np.eye(2 ** (n - i - 2)))

    eng = ParallelTEBD(n, chi, initial="neel")
    psi = np.zeros(2**n, dtype=complex)
    idx = 0
    for i in range(0, n, 2):
        idx |= 1 << (n - 1 - i)
    psi[idx] = 1.0
    for _ in range(5):
        eng.trotter_step(gate)
        for i in range(0, n - 1, 2):
            psi = embed(gm, i) @ psi
        for i in range(1, n - 1, 2):
            psi = embed(gm, i) @ psi
    psi /= np.linalg.norm(psi)
    wf = np.array(np.asarray(eng.wavefunction()))
    wf /= np.linalg.norm(wf)
    assert abs(np.vdot(psi, wf)) > 0.9999
    zmid = float(np.real(np.asarray(eng.expectation_single(Z, n // 2))))
    z_dense = float(np.real(psi.conj() @ embed(np.kron(Z, np.eye(2)), n // 2) @ psi))
    assert abs(zmid - z_dense) < 1e-3
    zz = float(np.real(np.asarray(eng.expectation_two_site(np.kron(Z, Z), 2))))
    zz_d = float(np.real(psi.conj() @ embed(np.kron(Z, Z), 2) @ psi))
    assert abs(zz - zz_d) < 1e-3
    assert float(np.asarray(eng.entanglement_entropy(n // 2))) > 0


def test_parallel_tebd_inv_s_relative_floor():
    """The S^-1 unwrap's relative noise floor (INV_S_REL) preserves physics.

    The floor drops (rather than inverts) singular directions below
    rel * s_max; on chip this is what keeps the f32 Jacobi trajectory on
    the f64 track (see examples/ab_tebd_f32_stability.py).  Here: the
    explicit floor and the auto default must both match the dense oracle
    in the exact regime, and a forced-large floor must visibly truncate."""
    import scipy.linalg as sl
    from tensorcircuit_ng_tpu.models import tebd as T

    n, chi = 6, 16
    hb = 0.8 * np.kron(
        np.array([[0, 1], [1, 0]]), np.array([[0, 1], [1, 0]])
    ) + np.kron(np.diag([1.0, -1.0]), np.diag([1.0, -1.0]))
    gm = sl.expm(-1j * 0.07 * hb)
    gate = jnp.asarray(gm.astype(np.complex64))

    def embed(gg, i):
        return np.kron(np.kron(np.eye(2**i), gg), np.eye(2 ** (n - i - 2)))

    psi = np.zeros(2**n, dtype=complex)
    idx = 0
    for i in range(0, n, 2):
        idx |= 1 << (n - 1 - i)
    psi[idx] = 1.0
    for _ in range(6):
        for i in range(0, n - 1, 2):
            psi = embed(gm, i) @ psi
        for i in range(1, n - 1, 2):
            psi = embed(gm, i) @ psi
    psi /= np.linalg.norm(psi)

    old = T.INV_S_REL
    try:
        fids = {}
        for rel in (None, 0.0, 1e-6):
            T.INV_S_REL = rel
            eng = T.ParallelTEBD(n, chi, initial="neel")
            for _ in range(6):
                eng.trotter_step(gate)
            wf = np.array(np.asarray(eng.wavefunction()))
            fids[rel] = abs(np.vdot(psi, wf / np.linalg.norm(wf)))
        for rel, f in fids.items():
            assert f > 0.9999, (rel, f)
        # a deliberately huge floor truncates the state (sanity that the
        # knob is actually wired through)
        T.INV_S_REL = 0.9
        eng = T.ParallelTEBD(n, chi, initial="neel")
        for _ in range(6):
            eng.trotter_step(gate)
        wf = np.array(np.asarray(eng.wavefunction()))
        assert abs(np.vdot(psi, wf / np.linalg.norm(wf))) < 0.999
    finally:
        T.INV_S_REL = old


@pytest.mark.slow
def test_parallel_tebd_matches_sequential_mps():
    import scipy.linalg as sl
    from tensorcircuit_ng_tpu.models.tebd import ParallelTEBD
    from tensorcircuit_ng_tpu.models.mpscircuit import MPSCircuit

    X = np.array([[0, 1], [1, 0]])
    Z = np.diag([1.0, -1.0])
    hb = 0.8 * np.kron(X, X) + 1.0 * np.kron(Z, Z)
    gm = sl.expm(-1j * 0.05 * hb)
    gate = jnp.asarray(gm.astype(np.complex64))
    n2, chi2 = 10, 8
    eng = ParallelTEBD(n2, chi2, initial="neel")
    for _ in range(4):
        eng.trotter_step(gate)
    m = MPSCircuit(n2, split={"max_singular_values": chi2})
    for i in range(0, n2, 2):
        m.x(i)
    for _ in range(4):
        for i in range(0, n2 - 1, 2):
            m.any(i, i + 1, unitary=gm)
        for i in range(1, n2 - 1, 2):
            m.any(i, i + 1, unitary=gm)
    z1 = float(np.real(np.asarray(eng.expectation_single(Z, 5))))
    z2 = float(np.real(np.asarray(m.expectation_ps(z=[5]))))
    assert abs(z1 - z2) < 0.05


def test_finite_mps_measurements():
    import tensorcircuit_ng_tpu as tc

    c = tc.Circuit(5)
    m = tc.MPSCircuit(5)
    for cc in (c, m):
        for i in range(5):
            cc.ry(i, theta=0.3 * (i + 1))
        for i in range(4):
            cc.cnot(i, i + 1)
    fm = tc.FiniteMPS(m._tensors, center_position=m._center, canonicalize=False)
    Z = np.diag([1.0, -1.0])
    X = np.array([[0, 1], [1, 0.0]])

    vz, vx = fm.measure_local_operator([Z, X], [1, 3])
    np.testing.assert_allclose(
        np.real(np.asarray(vz)), np.real(np.asarray(c.expectation_ps(z=[1]))), atol=1e-5
    )
    np.testing.assert_allclose(
        np.real(np.asarray(vx)), np.real(np.asarray(c.expectation_ps(x=[3]))), atol=1e-5
    )

    c00, csame, c44 = fm.measure_two_body_correlator(Z, Z, 2, [0, 2, 4])
    np.testing.assert_allclose(
        np.real(np.asarray(c00)), np.real(np.asarray(c.expectation_ps(z=[0, 2]))), atol=1e-5
    )
    np.testing.assert_allclose(np.real(np.asarray(csame)), 1.0, atol=1e-5)  # Z@Z = I
    np.testing.assert_allclose(
        np.real(np.asarray(c44)), np.real(np.asarray(c.expectation_ps(z=[2, 4]))), atol=1e-5
    )

    fc = fm.conj()
    np.testing.assert_allclose(
        np.asarray(fc.tensors[2]), np.conj(np.asarray(fm.tensors[2])), atol=1e-12
    )
    f2 = fm.copy()
    assert len(f2) == 5 and f2.center_position == fm.center_position

    with pytest.raises(ValueError):
        fm.measure_local_operator([Z], [1, 2])


@pytest.mark.slow
def test_parallel_tebd_jacobi_mode_matches_gram():
    import scipy.linalg as sl
    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.models import tebd as tebd_mod
    from tensorcircuit_ng_tpu.core import kernels_jacobi as KJ

    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])
    hb = np.kron(Z, Z) + 0.5 * np.kron(X, np.eye(2))
    gate = sl.expm(-1j * 0.1 * hb).astype(np.complex64)

    def evolve():
        eng = tc.ParallelTEBD(6, 8, initial="neel")
        for _ in range(4):
            eng.trotter_step(gate)
        return np.asarray(eng.wavefunction())

    old_mode, old_interp = tebd_mod.SVD_MODE, KJ._INTERPRET
    try:
        tebd_mod.SVD_MODE = "gram"
        psi_g = evolve()
        tebd_mod.SVD_MODE = "jacobi"
        KJ._INTERPRET = True
        psi_j = evolve()
    finally:
        tebd_mod.SVD_MODE, KJ._INTERPRET = old_mode, old_interp
    ov = abs(np.vdot(psi_g, psi_j)) / (np.linalg.norm(psi_g) * np.linalg.norm(psi_j))
    assert ov > 1 - 1e-5, ov


def test_parallel_tebd_sharded_sites_mesh():
    """Site-sharded ParallelTEBD trotter step over the 8-device mesh.

    Γ tensors sharded along the site axis (bond-neighbor access becomes an
    XLA collective permute); result must equal the unsharded evolution.
    """
    import scipy.linalg as sl
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import tensorcircuit_ng_tpu as tc

    n, chi, steps = 16, 8, 3
    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])
    gate = sl.expm(-1j * 0.1 * (np.kron(Z, Z) + 0.4 * np.kron(X, np.eye(2)))).astype(
        np.complex64
    )

    def step_fn(gammas, lambdas):
        e = tc.ParallelTEBD.from_state(gammas, lambdas)
        for _ in range(steps):
            e.trotter_step(gate)
        return e.gammas, e.lambdas

    g0, l0 = tc.ParallelTEBD.initial_tensors(n, chi, 2, "neel")
    ref_g, ref_l = jax.jit(step_fn)(jnp.asarray(g0), jnp.asarray(l0))

    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.array(devs[:8]), ("sites",))
    sh_g = NamedSharding(mesh, P("sites", None, None, None))
    sh_l = NamedSharding(mesh, P())  # bond weights replicated
    g_sharded = jax.device_put(jnp.asarray(g0), sh_g)
    l_sharded = jax.device_put(jnp.asarray(l0), sh_l)
    out_g, out_l = jax.jit(step_fn, in_shardings=(sh_g, sh_l))(g_sharded, l_sharded)

    np.testing.assert_allclose(np.asarray(out_l), np.asarray(ref_l), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g), atol=1e-5)


@pytest.mark.slow  # 9 s gram tracing; the r3 red-test regression is guarded in the CI tier
# (RUN_SLOW=1), and the fast gate keeps warm/exactness TEBD coverage
def test_parallel_tebd_canonicalize():
    import scipy.linalg as sl
    import tensorcircuit_ng_tpu as tc

    n, chi = 6, 8
    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])
    gate = sl.expm(
        -1j * 0.3 * (np.kron(Z, Z) + 0.6 * np.kron(X, np.eye(2)))
    ).astype(np.complex64)
    eng = tc.ParallelTEBD(n, chi, initial="neel")
    for _ in range(3):
        eng.trotter_step(gate)
    w0 = np.array(eng.wavefunction())
    w0 = w0 / np.linalg.norm(w0)
    sv = np.linalg.svd(w0.reshape(2 ** (n // 2), -1), compute_uv=False)
    eng.canonicalize()
    w1 = np.array(eng.wavefunction())
    w1 = w1 / np.linalg.norm(w1)
    assert abs(np.vdot(w0, w1)) > 1 - 1e-5
    lam = np.sort(np.array(eng.lambdas[n // 2]))[::-1]
    sv = np.sort(sv)[::-1][:8]
    # canonicalize() resolves Schmidt values through an f32 Gram-eigh
    # (linalg.gram_svd): squaring the spectrum means sigma below
    # sqrt(eps_f32)*s_max ~ 3.5e-4 carries absolute error ~eps*s_max^2/sigma
    # (observed 1.1e-5 at sigma=1.2e-4) — tight atol only above that floor.
    big = sv > 5e-4
    np.testing.assert_allclose(lam[:8][big], sv[big], atol=1e-5)
    np.testing.assert_allclose(lam[:8][~big], sv[~big], atol=1e-3)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_parallel_tebd_imaginary_time_ground_state():
    """Imaginary-time TEBD with per-bond edge-corrected gates hits the TFIM
    ground state (validated at err<1e-6 for the long schedule; short here)."""
    import scipy.linalg as sl
    import tensorcircuit_ng_tpu as tc
    import tensorcircuit_ng_tpu.quantum as qu

    n, chi, g = 8, 16, 1.0
    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])

    def hbond(i):
        h = -np.kron(Z, Z) - g * 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
        if i == 0:
            h += -g * 0.5 * np.kron(X, np.eye(2))
        if i == n - 2:
            h += -g * 0.5 * np.kron(np.eye(2), X)
        return h

    def stack(parity, tau):
        return np.stack(
            [sl.expm(-tau * hbond(i)).astype(np.complex64) for i in range(parity, n - 1, 2)]
        )

    eng = tc.ParallelTEBD(n, chi, initial="zeros")
    for tau, steps in ((0.2, 60), (0.05, 80)):
        h0, f1 = stack(0, tau / 2), stack(1, tau)
        for k in range(steps):
            eng.apply_two_site_layer(h0, 0)
            eng.apply_two_site_layer(f1, 1)
            eng.apply_two_site_layer(h0, 0)
            if k % 20 == 19:
                eng.canonicalize()
    e = sum(
        float(jnp.real(eng.expectation_two_site(hbond(i), i))) for i in range(n - 1)
    )
    terms, ws = [], []
    for i in range(n - 1):
        l = [0] * n
        l[i] = 3
        l[i + 1] = 3
        terms.append(l)
        ws.append(-1.0)
    for i in range(n):
        l = [0] * n
        l[i] = 1
        terms.append(l)
        ws.append(-g)
    H = np.asarray(
        qu.PauliStringSum2Dense(
            jnp.asarray(np.array(terms), dtype=jnp.int32),
            jnp.asarray(np.array(ws), dtype=jnp.float32),
        )
    ).real
    e_exact = float(np.linalg.eigvalsh(H)[0])
    assert abs(e - e_exact) < 5e-3, (e, e_exact)


@pytest.mark.slow  # 13 s; warm threading is opt-in, and the subspace-mode
# test exercises the same warm_state/from_state machinery in the fast gate
def test_parallel_tebd_warm_start_matches_cold():
    """Warm-started Jacobi (vh threaded via warm_state/from_state, 4 sweeps)
    reproduces the cold 10-sweep evolution (interpret-mode kernel)."""
    import scipy.linalg as sl
    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.models import tebd as tebd_mod
    from tensorcircuit_ng_tpu.core import kernels_jacobi as KJ

    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])
    hb = np.kron(Z, Z) + 0.5 * np.kron(X, np.eye(2))
    gate = sl.expm(-1j * 0.12 * hb).astype(np.complex64)
    # chi=4 < 2^(n/2): truncation is ACTIVE by step 2, so the warm path is
    # exercised in the regime that motivated the inverse-free unwrap
    n, chi, steps = 8, 4, 3

    def evolve(threaded):
        eng = tc.ParallelTEBD(n, chi, initial="neel")
        gr, gi, lam = (
            jnp.real(jnp.asarray(eng.gammas)),
            jnp.imag(jnp.asarray(eng.gammas)),
            jnp.asarray(eng.lambdas),
        )
        # warm={} opts in to recording from step 1 (cold sweeps, warm later)
        warm = {} if threaded else None
        for _ in range(steps):
            eng = tc.ParallelTEBD.from_state(
                gr + 1j * gi, lam, warm=warm if threaded else None
            )
            eng.trotter_step(gate)
            warm = eng.warm_state()
            gr, gi, lam = jnp.real(eng.gammas), jnp.imag(eng.gammas), eng.lambdas
        return np.asarray(tc.ParallelTEBD.from_state(gr + 1j * gi, lam).wavefunction())

    old_mode, old_interp = tebd_mod.SVD_MODE, KJ._INTERPRET
    try:
        tebd_mod.SVD_MODE = "jacobi"
        KJ._INTERPRET = True
        psi_c = evolve(False)
        psi_w = evolve(True)
    finally:
        tebd_mod.SVD_MODE, KJ._INTERPRET = old_mode, old_interp
    ov = abs(np.vdot(psi_c, psi_w)) / (np.linalg.norm(psi_c) * np.linalg.norm(psi_w))
    assert ov > 1 - 1e-5, ov


@pytest.mark.slow  # 11 s; subspace is an OPT-IN mode (refuted as default by the hardware A/B);
# kernels-level subspace_svd parity stays in test_kernels in the fast gate
def test_parallel_tebd_subspace_mode_matches_gram():
    """SVD_MODE='subspace' (MXU subspace capture + panel Jacobi, interpret
    kernel) reproduces the gram-SVD evolution, cold and warm-threaded,
    under ACTIVE truncation."""
    import scipy.linalg as sl
    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.models import tebd as tebd_mod
    from tensorcircuit_ng_tpu.core import kernels_jacobi as KJ

    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])
    hb = np.kron(Z, Z) + 0.5 * np.kron(X, np.eye(2))
    gate = sl.expm(-1j * 0.12 * hb).astype(np.complex64)
    n, chi, steps = 8, 4, 3  # chi < 2^(n/2): truncation active by step 2

    def evolve(mode, threaded=False):
        eng = tc.ParallelTEBD(n, chi, initial="neel")
        gr, gi, lam = (
            jnp.real(jnp.asarray(eng.gammas)),
            jnp.imag(jnp.asarray(eng.gammas)),
            jnp.asarray(eng.lambdas),
        )
        old = tebd_mod.SVD_MODE
        tebd_mod.SVD_MODE = mode
        try:
            warm = {} if threaded else None
            for _ in range(steps):
                eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam, warm=warm)
                eng.trotter_step(gate)
                if threaded:
                    warm = eng.warm_state()
                gr, gi, lam = (
                    jnp.real(eng.gammas),
                    jnp.imag(eng.gammas),
                    eng.lambdas,
                )
        finally:
            tebd_mod.SVD_MODE = old
        return np.asarray(
            tc.ParallelTEBD.from_state(gr + 1j * gi, lam).wavefunction()
        )

    psi_g = evolve("gram")
    old_interp = KJ._INTERPRET
    try:
        KJ._INTERPRET = True
        psi_s = evolve("subspace")
        psi_w = evolve("subspace", threaded=True)
    finally:
        KJ._INTERPRET = old_interp
    # warm uses refine=1 capture (one alternating round): ~1e-4-grade
    # subspace error per step is by design (cold refine=2 is tighter)
    for tag, tol, psi in (("cold", 1e-4, psi_s), ("warm", 1e-3, psi_w)):
        ov = abs(np.vdot(psi_g, psi)) / (
            np.linalg.norm(psi_g) * np.linalg.norm(psi)
        )
        assert ov > 1 - tol, (tag, ov)
