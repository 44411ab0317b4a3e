"""quantum.py toolbox tests: Hamiltonians, QI metrics, counts."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu


def dense_pauli(l):
    I = np.eye(2)
    X = np.array([[0, 1], [1, 0]])
    Y = np.array([[0, -1j], [1j, 0]])
    Z = np.diag([1, -1])
    mats = [I, X, Y, Z]
    out = np.eye(1)
    for i in l:
        out = np.kron(out, mats[i])
    return out


@pytest.mark.parametrize("l", [[1, 0], [3, 3], [2, 1], [0, 2], [1, 2, 3], [2, 2, 2]])
def test_pauli_string_coo(l):
    sp = qu.PauliStringSum2COO([l], numpy=True)
    np.testing.assert_allclose(np.asarray(sp.todense()), dense_pauli(l), atol=1e-8)


def test_pauli_sum_dense_and_mvp():
    ls = [[1, 0, 0], [3, 3, 0], [0, 2, 2], [3, 0, 3]]
    w = [0.5, -1.0, 0.7, 0.3]
    expected = sum(wi * dense_pauli(li) for wi, li in zip(w, ls))
    dense = np.asarray(qu.PauliStringSum2Dense(ls, w))
    np.testing.assert_allclose(dense, expected, atol=1e-6)
    mvp = qu.PauliStringSum2MVP(ls, w)
    v = np.random.default_rng(0).normal(size=8) + 1j * np.random.default_rng(1).normal(size=8)
    v = jnp.asarray(v, dtype=jnp.complex64)
    np.testing.assert_allclose(np.asarray(mvp(v)), expected @ np.asarray(v), atol=1e-4)
    # jit + grad compatible
    f = jax.jit(lambda x: jnp.real(jnp.vdot(x, mvp(x))))
    assert np.isfinite(float(f(v)))


def test_heisenberg_hamiltonian():
    try:
        import networkx as nx
        g = nx.Graph()
        g.add_edge(0, 1)
        g.add_edge(1, 2)
    except ImportError:
        g = [(0, 1), (1, 2)]
    h = qu.heisenberg_hamiltonian(g, hzz=1.0, hxx=1.0, hyy=1.0, sparse=False)
    e = np.linalg.eigvalsh(np.asarray(h))
    # 3-site Heisenberg chain ground state energy = -4
    np.testing.assert_allclose(e[0], -4.0, atol=1e-5)


def test_entropy_and_entanglement():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    s = c.state()
    rho_a = qu.reduced_density_matrix(s, [1])
    np.testing.assert_allclose(np.asarray(rho_a), np.eye(2) / 2, atol=1e-6)
    np.testing.assert_allclose(float(qu.entanglement_entropy(s, [1])), np.log(2), atol=1e-5)
    np.testing.assert_allclose(float(qu.renyi_entropy(rho_a, 2)), np.log(2), atol=1e-5)
    # product state: zero entanglement
    c2 = tc.Circuit(2)
    c2.h(0)
    np.testing.assert_allclose(float(qu.entanglement_entropy(c2.state(), [1])), 0.0, atol=1e-4)


def test_fidelity_trace_distance():
    c = tc.Circuit(1)
    c.h(0)
    psi = c.state()
    rho = np.outer(np.asarray(psi), np.asarray(psi).conj())
    sigma = np.eye(2) / 2
    f = float(qu.fidelity(jnp.asarray(rho), jnp.asarray(sigma)))
    np.testing.assert_allclose(f, 0.5, atol=1e-5)
    td = float(qu.trace_distance(jnp.asarray(rho), jnp.asarray(sigma)))
    np.testing.assert_allclose(td, 0.5, atol=1e-4)


def test_negativity():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    rho = np.asarray(c.densitymatrix() if hasattr(c, "densitymatrix") else None) if False else np.outer(np.asarray(c.state()), np.asarray(c.state()).conj())
    neg = float(qu.entanglement_negativity(jnp.asarray(rho), [0]))
    np.testing.assert_allclose(neg, 0.5, atol=1e-5)
    logneg = float(qu.log_negativity(jnp.asarray(rho), [0], base="2"))
    np.testing.assert_allclose(logneg, 1.0, atol=1e-5)


def test_gibbs_and_double_state():
    h = np.diag([0.0, 1.0]).astype(np.complex64)
    rho = np.asarray(qu.gibbs_state(jnp.asarray(h), beta=1.0))
    z = 1 + np.exp(-1)
    np.testing.assert_allclose(np.diag(rho), [1 / z, np.exp(-1) / z], atol=1e-5)
    psi = np.asarray(qu.double_state(jnp.asarray(h), beta=1.0))
    rho_red = qu.reduced_density_matrix(jnp.asarray(psi), [1])
    np.testing.assert_allclose(np.asarray(rho_red), rho, atol=1e-5)


def test_partial_transpose_involution():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    rho = m @ m.conj().T
    rho = rho / np.trace(rho)
    pt = qu.partial_transpose(jnp.asarray(rho), [0])
    pt2 = qu.partial_transpose(pt, [0])
    np.testing.assert_allclose(np.asarray(pt2), rho, atol=1e-6)


def test_count_conversions():
    samples = jnp.asarray([0, 3, 3, 2, 0, 0])
    cv = qu.sample2all(samples, 2, format="count_vector")
    np.testing.assert_allclose(np.asarray(cv), [3, 0, 1, 2])
    d_bin = qu.sample2all(samples, 2, format="count_dict_bin")
    assert d_bin == {"00": 3, "10": 1, "11": 2}
    d_int = qu.sample2all(samples, 2, format="count_dict_int")
    assert d_int == {0: 3, 2: 1, 3: 2}
    sb = np.asarray(qu.sample2all(samples, 2, format="sample_bin"))
    np.testing.assert_allclose(sb[1], [1, 1])
    vals, cnts = qu.sample2all(samples, 2, format="count_tuple")
    np.testing.assert_allclose(np.asarray(vals), [0, 2, 3])
    # roundtrips
    cv2 = qu.count_dict2vector(d_int, 2)
    np.testing.assert_allclose(np.asarray(cv2), np.asarray(cv))


def test_measurement_counts():
    c = tc.Circuit(2)
    c.h(0)
    p = qu.measurement_counts(c.state(), counts=None)
    np.testing.assert_allclose(np.asarray(p), [0.5, 0, 0.5, 0], atol=1e-6)
    cv = qu.measurement_counts(
        c.state(), counts=1000, format="count_vector",
        status=jnp.asarray(np.random.default_rng(0).uniform(size=1000)))
    cv = np.asarray(cv)
    assert cv[1] == 0 and cv[3] == 0
    assert abs(cv[0] - 500) < 100


def test_correlation():
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    samples = c.sample(batch=500, allow_state=True, format="sample_bin",
                       status=jnp.asarray(np.random.default_rng(0).uniform(size=500)))
    corr = float(qu.correlation_from_samples([0, 1], samples, 2))
    np.testing.assert_allclose(corr, 1.0, atol=1e-6)
    cv = c.sample(batch=500, allow_state=True, format="count_vector",
                  status=jnp.asarray(np.random.default_rng(1).uniform(size=500)))
    corr2 = float(qu.correlation_from_counts([0, 1], cv))
    np.testing.assert_allclose(corr2, 1.0, atol=1e-6)


def test_quoperator_algebra():
    X = jnp.asarray(np.array([[0, 1], [1, 0]]), dtype=jnp.complex64)
    Z = jnp.asarray(np.diag([1.0, -1.0]), dtype=jnp.complex64)
    qx = qu.QuOperator.from_tensor(X)
    qz = qu.QuOperator.from_tensor(Z)
    prod = qx @ qz
    np.testing.assert_allclose(np.asarray(prod.eval_matrix()), np.asarray(X @ Z), atol=1e-6)
    tp = qx | qz
    np.testing.assert_allclose(np.asarray(tp.eval_matrix()), np.kron(np.asarray(X), np.asarray(Z)), atol=1e-6)
    adjoint = (1j * qx).adjoint()
    np.testing.assert_allclose(np.asarray(adjoint.eval_matrix()), -1j * np.asarray(X), atol=1e-6)
    # vector
    c = tc.Circuit(2)
    c.h(0)
    c.cnot(0, 1)
    qv = qu.QuVector.from_tensor(c.state(form="tensor"))
    rho = qv.projector()
    np.testing.assert_allclose(float(jnp.real(rho.trace().eval())), 1.0, atol=1e-6)
    rdm = qv.reduced_density_matrix([0])
    np.testing.assert_allclose(np.asarray(rdm.eval_matrix()), np.eye(2) / 2, atol=1e-6)


def test_expectation_quoperator_in_circuit():
    c = tc.Circuit(2)
    c.h(0)
    qv = c.get_quvector()
    assert qv.shape == (4, 1)


@pytest.mark.slow  # lobpcg niche; hamiltonian builders covered elsewhere in this file
def test_generate_local_hamiltonian_and_lobpcg():
    import numpy as np
    from tensorcircuit_ng_tpu import quantum as qu
    from tensorcircuit_ng_tpu.backend import backend as K

    z = np.diag([1.0, -1.0])
    x = np.array([[0.0, 1.0], [1.0, 0.0]])
    h = qu.generate_local_hamiltonian(np.kron(z, z).reshape(2, 2, 2, 2), x)
    np.testing.assert_allclose(
        np.asarray(h).reshape(8, 8), np.kron(np.kron(z, z), x), atol=1e-6
    )
    qop = qu.generate_local_hamiltonian(x, z, matrix_form=False)
    np.testing.assert_allclose(
        np.asarray(qop.eval_matrix()), np.kron(x, z), atol=1e-6
    )

    # lobpcg ground state of a sparse TFIM matches dense eigh
    n = 5
    ls, ws = [], []
    for i in range(n - 1):
        l = [0] * n
        l[i] = 3
        l[i + 1] = 3
        ls.append(l)
        ws.append(1.0)
    for i in range(n):
        l = [0] * n
        l[i] = 1
        ls.append(l)
        ws.append(-1.0)
    hs = qu.PauliStringSum2COO(ls, ws)
    hd = qu.PauliStringSum2Dense(ls, ws, numpy=True)
    e_exact = float(np.linalg.eigvalsh(hd)[0])
    x0 = np.random.default_rng(0).normal(size=(2**n, 4)).astype(np.complex64)
    vals, vecs = K.lobpcg(hs, x0, max_iter=300)
    np.testing.assert_allclose(float(np.real(vals[0])), e_exact, atol=1e-3)
    # residual check on the eigenvector
    v0 = np.asarray(vecs[:, 0])
    res = np.linalg.norm(np.asarray(hs.todense()) @ v0 - vals[0] * v0)
    assert res < 5e-2


def test_numpycoo_sparse_ops():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tensorcircuit_ng_tpu.backend import backend as K, NumpyCOO

    idx = np.array([[0, 1], [1, 0], [2, 2], [2, 0]])
    vals = np.array([1.0 + 1j, 2.0, -1.0, 0.5], dtype=np.complex64)
    m = K.coo_sparse_matrix(idx, vals, (3, 3))
    assert isinstance(m, NumpyCOO)
    assert K.is_sparse(m)
    dense = np.zeros((3, 3), dtype=np.complex64)
    for (r, c), v in zip(idx, vals):
        dense[r, c] += v
    np.testing.assert_allclose(np.asarray(m.todense()), dense, atol=1e-6)
    v = np.arange(3).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(m @ v), dense @ v, atol=1e-6)
    b = np.arange(6).reshape(3, 2).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(m @ b), dense @ b, atol=1e-6)

    # closed over jit (the axon-critical property) + tracer passthrough
    f = jax.jit(lambda x: jnp.real(jnp.sum(m @ x)))
    np.testing.assert_allclose(float(f(v)), float(np.real(np.sum(dense @ v))), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(K.to_dense(m) if hasattr(K, "to_dense") else m.todense()),
        dense,
        atol=1e-6,
    )
    sp = m.to_scipy()
    np.testing.assert_allclose(sp.todense(), dense, atol=1e-6)


# ---------------- round-1 parity batch: helper functions ----------------


def test_ps2xyz_roundtrip():
    assert qu.ps2xyz([1, 2, 2, 0]) == {"x": [0], "y": [1, 2], "z": []}
    assert qu.xyz2ps({"x": [0], "y": [1, 2], "z": []}, 4) == [1, 2, 2, 0]
    assert qu.xyz2ps(qu.ps2xyz([0, 3, 1]), 3) == [0, 3, 1]


def test_u1_sector_tools():
    inds = np.asarray(qu.u1_inds(5, 1))
    assert inds.tolist() == [1, 2, 4, 8, 16]
    assert float(np.asarray(qu.u1_mask(4, 2)).sum()) == 6
    s = np.random.default_rng(0).normal(size=16)
    p = qu.u1_project(s, 4, 2)
    e = np.asarray(qu.u1_enlarge(p, 4, 2))
    np.testing.assert_allclose(e[np.asarray(qu.u1_inds(4, 2))], s[np.asarray(qu.u1_inds(4, 2))], atol=1e-6)
    assert abs(e.sum() - s[np.asarray(qu.u1_inds(4, 2))].sum()) < 1e-6


def test_trace_product_and_anti_flatness():
    o = np.ones([2, 2])
    h = np.eye(2)
    assert abs(qu.trace_product(o, h) - 2.0) < 1e-6
    qop = qu.QuOperator.from_tensor(o)
    assert abs(qu.trace_product(qop, h) - 2.0) < 1e-6
    # maximally mixed and pure states are flat: anti-flatness 0
    assert abs(float(qu.anti_flatness(np.eye(4) / 4))) < 1e-6
    psi = np.zeros(4); psi[0] = 1
    assert abs(float(qu.anti_flatness(np.outer(psi, psi)))) < 1e-6
    # non-flat spectrum
    rho = np.diag([0.9, 0.1])
    lam = np.array([0.9, 0.1])
    expected = (lam**3).sum() - (lam**2).sum() ** 2
    np.testing.assert_allclose(float(qu.anti_flatness(rho)), expected, atol=1e-6)
    v = float(qu.entanglement_anti_flatness(np.ones(8) / np.sqrt(8.0), [0]))
    assert abs(v) < 1e-6


def test_reduced_wavefunction():
    import tensorcircuit_ng_tpu as tc

    c = tc.Circuit(3)
    c.h(0); c.cx(0, 1); c.x(2)
    full = np.asarray(c.state())
    rw = np.asarray(qu.reduced_wavefunction(full, [2], [1]))
    np.testing.assert_allclose(rw, full.reshape(4, 2)[:, 1], atol=1e-6)
    rw0 = np.asarray(qu.reduced_wavefunction(full, [0], [0]))
    np.testing.assert_allclose(rw0, full.reshape(2, 4)[0], atol=1e-6)


def test_ps2coo_core_vs_dense():
    for l in ([1, 3], [2, 0, 1], [3, 3]):
        idx, vals = qu.ps2coo_core(l)
        size = 2 ** len(l)
        dense = np.zeros([size, size], dtype=np.complex128)
        dense[idx[:, 0], idx[:, 1]] = vals
        np.testing.assert_allclose(dense, np.asarray(qu.PauliString2Dense(l)), atol=1e-6)


def test_op2tensor_decorator():
    @qu.op2tensor
    def tr(x):
        return np.trace(x)

    qop = qu.QuOperator.from_tensor(np.eye(2) * 2)
    assert abs(tr(qop) - 4.0) < 1e-6
    assert abs(tr(np.eye(3)) - 3.0) < 1e-6


def test_mpo_interop_vendored_fixtures():
    """tenpy2qop / quimb2qop validated against vendored-format fixtures.

    tenpy/quimb are not installed, so these fixtures reproduce the exact
    array layouts the libraries hand over (tenpy ``get_W -> (wL, wR, p, p*)``,
    quimb ``.arrays`` with (l, r, out, in) and rank-3 boundary tensors) for
    the standard bond-dimension-3 transverse-field Ising MPO; the converted
    QuOperator must equal the independently built dense Hamiltonian
    (reference quantum.py:1644/1824 conversions).
    """
    import numpy as np
    import jax.numpy as jnp
    from tensorcircuit_ng_tpu import quantum as qu

    J, g, L = 1.0, 0.7, 4
    I2 = np.eye(2)
    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])

    # W[a, b, p, p*]: rows/cols index the bond, standard TFI grid
    W = np.zeros((3, 3, 2, 2))
    W[0, 0] = I2
    W[0, 1] = Z
    W[0, 2] = -g * X
    W[1, 2] = -J * Z
    W[2, 2] = I2
    Ws = [W[0:1]] + [W] * (L - 2) + [W[:, 2:3]]

    # dense oracle
    ls, ws = [], []
    for i in range(L - 1):
        v = [0] * L
        v[i] = 3
        v[i + 1] = 3
        ls.append(v)
        ws.append(-J)
    for i in range(L):
        v = [0] * L
        v[i] = 1
        ls.append(v)
        ws.append(-g)
    h_dense = np.asarray(qu.PauliStringSum2Dense(ls, ws, numpy=True))

    class FakeTenpyW:
        def __init__(self, w):
            self._w = w

        def to_ndarray(self):
            return self._w  # (wL, wR, p, p*)

    class FakeTenpyMPO:
        L = len(Ws)

        def get_W(self, i):
            return FakeTenpyW(Ws[i])

    m1 = np.asarray(qu.tenpy2qop(FakeTenpyMPO()).eval_matrix())
    np.testing.assert_allclose(m1, h_dense, atol=1e-6)

    class FakeQuimbMPO:
        # quimb arrays: (l, r, out, in); boundary tensors drop the outer bond
        arrays = (
            [np.transpose(Ws[0][0], (0, 1, 2))]  # (r, p, p*) == (r, out, in)
            + [np.transpose(W, (0, 1, 2, 3))] * (L - 2)
            + [np.transpose(Ws[-1][:, 0], (0, 1, 2))]  # (l, out, in)
        )

    m2 = np.asarray(qu.quimb2qop(FakeQuimbMPO()).eval_matrix())
    np.testing.assert_allclose(m2, h_dense, atol=1e-6)

    # tn2qop chain independently
    chain = [jnp.asarray(np.transpose(w, (0, 2, 3, 1))) for w in Ws]
    m3 = np.asarray(qu.tn2qop(chain).eval_matrix())
    np.testing.assert_allclose(m3, h_dense, atol=1e-6)
