"""Pallas fused-layer kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import kernels


@pytest.fixture
def interpret_mode():
    kernels.set_interpret_mode(True)
    yield
    kernels.set_interpret_mode(False)


def random_state_and_gates(n, seed=0):
    rng = np.random.default_rng(seed)
    psi = rng.standard_normal(2**n) + 1j * rng.standard_normal(2**n)
    psi = jnp.asarray(psi / np.linalg.norm(psi), dtype=jnp.complex64)
    gates = []
    for _ in range(n):
        m = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
        q, _ = np.linalg.qr(m)
        gates.append(q)
    return psi, jnp.asarray(np.stack(gates), dtype=jnp.complex64)


@pytest.mark.parametrize("n", [4, 8])
def test_fused_layer_forward(interpret_mode, n):
    psi, gates = random_state_and_gates(n, seed=n)
    out = kernels._fused_fwd_impl(psi, gates)
    ref = kernels._apply_layer_reference(psi, gates)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_fused_layer_gradients(interpret_mode):
    n = 8
    psi, gates = random_state_and_gates(n, seed=2)

    def loss_fused(g, p):
        y = kernels.fused_single_qubit_layer(p, g)
        return jnp.real(jnp.sum(y).real + jnp.imag(jnp.sum(y * y)))

    def loss_ref(g, p):
        y = kernels._apply_layer_reference(p, g)
        return jnp.real(jnp.sum(y).real + jnp.imag(jnp.sum(y * y)))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(gates, psi)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(gates, psi)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_fused_layer_rx_parameterized(interpret_mode):
    # typical VQE use: rx(theta_q) on every qubit, grad through thetas
    n = 8
    from tensorcircuit_ng_tpu.ops.gates import rx_matrix

    def loss(thetas):
        c = tc.Circuit(n)
        for i in range(n):
            c.h(i)
        psi = c.state()
        gates = jax.vmap(lambda t: rx_matrix(t))(thetas)
        psi = kernels.fused_single_qubit_layer(psi, gates)
        from tensorcircuit_ng_tpu.core import statevec

        return jnp.real(statevec.expectation_ps(psi, z=[0, 1]))

    thetas = jnp.asarray(np.random.default_rng(0).normal(size=n) * 0.4, dtype=jnp.float32)

    def loss_ref(thetas):
        c = tc.Circuit(n)
        for i in range(n):
            c.h(i)
        for i in range(n):
            c.rx(i, theta=thetas[i])
        return jnp.real(c.expectation_ps(z=[0, 1]))

    np.testing.assert_allclose(float(loss(thetas)), float(loss_ref(thetas)), atol=1e-5)
    g1 = jax.grad(loss)(thetas)
    g2 = jax.grad(loss_ref)(thetas)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_fused_circuit_api_matches_plain():
    n = 6
    rng = np.random.default_rng(1)
    thz = jnp.asarray(rng.normal(size=n - 1) * 0.4, dtype=jnp.float32)
    thx = jnp.asarray(rng.normal(size=n) * 0.4, dtype=jnp.float32)
    pairs = [(i, i + 1) for i in range(n - 1)]

    c1 = tc.Circuit(n)
    c1.h_layer()
    c1.rzz_product(pairs, thz)
    c1.rx_layer(thx)

    c2 = tc.Circuit(n)
    for i in range(n):
        c2.h(i)
    for k, (a, b) in enumerate(pairs):
        c2.rzz(a, b, theta=thz[k])
    for i in range(n):
        c2.rx(i, theta=thx[i])

    np.testing.assert_allclose(np.asarray(c1.state()), np.asarray(c2.state()), atol=1e-5)
    # fused energy helpers
    e1 = float(c1.expectation_zz_sum(pairs)) - float(c1.expectation_x_sum())
    e2 = sum(float(np.real(np.asarray(c2.expectation_ps(z=[a, b])))) for a, b in pairs)
    e2 -= sum(float(np.real(np.asarray(c2.expectation_ps(x=[i])))) for i in range(n))
    np.testing.assert_allclose(e1, e2, atol=1e-4)
    # matrix()/IR expansion of fused items
    np.testing.assert_allclose(np.asarray(c1.matrix()), np.asarray(c2.matrix()), atol=1e-5)
    # grads through the fused stack
    def loss(tz, tx):
        c = tc.Circuit(n)
        c.h_layer()
        c.rzz_product(pairs, tz)
        c.rx_layer(tx)
        return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()

    def loss_ref(tz, tx):
        c = tc.Circuit(n)
        for i in range(n):
            c.h(i)
        for k, (a, b) in enumerate(pairs):
            c.rzz(a, b, theta=tz[k])
        for i in range(n):
            c.rx(i, theta=tx[i])
        e = sum(jnp.real(c.expectation_ps(z=[a, b])) for a, b in pairs)
        e -= sum(jnp.real(c.expectation_ps(x=[i])) for i in range(n))
        return e

    g1 = jax.grad(loss, argnums=(0, 1))(thz, thx)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(thz, thx)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)


@pytest.mark.slow
def test_row_layer_lane_matches_separate(interpret_mode):
    """Lane-fused kernel (optional path) == row kernel + explicit matmul."""
    import jax
    import jax.numpy as jnp
    from tensorcircuit_ng_tpu.core import kernels_rowlayer as krl

    rng = np.random.default_rng(5)
    nrow, lanes = 3, 128
    r = 2 ** (nrow + 1)  # two grid blocks

    def rand_u(k):
        h = rng.normal(size=(k, k)) + 1j * rng.normal(size=(k, k))
        q, _ = np.linalg.qr(h)
        return q

    gates = jnp.asarray(np.stack([rand_u(2) for _ in range(nrow)]), dtype=jnp.complex64)
    mlane = jnp.asarray(rand_u(lanes), dtype=jnp.complex64)
    psi = rng.normal(size=(r, lanes)) + 1j * rng.normal(size=(r, lanes))
    psi = jnp.asarray(psi / np.linalg.norm(psi), dtype=jnp.complex64)

    y1 = krl.row_layer_lane(psi, gates, mlane)
    y2 = krl.row_layer(psi, gates) @ mlane
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    # gradients agree with the unfused composition
    def loss_fused(p, g, m):
        return jnp.real(jnp.sum(krl.row_layer_lane(p, g, m) * jnp.conj(psi)))

    def loss_ref(p, g, m):
        return jnp.real(jnp.sum((krl.row_layer(p, g) @ m) * jnp.conj(psi)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(psi, gates, mlane)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(psi, gates, mlane)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_fused_rx_layer_both_paths(interpret_mode):
    """theta-native rotx (USE_ROTX on) == generic gate layer, incl. grads."""
    import jax
    import jax.numpy as jnp

    from tensorcircuit_ng_tpu.core import kernels
    from tensorcircuit_ng_tpu.ops.gates import rx_matrix

    n = 9  # 2 row qubits + 7 lanes
    rng = np.random.default_rng(2)
    psi = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    psi = jnp.asarray(psi / np.linalg.norm(psi), dtype=jnp.complex64)
    th = jnp.asarray(rng.normal(size=n) * 0.5, jnp.float32)

    old = kernels.USE_ROTX
    try:
        kernels.USE_ROTX = True
        y1 = kernels.fused_rx_layer(psi, th)
        kernels.USE_ROTX = False
        y2 = kernels.fused_rx_layer(psi, th)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

        def loss(t, flag):
            kernels.USE_ROTX = flag
            return jnp.real(jnp.sum(kernels.fused_rx_layer(psi, t) * jnp.conj(psi)))

        g1 = jax.grad(lambda t: loss(t, True))(th)
        g2 = jax.grad(lambda t: loss(t, False))(th)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)
    finally:
        kernels.USE_ROTX = old


# ---------------- fused zz+rx layer kernel ----------------


# fast-gate since r5: one interpret-mode representative per kernel family (VERDICT r4 #5)
def test_zzrx_kernel_reference_and_interpret():
    from tensorcircuit_ng_tpu.core import kernels_rowlayer as kr
    from tensorcircuit_ng_tpu.core import kernels
    from tensorcircuit_ng_tpu.core import statevec as sv
    from tensorcircuit_ng_tpu.ops.gates import rx_matrix

    n = 9
    nrow_all = n - 7
    nrow_k = 2
    pairs = tuple((i, i + 1) for i in range(n - 1))
    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))
    psi = (psi / np.linalg.norm(psi)).astype(np.complex64)
    state2d = jnp.asarray(psi.reshape(2**nrow_all, 128))
    zzth = jnp.asarray(rng.normal(size=len(pairs)), dtype=jnp.float32)
    rxth = jnp.asarray(rng.normal(size=nrow_k), dtype=jnp.float32)
    w = jnp.asarray(
        (rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,)))
        .astype(np.complex64)
        .reshape(2**nrow_all, 128)
    )

    def via_kernel(s2d, zt, rt):
        return jnp.real(jnp.vdot(w, kr.zzrx_row_layer(pairs, n, s2d, zt, rt)))

    def via_plain(s2d, zt, rt):
        s = jnp.reshape(s2d, (-1,))
        s = sv.apply_zz_product_phase(s, pairs, zt)
        for q in range(nrow_k):
            s = sv.apply_unitary(s, rx_matrix(rt[q]).astype(s.dtype), [q])
        return jnp.real(jnp.vdot(jnp.reshape(w, (-1,)), s))

    v2, g2 = jax.value_and_grad(via_plain, argnums=(0, 1, 2))(state2d, zzth, rxth)
    for interp in (False, True):
        kernels.set_interpret_mode(interp)
        try:
            v1, g1 = jax.value_and_grad(via_kernel, argnums=(0, 1, 2))(state2d, zzth, rxth)
        finally:
            kernels.set_interpret_mode(False)
        assert abs(float(v1 - v2)) < 1e-4
        for a, b in zip(g1, g2):
            assert float(jnp.abs(jnp.reshape(a, (-1,)) - jnp.reshape(b, (-1,))).max()) < 1e-3


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_zzrx_kernel_over_128_pairs():
    """Sign-column padding widens past the 128 budget (regression: n>=17
    all-to-all layers crashed with a negative pad width)."""
    from tensorcircuit_ng_tpu.core import kernels_rowlayer as kr
    from tensorcircuit_ng_tpu.core import kernels
    from tensorcircuit_ng_tpu.core import statevec as sv

    n = 9
    base = [(i, j) for i in range(n) for j in range(i + 1, n)]  # 36
    pairs = tuple((base * 4)[:140])  # zz phases commute; duplicates are legal
    rng = np.random.default_rng(5)
    psi = rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))
    psi = (psi / np.linalg.norm(psi)).astype(np.complex64)
    state2d = jnp.asarray(psi.reshape(2 ** (n - 7), 128))
    zzth = jnp.asarray(rng.normal(size=len(pairs)) * 0.1, dtype=jnp.float32)
    rxth = jnp.asarray(rng.normal(size=2) * 0.3, dtype=jnp.float32)
    w = jnp.asarray(
        (rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))).astype(np.complex64)
    )

    def via_kernel(zt, rt):
        y = kr.zzrx_row_layer(pairs, n, state2d, zt, rt)
        return jnp.real(jnp.vdot(w, jnp.reshape(y, (-1,))))

    def via_plain(zt, rt):
        from tensorcircuit_ng_tpu.ops.gates import rx_matrix

        s = jnp.reshape(state2d, (-1,))
        s = sv.apply_zz_product_phase(s, pairs, zt)
        for q in range(2):
            s = sv.apply_unitary(s, rx_matrix(rt[q]).astype(s.dtype), [q])
        return jnp.real(jnp.vdot(w, s))

    v2, g2 = jax.value_and_grad(via_plain, argnums=(0, 1))(zzth, rxth)
    kernels.set_interpret_mode(True)
    try:
        v1, g1 = jax.value_and_grad(via_kernel, argnums=(0, 1))(zzth, rxth)
    finally:
        kernels.set_interpret_mode(False)
    assert abs(float(v1 - v2)) < 1e-4
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_zzrx_layer_circuit_equivalence():
    # multi-block + outer-qubit configuration via a shrunken kernel budget
    from tensorcircuit_ng_tpu.core import kernels_rowlayer as kr
    from tensorcircuit_ng_tpu.core import kernels

    old = kr.MAX_KERNEL_QUBITS_ZZRX
    kr.MAX_KERNEL_QUBITS_ZZRX = 2
    kernels.set_interpret_mode(True)
    try:
        n = 10  # nrow=3 > kernel budget... (shrunken below) -> outer-qubit path
        pairs = [(i, i + 1) for i in range(n - 1)]
        rng = np.random.default_rng(1)
        zz = jnp.asarray(rng.normal(size=n - 1), dtype=jnp.float32)
        rx = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)

        def e_fused(zz, rx):
            c = tc.Circuit(n)
            c.h_layer()
            c.zzrx_layer(pairs, zz, rx)
            return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()

        def e_plain(zz, rx):
            c = tc.Circuit(n)
            c.h_layer()
            c.rzz_product(pairs, zz)
            c.rx_layer(rx)
            return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()

        v1, g1 = jax.value_and_grad(e_fused, argnums=(0, 1))(zz, rx)
        v2, g2 = jax.value_and_grad(e_plain, argnums=(0, 1))(zz, rx)
        assert abs(float(v1 - v2)) < 1e-4
        for a, b in zip(g1, g2):
            assert float(jnp.abs(a - b).max()) < 1e-3
    finally:
        kr.MAX_KERNEL_QUBITS_ZZRX = old
        kernels.set_interpret_mode(False)


def test_zzrx_layer_qir_consumers():
    n = 4
    c = tc.Circuit(n)
    c.h_layer()
    c.zzrx_layer([(0, 1), (2, 3)], jnp.asarray([0.3, 0.4]), jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    c2 = tc.Circuit(n)
    c2.h_layer()
    c2.rzz_product([(0, 1), (2, 3)], jnp.asarray([0.3, 0.4]))
    c2.rx_layer(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    np.testing.assert_allclose(np.asarray(c.matrix()), np.asarray(c2.matrix()), atol=1e-5)
    inv = c.inverse()
    composed = tc.Circuit(n)
    composed.append_from_qir(c.to_qir() if False else c._expanded_qir())
    composed.append_from_qir(inv._expanded_qir() if hasattr(inv, "_expanded_qir") else inv.to_qir())
    np.testing.assert_allclose(
        np.asarray(composed.state())[0], 1.0 + 0j, atol=1e-5
    )


@pytest.mark.slow
def test_gram_svd_matches_adaware():
    from tensorcircuit_ng_tpu.core import linalg as L

    rng = np.random.default_rng(0)
    for shape in ((64, 64), (32, 48), (48, 32)):
        a = jnp.asarray(
            (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)
        )
        u, s, vh = L.gram_svd(a)
        np.testing.assert_allclose(
            np.asarray(u @ jnp.diag(s.astype(a.dtype)) @ vh), np.asarray(a), atol=1e-4
        )
        # singular values agree with the exact SVD
        _, s_ref, _ = L.adaware_svd(a)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-3)

        def loss(a, svd):
            u, s, vh = svd(a)
            return jnp.real(jnp.sum(s[:16] ** 2)) + 0.1 * jnp.real(
                jnp.sum(jnp.abs(u[:, :16]) ** 2)
            )

        g1 = jax.grad(lambda x: loss(x, L.gram_svd))(a)
        g2 = jax.grad(lambda x: loss(x, L.adaware_svd))(a)
        assert float(jnp.abs(g1 - g2).max()) < 1e-2


@pytest.mark.slow  # 11 s; gram_svd itself is covered by test_gram_svd_* fast tests
def test_tebd_gram_svd_flag_consistency():
    from tensorcircuit_ng_tpu.core import linalg as L
    from tensorcircuit_ng_tpu.models.mpscircuit import MPSCircuit

    def run():
        m = MPSCircuit(12, split={"max_singular_values": 16})
        for i in range(0, 12, 2):
            m.x(i)
        for parity in (0, 1):
            for i in range(parity, 11, 2):
                m.rzz(i, i + 1, theta=0.2)
                m.rxx(i, i + 1, theta=0.15)
        return float(np.real(np.asarray(m.expectation_ps(z=[5, 6]))))

    v_std = run()
    L.USE_GRAM_SVD = True
    try:
        v_gram = run()
    finally:
        L.USE_GRAM_SVD = False
    assert abs(v_std - v_gram) < 1e-3, (v_std, v_gram)


@pytest.mark.slow
def test_jacobi_svd_correctness_and_grad():
    from tensorcircuit_ng_tpu.core import linalg as L

    rng = np.random.default_rng(7)
    for shape, sweeps in [((16, 16), 10), ((3, 16, 16), 10), ((12, 8), 8)]:
        a = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
            np.complex64
        )
        u, s, vh = (np.asarray(x) for x in L.jacobi_svd(jnp.asarray(a), sweeps))
        np.testing.assert_allclose(
            (u * s[..., None, :]) @ vh, a, atol=2e-5
        )  # reconstruction
        np.testing.assert_allclose(
            s, np.linalg.svd(a, compute_uv=False), atol=2e-5
        )  # values, descending
        k = min(shape[-2], shape[-1])
        uhu = np.einsum("...ki,...kj->...ij", u.conj(), u)[..., :k, :k]
        np.testing.assert_allclose(uhu, np.broadcast_to(np.eye(k), uhu.shape), atol=2e-6)

    # odd trailing dimension is rejected
    with pytest.raises(ValueError):
        L.jacobi_svd(jnp.ones((4, 5)), 4)

    # gradient agrees with the LAPACK-path adjoint on a gauge-invariant loss
    a = (rng.standard_normal((10, 10)) + 1j * rng.standard_normal((10, 10))).astype(
        np.complex64
    )

    def mk(svd):
        def loss(x):
            u, s, vh = svd(x)
            rec = (u[:, :4] * s[None, :4]) @ vh[:4, :]
            w = jnp.arange(100, dtype=jnp.float32).reshape(10, 10)
            return jnp.real(jnp.sum(s[:4]) + jnp.sum(w * jnp.abs(rec) ** 2))

        return loss

    ga = jax.grad(mk(L.adaware_svd))(jnp.asarray(a))
    gj = jax.grad(mk(lambda x: L.jacobi_svd(x, 12)))(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gj), atol=2e-5 * float(jnp.abs(ga).max()))


# fast-gate since r5: jacobi family representative (VERDICT r4 #5)
def test_jacobi_svd_pallas_interpret():
    from tensorcircuit_ng_tpu.core import kernels_jacobi as KJ

    rng = np.random.default_rng(3)
    old = KJ._INTERPRET
    KJ._INTERPRET = True
    try:
        for shape in [(16, 16), (2, 32, 32), (24, 16)]:
            a = (
                rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
            ).astype(np.complex64)
            for acc_v in (True, False):
                u, s, vh = (
                    np.asarray(x) for x in KJ.jacobi_svd_pallas(jnp.asarray(a), 10, acc_v)
                )
                np.testing.assert_allclose(
                    (u * s[..., None, :]) @ vh, a, atol=5e-5
                )
                np.testing.assert_allclose(
                    s, np.linalg.svd(a, compute_uv=False), atol=5e-5
                )
        with pytest.raises(ValueError):
            KJ.jacobi_svd_pallas(jnp.ones((4, 8)), 4)  # m < n rejected

        # AD wrapper gradient vs LAPACK adjoint (gauge-invariant loss)
        a = (
            rng.standard_normal((16, 16)) + 1j * rng.standard_normal((16, 16))
        ).astype(np.complex64)
        from tensorcircuit_ng_tpu.core import linalg as L

        def mk(svd):
            def loss(x):
                u, s, vh = svd(x)
                rec = (u[:, :6] * s[None, :6]) @ vh[:6, :]
                w = jnp.arange(256, dtype=jnp.float32).reshape(16, 16)
                return jnp.real(jnp.sum(s[:6]) + jnp.sum(w * jnp.abs(rec) ** 2))

            return loss

        ga = jax.grad(mk(L.adaware_svd))(jnp.asarray(a))
        gk = jax.grad(mk(lambda x: KJ.jacobi_svd(x, 10, False)))(jnp.asarray(a))
        assert float(jnp.abs(ga - gk).max()) < 1e-5 * float(jnp.abs(ga).max())
    finally:
        KJ._INTERPRET = old


def test_jacobi_svd_lane_major_matches_grid():
    """Lane-major kernel (pair slots along lanes) vs the sublane-major grid.

    Covers the group-packing transform (incl. batch padding: B=10 with
    group 8 pads two zero matrices) and both with_v modes."""
    from tensorcircuit_ng_tpu.core import kernels_jacobi as KJ

    rng = np.random.default_rng(7)
    old = (KJ._INTERPRET, KJ.LANES, KJ.LANE_GROUP)
    KJ._INTERPRET = True
    try:
        for batch, m in ((8, 32), (10, 32), (8, 48)):  # incl. rectangular m > n
            a = (
                rng.standard_normal((batch, m, 32))
                + 1j * rng.standard_normal((batch, m, 32))
            ).astype(np.complex64)
            # exercise a decaying spectrum too
            a[0] = a[0] @ np.diag(np.exp(-np.linspace(0, 6, 32))).astype(
                np.complex64
            )
            for acc_v in (True, False):
                KJ.LANES = False
                u0, s0, v0 = (
                    np.asarray(x)
                    for x in KJ.jacobi_svd_pallas(jnp.asarray(a), 10, acc_v)
                )
                KJ.LANES = True
                KJ.LANE_GROUP = 8
                assert (min(KJ.LANE_GROUP, batch) * 16) % 128 == 0
                u1, s1, v1 = (
                    np.asarray(x)
                    for x in KJ.jacobi_svd_pallas(jnp.asarray(a), 10, acc_v)
                )
                np.testing.assert_allclose(s1, s0, atol=5e-5)
                np.testing.assert_allclose(
                    (u1 * s1[..., None, :]) @ v1, a, atol=5e-5
                )
    finally:
        KJ._INTERPRET, KJ.LANES, KJ.LANE_GROUP = old


@pytest.mark.slow  # ~1 min; every ML_MODE dispatch (stack/xla/whole-block)
def test_zzrx_multilayer_reference_and_interpret():
    """All fused_zzrx_multilayer modes == stacked per-layer path (values+grads).

    Loops ML_MODE over the production 'stack' path, the pure-matmul 'xla'
    variant, and the whole-block kernels_multilayer grid kernel ('pallas'),
    the latter two in interpret mode too — these have no other coverage.
    """
    from tensorcircuit_ng_tpu.core import kernels

    n, L = 9, 2
    pairs = tuple((i, i + 1) for i in range(n - 1))
    rng = np.random.default_rng(7)
    psi = rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))
    psi = jnp.asarray((psi / np.linalg.norm(psi)).astype(np.complex64))
    zz = jnp.asarray(rng.normal(size=(L, n - 1)) * 0.3, jnp.float32)
    rx = jnp.asarray(rng.normal(size=(L, n)) * 0.3, jnp.float32)
    w = jnp.asarray(
        (rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))).astype(np.complex64)
    )

    def loss_ml(zz, rx):
        y = kernels.fused_zzrx_multilayer(psi, pairs, zz, rx)
        return jnp.real(jnp.vdot(w, y)) + jnp.imag(jnp.vdot(w, y * y))

    def loss_ref(zz, rx):
        y = psi
        for l in range(L):
            y = kernels.fused_zzrx_layer(y, pairs, zz[l], rx[l])
        return jnp.real(jnp.vdot(w, y)) + jnp.imag(jnp.vdot(w, y * y))

    from tensorcircuit_ng_tpu.core import kernels_stack

    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(zz, rx)
    old_mode = kernels.ML_MODE
    old_fuse = kernels_stack.FUSE_LANE
    # pin the UNFUSED lane stage here: the fused-lane default is covered by
    # test_zzrx_stack_fused_lane; this keeps the XLA lane path exercised
    kernels_stack.FUSE_LANE = False
    try:
        for mode, interp in (
            ("stack", False),
            ("stack", True),
            ("xla", False),
            ("pallas", True),  # whole-block grid kernel, interpret only on CPU
        ):
            kernels.ML_MODE = mode
            kernels.set_interpret_mode(interp)
            try:
                v1, g1 = jax.value_and_grad(loss_ml, argnums=(0, 1))(zz, rx)
            finally:
                kernels.set_interpret_mode(False)
            np.testing.assert_allclose(float(v1), float(v2), atol=2e-4, err_msg=mode)
            np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=2e-3, err_msg=mode)
            np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=2e-3, err_msg=mode)
    finally:
        kernels.ML_MODE = old_mode
        kernels_stack.FUSE_LANE = old_fuse


@pytest.mark.slow  # grouping logic shared with the stack dispatch tests; CI retains
def test_zzrx_multilayer_circuit_grouping():
    """Consecutive zzrx_layer ops group into one multilayer op == rzz+rx."""
    n, L = 9, 3
    pairs = [(i, i + 1) for i in range(n - 1)]
    rng = np.random.default_rng(3)
    zz = jnp.asarray(rng.normal(size=(L, n - 1)) * 0.4, jnp.float32)
    rx = jnp.asarray(rng.normal(size=(L, n)) * 0.4, jnp.float32)
    c = tc.Circuit(n)
    c.h_layer()
    for l in range(L):
        c.zzrx_layer(pairs, zz[l], rx[l])
    grouped = c._grouped_qir()
    assert any(isinstance(g, list) and len(g) == L for g in grouped)
    e1 = c.expectation_ps(z=[0, 1])
    c2 = tc.Circuit(n)
    c2.h_layer()
    for l in range(L):
        c2.rzz_product(pairs, zz[l])
        c2.rx_layer(rx[l])
    e2 = c2.expectation_ps(z=[0, 1])
    np.testing.assert_allclose(
        complex(np.asarray(e1)), complex(np.asarray(e2)), atol=1e-5
    )


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_zzrx_stack_outer_stage(monkeypatch):
    """Stack custom VJP with a nonzero outer-kron stage == rzz+rx chain.

    Shrinks the kernel row budget so n=10 splits as 1 outer + 2 kernel + 7
    lane qubits, exercising the outer matmul fwd/bwd of kernels_stack.
    """
    from tensorcircuit_ng_tpu.core import kernels, kernels_rowlayer

    monkeypatch.setattr(kernels_rowlayer, "MAX_KERNEL_QUBITS_ZZRX", 1)
    n, L = 9, 2
    pairs = tuple((i, i + 1) for i in range(n - 1))
    rng = np.random.default_rng(11)
    psi = rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))
    psi = jnp.asarray((psi / np.linalg.norm(psi)).astype(np.complex64))
    zz = jnp.asarray(rng.normal(size=(L, n - 1)) * 0.3, jnp.float32)
    rx = jnp.asarray(rng.normal(size=(L, n)) * 0.3, jnp.float32)
    w = jnp.asarray(
        (rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))).astype(np.complex64)
    )

    def loss_stack(zz, rx):
        y = kernels.fused_zzrx_multilayer(psi, pairs, zz, rx)
        return jnp.real(jnp.vdot(w, y)) + jnp.imag(jnp.vdot(w, y * y))

    from tensorcircuit_ng_tpu.core import statevec
    from tensorcircuit_ng_tpu.ops.gates import rx_matrix

    def loss_ref(zz, rx):
        y = psi
        for l in range(L):
            y = statevec.apply_zz_product_phase(y, pairs, zz[l])
            for q in range(n):
                y = statevec.apply_unitary(y, rx_matrix(rx[l, q]), [q])
        return jnp.real(jnp.vdot(w, y)) + jnp.imag(jnp.vdot(w, y * y))

    assert kernels.ML_MODE == "stack"
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(zz, rx)
    for interp in (False, True):
        kernels.set_interpret_mode(interp)
        try:
            v1, g1 = jax.value_and_grad(loss_stack, argnums=(0, 1))(zz, rx)
        finally:
            kernels.set_interpret_mode(False)
        np.testing.assert_allclose(float(v1), float(v2), atol=2e-4)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=2e-3)


# fast-gate since r5: stack+energy family representative (VERDICT r4 #5)
def test_zzrx_stack_energy_fused_readout(monkeypatch):
    """expectation_zzx_energy == Re(zz_sum) + w_x * x_sum, values AND grads.

    Covers the stack fused-energy custom VJP (kernels_stack.zzrx_stack_energy)
    on both the CPU reference and Pallas interpret paths, with a nonzero
    outer-kron stage, plus the single-layer fallback branch and the
    readout-pairs != layer-pairs case.
    """
    from tensorcircuit_ng_tpu.core import kernels, kernels_rowlayer

    monkeypatch.setattr(kernels_rowlayer, "MAX_KERNEL_QUBITS_ZZRX", 1)
    n, L = 9, 2
    pairs = [(i, i + 1) for i in range(n - 1)]
    readout_pairs = [(0, 2), (3, 7), (1, 8)]  # differ from the layer pairs
    rng = np.random.default_rng(5)
    p0 = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.4, jnp.float32)

    def build(p, layers=L):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(layers):
            c.zzrx_layer(pairs, p[l, 0, : n - 1], p[l, 1])
        return c

    def e_fused(p):
        return build(p).expectation_zzx_energy(readout_pairs, 0.7, -1.3)

    def e_ref(p):
        c = build(p)
        return 0.7 * jnp.real(c.expectation_zz_sum(readout_pairs)) - (
            1.3 * c.expectation_x_sum()
        )

    assert kernels.ML_MODE == "stack"
    vr, gr = jax.value_and_grad(e_ref)(p0)
    # CPU-path asserts only: interpret-mode energy+outer coverage lives in
    # test_zzrx_stack_fused_lane (one fast interpret representative)
    vf, gf = jax.value_and_grad(e_fused)(p0)
    np.testing.assert_allclose(float(vf), float(vr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-3)

    # single-layer circuit: no trailing run -> statevec fallback branch
    def e1(p):
        return build(p, layers=1).expectation_zzx_energy(readout_pairs, 0.7, -1.3)

    def e1r(p):
        c = build(p, layers=1)
        return 0.7 * jnp.real(c.expectation_zz_sum(readout_pairs)) - (
            1.3 * c.expectation_x_sum()
        )

    np.testing.assert_allclose(float(e1(p0)), float(e1r(p0)), atol=2e-4)

    # x-only readout (no pairs) through the fused path
    def ex(p):
        return build(p).expectation_zzx_energy(None, 0.0, 1.0)

    np.testing.assert_allclose(
        float(ex(p0)), float(build(p0).expectation_x_sum()), atol=2e-4
    )


# fast-gate since r5: lane-fusion family representative (VERDICT r4 #5)
# the multilayer-grouping test are the fast-gate representatives of this family
def test_zzrx_stack_fused_lane(monkeypatch):
    """FUSE_LANE in-kernel lane matmul == unfused XLA lane stage == rzz+rx.

    Values and grads through both zzrx_stack_core (vdot loss) and the fused
    energy readout, in Pallas interpret mode, with a nonzero outer stage
    (kernel budget shrunk to 1 so n=9 splits 1 outer + 1 kernel + 7 lane).
    """
    from tensorcircuit_ng_tpu.core import kernels, kernels_rowlayer, kernels_stack

    monkeypatch.setattr(kernels_rowlayer, "MAX_KERNEL_QUBITS_ZZRX", 1)
    n, L = 9, 2
    pairs = tuple((i, i + 1) for i in range(n - 1))
    rng = np.random.default_rng(13)
    psi = rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))
    psi = jnp.asarray((psi / np.linalg.norm(psi)).astype(np.complex64))
    zz = jnp.asarray(rng.normal(size=(L, n - 1)) * 0.3, jnp.float32)
    rx = jnp.asarray(rng.normal(size=(L, n)) * 0.3, jnp.float32)
    w = jnp.asarray(
        (rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))).astype(np.complex64)
    )

    def loss_ml(zz, rx):
        y = kernels.fused_zzrx_multilayer(psi, pairs, zz, rx)
        return jnp.real(jnp.vdot(w, y)) + jnp.imag(jnp.vdot(w, y * y))

    def loss_ref(zz, rx):
        y = psi
        for l in range(L):
            y = kernels.fused_zzrx_layer(y, pairs, zz[l], rx[l])
        return jnp.real(jnp.vdot(w, y)) + jnp.imag(jnp.vdot(w, y * y))

    def e_fused(p):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(L):
            c.zzrx_layer(list(pairs), p[l, 0, : n - 1], p[l, 1])
        return c.expectation_zzx_energy(list(pairs), 0.7, -1.3)

    p0 = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.4, jnp.float32)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(zz, rx)
    e_truth = jax.value_and_grad(e_fused)(p0)  # unfused CPU-reference path
    assert kernels.ML_MODE == "stack"
    # FUSE_LANE=False interpret coverage lives in the other stack tests;
    # this one validates the fused-lane kernels against the references
    monkeypatch.setattr(kernels_stack, "FUSE_LANE", True)
    kernels.set_interpret_mode(True)
    try:
        v1, g1 = jax.value_and_grad(loss_ml, argnums=(0, 1))(zz, rx)
        ve, ge = jax.value_and_grad(e_fused)(p0)
    finally:
        kernels.set_interpret_mode(False)
    np.testing.assert_allclose(float(v1), float(v2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=2e-3)
    np.testing.assert_allclose(float(ve), float(e_truth[0]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(e_truth[1]), atol=2e-3)


def test_fuse_lane_flip_between_trace_and_backward(monkeypatch):
    """Flipping FUSE_LANE between a vjp trace and its backward call must not
    corrupt gradients: the mode rides the residual structure."""
    from tensorcircuit_ng_tpu.core import kernels, kernels_stack

    n, L = 9, 2
    pairs = tuple((i, i + 1) for i in range(n - 1))
    rng = np.random.default_rng(21)
    p0 = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.4, jnp.float32)

    def e_fused(p):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(L):
            c.zzrx_layer(list(pairs), p[l, 0, : n - 1], p[l, 1])
        return c.expectation_zzx_energy(list(pairs), 0.7, -1.3)

    g_truth = np.asarray(jax.grad(e_fused)(p0))  # CPU reference path
    kernels.set_interpret_mode(True)
    try:
        monkeypatch.setattr(kernels_stack, "FUSE_LANE", False)
        _, vjp_fn = jax.vjp(e_fused, p0)
        monkeypatch.setattr(kernels_stack, "FUSE_LANE", True)  # flip mid-flight
        (g,) = vjp_fn(jnp.float32(1.0))
    finally:
        kernels.set_interpret_mode(False)
    np.testing.assert_allclose(np.asarray(g), g_truth, atol=2e-3)


@pytest.mark.slow  # 7 s general-weights readout audit; the fused-readout path is exercised by
# the flip test + multilayer grouping + bench in the fast gate
def test_expectation_ising_sum_general(monkeypatch):
    """Weighted zz + longitudinal z + weighted x + 3-local Z strings through
    the fused Ising readout == per-string expectation_ps oracle."""
    from tensorcircuit_ng_tpu.core import kernels, kernels_rowlayer

    monkeypatch.setattr(kernels_rowlayer, "MAX_KERNEL_QUBITS_ZZRX", 1)
    n, L = 9, 2
    pairs = [(i, i + 1) for i in range(n - 1)]
    rng = np.random.default_rng(7)
    p0 = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.4, jnp.float32)
    zz_terms = [(i, i + 1, 0.5 + 0.1 * i) for i in range(n - 1)]
    z_terms = [(q, 0.3) for q in range(0, n, 2)]
    x_terms = [(q, -0.8 - 0.05 * q) for q in range(n)]

    def build(p):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(L):
            c.zzrx_layer(pairs, p[l, 0, : n - 1], p[l, 1])
        return c

    def e_fused(p):
        return build(p).expectation_ising_sum(zz_terms, z_terms, x_terms)

    def e_ref(p):
        c = build(p)
        e = jnp.float32(0.0)
        for a, b, w in zz_terms:
            e = e + w * jnp.real(c.expectation_ps(z=[a, b]))
        for q, w in z_terms:
            e = e + w * jnp.real(c.expectation_ps(z=[q]))
        for q, w in x_terms:
            e = e + w * jnp.real(c.expectation_ps(x=[q]))
        return e

    vr, gr = jax.value_and_grad(e_ref)(p0)
    for interp in (False, True):
        kernels.set_interpret_mode(interp)
        try:
            vf, gf = jax.value_and_grad(e_fused)(p0)
        finally:
            kernels.set_interpret_mode(False)
        np.testing.assert_allclose(float(vf), float(vr), atol=3e-4)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=3e-3)

    # 3-local Z string via the low-level dense readout
    c = build(p0)
    spec = ((((0, 1, 2), 0.7),), ())
    ev = float(kernels.ising_energy_dense(c.state(), n, spec))
    er = 0.7 * float(jnp.real(c.expectation_ps(z=[0, 1, 2])))
    np.testing.assert_allclose(ev, er, atol=1e-4)


@pytest.mark.slow  # 33 s; FUSE_ROWM is default-OFF (hardware A/B record) —
# the interpret parity stays as the measured-record regression in the slow tier
def test_zzrx_stack_fused_rowm(monkeypatch):
    """FUSE_ROWM in-kernel row-kron matmul == butterfly path == CPU reference.

    Two geometries in interpret mode: (a) nouter>0 so the dM7 accumulation
    revisits its output block across grid steps (rmx=1), and (b) a single
    block with rmx=3 so the kron matmul carries several qubits at once.
    Values and grads through the fused energy readout.
    """
    from tensorcircuit_ng_tpu.core import kernels, kernels_rowlayer, kernels_stack

    rng = np.random.default_rng(29)

    def e_fused(p, n, L, pairs):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(L):
            c.zzrx_layer(list(pairs), p[l, 0, : n - 1], p[l, 1])
        return c.expectation_zzx_energy(list(pairs), 0.7, -1.3)

    for max_k, n in ((4, 12), (10, 13)):
        monkeypatch.setattr(kernels_rowlayer, "MAX_KERNEL_QUBITS_ZZRX", max_k)
        L = 2
        pairs = tuple((i, i + 1) for i in range(n - 1))
        p0 = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.4, jnp.float32)
        f = lambda p: e_fused(p, n, L, pairs)
        v_truth, g_truth = jax.value_and_grad(f)(p0)  # CPU reference path
        monkeypatch.setattr(kernels_stack, "FUSE_LANE", True)
        monkeypatch.setattr(kernels_stack, "FUSE_ROWM", True)
        assert kernels_stack._rowm_qubits(min(max_k, n - 7)) >= 1
        kernels.set_interpret_mode(True)
        try:
            v1, g1 = jax.value_and_grad(f)(p0)
            monkeypatch.setattr(kernels_stack, "FUSE_ROWM", False)
            v2, g2 = jax.value_and_grad(f)(p0)
        finally:
            kernels.set_interpret_mode(False)
        np.testing.assert_allclose(float(v1), float(v_truth), atol=2e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g_truth), atol=2e-3)
        np.testing.assert_allclose(float(v1), float(v2), atol=2e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-3)


@pytest.mark.slow  # 14 s; FUSE_ROWM is default-OFF — the lane flip test
# covers the residual-structure mode safety in the fast gate
def test_fuse_rowm_flip_between_trace_and_backward(monkeypatch):
    """Flipping FUSE_ROWM between a vjp trace and its backward call must not
    corrupt gradients: the rowm mode rides the residual structure too."""
    from tensorcircuit_ng_tpu.core import kernels, kernels_stack

    n, L = 13, 2
    pairs = tuple((i, i + 1) for i in range(n - 1))
    rng = np.random.default_rng(23)
    p0 = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.4, jnp.float32)

    def e_fused(p):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(L):
            c.zzrx_layer(list(pairs), p[l, 0, : n - 1], p[l, 1])
        return c.expectation_zzx_energy(list(pairs), 0.7, -1.3)

    g_truth = np.asarray(jax.grad(e_fused)(p0))  # CPU reference path
    kernels.set_interpret_mode(True)
    try:
        monkeypatch.setattr(kernels_stack, "FUSE_ROWM", True)
        _, vjp_fn = jax.vjp(e_fused, p0)
        monkeypatch.setattr(kernels_stack, "FUSE_ROWM", False)  # flip mid-flight
        (g,) = vjp_fn(jnp.float32(1.0))
    finally:
        kernels.set_interpret_mode(False)
    np.testing.assert_allclose(np.asarray(g), g_truth, atol=2e-3)


def test_zzrx_stack_grand_fused(monkeypatch):
    """FUSE_GRAND one-kernel L-layer forward == per-layer stack, value AND
    grad, bit-exact in interpret mode (the backward is shared — only the
    forward path differs)."""
    from tensorcircuit_ng_tpu.core import kernels_rowlayer, kernels_stack

    monkeypatch.setattr(kernels_rowlayer, "MAX_KERNEL_QUBITS_ZZRX", 1)
    n, L = 10, 2  # nrow=3 -> nkernel=1, nouter=2: grid 4 x RB 2
    pairs = tuple((i, (i + 1) % n) for i in range(n))
    rng = np.random.default_rng(7)
    p = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.4, jnp.float32)

    def energy(q):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(L):
            c.zzrx_layer(list(pairs), q[l, 0], q[l, 1])
        return jnp.real(c.expectation_zzx_energy(list(pairs), 1.0, -1.0))

    kernels.set_interpret_mode(True)
    try:
        monkeypatch.setattr(kernels_stack, "FUSE_GRAND", False)
        v0, g0 = jax.value_and_grad(lambda q: energy(q))(p)
        monkeypatch.setattr(kernels_stack, "FUSE_GRAND", True)
        v1, g1 = jax.value_and_grad(lambda q: energy(q))(p)
    finally:
        kernels.set_interpret_mode(False)
    np.testing.assert_allclose(float(v1), float(v0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)


def test_zzrx_stack_grand_bwd(monkeypatch):
    """FUSE_GRAND_BWD one-kernel L-layer adjoint == per-layer stack grads
    (interpret mode), for odd L (no parity constraint), alone and combined
    with the grand forward."""
    from tensorcircuit_ng_tpu.core import kernels_rowlayer, kernels_stack

    monkeypatch.setattr(kernels_rowlayer, "MAX_KERNEL_QUBITS_ZZRX", 3)
    n, L = 12, 3  # nrow=5 -> nkernel=3, nouter=2: RB=8, G=D=4
    pairs = tuple((i, (i + 1) % n) for i in range(n))
    rng = np.random.default_rng(11)
    p = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.4, jnp.float32)

    def energy(q):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(q.shape[0]):
            c.zzrx_layer(list(pairs), q[l, 0], q[l, 1])
        return jnp.real(c.expectation_zzx_energy(list(pairs), 1.0, -1.0))

    kernels.set_interpret_mode(True)
    try:
        monkeypatch.setattr(kernels_stack, "FUSE_GRAND_BWD", False)
        v0, g0 = jax.value_and_grad(energy)(p)
        monkeypatch.setattr(kernels_stack, "FUSE_GRAND_BWD", True)
        v1, g1 = jax.value_and_grad(energy)(p)
        monkeypatch.setattr(kernels_stack, "FUSE_GRAND", True)
        v2, g2 = jax.value_and_grad(energy)(p)
        # true combo: grand fwd only engages at even L (ping-pong parity),
        # so the production default (both flags on) needs an even-L check
        p4 = jnp.concatenate([p, p[::-1]], axis=0)  # L=6
        v3, g3 = jax.value_and_grad(energy)(p4)
        monkeypatch.setattr(kernels_stack, "FUSE_GRAND", False)
        monkeypatch.setattr(kernels_stack, "FUSE_GRAND_BWD", False)
        v4, g4 = jax.value_and_grad(energy)(p4)
    finally:
        kernels.set_interpret_mode(False)
    np.testing.assert_allclose(float(v1), float(v0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)
    np.testing.assert_allclose(float(v2), float(v0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g0), atol=1e-5)
    np.testing.assert_allclose(float(v3), float(v4), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g4), atol=1e-5)


def test_grand_dispatch_fallback_gates(monkeypatch):
    """Review fixes: (a) FUSE_LANE=False (the ab_lane_fused off arm) must
    fall back per-layer instead of tripping the theta boundary's
    fused-topology assert; (b) above MAX_GRAND_ROW_QUBITS (the VMEM
    envelope) the grand path must fall back rather than hand Mosaic an
    over-budget kernel."""
    from tensorcircuit_ng_tpu.core import kernels_rowlayer, kernels_stack

    monkeypatch.setattr(kernels_rowlayer, "MAX_KERNEL_QUBITS_ZZRX", 3)
    n, L = 12, 2
    pairs = tuple((i, i + 1) for i in range(n - 1))
    p = jnp.asarray(
        np.random.default_rng(0).normal(size=(L, 2, n)) * 0.3, jnp.float32
    )

    def energy(q):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(L):
            c.zzrx_layer(list(pairs), q[l, 0, : n - 1], q[l, 1])
        return c.expectation_zzx_energy(list(pairs), 1.0, -1.0)

    kernels.set_interpret_mode(True)
    try:
        v0, g0 = jax.value_and_grad(energy)(p)
        monkeypatch.setattr(kernels_stack, "FUSE_LANE", False)
        v1, g1 = jax.value_and_grad(energy)(p)
        monkeypatch.setattr(kernels_stack, "FUSE_LANE", True)
        monkeypatch.setattr(kernels_stack, "MAX_GRAND_ROW_QUBITS", 2)
        v2, g2 = jax.value_and_grad(energy)(p)
    finally:
        kernels.set_interpret_mode(False)
    for v, g in ((v1, g1), (v2, g2)):
        np.testing.assert_allclose(float(v), float(v0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g0), atol=1e-4)
