"""Regression tests for the round-2 code-review findings (timeevol /
quantum / contractor / noisemodel / shadows).

Slow tier (RUN_SLOW=1): these pin ALREADY-FIXED review findings — pure
regression insurance with no unique surface coverage, so they run in the
full CI tier rather than the fast per-commit gate (suite-time budget,
VERDICT r3 #3)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu
from tensorcircuit_ng_tpu import timeevol, shadows, noisemodel


def test_measurement_counts_density_matrix_diagonal():
    rho = np.diag([0.5, 0.5, 0.0, 0.0]).astype(np.complex64)
    p = qu.measurement_counts(rho, counts=None)
    np.testing.assert_allclose(np.asarray(p), [0.5, 0.5, 0.0, 0.0], atol=1e-7)
    # statevector input still |psi|^2
    psi = np.array([1.0, 1.0, 0.0, 0.0]) / np.sqrt(2)
    p2 = qu.measurement_counts(psi, counts=None)
    np.testing.assert_allclose(np.asarray(p2), [0.5, 0.5, 0.0, 0.0], atol=1e-7)


def test_estimate_spectral_bounds_finds_both_edges():
    h = np.diag([-10.0, 1.0, 0.3, -2.0])
    emax, emin = timeevol.estimate_spectral_bounds(h)
    assert abs(emax - 1.0) < 1e-6 and abs(emin + 10.0) < 1e-6
    # feeding them to chebyshev no longer divides by zero
    assert emax > emin


def test_estimate_k_and_M_reference_signatures():
    bounds = (5.0, -5.0)
    k = timeevol.estimate_k(0.5, bounds)
    m = timeevol.estimate_M(0.5, bounds, k)
    assert isinstance(k, int) and isinstance(m, int)
    assert m >= k + 30


def test_hamiltonian_evol_imaginary_time_ground_state():
    h = np.diag([-1.0, 0.5, 2.0, 3.0]).astype(np.complex128)
    psi0 = np.ones(4) / 2.0
    out = timeevol.hamiltonian_evol(h, psi0, jnp.asarray([0.0, 20.0]))
    # long imaginary time projects onto the ground state |0>
    np.testing.assert_allclose(np.abs(np.asarray(out[-1])), [1, 0, 0, 0], atol=1e-6)
    # states are normalized at every time
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-8)
    # the real-time oracle still evolves unitarily
    outr = timeevol.hamiltonian_evol_real(jnp.asarray(0.7), h, jnp.asarray(psi0, dtype=jnp.complex128))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(outr)), 1.0, atol=1e-8)
    assert timeevol.ed_evol is timeevol.hamiltonian_evol


def test_expm_multiply_real_initial_state():
    h = np.diag([1.0, -1.0]).astype(np.complex128)
    out = timeevol.expm_multiply(h, np.array([1.0, 0.0], dtype=np.float32), t=0.5)
    ref = np.exp(-0.5j) * np.array([1.0, 0.0])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_choose_slices_never_picks_output_indices():
    from tensorcircuit_ng_tpu.core.contractor import (
        EinsumIR,
        choose_slices,
        sliced_contract_ir,
        contract_ir,
    )

    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 4))
    b = rng.normal(size=(4, 4))
    ir = EinsumIR([(0, 1), (1, 2)], (0, 2), {0: 4, 1: 4, 2: 4}, [a, b])
    sl = choose_slices(ir, target_size=4)
    assert all(i not in (0, 2) for i in sl), sl
    if sl:
        got = sliced_contract_ir(ir, sl)
        np.testing.assert_allclose(np.asarray(got), a @ b, atol=1e-6)
    with pytest.raises(ValueError):
        sliced_contract_ir(ir, [2])


def test_noiseconf_add_noise_appends():
    from tensorcircuit_ng_tpu.ops import channels

    nc = noisemodel.NoiseConf()
    dep = channels.depolarizingchannel(0.01, 0.01, 0.01)
    amp = channels.amplitudedampingchannel(0.05, 0.0)
    nc.add_noise("rx", dep)
    nc.add_noise("rx", amp)
    chans = nc.channels_for({"name": "rx", "index": (0,)})
    assert len(chans) == 2
    # qubit-specific entries survive an "any" registration and stack too
    nc2 = noisemodel.NoiseConf()
    nc2.add_noise("rz", [dep], [[1]])
    nc2.add_noise("rz", amp)
    nc2.add_noise("rz", [amp], [[1]])
    assert len(nc2.channels_for({"name": "rz", "index": (1,)})) == 3
    assert len(nc2.channels_for({"name": "rz", "index": (0,)})) == 1


def test_channel_count_matches_consumption():
    from tensorcircuit_ng_tpu.ops import channels

    nc = noisemodel.NoiseConf()
    dep = channels.depolarizingchannel(0.01, 0.01, 0.01)  # single-qubit channel
    nc.add_noise("cnot", dep)  # broadcasts over both qubits
    c = tc.Circuit(2)
    c.cnot(0, 1)
    n_pub = noisemodel.channel_count(c, nc)
    n_cls = nc.channel_count(c)
    n_mc = noisemodel._mc_channel_count(c, nc)
    assert n_pub == n_cls == n_mc == 2
    # a correctly sized status is accepted end to end
    val = noisemodel.expectation_noisfy(
        c, (tc.gates.z(), [1]), noise_conf=nc, status=jnp.asarray(np.random.default_rng(0).uniform(size=(7, 2)))
    )
    assert np.isfinite(float(val))


def test_renyi_entropy_2_brydges_estimator():
    # Bell pair: S2 of one qubit = log 2; product |00>: S2 = 0
    n, ns, repeat = 2, 300, 16
    rng = np.random.default_rng(7)
    c = tc.Circuit(n)
    c.h(0)
    c.cnot(0, 1)
    snaps = []
    strings = rng.integers(0, 3, size=(ns, n))
    for s in range(ns):
        cc = tc.Circuit(n, inputs=np.asarray(c.state()))
        for q in range(n):
            if strings[s, q] == 0:
                cc.h(q)
            elif strings[s, q] == 1:
                cc.sd(q)
                cc.h(q)
        st = rng.uniform(size=(repeat, n))
        bits = np.asarray(cc.sample(batch=repeat, allow_state=True, format="sample_bin", status=jnp.asarray(st)))
        snaps.append(bits)
    snaps = np.stack(snaps)  # (ns, repeat, n)
    s2_sub = shadows.renyi_entropy_2(snaps, [0])
    assert abs(s2_sub - np.log(2)) < 0.35, s2_sub
    s2_full = shadows.renyi_entropy_2(snaps)
    assert abs(s2_full) < 0.3, s2_full  # pure state: S2 ~= 0
    # keep/trace-out spellings agree
    assert shadows.renyi_entropy_2(snaps, subsystem_to_keep=[0]) == s2_sub
    assert shadows.renyi_entropy_2(snaps, subsystems_to_trace_out=[1]) == s2_sub


# ---------------------------------------------------------------------------
# second review pass (fused-energy round)
# ---------------------------------------------------------------------------


def test_expm_multiply_numpy_complex_prefactor(highp):
    """np.complex64/jnp complex prefactors must upcast a real psi0 too."""
    h = np.diag([1.0, -1.0])
    psi0 = jnp.asarray([1.0, 0.0], jnp.float64)
    outs = [
        timeevol.expm_multiply(jnp.asarray(h), psi0, t=0.3, prefactor=pf)
        for pf in (-1j, np.complex64(-1j), jnp.asarray(-1j))
    ]
    exact = np.array([np.exp(-0.3j), 0.0])
    for out in outs:
        assert np.iscomplexobj(np.asarray(out))
        np.testing.assert_allclose(np.asarray(out), exact, atol=1e-6)


def test_stack_path_preserves_complex128(highp):
    """>=2 grouped zzrx layers in complex128 must NOT drop to f32 planes."""
    import tensorcircuit_ng_tpu as tc

    tc.set_dtype("complex128")
    try:
        n, L = 9, 2
        pairs = [(i, i + 1) for i in range(n - 1)]
        rng = np.random.default_rng(3)
        p = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.3, jnp.float64)
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(L):
            c.zzrx_layer(pairs, p[l, 0, : n - 1], p[l, 1])
        psi = c.state()
        assert psi.dtype == jnp.complex128
        # per-layer oracle at f64
        c2 = tc.Circuit(n)
        c2.h_layer()
        c2.zzrx_layer(pairs, p[0, 0, : n - 1], p[0, 1])
        psi1 = c2.state()
        c3 = tc.Circuit(n, inputs=psi1)
        c3.zzrx_layer(pairs, p[1, 0, : n - 1], p[1, 1])
        np.testing.assert_allclose(
            np.asarray(psi), np.asarray(c3.state()), atol=1e-12
        )
    finally:
        tc.set_dtype("complex64")


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_xla_mode_many_pairs_falls_back():
    """ML_MODE='xla' with >MAX_ML_PAIRS pairs routes to the per-layer path."""
    from tensorcircuit_ng_tpu.core import kernels

    n, L = 17, 2
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]  # 136 pairs
    assert len(pairs) > 128
    rng = np.random.default_rng(4)
    psi0 = rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))
    psi0 = jnp.asarray((psi0 / np.linalg.norm(psi0)).astype(np.complex64))
    zz = jnp.asarray(rng.normal(size=(L, len(pairs))) * 0.2, jnp.float32)
    rx = jnp.asarray(rng.normal(size=(L, n)) * 0.2, jnp.float32)
    ref = kernels.fused_zzrx_multilayer(psi0, pairs, zz, rx)
    old = kernels.ML_MODE
    kernels.ML_MODE = "xla"
    try:
        out = kernels.fused_zzrx_multilayer(psi0, pairs, zz, rx)
    finally:
        kernels.ML_MODE = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_stack_core_scalar_mout_applied():
    """zzrx_stack_core with nouter==0 must apply the (1,1) mout scalar and
    return its true gradient (it used to silently drop both)."""
    from tensorcircuit_ng_tpu.core import kernels_stack as kst

    n, L = 8, 1
    pairs = tuple((i, i + 1) for i in range(n - 1))
    rng = np.random.default_rng(5)
    psi = rng.normal(size=(2**n,)) + 1j * rng.normal(size=(2**n,))
    psi2d = jnp.asarray((psi / np.linalg.norm(psi)).astype(np.complex64)).reshape(2, 128)
    zz = jnp.asarray(rng.normal(size=(L, n - 1)) * 0.3, jnp.float32)
    rxk = jnp.asarray(rng.normal(size=(L, 1)) * 0.3, jnp.float32)
    mlane = jnp.asarray(
        np.stack([np.eye(128, dtype=np.complex64)] * L)
    )

    def f(scale_r):
        mout = jnp.ones((L, 1, 1), jnp.complex64) * scale_r.astype(jnp.complex64)
        y = kst.zzrx_stack_core(pairs, n, psi2d, zz, rxk, mout, mlane)
        return jnp.sum(jnp.real(y) ** 2 + jnp.imag(y) ** 2)

    v, g = jax.value_and_grad(f)(jnp.float32(2.0))
    # |2^L psi|^2 = 4 |psi|^2 = 4; d/ds |s^L psi|^2 = 2L s^(2L-1) = 4
    np.testing.assert_allclose(float(v), 4.0, rtol=1e-4)
    np.testing.assert_allclose(float(g), 4.0, rtol=1e-3)


def test_h_layer_name_collision_not_folded():
    """A user fused_single_qubit_layer named 'h_layer' must NOT be replaced
    by the uniform-state fold."""
    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.ops.gates import ry_matrix

    n = 4
    gates = np.stack([np.asarray(ry_matrix(0.7))] * n)
    c = tc.Circuit(n)
    c.fused_single_qubit_layer(gates, name="h_layer", constant=True)
    c2 = tc.Circuit(n)
    for q in range(n):
        c2.ry(q, theta=0.7)
    np.testing.assert_allclose(
        np.asarray(c.state()), np.asarray(c2.state()), atol=1e-6
    )
    # while the real h_layer still folds to the exact uniform state
    c3 = tc.Circuit(n)
    c3.h_layer()
    np.testing.assert_allclose(
        np.asarray(c3.state()), np.full(2**n, 2.0 ** (-n / 2)), atol=1e-6
    )


# ---------------------------------------------------------------------------
# third review pass (parity round)
# ---------------------------------------------------------------------------


def test_dm_cond_measure_copy_replay():
    """copy()/compose must replay the collapse with its recorded status."""
    c = tc.DMCircuit(1)
    c.h(0)
    c.cond_measurement(0, status=jnp.asarray(0.9))
    rho1 = np.asarray(c.densitymatrix())
    rho2 = np.asarray(c.copy().densitymatrix())
    np.testing.assert_allclose(rho1, rho2, atol=1e-6)
    assert abs(rho1[1, 1] - 1) < 1e-5
    # inverse skips the collapse (non-unitary, like channels)
    inv = c.inverse()
    assert [i["name"] for i in inv.to_qir()] == ["hd"]


def test_rzm_multicz_wide_on_dm():
    """k>8 hyperedge items must not crash the DM engine."""
    c = tc.DMCircuit(9)
    c.h(0)
    c.rzm(*range(9), theta=0.3)
    c.multicz(*range(9))
    rho = c.densitymatrix()
    assert abs(float(jnp.real(jnp.trace(rho))) - 1) < 1e-5
    # oracle vs pure-state engine
    cp = tc.Circuit(9)
    cp.h(0)
    cp.rzm(*range(9), theta=0.3)
    cp.multicz(*range(9))
    psi = np.asarray(cp.state())
    probs = np.real(np.diagonal(np.asarray(c.densitymatrix())))
    np.testing.assert_allclose(probs, np.abs(psi) ** 2, atol=1e-6)


def test_quoperator_norm_is_squared_hs():
    """reference QuOperator.norm == tr(A^dag A) (take sqrt for the norm)."""
    op = qu.QuOperator.from_tensor(np.diag([2.0, 0.0]), [0], [1])
    np.testing.assert_allclose(float(np.real(op.norm().eval())), 4.0, atol=1e-6)


def test_rzm_concrete_theta_stays_numpy():
    """Concrete rzm expansion must stay numpy (axon complex-constant rule)."""
    c = tc.DMCircuit(2)
    c.rzm(0, 1, theta=0.3)
    item = c._expanded_qir()[0]
    assert isinstance(item["gate"].tensor, np.ndarray)


def test_hamiltonian_evol_real_keeps_c64():
    h = jnp.asarray(np.diag([1.0, -1.0]), jnp.complex64)
    out = timeevol.hamiltonian_evol_real(
        jnp.asarray(0.3), h, jnp.asarray([1.0, 0], jnp.complex64)
    )
    assert out.dtype == jnp.complex64


def test_amplitude_encoding_oversized_normalized():
    from tensorcircuit_ng_tpu.templates import dataset

    v = np.asarray(dataset.amplitude_encoding(jnp.asarray(np.ones(64), jnp.float32), 4))
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# fourth review pass
# ---------------------------------------------------------------------------


def test_rdm_quvector_two_subsystems():
    """A 2-subsystem QuVector must not be misread as a density matrix."""
    rng = np.random.default_rng(0)
    psi = rng.normal(size=4) + 1j * rng.normal(size=4)
    psi /= np.linalg.norm(psi)
    qv = qu.QuVector.from_tensor(psi.reshape(2, 2))
    rho = np.asarray(qu.reduced_density_matrix(qv, [0]))
    want = np.asarray(qu.reduced_density_matrix(jnp.asarray(psi), [0]))
    np.testing.assert_allclose(rho, want, atol=1e-6)


def test_symbol_bind_keeps_inputs():
    import sympy

    th = sympy.Symbol("t", real=True)
    w = np.zeros(4)
    w[1] = 1.0
    c = tc.SymbolCircuit(2, inputs=w)
    c.rx(0, theta=th)
    out = np.array(
        c.bind({th: 0.0}).wavefunction().evalf().tolist(), dtype=complex
    ).reshape(-1)
    np.testing.assert_allclose(np.abs(out), [0, 1, 0, 0], atol=1e-6)


def test_zzrx_layer_circuit_copy():
    """copy() must replay fused zzrx_layer items."""
    c = tc.Circuit(8)
    c.h_layer()
    c.zzrx_layer(
        [(0, 1), (2, 3)],
        jnp.asarray([0.3, 0.4], jnp.float32),
        jnp.asarray(np.full(8, 0.2), jnp.float32),
    )
    c2 = c.copy()
    np.testing.assert_allclose(
        np.asarray(c.state()), np.asarray(c2.state()), atol=1e-6
    )


def test_stabilizer_state_with_lazy_noise():
    """Lazy noise/detector instructions must not break state()."""
    sc = tc.StabilizerCircuit(2)
    sc.h(0)
    sc.x_error(0, p=0.1)
    np.testing.assert_allclose(
        np.abs(np.asarray(sc.state())),
        [1 / np.sqrt(2), 0, 1 / np.sqrt(2), 0],
        atol=1e-6,
    )


def test_dm_inverse_ignores_dminputs():
    rho0 = np.diag([0.5, 0.5, 0, 0]).astype(np.complex64)
    dm = tc.DMCircuit(2, dminputs=jnp.asarray(rho0))
    dm.x(0)
    rho_inv = np.asarray(dm.inverse().densitymatrix())
    want = np.zeros((4, 4))
    want[2, 2] = 1
    np.testing.assert_allclose(rho_inv, want, atol=1e-6)


def test_wide_hyperedges_through_einsum_ir():
    """k>8 rzm/multicz lower as (2,)*k diagonal hyperedges in the IR."""
    c = tc.DMCircuit2(9)
    c.h(0)
    c.multicz(*range(9))
    c.rzm(*range(9), theta=0.4)
    v = float(np.real(np.asarray(c.expectation((np.diag([1.0, -1.0]), [0])))))
    np.testing.assert_allclose(v, 0.0, atol=1e-5)
    c2 = tc.Circuit(4)
    for i in range(4):
        c2.h(i)
    c2.multicz(0, 1, 2, 3)
    c2.rzm(0, 1, theta=0.6)
    from tensorcircuit_ng_tpu.core.einsum_ir import circuit_state_ir
    from tensorcircuit_ng_tpu.core import contractor as ctr

    ir = circuit_state_ir(c2.to_qir(), 4)
    psi_ir = np.asarray(ctr.contract_ir(ir)).reshape(-1)
    np.testing.assert_allclose(psi_ir, np.asarray(c2.state()), atol=1e-6)


# ---------------------------------------------------------------------------
# fifth review pass
# ---------------------------------------------------------------------------


def test_entropy_shadow_snapshot_states_input():
    """5-D snapshot-states input: qubit axis is axis 2, not the last axis."""
    nq = 3
    c = tc.Circuit(nq)
    c.h(0)
    c.cx(0, 1)
    c.ry(2, theta=0.4)
    psi = c.state()
    rng = np.random.default_rng(0)
    strings = jnp.asarray(rng.integers(0, 3, size=(64, nq)), jnp.int32)
    status = jnp.asarray(rng.uniform(size=(64, 2)))
    snaps = shadows.shadow_snapshots(psi, strings, status)
    lss = shadows.local_snapshot_states(snaps, strings)
    e1 = float(np.real(np.asarray(shadows.entropy_shadow(lss, None, sub=[1, 2]))))
    e2 = float(
        np.real(np.asarray(shadows.entropy_shadow(snaps, strings, subsystem_to_keep=[1, 2])))
    )
    assert abs(e1 - e2) < 1e-6
    with pytest.raises(ValueError):
        shadows.entropy_shadow(snaps, strings, sub=[0], alpha=0)
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        shadows.entropy_shadow(snaps, strings, sub=[0], subsystem_to_keep=[1])
        assert any("sub is ignored" in str(x.message) for x in w)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_wide_hyperedges_through_expectation_irs():
    """k>8 rzm/multicz lower through BOTH expectation IRs (ket+bra sides)."""
    from tensorcircuit_ng_tpu.core import contractor as ctr

    X = np.array([[0, 1], [1, 0.0]])
    cw = tc.Circuit(9)
    for q in range(9):
        cw.h(q)
    cw.multicz(*range(9))
    cw.rzm(*range(9), theta=0.8)
    v_ir = float(np.real(np.asarray(ctr.contract_ir(cw.expectation_before((X, [0]))))))
    v_dense = float(np.real(np.asarray(cw.expectation_ps(x=[0]))))
    np.testing.assert_allclose(v_ir, v_dense, atol=1e-5)
    cd2 = tc.DMCircuit2(9)
    for q in range(9):
        cd2.h(q)
    cd2.multicz(*range(9))
    cd2.rzm(*range(9), theta=0.8)
    v_so = float(np.real(np.asarray(ctr.contract_ir(cd2.expectation_before((X, [0]))))))
    np.testing.assert_allclose(v_so, v_dense, atol=1e-5)


def test_rzm_traced_theta_through_ir():
    """Traced rzm theta builds in-trace in the IR; grads match cos law."""
    from tensorcircuit_ng_tpu.core import contractor as ctr
    from tensorcircuit_ng_tpu.core.einsum_ir import expectation_ir

    X = np.array([[0, 1], [1, 0.0]])

    def f(th):
        c = tc.Circuit(4)
        for q in range(4):
            c.h(q)
        c.rzm(0, 1, 2, theta=th)
        ir = expectation_ir(c.to_qir(), 4, [(jnp.asarray(X, jnp.complex64), [0])])
        return jnp.real(ctr.contract_ir(ir))

    v, g = jax.value_and_grad(f)(jnp.asarray(0.4))
    np.testing.assert_allclose(float(v), np.cos(0.4), atol=1e-5)
    np.testing.assert_allclose(float(g), -np.sin(0.4), atol=1e-5)


def test_layer_item_remapping():
    """initial_mapping/compose remap pairs and permute per-qubit thetas."""
    rx = jnp.asarray(np.arange(3) * 0.1 + 0.1, jnp.float32)
    c = tc.Circuit(3)
    c.zzrx_layer([(0, 1)], jnp.asarray([0.3], jnp.float32), rx)
    mp = {0: 2, 1: 0, 2: 1}
    cm = c.initial_mapping(mp)
    co = tc.Circuit(3)
    co.rzz(2, 0, theta=0.3)
    for q_l, q_p in mp.items():
        co.rx(q_p, theta=float(rx[q_l]))
    np.testing.assert_allclose(np.asarray(cm.state()), np.asarray(co.state()), atol=1e-5)
    # partial mapping of a fused layer must raise, not silently misplace
    big = tc.Circuit(4)
    sub = tc.Circuit(2)
    sub.zzrx_layer(
        [(0, 1)], jnp.asarray([0.3], jnp.float32), jnp.asarray([0.1, 0.2], jnp.float32)
    )
    with pytest.raises(ValueError):
        big.compose(sub, indices=[1, 2])
