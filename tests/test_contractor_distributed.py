"""Einsum IR, contraction, slicing, and distributed-contractor tests.

Multi-device paths run on the 8 virtual CPU devices from conftest's
``xla_force_host_platform_device_count`` (reference test strategy §4).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import einsum_ir as eir
from tensorcircuit_ng_tpu.core import contractor as ctr
from tensorcircuit_ng_tpu.parallel import DistributedContractor, term_sharded_expectation


def small_circuit(n, params=None):
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for i in range(n - 1):
        c.cnot(i, i + 1)
    if params is not None:
        for i in range(n):
            c.rx(i, theta=params[i])
    return c


def test_amplitude_ir_matches_dense():
    n = 6
    c = small_circuit(n)
    for bits in ["0" * n, "1" * n, "010101"]:
        ir = c.amplitude_before(bits)
        val = ctr.contract_ir(ir)
        np.testing.assert_allclose(
            np.asarray(val), np.asarray(c.amplitude(bits)), atol=1e-6
        )


def test_expectation_ir_matches_dense():
    n = 6
    params = jnp.asarray(np.random.default_rng(0).normal(size=n), dtype=jnp.float32)
    c = small_circuit(n, params)
    ir = c.expectation_before((tc.gates.z(), [0]), (tc.gates.z(), [1]))
    val = ctr.contract_ir(ir)
    np.testing.assert_allclose(
        np.asarray(val), np.asarray(c.expectation_ps(z=[0, 1])), atol=1e-5
    )


def test_contraction_info():
    n = 8
    c = small_circuit(n)
    info = ctr.contraction_info(c.amplitude_before("0" * n))
    assert info["flops"] > 0
    assert info["largest_intermediate"] >= 2


def deep_circuit(n, depth, seed=1):
    rng = np.random.default_rng(seed)
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for l in range(depth):
        for i in range(l % 2, n - 1, 2):
            c.cnot(i, i + 1)
        for i in range(n):
            c.rx(i, theta=float(rng.normal()))
    return c


@pytest.mark.slow
def test_sliced_contraction_matches_full():
    n = 8
    c = deep_circuit(n, 6)
    ir = c.amplitude_before("0" * n)
    full = ctr.contract_ir(ir)
    sliced_idx = ctr.choose_slices(ir, target_size=2**4)
    assert len(sliced_idx) >= 1
    val = ctr.sliced_contract_ir(ir, sliced_idx)
    np.testing.assert_allclose(np.asarray(val), np.asarray(full), atol=1e-5)
    # empty slice set degenerates to the full contraction
    val2 = ctr.sliced_contract_ir(ir, [])
    np.testing.assert_allclose(np.asarray(val2), np.asarray(full), atol=1e-5)


@pytest.mark.slow  # slicing covered by the distributed-contractor vag test + driver dryrun
def test_large_n_amplitude_ghz():
    # 40-qubit GHZ amplitude through the IR path (dense state impossible)
    n = 40
    c = tc.Circuit(n)
    c.h(0)
    for i in range(n - 1):
        c.cnot(i, i + 1)
    amp0 = c.amplitude("0" * n)
    amp1 = c.amplitude("1" * n)
    amp_mixed = c.amplitude("1" + "0" * (n - 1))
    np.testing.assert_allclose(np.abs(np.asarray(amp0)), 1 / np.sqrt(2), atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(amp1)), 1 / np.sqrt(2), atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(amp_mixed)), 0.0, atol=1e-5)


def test_large_n_expectation_lightcone():
    n = 50
    c = tc.Circuit(n)
    for i in range(n):
        c.rx(i, theta=0.1 * (i + 1))
    for i in range(n - 1):
        c.cnot(i, i + 1)
    val = c.expectation_ps(z=[0])
    np.testing.assert_allclose(np.real(np.asarray(val)), np.cos(0.1), atol=1e-5)


def test_distributed_contractor_value_and_grad():
    n = 8
    devices = jax.devices()
    assert len(devices) >= 8

    def ir_fn(params):
        c = small_circuit(n, params)
        return c.expectation_before((tc.gates.z(), [0]), (tc.gates.z(), [1]))

    params = jnp.asarray(np.random.default_rng(2).normal(size=n), dtype=jnp.float32)
    dc = DistributedContractor(ir_fn, params, options={"target_size": 2**6})
    rep = dc.report()
    assert rep["devices"] == len(devices)
    v = dc.value(params)
    c = small_circuit(n, params)
    expected = c.expectation_ps(z=[0, 1])
    np.testing.assert_allclose(np.asarray(v), np.asarray(expected), atol=1e-5)
    val, grad = dc.value_and_grad(params)
    np.testing.assert_allclose(float(val), float(np.real(np.asarray(expected))), atol=1e-5)

    def dense_loss(ps):
        return jnp.real(small_circuit(n, ps).expectation_ps(z=[0, 1]))

    g2 = jax.grad(dense_loss)(params)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g2), atol=1e-4)


def test_distributed_contractor_path_checkpoint(tmp_path):
    n = 6

    def ir_fn(params):
        c = small_circuit(n, params)
        return c.amplitude_before("0" * n)

    params = jnp.asarray(np.zeros(n), dtype=jnp.float32)
    dc = DistributedContractor(ir_fn, params, options={"target_size": 2**4})
    fp = str(tmp_path / "tree.pkl")
    dc.find_path(fp)
    dc2 = DistributedContractor.from_path(fp, ir_fn, params)
    v1 = dc.value(params)
    v2 = dc2.value(params)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_term_sharded_expectation():
    n = 6
    mesh = None  # default over all 8 cpu devices
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
    while len(ls) % 8 != 0:
        ls.append([0] * n)
        ws.append(0.0)

    def state_fn(params):
        c = tc.Circuit(n)
        for i in range(n):
            c.h(i)
        for i in range(n):
            c.rx(i, theta=params[i])
        return c.state()

    energy = term_sharded_expectation(state_fn, np.array(ls), np.array(ws))
    params = jnp.asarray(np.random.default_rng(3).normal(size=n) * 0.3, dtype=jnp.float32)
    e = energy(params)

    # dense reference
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for i in range(n):
        c.rx(i, theta=params[i])
    expected = 0.0
    for i in range(n - 1):
        expected += np.real(np.asarray(c.expectation_ps(z=[i, i + 1])))
    for i in range(n):
        expected += -np.real(np.asarray(c.expectation_ps(x=[i])))
    np.testing.assert_allclose(float(e), expected, atol=1e-4)


def test_dry_run_and_strip_exponent():
    n = 6
    c = small_circuit(n)
    ir = c.amplitude_before("0" * n)
    z = ctr.contract_ir(ir, dry_run=True)
    assert z.shape == ()
    assert complex(np.asarray(z)) == 0
    val, logf = ctr.contract_ir(ir, strip_exponent=True)
    full = ctr.contract_ir(ir)
    np.testing.assert_allclose(
        complex(np.asarray(val)) * np.exp(float(logf)), complex(np.asarray(full)), atol=1e-6
    )


def test_mpo_gate_application():
    import tensorcircuit_ng_tpu.quantum as qu

    # rzz as a 2-site MPO: bond-2 decomposition of exp(-i theta/2 Z x Z)
    theta = 0.6
    za = np.zeros((1, 2, 2, 2), dtype=complex)
    za[0, :, :, 0] = np.cos(theta / 2) * np.eye(2)
    za[0, :, :, 1] = -1j * np.sin(theta / 2) * np.diag([1, -1])
    zb = np.zeros((2, 2, 2, 1), dtype=complex)
    zb[0, :, :, 0] = np.eye(2)
    zb[1, :, :, 0] = np.diag([1, -1])
    c = tc.Circuit(3)
    c.h(0)
    c.h(1)
    c.mpo(0, 1, mpo=[za, zb])
    c2 = tc.Circuit(3)
    c2.h(0)
    c2.h(1)
    c2.rzz(0, 1, theta=theta)
    np.testing.assert_allclose(np.asarray(c.state()), np.asarray(c2.state()), atol=1e-5)


def test_hyperedge_contraction_support():
    """Indices shared by >2 tensors (CopyNode/hyperedge semantics)."""
    import jax

    rng = np.random.default_rng(0)
    # scalar = sum_i a_i b_i c_i  (3-tensor hyperedge on index 0)
    a, b, c_ = (rng.normal(size=3).astype(np.float32) for _ in range(3))
    ir = eir.EinsumIR([(0,), (0,), (0,)], (), {0: 3}, [a, b, c_])
    v = ctr.contract_ir(ir)
    np.testing.assert_allclose(float(v), float(np.sum(a * b * c_)), atol=1e-6)

    # chained hyperedges with an open leg: out_j = sum_i a_i b_i M_ij d_j
    M = rng.normal(size=(3, 4)).astype(np.float32)
    d = rng.normal(size=4).astype(np.float32)
    ir2 = eir.EinsumIR([(0,), (0,), (0, 1), (1,)], (1,), {0: 3, 1: 4}, [a, b, M, d])
    v2 = ctr.contract_ir(ir2)
    np.testing.assert_allclose(
        np.asarray(v2), np.einsum("i,i,ij,j->j", a, b, M, d), atol=1e-5
    )

    # jit + AD through a hyperedge
    def f(x):
        ir3 = eir.EinsumIR([(0,), (0,), (0,)], (), {0: 3}, [x, b, c_])
        return ctr.contract_ir(ir3)

    g = jax.grad(f)(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(g), b * c_, atol=1e-5)
    vj = jax.jit(f)(jnp.asarray(a))
    np.testing.assert_allclose(float(vj), float(np.sum(a * b * c_)), atol=1e-5)


def test_treesa_handles_hyperedges():
    from tensorcircuit_ng_tpu.core.native import TreeSAOptimizer, treesa_available

    if not treesa_available():
        import pytest

        pytest.skip("no g++")
    rng = np.random.default_rng(1)
    tensors = [rng.normal(size=(4, 4)).astype(np.float32) for _ in range(4)]
    # star hyperedge: index 0 in all four tensors
    ir = eir.EinsumIR(
        [(0, 1), (0, 2), (0, 3), (0, 4)],
        (1, 2, 3, 4),
        {i: 4 for i in range(5)},
        tensors,
    )
    v_greedy = ctr.contract_ir(ir, optimizer="greedy")
    v_sa = ctr.contract_ir(ir, optimizer=TreeSAOptimizer(n_iters=300))
    np.testing.assert_allclose(np.asarray(v_sa), np.asarray(v_greedy), atol=1e-4)


def test_treesa_easy_network_policy():
    """The annealer returns the greedy seed immediately when its cost is
    already below the skip threshold (VERDICT r2 #6: auto/treesa must never
    burn seconds to tie greedy on easy nets)."""
    import time

    import opt_einsum as oe

    from tensorcircuit_ng_tpu.core.native import TreeSAOptimizer, treesa_available

    if not treesa_available():
        pytest.skip("native treesa unavailable")
    n, depth = 24, 8
    c = tc.Circuit(n)
    for l in range(depth):
        for i in range(l % 2, n - 1, 2):
            c.cnot(i, i + 1)
    ir = c.expectation_before((np.diag([1.0, -1.0]), [n // 2]))
    t0 = time.time()
    _, ig = oe.contract_path(ir.to_subscripts(), *ir.shapes(), shapes=True, optimize="greedy")
    t_greedy = time.time() - t0
    t0 = time.time()
    _, it = oe.contract_path(
        ir.to_subscripts(), *ir.shapes(), shapes=True,
        optimize=TreeSAOptimizer(n_iters=600000, restarts=3),
    )
    t_sa = time.time() - t0
    assert float(ig.opt_cost) < 1e9  # this IS an easy network
    assert float(it.opt_cost) <= float(ig.opt_cost) * 1.001
    assert t_sa < t_greedy + 0.5, (t_sa, t_greedy)
