"""Native C++ TreeSA contraction-path optimizer tests."""

import numpy as np
import pytest

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import native
from tensorcircuit_ng_tpu.core import contractor as ctr


pytestmark = pytest.mark.skipif(
    not native.treesa_available(), reason="g++ unavailable"
)


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


def test_treesa_path_valid_and_correct():
    n = 8
    c = deep_circuit(n, 4)
    ir = c.amplitude_before("0" * n)
    opt = native.TreeSAOptimizer(n_iters=500)
    val_sa = ctr.contract_ir(ir, optimizer=opt)
    val_greedy = ctr.contract_ir(ir, optimizer="greedy")
    np.testing.assert_allclose(np.asarray(val_sa), np.asarray(val_greedy), atol=1e-5)


def test_treesa_cost_not_catastrophic():
    import opt_einsum as oe

    n = 10
    c = deep_circuit(n, 6)
    ir = c.amplitude_before("0" * n)
    opt = native.TreeSAOptimizer(n_iters=1500)
    path_sa = opt(
        [list(x) for x in ir.inputs], list(ir.output), ir.size_dict
    )
    _, info_sa = oe.contract_path(
        ir.to_subscripts(), *ir.shapes(), shapes=True, optimize=path_sa
    )
    _, info_greedy = oe.contract_path(
        ir.to_subscripts(), *ir.shapes(), shapes=True, optimize="greedy"
    )
    # SA should be within a reasonable factor of greedy (often better)
    assert np.log2(float(info_sa.largest_intermediate)) <= np.log2(
        float(info_greedy.largest_intermediate)
    ) + 6


def test_treesa_direct_api():
    # simple matmul chain a-b-c-d: best path is sequential
    inputs = [[0, 1], [1, 2], [2, 3], [3, 4]]
    output = [0, 4]
    size_dict = {0: 2, 1: 64, 2: 2, 3: 64, 4: 2}
    path = native.treesa_path(inputs, output, size_dict, n_iters=300)
    assert len(path) == 3
    # verify the path is executable
    import opt_einsum as oe

    arrays = [np.random.randn(*[size_dict[i] for i in inp]) for inp in inputs]
    sym = {i: oe.get_symbol(i) for i in range(5)}
    eq = ",".join("".join(sym[i] for i in inp) for inp in inputs) + "->" + "".join(
        sym[i] for i in output
    )
    res = oe.contract(eq, *arrays, optimize=path)
    ref = oe.contract(eq, *arrays, optimize="optimal")
    np.testing.assert_allclose(res, ref, atol=1e-8)


def test_auto_escalation_fires_on_hard_net_and_skips_easy(monkeypatch):
    """find_path('auto') escalates to treesa on hard networks (greedy cost
    > 1e10) and does NOT pay the annealer on easy ones (contractor.py
    escalation policy — benchmarked in benchmarks/path_quality.py)."""
    calls = {"n": 0}
    real = native.TreeSAOptimizer

    def counting(*args, **kw):
        calls["n"] += 1
        kw["n_iters"] = 20000  # keep the test fast; quality irrelevant here
        kw["restarts"] = 1
        return real(**kw)

    monkeypatch.setattr(native, "TreeSAOptimizer", counting)

    # easy: shallow chain — greedy is fine, no escalation
    c = deep_circuit(8, 4)
    ir = c.amplitude_before("0" * 8)
    ctr._PATH_CACHE.pop((ir.signature(), "auto"), None)
    _, info = ctr.find_path(ir, "auto")
    assert calls["n"] == 0
    assert float(info.opt_cost) < 1e10

    # hard: 2D brickwork grid — greedy-class paths blow past 1e10 FLOPs
    rows, cols, depth = 5, 5, 10
    n = rows * cols
    rng = np.random.default_rng(3)
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    for l in range(depth):
        if l % 2 == 0:
            pairs = [
                (r * cols + a, r * cols + a + 1)
                for r in range(rows)
                for a in range(l // 2 % 2, cols - 1, 2)
            ]
        else:
            pairs = [
                (a * cols + cc, (a + 1) * cols + cc)
                for cc in range(cols)
                for a in range((l // 2) % 2, rows - 1, 2)
            ]
        for a, b in pairs:
            c.cnot(a, b)
        for i in range(n):
            c.rx(i, theta=float(rng.normal()))
    ir = c.amplitude_before("0" * n)
    import opt_einsum as oe

    _, ginfo = oe.contract_path(
        ir.to_subscripts(), *ir.shapes(), shapes=True, optimize="greedy"
    )
    assert float(ginfo.opt_cost) > 1e10  # precondition: actually hard
    ctr._PATH_CACHE.pop((ir.signature(), "auto"), None)
    _, info = ctr.find_path(ir, "auto")
    assert calls["n"] == 1  # escalation fired exactly once
    assert float(info.opt_cost) <= float(ginfo.opt_cost)
