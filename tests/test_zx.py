"""ZX subsystem tests: conversion fidelity, fusion invariance, exact scalars."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.zx import circuit_to_zx, ZXGraph, ExactScalarArray, gf2_matmul


def assert_proportional(a, b, atol=1e-4):
    a = np.asarray(a).reshape(-1)
    b = np.asarray(b).reshape(-1)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    assert na > 1e-9 and nb > 1e-9
    a = a / na
    b = b / nb
    phase = np.vdot(a, b)
    assert abs(abs(phase) - 1.0) < atol, (abs(phase),)


@pytest.mark.parametrize("builder", [
    lambda c: (c.h(0), c.cnot(0, 1)),
    lambda c: (c.h(0), c.s(0), c.cz(0, 1), c.h(1)),
    lambda c: (c.t(0), c.rz(1, theta=0.7), c.cnot(1, 0)),
    lambda c: (c.h(0), c.h(1), c.rzz(0, 1, theta=0.9)),
    lambda c: (c.x(0), c.rx(1, theta=0.4), c.swap(0, 1)),
    lambda c: (c.h(0), c.cphase(0, 1, theta=0.5)),
])
def test_zx_matrix_matches_circuit(builder):
    c = tc.Circuit(2)
    builder(c)
    g = circuit_to_zx(c)
    m_zx = np.asarray(g.to_matrix())
    m_c = np.asarray(c.matrix())
    assert_proportional(m_zx, m_c)


def test_zx_fusion_preserves_semantics():
    c = tc.Circuit(2)
    c.rz(0, theta=0.3)
    c.rz(0, theta=0.4)
    c.cnot(0, 1)
    c.rz(1, theta=0.5)
    g = circuit_to_zx(c)
    before = np.asarray(g.to_matrix())
    nfused = g.fuse_spiders()
    assert nfused > 0
    after = np.asarray(g.to_matrix())
    assert_proportional(before, after)


def test_zx_closed_scalar():
    # <0|rz(theta)|0> amplitude diagram
    c = tc.Circuit(1)
    c.rz(0, theta=0.8)
    g = circuit_to_zx(c)
    m = np.asarray(g.to_matrix())
    # amplitude <0|U|0>
    amp_c = np.asarray(c.amplitude("0"))
    assert_proportional(np.asarray([m[0, 0]]), np.asarray([amp_c]))


def test_exact_scalar_arithmetic():
    w = ExactScalarArray.from_phase_eighth(1)
    w2 = w * w
    np.testing.assert_allclose(
        complex(np.asarray(w2.to_complex())), np.exp(1j * np.pi / 2), atol=1e-6
    )
    # w^8 = 1
    acc = ExactScalarArray.one()
    for _ in range(8):
        acc = acc * w
    np.testing.assert_allclose(complex(np.asarray(acc.to_complex())), 1.0, atol=1e-6)
    # sqrt2 powers
    s = ExactScalarArray.one().scale_sqrt2(2)
    np.testing.assert_allclose(complex(np.asarray(s.to_complex())), 2.0, atol=1e-6)
    # addition with equal powers
    total = w + w
    np.testing.assert_allclose(
        complex(np.asarray(total.to_complex())), 2 * np.exp(1j * np.pi / 4), atol=1e-6
    )
    # addition across powers: 1 + sqrt2
    mixed = ExactScalarArray.one() + ExactScalarArray.one().scale_sqrt2(1)
    np.testing.assert_allclose(
        complex(np.asarray(mixed.to_complex())), 1 + np.sqrt(2), atol=1e-5
    )


def test_gf2_matmul():
    a = jnp.asarray([[1, 1], [0, 1]])
    b = jnp.asarray([[1, 0], [1, 1]])
    np.testing.assert_allclose(np.asarray(gf2_matmul(a, b)), [[0, 1], [1, 1]])


@pytest.mark.slow  # zx semantics guarded by the exact-scalar tests in the gate
def test_simplify_preserves_semantics_and_shrinks():
    import numpy as np

    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.zx import circuit_to_zx, simplify

    rng = np.random.default_rng(4)
    c = tc.Circuit(4)
    names1 = ["h", "s", "t", "x", "z"]
    for _ in range(16):
        if rng.random() < 0.6:
            getattr(c, names1[rng.integers(len(names1))])(int(rng.integers(4)))
        else:
            q = int(rng.integers(3))
            c.cnot(q, q + 1)
        if rng.random() < 0.3:
            c.rz(int(rng.integers(4)), theta=float(rng.normal()))

    g = circuit_to_zx(c)
    m0 = np.asarray(g.to_matrix())
    n0 = g.num_spiders()
    removed = simplify(g)
    m1 = np.asarray(g.to_matrix())
    np.testing.assert_allclose(m1, m0, atol=1e-5)
    assert removed > 0
    assert g.num_spiders() < n0
    # graph-like form: only Z and boundary spiders remain
    kinds = {s.kind for s in g.spiders.values()}
    assert kinds <= {"Z", "B"}


def test_identity_removal_xor_hadamard():
    import numpy as np

    from tensorcircuit_ng_tpu.zx import ZXGraph, remove_identities

    # B - (H) - Z(0) - (H) - B  ==  plain wire
    g = ZXGraph()
    bi = g.add_spider("B")
    z = g.add_spider("Z", 0.0)
    bo = g.add_spider("B")
    g.inputs = [bi]
    g.outputs = [bo]
    g.add_edge(bi, z, hadamard=True)
    g.add_edge(z, bo, hadamard=True)
    assert remove_identities(g) == 1
    m = np.asarray(g.to_matrix())
    np.testing.assert_allclose(m, np.eye(2), atol=1e-6)


# ============ round-1 parity batch: noise model / stabilizer-T ============


def test_xor_convolve_vs_bruteforce():
    from tensorcircuit_ng_tpu.zx import noise_model as nm

    rng = np.random.default_rng(0)
    for k in (1, 2, 3):
        a = rng.random(2**k); a /= a.sum()
        b = rng.random(2**k); b /= b.sum()
        brute = np.zeros(2**k)
        for i in range(2**k):
            for j in range(2**k):
                brute[i ^ j] += a[i] * b[j]
        np.testing.assert_allclose(nm.xor_convolve(a, b), brute, atol=1e-12)


def test_channel_simplification_and_sampler():
    from tensorcircuit_ng_tpu.zx import noise_model as nm

    # two channels feeding the same f-column merge into one effective channel
    transform = np.array([[1, 1]])
    s = nm.ChannelSampler([nm.error_probs(0.1), nm.error_probs(0.2)], transform, seed=42)
    assert len(s.channels) == 1 and s.num_f_params == 1
    p_eff = 0.1 * 0.8 + 0.9 * 0.2
    np.testing.assert_allclose(s.channels[0].probs, [1 - p_eff, p_eff], atol=1e-12)
    samp = s.sample(100000)
    assert abs(samp.mean() - p_eff) < 5e-3
    out, _ = s.sample_jax(100000, jax.random.key(0))
    assert abs(np.asarray(out, dtype=np.float64).mean() - p_eff) < 5e-3
    # null column marginalized away
    s2 = nm.ChannelSampler([nm.error_probs(0.3), nm.error_probs(0.9)], np.array([[1, 0]]), seed=1)
    assert len(s2.channels) == 1
    # subset absorption
    big = nm.Channel(nm.pauli_channel_1_probs(0.05, 0.02, 0.03), (0, 1))
    small = nm.Channel(nm.error_probs(0.1), (0,))
    merged = nm.absorb_subset_channels(nm.normalize_channels([big, small]))
    assert len(merged) == 1
    want = nm.xor_convolve(
        nm.pauli_channel_1_probs(0.05, 0.02, 0.03),
        nm.expand_channel(nm.Channel(nm.error_probs(0.1), (0,)), (0, 1)).probs,
    )
    np.testing.assert_allclose(merged[0].probs, want, atol=1e-12)


def test_find_basis_gf2():
    from tensorcircuit_ng_tpu.zx.utils import find_basis

    vecs = np.array(
        [[1, 0, 1], [0, 1, 1], [1, 1, 0], [0, 0, 0], [1, 0, 1]], dtype=np.uint8
    )
    basis, transform = find_basis(vecs)
    assert basis.shape[0] == 2
    np.testing.assert_array_equal((transform @ basis) % 2, vecs)


def test_connected_components_zxgraph():
    from tensorcircuit_ng_tpu.zx import circuit_to_zx, connected_components

    c = tc.Circuit(4)
    c.h(0); c.cx(0, 1)
    c.h(2); c.cx(2, 3)
    g = circuit_to_zx(c)
    comps = connected_components(g)
    assert len(comps) == 2
    sizes = sorted(len(comp.graph.spiders) for comp in comps)
    assert sizes[0] > 0 and sum(sizes) == len(g.spiders)


def test_find_stab_decompositions():
    from tensorcircuit_ng_tpu.zx.scalar_graph import find_stab, find_stab_u3

    t_mat = np.diag([1.0, np.exp(0.25j * np.pi)])
    terms = find_stab(1)
    acc = sum(c * ops[0] for c, ops in terms)
    np.testing.assert_allclose(acc, t_mat, atol=1e-12)
    # u3 decomposition reconstructs the unitary
    theta, phi, lam = 0.7, 0.3, -0.4
    terms3 = find_stab_u3(theta, phi, lam)
    acc3 = sum(c * m for c, m in terms3)
    rz = lambda a: np.diag([np.exp(-0.5j * a), np.exp(0.5j * a)])
    ry = lambda a: np.array(
        [[np.cos(a / 2), -np.sin(a / 2)], [np.sin(a / 2), np.cos(a / 2)]]
    )
    np.testing.assert_allclose(acc3, rz(phi) @ ry(theta) @ rz(lam), atol=1e-10)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_stabilizer_t_bell_and_tgate():
    from tensorcircuit_ng_tpu.zx import StabilizerTCircuit

    c = StabilizerTCircuit(2, seed=7)
    c.h(0); c.cx(0, 1)
    c.measure_instruction(0); c.measure_instruction(1)
    s = np.asarray(c.sample_measurements(3000))
    assert (s[:, 0] == s[:, 1]).all()
    assert abs(s[:, 0].mean() - 0.5) < 0.05
    # non-Clifford: T-gate interference statistics
    c2 = StabilizerTCircuit(1, seed=3)
    c2.h(0); c2.t(0); c2.h(0)
    c2.measure_instruction(0)
    p1 = np.asarray(c2.sample_measurements(20000)).mean()
    exact = abs((1 - np.exp(1j * np.pi / 4)) / 2) ** 2
    assert abs(p1 - exact) < 0.015
    # outcome_probability is exact per noise realization
    p = np.asarray(c2.outcome_probability(np.array([1.0]), shots=3))
    np.testing.assert_allclose(p, exact, atol=1e-5)
    # amplitude of the unitary part
    c3 = StabilizerTCircuit(2)
    c3.h(0); c3.cx(0, 1)
    assert abs(complex(np.asarray(c3.amplitude("11"))) - 1 / np.sqrt(2)) < 1e-6


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_stabilizer_t_noise_and_detectors():
    from tensorcircuit_ng_tpu.zx import StabilizerTCircuit

    c = StabilizerTCircuit(3, seed=11)
    c.x_error(1, p=0.2)
    c.cx(0, 2)
    c.measure_instruction(0); c.measure_instruction(1); c.measure_instruction(2)
    c.detector_instruction(-2)
    c.detector_instruction(-1, -3)
    det = np.asarray(c.sample_detectors(20000))
    assert abs(det[:, 0].mean() - 0.2) < 0.02
    assert det[:, 1].mean() < 0.01
    # noisy expectation decays by the depolarizing factor
    c6 = StabilizerTCircuit(1, seed=9)
    c6.h(0)
    c6.depolarizing(0, 0.1, 0.1, 0.1)
    e2 = float(np.asarray(c6.expectation_ps(x=[0], shots=8000)))
    assert abs(e2 - 0.6) < 0.05


@pytest.mark.slow  # 6 s python-side detector sampling; test_detectors.py
# covers detector semantics in the fast gate
def test_stabilizer_t_from_stim_str():
    from tensorcircuit_ng_tpu.zx import StabilizerTCircuit

    stim_text = """
R 0 1 2
X_ERROR(0.1) 0
CX 0 1
M 1
DETECTOR rec[-1]
M 0 2
"""
    c = StabilizerTCircuit.from_stim_str(stim_text)
    det = np.asarray(c.sample_detectors(400, seed=1))
    assert abs(det[:, 0].mean() - 0.1) < 0.055  # 400 samples


def test_stabilizer_t_from_circuit_and_vs_dense():
    from tensorcircuit_ng_tpu.zx import StabilizerTCircuit

    base = tc.Circuit(3)
    base.h(0); base.cx(0, 1); base.rz(2, theta=0.5); base.cx(1, 2); base.t(0)
    st = StabilizerTCircuit.from_circuit(base)
    for bits in ("000", "110", "111"):
        a1 = complex(np.asarray(st.amplitude(bits)))
        a2 = complex(np.asarray(base.amplitude(bits)))
        assert abs(a1 - a2) < 1e-5


def test_build_amplitude_graph_scalar():
    from tensorcircuit_ng_tpu.zx import build_amplitude_graph

    c = tc.Circuit(2)
    c.h(0); c.cx(0, 1); c.t(0)
    g = build_amplitude_graph(c, "11")
    val = complex(np.asarray(g.scalar()))
    want = complex(np.asarray(c.amplitude("11")))
    assert abs(val - want) < 1e-5


# ---------------------------------------------------------------------------
# GraphS / GraphRepresentation (pyzx-style mutable graph, zx/graph_s.py)
# ---------------------------------------------------------------------------


def test_graphs_tensor_semantics():
    import math
    from tensorcircuit_ng_tpu.zx.graph_s import GraphS, VertexType, EdgeType

    # T gate: Z spider phase pi/4
    g = GraphS()
    i = g.add_vertex(VertexType.BOUNDARY)
    v = g.add_vertex(VertexType.Z, phase=0.25)
    o = g.add_vertex(VertexType.BOUNDARY)
    g.add_edge((i, v))
    g.add_edge((v, o))
    g.set_inputs([i])
    g.set_outputs([o])
    np.testing.assert_allclose(
        g.to_tensor(), np.diag([1, np.exp(1j * math.pi * 0.25)]), atol=1e-12
    )

    # CNOT = sqrt(2) * (Z spider - X spider)
    g3 = GraphS()
    ic, it_ = g3.add_vertex(0), g3.add_vertex(0)
    zc, xt = g3.add_vertex(VertexType.Z), g3.add_vertex(VertexType.X)
    oc, ot = g3.add_vertex(0), g3.add_vertex(0)
    for e in [(ic, zc), (it_, xt), (zc, xt), (zc, oc), (xt, ot)]:
        g3.add_edge(e)
    g3.set_inputs([ic, it_])
    g3.set_outputs([oc, ot])
    g3.scalar.add_power(1)
    cnot = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
    np.testing.assert_allclose(g3.to_tensor().reshape(4, 4), cnot, atol=1e-12)

    # hadamard edge realizes H
    g4 = GraphS()
    i, a, b, o = (g4.add_vertex(t) for t in (0, 1, 1, 0))
    g4.add_edge((i, a))
    g4.add_edge((a, b), EdgeType.HADAMARD)
    g4.add_edge((b, o))
    g4.set_inputs([i])
    g4.set_outputs([o])
    H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    np.testing.assert_allclose(g4.to_tensor(), H, atol=1e-12)


def test_graphs_edge_parity_rules():
    from tensorcircuit_ng_tpu.zx.graph_s import GraphS, EdgeType

    # Hopf: parallel hadamard edges between same-colour spiders cancel (1/2)
    g = GraphS()
    i, a, b, o = (g.add_vertex(t) for t in (0, 1, 1, 0))
    g.add_edge((i, a))
    g.add_edge((b, o))
    g.add_edge((a, b), EdgeType.HADAMARD)
    g.add_edge((a, b), EdgeType.HADAMARD)
    g.set_inputs([i])
    g.set_outputs([o])
    assert g.edge_type((a, b)) == 0
    np.testing.assert_allclose(g.to_tensor(), 0.5 * np.ones((2, 2)), atol=1e-12)

    # parallel simple edges between different colours cancel with 1/2
    g2 = GraphS()
    a, b = g2.add_vertex(1), g2.add_vertex(2)
    g2.add_edge((a, b))
    g2.add_edge((a, b))
    assert g2.edge_type((a, b)) == 0 and g2.scalar.power2 == -2

    # same-colour simple edges are idempotent; mixed pair stored as 3
    g3 = GraphS()
    a, b = g3.add_vertex(1), g3.add_vertex(1)
    g3.add_edge((a, b))
    g3.add_edge((a, b))
    assert g3.edge_type((a, b)) == EdgeType.SIMPLE
    g3.add_edge((a, b), EdgeType.HADAMARD)
    assert g3.edge_type((a, b)) == EdgeType.BOTH

    # hadamard self-loop = pi phase + 1/sqrt(2)
    g4 = GraphS()
    i, a, o = (g4.add_vertex(t) for t in (0, 1, 0))
    g4.add_edge((i, a))
    g4.add_edge((a, o))
    g4.add_edge((a, a), EdgeType.HADAMARD)
    g4.set_inputs([i])
    g4.set_outputs([o])
    np.testing.assert_allclose(
        g4.to_tensor(), np.diag([1, -1]) / np.sqrt(2), atol=1e-12
    )


def test_graph_representation_wrapper():
    from tensorcircuit_ng_tpu.zx import GraphRepresentation, VertexType

    br = GraphRepresentation()
    v1 = br.add_vertex(VertexType.Z, qubit=0, row=1, phase=0.5)
    v2 = br.add_vertex(VertexType.Z, qubit=0, row=2)
    br.add_edge((v1, v2))
    br.rec.append(v1)
    br.observables_dict[0] = v2
    assert br.num_vertices() == 2
    assert br.phase(v1) == 0.5
    assert br.observables == [v2]
    assert list(br.neighbors(v1)) == [v2]
    assert br.vertex_degree(v1) == 1
    br.set_vdata(v1, "tag", "m0")
    assert br.vdata(v1, "tag") == "m0"
    br.add_to_phase(v1, 0.25, params={"e0"})
    assert br.get_params(v1) == {"e0"}

    assert br.phase(v1) == 0.75  # 0.5 + 0.25
    b2 = br.copy()
    b2.set_phase(v1, 1.5)
    assert br.phase(v1) == 0.75 and b2.phase(v1) == 1.5
    assert b2.rec == [v1] and b2.rec is not br.rec

    # add_edge_table applies nonzero entries
    v3 = br.add_vertex(VertexType.X)
    br.add_edge_table({(v2, v3): [1, 2]})  # EdgeType codes, 0 entries skipped
    assert br.graph.connected(v2, v3)

    br.remove_edge((v1, v2))
    br.remove_isolated_vertices()
    assert v1 not in br.vertex_set()

    with pytest.raises(AttributeError):
        br.not_a_method
