"""ZX subsystem tests: conversion fidelity, fusion invariance, exact scalars."""

import numpy as np
import pytest
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


def test_simplify_preserves_semantics_and_shrinks():
    import numpy as np

    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.zx import circuit_to_zx, simplify

    rng = np.random.default_rng(4)
    c = tc.Circuit(4)
    names1 = ["h", "s", "t", "x", "z"]
    for _ in range(25):
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
