"""Templates tests: lattices, measurements, hamiltonians, blocks, conversions."""

import numpy as np
import pytest
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.templates import (
    lattice as lat,
    measurements as meas,
    hamiltonians as ham,
    blocks,
    graphs,
    conversions,
    ansatz,
    dataset,
)


def test_chain_lattice():
    l = lat.ChainLattice(6, pbc=True)
    assert l.num_sites == 6
    nn = l.get_neighbor_pairs(1)
    assert len(nn) == 6  # pbc ring
    l2 = lat.ChainLattice(6, pbc=False)
    assert len(l2.get_neighbor_pairs(1)) == 5


def test_square_lattice_neighbors():
    l = lat.SquareLattice((3, 3), pbc=False)
    assert l.num_sites == 9
    nn = l.get_neighbor_pairs(1)
    assert len(nn) == 12  # 2*3*2 edges on open 3x3
    nnn = l.get_neighbor_pairs(2)
    assert len(nnn) == 8  # diagonals


def test_honeycomb_kagome_sites():
    assert lat.HoneycombLattice((2, 2)).num_sites == 8
    assert lat.KagomeLattice((2, 2)).num_sites == 12
    assert lat.LiebLattice((2, 2)).num_sites == 12
    assert lat.TriangularLattice((3, 3)).num_sites == 9
    assert lat.CubicLattice((2, 2, 2)).num_sites == 8


def test_customize_lattice_and_layers():
    l = lat.CustomizeLattice(2, ["a", "b", "c"], [[0, 0], [1, 0], [2, 0]])
    assert l.get_index("b") == 1
    bonds = [(0, 1), (1, 2), (2, 3), (3, 0)]
    layers = lat.get_compatible_layers(bonds)
    for layer in layers:
        used = [q for b in layer for q in b]
        assert len(used) == len(set(used))
    assert sum(len(l_) for l_ in layers) == 4


def test_operator_expectation_dispatch():
    n = 4
    c = tc.Circuit(n)
    for i in range(n):
        c.h(i)
    h_sparse = ham.tfim_hamiltonian(n, j=1.0, h=-1.0)
    h_dense = ham.tfim_hamiltonian(n, j=1.0, h=-1.0, sparse=False)
    from tensorcircuit_ng_tpu import quantum as qu
    e1 = float(meas.operator_expectation(c, h_sparse))
    e2 = float(meas.operator_expectation(c, h_dense))
    np.testing.assert_allclose(e1, e2, atol=1e-5)
    np.testing.assert_allclose(e1, -n, atol=1e-5)  # |+>^n: <X_i>=1, <ZZ>=0


def test_heisenberg_measurements_match_hamiltonian():
    n = 4
    g = graphs.Line1D(n, pbc=False)
    c = tc.Circuit(n)
    for i in range(n):
        c.rx(i, theta=0.3 * (i + 1))
    h = ham.heisenberg_hamiltonian(g, sparse=False)
    e_direct = float(meas.operator_expectation(c, h))
    e_terms = float(meas.heisenberg_measurements(c, g))
    np.testing.assert_allclose(e_terms, e_direct, atol=1e-5)


def test_qft_block():
    n = 3
    c = tc.Circuit(n)
    blocks.qft(c)
    psi = np.asarray(c.state())
    # QFT|0> = uniform superposition
    np.testing.assert_allclose(psi, np.ones(8) / np.sqrt(8), atol=1e-5)


def test_qaoa_ansatz_and_qubo():
    Q = np.array([[1.0, -2.0], [-2.0, 3.0]])
    structures, weights, offset = conversions.QUBO_to_Ising(Q)
    # check roundtrip energy on all bitstrings
    for bits in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        x = np.asarray(bits, dtype=float)
        e_qubo = x @ Q @ x
        z = 1 - 2 * x
        e_ising = offset
        for l, w in zip(structures, weights):
            term = w
            for i, v in enumerate(l):
                if v == 3:
                    term *= z[i]
            e_ising += term
        np.testing.assert_allclose(e_qubo, e_ising, atol=1e-9)
    c = ansatz.QAOA_ansatz_for_Ising([0.3, 0.5], 1, structures, weights)
    assert c.nqubits == 2
    Q2, const = conversions.Ising_to_QUBO(structures, weights, offset)
    np.testing.assert_allclose(Q2 + np.diag([const / 2] * 2) * 0, (Q + Q.T) / 2, atol=1e-9)


def test_rydberg_hamiltonian_hermitian():
    l = lat.ChainLattice(3, pbc=False)
    h = ham.rydberg_hamiltonian(l, omega=1.0, delta=0.5, c6=1.0, sparse=False)
    h = np.asarray(h)
    np.testing.assert_allclose(h, h.conj().T, atol=1e-6)


def test_grid2dcoord():
    g = graphs.Grid2DCoord(3, 2)
    assert g.two2one(*g.one2two(4)) == 4
    assert len(g.all_rows(pbc=False)) == 4
    assert len(g.all_cols(pbc=False)) == 3


def test_amplitude_encoding():
    x = np.arange(16.0)
    v = np.asarray(dataset.amplitude_encoding(x, 4))
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-6)
    # reference semantics: non-batch; batch via vmap (reference dataset.py:39)
    import jax

    xb = jnp.asarray(np.random.default_rng(0).normal(size=(5, 10)), jnp.float32)
    vb = np.asarray(jax.vmap(lambda f: dataset.amplitude_encoding(f, 4))(xb))
    assert vb.shape == (5, 16)
    np.testing.assert_allclose(np.linalg.norm(vb, axis=1), np.ones(5), atol=1e-5)


def test_hea_ansatz_runs():
    c = ansatz.hea_ansatz(np.zeros((3, 2, 4)), 4, 2)
    psi = np.asarray(c.state())
    assert abs(psi[0]) > 0.99


def test_grid2d_entangling_and_get_ps():
    from tensorcircuit_ng_tpu.templates.graphs import Grid2DCoord
    from tensorcircuit_ng_tpu.templates.blocks import Grid2D_entangling
    from tensorcircuit_ng_tpu.templates.conversions import get_ps

    coord = Grid2DCoord(2, 2)
    c = tc.Circuit(4)
    zz = np.kron(np.diag([1.0, -1.0]), np.diag([1.0, -1.0]))
    nedges = len(coord.all_rows()) + len(coord.all_cols())
    Grid2D_entangling(c, coord, zz, jnp.ones(nedges) * 0.3)
    s = np.asarray(c.state())
    # diagonal generator on |0000>: pure phase, amplitude stays on |0000>
    assert abs(abs(s[0]) - 1.0) < 1e-6
    assert abs(s[0] - np.exp(-1j * 0.3 * nedges)) < 1e-5

    class FakeQO:
        terms = {((0, "X"), (2, "Z")): 0.5, ((1, "Y"),): -1.0}

    ps, w = get_ps(FakeQO(), 3)
    assert ps.tolist() == [[1, 0, 3], [0, 2, 0]] and w.tolist() == [0.5, -1.0]
