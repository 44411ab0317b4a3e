"""Classical shadows tests: statistical convergence to exact values."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import shadows


def test_shadow_bound():
    n_total, k = shadows.shadow_bound([[1, 0, 3], [0, 2, 0]], epsilon=0.5)
    assert n_total > 0 and k > 0 and n_total % k == 0


@pytest.mark.slow  # statistical convergence; exact shadow identities stay in the gate
def test_shadow_expectation_converges():
    n = 3
    c = tc.Circuit(n)
    c.h(0)
    c.cnot(0, 1)
    c.rx(2, theta=0.6)
    psi = c.state()

    ns = 3000
    rng = np.random.default_rng(7)
    strings = jnp.asarray(rng.integers(0, 3, size=(ns, n)), dtype=jnp.int32)
    status = jnp.asarray(rng.uniform(size=(ns, 1)))
    snaps = shadows.shadow_snapshots(psi, strings, status)
    assert snaps.shape == (ns, 1, n)

    # <Z0 Z1> = 1 for the bell pair
    ests = shadows.expectation_ps_shadow(snaps, strings, z=[0, 1], k=5)
    val = float(np.median([float(e) for e in ests]))
    np.testing.assert_allclose(val, 1.0, atol=0.25)
    # <X2> = 0? rx rotation: <X2>=0; <Z2> = cos(0.6)
    ests_z2 = shadows.expectation_ps_shadow(snaps, strings, z=[2], k=5)
    val_z2 = float(np.median([float(e) for e in ests_z2]))
    np.testing.assert_allclose(val_z2, np.cos(0.6), atol=0.25)


@pytest.mark.slow  # statistical sweep; sibling: test_shadow_expectation_converges
def test_global_shadow_state_converges():
    n = 2
    c = tc.Circuit(n)
    c.h(0)
    c.cnot(0, 1)
    psi = c.state()
    rho_exact = np.outer(np.asarray(psi), np.asarray(psi).conj())

    ns = 5000
    rng = np.random.default_rng(11)
    strings = jnp.asarray(rng.integers(0, 3, size=(ns, n)), dtype=jnp.int32)
    status = jnp.asarray(rng.uniform(size=(ns, 1)))
    snaps = shadows.shadow_snapshots(psi, strings, status)
    rho_est = np.asarray(shadows.global_shadow_state(snaps, strings))
    np.testing.assert_allclose(rho_est, rho_exact, atol=0.15)
    np.testing.assert_allclose(np.trace(rho_est).real, 1.0, atol=0.05)


def test_entropy_shadow():
    n = 2
    c = tc.Circuit(n)
    c.h(0)
    c.cnot(0, 1)
    psi = c.state()
    ns = 4000
    rng = np.random.default_rng(13)
    strings = jnp.asarray(rng.integers(0, 3, size=(ns, n)), dtype=jnp.int32)
    status = jnp.asarray(rng.uniform(size=(ns, 8)))
    snaps = shadows.shadow_snapshots(psi, strings, status)
    # subsystem qubit 0 is maximally mixed: purity 0.5 -> renyi2 = ln 2
    s2 = float(shadows.renyi_entropy_2(snaps, sub=[0]))
    np.testing.assert_allclose(s2, np.log(2), atol=0.3)


@pytest.mark.slow  # heavy; fast sibling covers the path
def test_global_shadow_state_variants_agree():
    n, ns, repeat = 3, 400, 4
    c = tc.Circuit(n)
    c.h(0); c.cx(0, 1); c.rx(2, theta=0.7)
    psi = c.state()
    rng = np.random.default_rng(7)
    ps = rng.integers(0, 3, size=(ns, n)).astype(np.int32)
    status = rng.random((ns, repeat))
    snaps = shadows.shadow_snapshots(psi, ps, status)
    g0 = np.asarray(shadows.global_shadow_state(snaps, ps))
    g1 = np.asarray(shadows.global_shadow_state1(snaps, ps))
    g2 = np.asarray(shadows.global_shadow_state2(snaps, ps))
    np.testing.assert_allclose(g0, g1, atol=1e-5)
    np.testing.assert_allclose(g0, g2, atol=1e-5)
    # subsystem slicing matches reduced density matrix statistically
    s1 = np.asarray(shadows.global_shadow_state1(snaps, ps, sub=[0, 1]))
    s2 = np.asarray(shadows.global_shadow_state2(snaps, ps, sub=[0, 1]))
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    rho = np.asarray(tc.quantum.reduced_density_matrix(psi, [2]))
    assert np.abs(s1 - rho).max() < 0.25


def test_slice_sub_shape():
    x = np.zeros([5, 2, 4, 2, 2])
    y = shadows.slice_sub(x, [1, 3])
    assert y.shape == (5, 2, 2, 2, 2)
