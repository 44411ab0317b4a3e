"""End-to-end integration: VQE converges to the exact TFIM ground energy."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.templates.hamiltonians import tfim_hamiltonian


def test_vqe_converges_to_ground_state():
    import optax

    n, nlayers = 6, 3
    pairs = [(i, i + 1) for i in range(n - 1)]

    def energy(params):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(nlayers):
            c.rzz_product(pairs, params[l, 0, : n - 1])
            c.rx_layer(params[l, 1])
        return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()

    h = np.asarray(tfim_hamiltonian(n, j=1.0, h=-1.0, sparse=False))
    e_exact = float(np.linalg.eigvalsh(h)[0])

    params = jnp.asarray(
        np.random.default_rng(7).normal(size=(nlayers, 2, n)) * 0.1, dtype=jnp.float32
    )
    opt = optax.adam(5e-2)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(energy))
    for _ in range(300):
        v, g = vg(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    final = float(vg(params)[0])
    # hardware-efficient ansatz should reach within 2% of exact GS energy
    assert final < e_exact + 0.02 * abs(e_exact), (final, e_exact)


def test_fused_energy_matches_hamiltonian_matrix():
    n = 5
    pairs = [(i, i + 1) for i in range(n - 1)]
    params = jnp.asarray(np.random.default_rng(3).normal(size=(2, n)) * 0.3, dtype=jnp.float32)
    c = tc.Circuit(n)
    c.h_layer()
    c.rzz_product(pairs, params[0, : n - 1])
    c.rx_layer(params[1])
    e_fused = float(jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum())
    h = np.asarray(tfim_hamiltonian(n, j=1.0, h=-1.0, sparse=False))
    psi = np.asarray(c.state())
    e_mat = float(np.real(psi.conj() @ h @ psi))
    np.testing.assert_allclose(e_fused, e_mat, atol=1e-4)
