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


@pytest.mark.slow
def test_windowed_lightcone_vqe_matches_dense():
    """examples/vqe_1000q.py core: per-term window simulation is exact."""
    import importlib.util
    import os

    import numpy as np
    import jax.numpy as jnp

    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu.core import statevec as sv

    path = os.path.join(os.path.dirname(__file__), "..", "examples", "vqe_1000q.py")
    spec = importlib.util.spec_from_file_location("v1000", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n, L = 12, mod.L
    energy_win = mod.make_energy(n)
    rng = np.random.default_rng(3)
    params = jnp.asarray(rng.normal(size=(L, 2, n)) * 0.3, dtype=jnp.float32)

    c = tc.Circuit(n)
    c.h_layer()
    for l in range(L):
        even = [(i, i + 1) for i in range(0, n - 1, 2)]
        odd = [(i, i + 1) for i in range(1, n - 1, 2)]
        c.rzz_product(even, jnp.stack([params[l, 0, i] for i, _ in even]))
        c.rzz_product(odd, jnp.stack([params[l, 0, i] for i, _ in odd]))
        c.rx_layer(params[l, 1])
    pairs = [(i, i + 1) for i in range(n - 1)]
    psi = c.state()
    dense = float(jnp.real(sv.expectation_zz_sum(psi, pairs)) - sv.expectation_x_sum(psi))
    win = float(energy_win(params))
    np.testing.assert_allclose(win, dense, atol=2e-4)
