"""Applications tests: QUBO-QAOA, CVaR, DQAS, MADE."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.applications import optimization, dqas, layers, graphdata


def test_qubo_qaoa_small():
    # minimize x0 + x1 - 3 x0 x1 -> optimum x = (1,1), energy -1
    Q = np.array([[1.0, -1.5], [-1.5, 1.0]])
    params, e_best, bits = optimization.QUBO_QAOA(Q, nlayers=2, steps=120, seed=1)
    assert bits == "11"
    np.testing.assert_allclose(e_best, -1.0, atol=1e-6)


def test_cvar_loss():
    probs = jnp.asarray([0.5, 0.5])
    energies = jnp.asarray([-1.0, 1.0])
    # alpha=0.5 takes only the lowest half
    np.testing.assert_allclose(float(optimization.cvar_loss(probs, energies, 0.5)), -1.0, atol=1e-6)
    np.testing.assert_allclose(float(optimization.cvar_loss(probs, energies, 1.0)), 0.0, atol=1e-6)


def test_cvar_from_counts():
    counts = {"00": 50, "11": 50}
    e_fn = lambda b: -1.0 if b == "11" else 1.0
    np.testing.assert_allclose(optimization.cvar_from_counts(counts, e_fn, 0.5), -1.0, atol=1e-6)


def test_dqas_finds_good_op():
    # pool: rx or identity on a single qubit; target: maximize |<1|psi>|^2
    def loss_fn(ops, params):
        c = tc.Circuit(1)
        for s, op in enumerate(ops):
            if op == 0:
                c.rx(0, theta=params[s, 0])
            # op == 1: identity
        p = c.probability()
        return 1.0 - jnp.real(p[1])

    best_ops, params, hist = dqas.DQAS_search(
        op_pool=[0, 1], nslots=1, loss_fn=loss_fn, batch=8, steps=30, seed=3
    )
    assert best_ops == [0]  # rx chosen over identity
    assert hist[-1] < hist[0] + 1e-6


def test_layer_generators():
    c = tc.Circuit(4)
    layers.ry_layer(c, jnp.asarray([0.1] * 4))
    layers.zz_layer(c, jnp.asarray([0.2] * 3))
    layers.cnot_ring(c)
    assert c.gate_count() == 4 + 3 + 4


def test_graphdata():
    gen = graphdata.regular_graph_generator(3, 8, seed=0)
    g = next(gen)
    assert graphdata.all_nodes_covered(g)
    assert g.number_of_nodes() == 8


def test_made():
    flax = pytest.importorskip("flax")
    from tensorcircuit_ng_tpu.applications.van import MADE

    n = 4
    model = MADE(n=n, hidden=16)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2, size=(5, n)), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    lp = model.apply(params, x)
    assert lp.shape == (5,)
    assert np.all(np.asarray(lp) <= 0)
    # autoregressive property: logits for x_0 independent of inputs
    lg1 = model.apply(params, x, method=lambda m, xx: m.logits(xx))
    x2 = x.at[:, 1:].set(1 - x[:, 1:])
    lg2 = model.apply(params, x2, method=lambda m, xx: m.logits(xx))
    np.testing.assert_allclose(np.asarray(lg1[:, 0]), np.asarray(lg2[:, 0]), atol=1e-6)
    # sampling + total-probability check on all configs
    samples = model.apply(params, jax.random.PRNGKey(1), 64, method=lambda m, k, b: m.sample(k, b))
    assert samples.shape == (64, n)
    allx = jnp.asarray([[int(b) for b in format(i, f"0{n}b")] for i in range(2**n)], dtype=jnp.float32)
    total = float(jnp.sum(jnp.exp(model.apply(params, allx))))
    np.testing.assert_allclose(total, 1.0, atol=1e-4)
