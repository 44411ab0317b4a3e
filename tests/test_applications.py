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


def test_portfolio_qubo_and_stockdata():
    import numpy as np
    from tensorcircuit_ng_tpu.applications import finance

    rng = np.random.default_rng(0)
    daily = 1.0 + rng.normal(0, 0.01, size=(6, 40))
    prices = 100.0 * np.cumprod(daily, axis=1)
    sd = finance.StockData(prices)
    mu = sd.get_return()
    cov = sd.get_covariance()
    assert mu.shape == (6,)
    assert cov.shape == (6, 6)
    np.testing.assert_allclose(cov, cov.T, atol=1e-9)
    Q = finance.QUBO_from_portfolio(cov, mu, q=0.5, B=2, t=10.0)
    assert Q.shape == (6, 6)
    # brute-force check: optimum satisfies the budget when penalty dominates
    best, best_x = None, None
    for m in range(2**6):
        x = np.array([(m >> i) & 1 for i in range(6)], dtype=float)
        v = x @ Q @ x
        if best is None or v < best:
            best, best_x = v, x
    assert int(best_x.sum()) == 2


def test_physics_baselines():
    import numpy as np
    from tensorcircuit_ng_tpu.applications import physics
    import tensorcircuit_ng_tpu as tc
    from tensorcircuit_ng_tpu import quantum as qu

    # compare against exact diagonalization on a small PBC chain
    L = 6
    edges = [(i, (i + 1) % L) for i in range(L)]
    # TFIM: -sum ZZ - sum X (Pauli convention)
    ls, ws = [], []
    for a, b in edges:
        l = [0] * L
        l[a] = 3
        l[b] = 3
        ls.append(l)
        ws.append(-1.0)
    for i in range(L):
        l = [0] * L
        l[i] = 1
        ls.append(l)
        ws.append(-1.0)
    h = qu.PauliStringSum2Dense(ls, ws, numpy=True)
    e0 = float(np.linalg.eigvalsh(h)[0])
    np.testing.assert_allclose(physics.TFIM1Denergy(L), e0, rtol=1e-8)

    # Heisenberg: sum XX+YY+ZZ
    ls, ws = [], []
    for a, b in edges:
        for pp in (1, 2, 3):
            l = [0] * L
            l[a] = pp
            l[b] = pp
            ls.append(l)
            ws.append(1.0)
    h = qu.PauliStringSum2Dense(ls, ws, numpy=True)
    e0 = float(np.linalg.eigvalsh(h)[0])
    np.testing.assert_allclose(physics.Heisenberg1Denergy(L), e0, rtol=1e-6)


def test_data_collapse():
    import numpy as np
    from tensorcircuit_ng_tpu.applications.physics import data_collapse

    # synthetic perfect collapse: obs = f((p-pc) L^(1/nu)) with f(x)=tanh(x)
    pc, nu = 0.5, 1.3
    ns = [8, 16, 32]
    ps = [list(np.linspace(0.3, 0.7, 21)) for _ in ns]
    obs = [[float(np.tanh((p - pc) * L ** (1 / nu))) for p in ps[i]] for i, L in enumerate(ns)]
    _, xs, ys, loss_good = data_collapse(ns, ps, obs, pc, nu)
    _, _, _, loss_bad = data_collapse(ns, ps, obs, pc + 0.1, nu * 2)
    assert loss_good < loss_bad / 10
    assert loss_good < 1e-2


def test_bagging_ensemble():
    import numpy as np
    from tensorcircuit_ng_tpu.applications.ensemble import bagging

    class Stub:
        def __init__(self, bias):
            self.bias = bias

        def predict(self, x):
            return np.clip(x[:, 0] * 0.0 + self.bias, 0, 1)

    bag = bagging()
    bag.append(Stub(0.9), True)
    bag.append(Stub(0.8), True)
    bag.append(Stub(0.2), True)
    x = np.zeros((5, 3))
    avg = bag.predict(x, voting_policy="average")
    np.testing.assert_allclose(avg[:, 0], (0.9 + 0.8 + 0.2) / 3, atol=1e-9)
    w = bag.predict(x, voting_policy="weight")
    assert np.all(w[:, 0] > avg[:, 0])  # confident 0.9 outweighs 0.2
    hard = bag.predict(x, voting_policy="most")
    np.testing.assert_array_equal(hard, np.ones(5, dtype=int))
    acc = bag.eval(x, np.ones(5), voting_policy="most")
    assert acc == 1.0


def test_vqnhe_improves_on_plain_vqe():
    import numpy as np
    from tensorcircuit_ng_tpu.applications.vqes import VQNHE, construct_matrix

    n = 4
    ham = []
    for i in range(n - 1):
        row = [1.0] + [0] * n
        row[1 + i] = 3
        row[2 + i] = 3
        ham.append(row)
    for i in range(n):
        row = [-1.0] + [0] * n
        row[1 + i] = 1
        ham.append(row)
    hm = construct_matrix(ham)
    e_exact = float(np.linalg.eigvalsh(hm)[0])

    v = VQNHE(n, ham, model_type="complex", ansatz="hea", nlayers=2, units=8)
    e0 = v.energy(v.circuit_params, v.model_params)
    best, _, _ = v.training(maxiter=120, verbose=False)
    assert best < float(e0) - 0.1
    assert best >= e_exact - 1e-4  # variational bound
    # rbm variant runs
    v2 = VQNHE(n, ham, model_type="rbm", ansatz="hn", units=6)
    best2, _, _ = v2.training(maxiter=60)
    assert best2 >= e_exact - 1e-4
