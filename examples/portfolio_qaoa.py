"""QAOA portfolio selection on synthetic fund NAV histories (reference
``examples/qaoa_xalpha_portfolio.py`` role, with the xalpha market-data
fetch replaced by a reproducible synthetic NAV generator — zero network).

Pipeline, all through public surfaces:

    price series -> applications.finance.StockData (annualized mu, Sigma)
    -> QUBO_from_portfolio (q Sigma - diag(mu) + budget penalty)
    -> templates.conversions.QUBO_to_Ising (Z structures + offset)
    -> templates.ansatz.QAOA_ansatz_for_Ising (X and XY mixers)
    -> jit value_and_grad optimization -> most-probable bitstring.

Self-validating checks:

1. The Ising conversion is exact: <H_ising> + offset evaluated on every
   computational basis state equals x^T Q x from the raw QUBO.
2. QAOA (X mixer, 4 layers, best of 3 restarts) recovers the BRUTE-FORCE
   optimal budget-2 portfolio of 6 assets as its most probable bitstring.
3. The XY-mixer variant started in a budget-2 Dicke-like state conserves
   the budget: the sampled selection always has Hamming weight 2 (the XY
   mixer commutes with total Z), and also finds the optimum.
4. The chosen portfolio makes financial sense: it has a higher
   Sharpe-like ratio (return/vol) than the average over all budget-2
   portfolios.

Reference behavior anchors: ``applications/finance/portfolio.py``,
``templates/conversions.py:40``, ``templates/ansatz.py``.
"""

import os
import sys
from itertools import combinations

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.applications.finance import QUBO_from_portfolio, StockData
from tensorcircuit_ng_tpu.templates.conversions import QUBO_to_Ising
from tensorcircuit_ng_tpu.templates.ansatz import QAOA_ansatz_for_Ising

N, BUDGET, NLAYERS = 6, 2, 4
RISK_AVERSION, PENALTY = 0.8, 1.5


def synthetic_navs(rng, n_assets=N, n_days=260):
    """Geometric random walks with a low-rank correlated vol structure."""
    mu = rng.uniform(-0.0002, 0.0012, n_assets)
    vol = rng.uniform(0.004, 0.02, n_assets)
    loadings = rng.normal(size=(n_assets, 2)) * 0.6
    shocks = rng.normal(size=(2, n_days))
    idio = rng.normal(size=(n_assets, n_days))
    rets = mu[:, None] + vol[:, None] * (loadings @ shocks + idio) / np.sqrt(
        1 + (loadings**2).sum(1)
    )[:, None]
    return np.cumprod(1 + rets, axis=1)


def qubo_energy(q, x):
    return float(x @ q @ x)


if __name__ == "__main__":
    rng = np.random.default_rng(11)
    navs = synthetic_navs(rng)
    sd = StockData(navs)
    mu = sd.get_return() - 1.0
    sigma = np.cov(sd.daily_change) * 252
    q = QUBO_from_portfolio(sigma, mu, RISK_AVERSION, BUDGET, PENALTY)
    structures, weights, offset = QUBO_to_Ising(q)

    # [1] conversion exactness on all 64 basis states
    hdense = np.zeros(2**N)
    for term, w in zip(structures, weights):
        diag = np.ones(1)
        for v in term:
            diag = np.kron(diag, np.array([1.0, -1.0]) if v == 3 else np.ones(2))
        hdense += w * diag
    worst = 0.0
    for s in range(2**N):
        x = np.array([(s >> (N - 1 - i)) & 1 for i in range(N)], float)
        worst = max(worst, abs(hdense[s] + offset - qubo_energy(q, x)))
    print(f"[1] QUBO_to_Ising exact on all 2^{N} states: max |dE| = {worst:.2e}")
    assert worst < 1e-9

    # brute-force optimum (and budget-2 statistics for [4])
    best = min(range(2**N), key=lambda s: hdense[s])
    best_bits = [(best >> (N - 1 - i)) & 1 for i in range(N)]
    print(f"    brute-force optimum: {best_bits} (E = {hdense[best] + offset:.5f})")
    assert sum(best_bits) == BUDGET  # penalty is strong enough

    ws = jnp.asarray(weights, dtype=jnp.float32)

    def energy(params, mixer="X"):
        c = QAOA_ansatz_for_Ising(params, NLAYERS, structures, ws, mixer=mixer)
        probs = jnp.abs(c.state()) ** 2
        return jnp.real(jnp.sum(probs * jnp.asarray(hdense, jnp.float32)))

    # [2] X-mixer QAOA, 3 restarts
    vg = jax.jit(jax.value_and_grad(energy))
    found = None
    for restart in range(3):
        params = jnp.asarray(
            np.random.default_rng(restart).uniform(-0.3, 0.3, 2 * NLAYERS),
            jnp.float32,
        )
        opt = optax.adam(0.05)
        st = opt.init(params)
        for _ in range(250):
            e, g = vg(params)
            upd, st = opt.update(g, st)
            params = optax.apply_updates(params, upd)
        c = QAOA_ansatz_for_Ising(params, NLAYERS, structures, ws)
        probs = np.abs(np.asarray(c.state())) ** 2
        top = int(np.argmax(probs))
        print(
            f"[2] restart {restart}: <H> = {float(e) + offset:.5f}, "
            f"argmax state {top:0{N}b} (p = {probs[top]:.3f})"
        )
        if top == best:
            found = restart
            break
    assert found is not None, "QAOA never found the brute-force optimum"

    # [3] XY mixer preserves the budget sector exactly
    def xy_energy(params):
        c = tc.Circuit(N)
        # budget-2 initial product of two excitations (sector seed)
        c.x(0)
        c.x(1)
        p = jnp.reshape(params, (-1,))
        for l in range(NLAYERS):
            gamma, beta = p[2 * l], p[2 * l + 1]
            for term, w in zip(structures, weights):
                sites = [i for i, v in enumerate(term) if v == 3]
                if len(sites) == 1:
                    c.rz(sites[0], theta=2.0 * gamma * w)
                else:
                    c.rzz(sites[0], sites[1], theta=2.0 * gamma * w)
            for i in range(N):  # ring XY mixer
                j = (i + 1) % N
                c.rxx(i, j, theta=beta)
                c.ryy(i, j, theta=beta)
        return c

    params = jnp.asarray(
        np.random.default_rng(5).uniform(-0.3, 0.3, 2 * NLAYERS), jnp.float32
    )
    vg_xy = jax.jit(
        jax.value_and_grad(
            lambda p: jnp.real(
                jnp.sum(
                    jnp.abs(xy_energy(p).state()) ** 2
                    * jnp.asarray(hdense, jnp.float32)
                )
            )
        )
    )
    opt = optax.adam(0.05)
    st = opt.init(params)
    for _ in range(250):
        e, g = vg_xy(params)
        upd, st = opt.update(g, st)
        params = optax.apply_updates(params, upd)
    probs = np.abs(np.asarray(xy_energy(params).state())) ** 2
    weight_mass = {}
    for s in range(2**N):
        weight_mass[bin(s).count("1")] = weight_mass.get(bin(s).count("1"), 0) + probs[s]
    leak = 1.0 - weight_mass.get(BUDGET, 0.0)
    top_xy = int(np.argmax(probs))
    print(
        f"[3] XY mixer: sector leakage = {leak:.2e}, argmax {top_xy:0{N}b}, "
        f"<H> = {float(e) + offset:.5f}"
    )
    assert leak < 1e-4
    assert top_xy == best

    # [4] financial sanity: Sharpe-like ratio above the budget-2 average
    def sharpe(bits):
        sel = [i for i, b in enumerate(bits) if b]
        r = mu[sel].mean()
        v = np.sqrt(max(sigma[np.ix_(sel, sel)].sum() / len(sel) ** 2, 1e-12))
        return r / v

    all_b2 = [
        [1 if i in combo else 0 for i in range(N)]
        for combo in combinations(range(N), BUDGET)
    ]
    s_best = sharpe(best_bits)
    s_avg = np.mean([sharpe(b) for b in all_b2])
    print(f"[4] Sharpe-like: selected {s_best:.3f} vs budget-2 average {s_avg:.3f}")
    assert s_best > s_avg
    print("OK: QAOA portfolio selection recovers the optimal budget portfolio with X and XY mixers")
