"""Period-tripling discrete time crystal on a driven qutrit chain
(reference ``examples/reproduce_papers/2026_qutrit_time_crystal`` role).

Floquet model on n=6 qutrits, one cycle = imperfect cyclic kick x
disordered chiral clock interactions:

    U(g) = prod_i K_i(g) . exp(-i sum_i [J_i chi(s_i, s_i+1) + h_i s_i])

    K(g)  = F diag(e^{-2 pi i g j / 3}) F^H      (g=1 -> exact shift X3)
    chi   = chiral clock phase, diagonal in the computational basis.

The subharmonic order parameter is the Fourier weight of
m(t) = mean_i <M_i>, M = diag(1, 0, -1), at frequency omega/3 over 30
cycles, disorder-averaged.  All cycles run through ``tc.QuditCircuit``
``any``-gates on the d=3 engine.

Self-validating checks:

1. CLEAN LIMIT g=1: the kick is exactly the cyclic shift and the
   interactions are diagonal, so m(t) is exactly period-3: m(3k) = m(0)
   to 1e-5 for every k, from a random product start.
2. DTC vs THERMAL: at g=0.95 the omega/3 subharmonic share stays > 0.45
   and > 4x the g=0.60 value (disorder-averaged over 4 realizations, 30
   cycles), while at g=0.60 it falls below 0.2 — the period-tripling
   crossover of the paper's Fig. 2(b), scaled down.
3. The subharmonic weight is monotone across g in {0.60, 0.80, 0.95}.
4. Unitarity bookkeeping: |psi| = 1 to 1e-5 after 30 cycles.

Reference behavior anchor: ``tensorcircuit/quditcircuit.py`` (d=3 engine),
reproduce_papers/2026_qutrit_time_crystal.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

N, CYCLES = 6, 30
W3 = np.exp(2j * np.pi / 3)
M_DIAG = np.array([1.0, 0.0, -1.0])


def kick_matrix(g):
    f = np.array([[W3 ** (j * k) for k in range(3)] for j in range(3)]) / np.sqrt(3)
    d = np.diag(np.exp(-2j * np.pi * g * np.arange(3) / 3))
    return (f @ d @ f.conj().T).astype(np.complex64)


def bond_matrix(j_coupling, h_left):
    """Diagonal 9x9: chiral clock phase + left-site field."""
    phases = np.zeros(9, dtype=np.complex64)
    for a in range(3):
        for b in range(3):
            chi = ((a - b) % 3) * 2 * np.pi / 3  # chiral: not symmetric in a<->b
            phases[3 * a + b] = np.exp(-1j * (j_coupling * chi + h_left * a))
    return np.diag(phases)


def run(g, rng, cycles=CYCLES):
    js = rng.uniform(0.8, 1.2, N - 1)
    hs = rng.uniform(0.0, 0.5, N)
    start = rng.integers(0, 3, N)
    psi = np.zeros(3**N, dtype=np.complex64)
    idx = 0
    for s in start:
        idx = idx * 3 + int(s)
    psi[idx] = 1.0
    psi = jnp.asarray(psi)
    kick = kick_matrix(g)
    bonds = [bond_matrix(js[i], hs[i]) for i in range(N - 1)]
    ms = []
    for t in range(cycles + 1):
        c = tc.QuditCircuit(N, dim=3, inputs=psi)
        m = np.mean(
            [
                float(
                    jnp.real(
                        c.expectation((jnp.asarray(np.diag(M_DIAG).astype(np.complex64)), [i]))
                    )
                )
                for i in range(N)
            ]
        )
        ms.append(m)
        if t == cycles:
            break
        cc = tc.QuditCircuit(N, dim=3, inputs=psi)
        for i in range(N - 1):
            cc.any(i, i + 1, unitary=jnp.asarray(bonds[i]))
        # the last site's field is not covered by any bond's left slot
        cc.any(N - 1, unitary=jnp.asarray(np.diag(np.exp(-1j * hs[N - 1] * np.arange(3))).astype(np.complex64)))
        for i in range(N):
            cc.any(i, unitary=jnp.asarray(kick))
        psi = cc.state()
    return np.array(ms), float(jnp.linalg.norm(psi))


def subharmonic_weight(ms):
    """Fourier weight at f = 1/3 of the (mean-removed) m(t) signal."""
    x = ms - ms.mean()
    t = np.arange(len(x))
    amp3 = abs((x * np.exp(-2j * np.pi * t / 3)).sum()) ** 2
    others = [
        abs((x * np.exp(-2j * np.pi * f * t)).sum()) ** 2
        for f in np.linspace(0.02, 0.5, 49)
        if abs(f - 1 / 3) > 0.02
    ]
    return amp3 / (amp3 + np.sum(others) + 1e-12)


if __name__ == "__main__":
    # [1] clean limit: exact period 3
    ms, nrm = run(1.0, np.random.default_rng(0))
    rev = max(abs(ms[3 * k] - ms[0]) for k in range(1, CYCLES // 3 + 1))
    print(f"[1] g=1 clean limit: max |m(3k) - m(0)| = {rev:.2e}")
    assert rev < 1e-5

    # [2]+[3] DTC vs thermal crossover
    weights = {}
    for g in (0.60, 0.80, 0.95):
        frs = []
        for seed in range(4):
            ms, nrm = run(g, np.random.default_rng(10 + seed))
            assert abs(nrm - 1.0) < 1e-5  # [4]
            frs.append(subharmonic_weight(ms))
        weights[g] = float(np.mean(frs))
        print(f"[2] g={g}: disorder-averaged omega/3 weight = {weights[g]:.3f}")
    # the order parameter is the SHARE of spectral weight at omega/3; at
    # n=6 with 30 cycles the DTC peak carries ~0.5 of the total while the
    # thermal phase scatters to ~0.1 — the CONTRAST is the signature
    assert weights[0.95] > 0.45
    assert weights[0.60] < 0.2
    assert weights[0.95] > 4 * weights[0.60]
    assert weights[0.60] < weights[0.80] < weights[0.95]
    print("[3] subharmonic weight is monotone across the crossover")
    print("OK: period-tripling qutrit DTC: rigid at strong kick, molten at weak kick")
