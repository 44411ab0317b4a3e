"""Five real-time evolution methods on one quench, cross-validated
(reference ``examples/time_evolution_comparison.py``, ``expm_multiply_evol.py``
and ``krylov_time_evolution.py`` roles).

A Heisenberg-chain quench |0101..> under H = sum XX+YY+ZZ (n=8), evolved
to t=2.0 by every engine in ``tc.timeevol``:

    exact eigendecomposition   hamiltonian_evol_real   (dense oracle)
    Krylov subspace            krylov_evol             (MVP, scan Lanczos)
    Chebyshev expansion        chebyshev_evol          (Bessel-J, lax.scan)
    scaled-Taylor              expm_multiply_evol      (scipy expm_multiply role)
    ODE integration            ode_evol_global         (RK jaxode)

Self-validating checks:

1. All four iterative methods agree with the dense eigen-oracle on the
   full state (|dpsi| < 1e-3, most ~1e-5) and on the staggered
   magnetization observable trace over 21 time points.
2. The Hamiltonian is fed in three different FORMS — dense, sparse COO,
   and MVP callable — and krylov_evol returns the same state for each
   (engine-form independence).
3. Norm conservation: every method conserves |psi| to 1e-4 (chebyshev's
   norm drift doubles as its own accuracy certificate).
4. Physics: the staggered magnetization decays from 1 toward ~0 (Neel
   order melts), and total Sz stays exactly 0 (U(1) conservation) for
   every method.

Reference behavior anchor: ``tensorcircuit/timeevol.py:276-978``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import timeevol as te
from tensorcircuit_ng_tpu import quantum as qu

N, T = 8, 2.0


def heisenberg():
    terms, ws = [], []
    for i in range(N - 1):
        for p in (1, 2, 3):
            t = [0] * N
            t[i] = t[i + 1] = p
            terms.append(t)
            ws.append(1.0)
    return jnp.asarray(terms), jnp.asarray(ws, jnp.float32)


def staggered_mz(psi):
    c = tc.Circuit(N, inputs=psi)
    return sum(
        (-1) ** i * jnp.real(c.expectation_ps(z=[i])) for i in range(N)
    ) / N


def total_z(psi):
    c = tc.Circuit(N, inputs=psi)
    return sum(jnp.real(c.expectation_ps(z=[i])) for i in range(N))


if __name__ == "__main__":
    terms, ws = heisenberg()
    hdense = qu.PauliStringSum2Dense(terms, ws)
    hcoo = qu.PauliStringSum2COO(terms, ws)
    hnp = np.asarray(hdense)

    psi0 = np.zeros(2**N, dtype=np.complex64)
    neel = int("01" * (N // 2), 2)
    psi0[neel] = 1.0
    psi0 = jnp.asarray(psi0)
    mvp = lambda v: hdense @ v

    ts = jnp.linspace(0.0, T, 21)
    # dense eigen-oracle
    psi_exact = te.hamiltonian_evol_real(ts, hdense, psi0)

    evals = np.linalg.eigvalsh(hnp)
    bounds = (float(evals[-1]) * 1.05, float(evals[0]) * 1.05)
    states = {
        "krylov": te.krylov_evol(hdense, psi0, ts, subspace_dimension=40),
        "chebyshev": jnp.stack(
            [te.chebyshev_evol(mvp, psi0, float(t), bounds) for t in np.asarray(ts)]
        ),
        "expm_multiply": te.expm_multiply_evol(hdense, psi0, ts, norm_bound=float(np.abs(hnp).sum(1).max())),
        "ode": te.ode_evol_global(lambda t: hdense, psi0, ts),
    }

    # [1]+[3]+[4]
    mz_exact = np.array([float(staggered_mz(p)) for p in psi_exact])
    for name, psis in states.items():
        dpsi = float(max(jnp.linalg.norm(a - b) for a, b in zip(psis, psi_exact)))
        dnorm = float(max(abs(jnp.linalg.norm(p) - 1.0) for p in psis))
        mz = np.array([float(staggered_mz(p / jnp.linalg.norm(p))) for p in psis])
        dmz = float(np.abs(mz - mz_exact).max())
        sz = max(abs(float(total_z(p / jnp.linalg.norm(p)))) for p in psis)
        print(
            f"[1] {name:>13}: max|dpsi| = {dpsi:.2e}, |norm-1| = {dnorm:.2e}, "
            f"max|dMz| = {dmz:.2e}, |sum Z| = {sz:.1e}"
        )
        assert dpsi < 1e-3, (name, dpsi)
        assert dnorm < 1e-4, (name, dnorm)
        assert sz < 1e-4, (name, sz)
    print(f"[4] Neel order melts: Mz(0) = {mz_exact[0]:.3f} -> Mz(T) = {mz_exact[-1]:.3f}")
    assert mz_exact[0] > 0.99 and abs(mz_exact[-1]) < 0.5

    # [2] engine-form independence: dense vs COO vs MVP into krylov
    out_forms = [
        np.asarray(te.krylov_evol(h, psi0, jnp.asarray([T]), subspace_dimension=40))[0]
        for h in (hdense, hcoo, mvp)
    ]
    d12 = np.linalg.norm(out_forms[0] - out_forms[1])
    d13 = np.linalg.norm(out_forms[0] - out_forms[2])
    print(f"[2] krylov forms dense/COO/MVP: |d(dense,coo)| = {d12:.2e}, |d(dense,mvp)| = {d13:.2e}")
    assert d12 < 1e-5 and d13 < 1e-5
    print("OK: five evolution engines agree on the quench; forms are interchangeable")
