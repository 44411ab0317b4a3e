"""Rydberg-atom chain on the AnalogCircuit engine (reference
``examples/analog_rydberg.py`` role).

A 1D chain of neutral atoms driven by the standard Rydberg Hamiltonian

    H(t) = Omega(t)/2 * sum_i X_i  -  delta(t) * sum_i n_i
           + sum_{i<j} C6 / r_ij^6 * n_i n_j ,        n = (1 - Z)/2

with a compatible unit set (us, um, MHz).  The interaction tail is kept to
ALL pairs (not nearest-neighbour truncated) via the lattice distance matrix.

Self-validating checks:

1. BLOCKADE: after a resonant pulse (delta=0) on a blockaded pair
   (V_nn >> Omega), the doubly-excited population stays tiny while the
   symmetric single-excitation population Rabi-oscillates at sqrt(2) Omega —
   probed at the enhanced-pi-pulse time t = pi / (sqrt(2) Omega).
2. ADIABATIC Z2 SWEEP: ramping delta from negative to positive (with
   Omega on) drags the chain into the Z2 crystal; the staggered density
   correlator becomes strongly positive and adjacent double-occupancy
   stays far below the uncorrelated value.
3. EXACTNESS: for a constant-H segment the AnalogCircuit state matches
   scipy ``expm(-i H T)`` applied to the initial state to ODE accuracy.

Runs through the public ``tc.AnalogCircuit`` + ``tc.templates.lattice``
surface; the sweep is jitted end-to-end.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.templates.lattice import ChainLattice

# units: time us, distance um, energy MHz (hbar = 1)
OMEGA = 2 * np.pi * 1.0  # MHz
C6 = 2 * np.pi * 862690 / 2.0  # MHz * um^6 (Rb-70S-ish / 2 for demo scale)


def rydberg_terms(n, spacing, pbc=False):
    """Dense X-sum, n-sum and interaction diagonal as numpy constants."""
    chain = ChainLattice([n], lattice_constant=spacing, pbc=pbc)
    dist = chain.distance_matrix()
    dim = 2**n
    # single-site occupation bits for every basis state: (dim, n)
    idx = np.arange(dim)[:, None]
    bits = (idx >> (n - 1 - np.arange(n)[None, :])) & 1  # qubit 0 = MSB
    nsum_diag = bits.sum(axis=1).astype(np.float64)
    vdiag = np.zeros(dim)
    for i in range(n):
        for j in range(i + 1, n):
            r = dist[i, j]
            if r <= 0:
                continue
            vdiag += (C6 / r**6) * (bits[:, i] * bits[:, j])
    xsum = np.zeros((dim, dim))
    for i in range(n):
        xsum += np.kron(
            np.kron(np.eye(2**i), np.array([[0.0, 1.0], [1.0, 0.0]])),
            np.eye(2 ** (n - 1 - i)),
        )
    return xsum, nsum_diag, vdiag


def check_blockade():
    n = 2
    spacing = 4.0  # um -> V = C6/4^6 ~ 2pi * 105 MHz >> Omega
    xsum, nsum, vdiag = rydberg_terms(n, spacing)
    v_nn = float(vdiag[3])
    assert v_nn / OMEGA > 50

    def h(t):
        return (OMEGA / 2) * xsum + np.diag(vdiag)  # delta = 0

    t_pi = np.pi / (np.sqrt(2.0) * OMEGA)  # enhanced Rabi pi-pulse
    ac = tc.AnalogCircuit(n)
    ac.add_analog_block(h, t_pi)
    probs = np.asarray(jax.jit(lambda: jnp.abs(ac.state()) ** 2)())
    p_gg, p_ge, p_eg, p_ee = probs
    print(
        f"[1] blockade pair: P(single)={p_ge + p_eg:.4f}, P(double)={p_ee:.2e}"
        f"  (V/Omega={v_nn / OMEGA:.0f})"
    )
    assert p_ee < 5e-3, p_ee
    assert p_ge + p_eg > 0.98


def check_z2_sweep():
    n = 8
    spacing = 5.5  # um: V_nn ~ 2pi*31 MHz >> Omega, V_nnn ~ V_nn/64 << Omega
    xsum, nsum, vdiag = rydberg_terms(n, spacing)
    t_total = 3.0  # us
    d0, d1 = -2 * np.pi * 6.0, 2 * np.pi * 6.0

    def h(t):
        # linear detuning ramp; Omega constant with soft sin^2 edges
        frac = t / t_total
        delta = d0 + (d1 - d0) * frac
        om = OMEGA * jnp.sin(jnp.pi * jnp.minimum(frac, 1.0)) ** 0  # constant
        diag = vdiag - delta * nsum
        return (om / 2) * xsum + jnp.diag(jnp.asarray(diag, dtype=jnp.complex64))

    ac = tc.AnalogCircuit(n)
    ac.add_analog_block(h, t_total, max_steps=4000)
    psi = ac.state()
    c = tc.Circuit(n, inputs=psi)
    dens = np.array(
        [float(jnp.real((1 - c.expectation_ps(z=[i])) / 2)) for i in range(n)]
    )
    # two-point density correlators <n_i n_j> from <Z_i Z_j>
    nn = np.zeros((n, n))
    for i in range(n):
        nn[i, i] = dens[i]
        for j in range(i + 1, n):
            zz = float(jnp.real(c.expectation_ps(z=[i, j])))
            # <n_i n_j> = (1 - <Z_i> - <Z_j> + <Z_i Z_j>)/4, <Z> = 1 - 2<n>
            nn[i, j] = nn[j, i] = (
                1 - (1 - 2 * dens[i]) - (1 - 2 * dens[j]) + zz
            ) / 4
    conn = nn - np.outer(dens, dens)
    # the OBC sweep is reflection symmetric (even n maps sublattice A<->B),
    # so <staggered magnetization> = 0 exactly: the Z2 order lives in the
    # staggered STRUCTURE FACTOR of the connected correlations instead.
    phases = np.array([(-1) ** i for i in range(n)])
    s_pi = float(phases @ conn @ phases) / n**2
    adj = float(np.mean([nn[i, i + 1] for i in range(n - 1)]))
    uncorr = float(np.mean([dens[i] * dens[i + 1] for i in range(n - 1)]))
    print(
        f"[2] Z2 sweep n={n}: mean density={dens.mean():.3f}, "
        f"<n_i n_i+1>={adj:.4f} vs uncorrelated {uncorr:.4f}, "
        f"S(pi)/n^2={s_pi:.4f} (perfect cat = 0.25)"
    )
    assert dens.mean() > 0.30  # roughly half filling
    assert adj < 0.4 * uncorr  # blockade suppresses neighbours
    assert s_pi > 0.04  # finite-size Z2 crystal order (cat of both patterns)


def check_constant_exactness():
    n = 4
    from scipy.linalg import expm

    xsum, nsum, vdiag = rydberg_terms(n, 6.0)
    delta = 2 * np.pi * 1.3
    hmat = (OMEGA / 2) * xsum + np.diag(vdiag - delta * nsum)
    t = 0.7
    ac = tc.AnalogCircuit(n)
    ac.h(0)
    ac.add_analog_block(lambda tt: hmat, t, max_steps=4000)
    psi = np.asarray(ac.state())
    psi0 = np.zeros(2**n, dtype=complex)
    psi0[0] = 1 / np.sqrt(2)
    psi0[2 ** (n - 1)] = 1 / np.sqrt(2)
    ref = expm(-1j * hmat * t) @ psi0
    err = np.linalg.norm(psi - ref)
    print(f"[3] constant-H segment vs expm: |dpsi| = {err:.2e}")
    assert err < 2e-3, err


if __name__ == "__main__":
    check_blockade()
    check_z2_sweep()
    check_constant_exactness()
    print("OK: Rydberg chain analog evolution (blockade, Z2 sweep, expm parity)")
