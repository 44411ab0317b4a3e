"""Entanglement asymmetry of tilted-ferromagnet free-fermion states.

Reference examples tilted_ferromagnet_entanglement_asymmetry.py role
(physics: arXiv 2207.14693, 2302.03330): the ground state of the XY chain

    H = -sum_i [ (1+gamma)/2 X X + (1-gamma)/2 Y Y ] - h sum_i Z

on the line h = sqrt(1 - gamma^2) is a "tilted ferromagnet" cat state with
tilt angle theta, gamma = 2/(cos^2 theta + 1) - 1.  The U(1) charge
(particle number) is broken by the pairing terms; the Renyi-2 entanglement
asymmetry of a block of l sites,

    dS = S_AQ - S_A   (S_AQ = entropy of the charge-dephased rho_A),

obeys the closed form  S_AQ ~= 1/2 log l + 1/2 log(pi/2 k^{1/(k-1)}
sin^2 theta)  at large l (eq. 9 of 2207.14693).

Self-validating:
- the BdG ground state is cross-checked against the exact-diagonalized JW
  dense oracle (FGSTestSimulator) at L=8: identical correlation matrices;
- S_AQ matches the asymptotic formula within 0.1 at l=12..24, L=200;
- a hopping quench restores the symmetry: dS(t) decays by >5x.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc

FGS = tc.FGSSimulator


def xy_blocks(theta, L):
    """(h, d) blocks of the JW fermion form of the XY chain above.

    -[(1+g)/2 XX + (1-g)/2 YY] -> -(c_i^d c_{i+1} + h.c.)
                                  - g (c_i^d c_{i+1}^d + c_{i+1} c_i);
    - h Z with Z_i = 1 - 2 n_i  ->  +2 h n_i (up to a constant).
    """
    gamma = 2.0 / (np.cos(theta) ** 2 + 1.0) - 1.0
    hf = np.sqrt(max(0.0, 1.0 - gamma**2))
    h = np.zeros((L, L), dtype=complex)
    d = np.zeros((L, L), dtype=complex)
    for i in range(L - 1):
        h[i, i + 1] = -1.0
        h[i + 1, i] = -1.0
        # H += (1/2) sum d_ij c_i c_j + h.c. with antisymmetric d:
        # d[i+1, i] = -gamma gives -gamma (c_{i+1} c_i + c_i^d c_{i+1}^d)
        d[i + 1, i] = -gamma
        d[i, i + 1] = +gamma
    for i in range(L):
        h[i, i] = 2.0 * hf
    return h, d


def block_asym(sim, L, l, k=2, batch=512, seed=7):
    keep = list(range(L // 2 - l // 2, L // 2 + l // 2))
    trace_out = [i for i in range(L) if i not in keep]
    rng = np.random.default_rng(seed)
    status = rng.uniform(-np.pi, np.pi, size=(batch, k))
    saq = float(np.real(np.asarray(
        sim.renyi_entanglement_asymmetry(k, trace_out, status=status)
    )))
    sa = float(np.real(np.asarray(sim.renyi_entropy(keep, k))))
    return saq, sa


def asymptotic_saq(theta, l, k=2):
    return 0.5 * np.log(l) + 0.5 * np.log(
        0.5 * np.pi * k ** (1.0 / (k - 1)) * np.sin(theta) ** 2
    )


def main():
    # --- oracle check: BdG ground state == JW dense ground state at L=8 ---
    from tensorcircuit_ng_tpu.models.fgs import FGSTestSimulator

    theta = np.pi / 3
    h8, d8 = xy_blocks(theta, 8)
    s_f = FGS(8, hc=FGS.bdg(h8, d8))
    ora = FGSTestSimulator(8, filled=[])
    hdense = ora.hamiltonian_dense(h8, d8)
    w, v = np.linalg.eigh(hdense)
    ora.psi = v[:, 0]
    cm_f = np.asarray(s_f.get_cmatrix())
    cm_d = np.asarray(ora.get_cmatrix())
    err = np.abs(cm_f - cm_d).max()
    print(f"L=8 BdG-vs-JW correlation matrix max err {err:.2e}")
    assert err < 1e-5

    # --- asymptotic scaling of the asymmetry at L=200 ----------------------
    L = 200
    for theta in (np.pi / 4, np.pi / 3):
        h, d = xy_blocks(theta, L)
        sim = FGS(L, hc=FGS.bdg(h, d))
        for l in (12, 24):
            saq, sa = block_asym(sim, L, l)
            pred = asymptotic_saq(theta, l)
            print(
                f"theta={theta:.3f} l={l:3d}: S_AQ={saq:.4f} "
                f"(asymptotic {pred:.4f}), dS={saq - sa:.4f}"
            )
            assert abs(saq - pred) < 0.1, (saq, pred)
            assert saq - sa > 0.05  # broken symmetry: positive asymmetry

    # --- quench: hopping evolution restores the U(1) symmetry --------------
    theta = np.pi / 3
    h, d = xy_blocks(theta, L)
    ht = np.zeros((2 * L, 2 * L), dtype=complex)
    for i in range(L - 1):
        ht = ht + FGS.hopping(L, i, i + 1, 1.0)
    ds0 = None
    for t in (0.0, 30.0):
        simt = FGS(L, hc=FGS.bdg(h, d))
        if t:
            simt.evol_hamiltonian(ht, t)
        saq, sa = block_asym(simt, L, 12)
        print(f"t={t:5.1f}: dS = {saq - sa:.4f}")
        if t == 0.0:
            ds0 = saq - sa
        else:
            assert saq - sa < ds0 / 5.0, "hopping quench must restore U(1)"
    print("OK")


if __name__ == "__main__":
    main()
