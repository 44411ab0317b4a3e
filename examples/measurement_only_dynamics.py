"""Measurement-only dynamics: weak-measurement trajectories and the
entangling/disentangling competition (reference
``examples/measurement_only_circuit.py`` role).

No unitary gates at all: the circuit is built purely from weak measurements
of single-site X and two-site ZZ, implemented as two-outcome Kraus channels

    K_pm = (cos(phi) I  pm  sin(phi) O) / sqrt(2),   O^2 = I

applied with explicit ``status`` tensors so trajectories are jittable and
reproducible.  phi = pi/4 is the projective limit.

Self-validating checks:

1. Projective X-only from |0..0>: every site collapses to an X eigenstate,
   so the final state is a product state — every cut entropy is exactly 0.
2. Projective ZZ-only from |+..+>: all link operators Z_i Z_{i+1} commute
   and the global X-string survives, leaving a GHZ-class stabilizer state —
   S(segment) = log 2 for every proper connected segment and the mutual
   information between the two chain ends is exactly log 2.
3. Weak competition: trajectory-averaged end-to-end mutual information is
   larger in the ZZ-dominated regime than in the X-dominated regime.

Everything runs through the public ``Circuit.general_kraus`` trajectory
surface under jit+vmap (status arrays in, final states out).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import quantum as qu

N = 8
DEPTH = 6
X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=np.complex64)
ZZ = np.diag(np.array([1.0, -1.0, -1.0, 1.0])).astype(np.complex64)


def weak_kraus(op, phi):
    dim = op.shape[0]
    eye = np.eye(dim, dtype=np.complex64)
    c, s = np.cos(phi), np.sin(phi)
    return [(c * eye + s * op) / np.sqrt(2.0), (c * eye - s * op) / np.sqrt(2.0)]


def trajectory(status, phi_x, phi_zz, plus_start):
    """One monitored trajectory; status has shape (DEPTH, 2N-1)."""
    c = tc.Circuit(N)
    if plus_start:
        for i in range(N):
            c.h(i)
    kx = weak_kraus(X, phi_x)
    kzz = weak_kraus(ZZ, phi_zz)
    for t in range(DEPTH):
        for i in range(N):
            c.general_kraus(kx, i, status=status[t, i])
        for i in range(N - 1):
            c.general_kraus(kzz, i, i + 1, status=status[t, N + i])
    return c.state()


def batch_states(key, ntraj, phi_x, phi_zz, plus_start):
    status = jax.random.uniform(key, (ntraj, DEPTH, 2 * N - 1))
    fn = jax.jit(
        jax.vmap(lambda s: trajectory(s, phi_x, phi_zz, plus_start))
    )
    return np.asarray(fn(status))


def end_mutual_information(psi):
    """I(A:C) between the first and last two sites of the chain."""
    a, c_seg = [0, 1], [N - 2, N - 1]
    mid = [i for i in range(N) if i not in a + c_seg]
    rho_a = qu.reduced_density_matrix(psi, mid + c_seg)
    rho_c = qu.reduced_density_matrix(psi, mid + a)
    rho_ac = qu.reduced_density_matrix(psi, mid)
    return float(qu.entropy(rho_a) + qu.entropy(rho_c) - qu.entropy(rho_ac))


def half_cut_entropy(psi):
    return float(qu.entropy(qu.reduced_density_matrix(psi, list(range(N // 2)))))


def main():
    key = jax.random.PRNGKey(42)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    log2 = float(np.log(2.0))

    # --- 1: projective X-only -> product state, zero entanglement --------
    states = batch_states(k1, 4, np.pi / 4, 0.0, plus_start=False)
    s_half = max(half_cut_entropy(p) for p in states)
    print(f"[1] projective X-only: max half-cut entropy {s_half:.2e}")
    assert s_half < 1e-5, s_half

    # --- 2: projective ZZ-only from |+..+> -> GHZ-class stabilizer -------
    states = batch_states(k2, 4, 0.0, np.pi / 4, plus_start=True)
    for p in states:
        sh = half_cut_entropy(p)
        mi = end_mutual_information(p)
        assert abs(sh - log2) < 1e-5, sh
        assert abs(mi - log2) < 1e-5, mi
    print(f"[2] projective ZZ-only: S_half = I(ends) = log 2 "
          f"({sh:.6f} vs {log2:.6f}) on every trajectory")

    # --- 3: weak competition ---------------------------------------------
    ntraj = 12
    mi_zz = np.mean([
        end_mutual_information(p)
        for p in batch_states(k3, ntraj, 0.1, 0.6, plus_start=True)
    ])
    mi_x = np.mean([
        end_mutual_information(p)
        for p in batch_states(k4, ntraj, 0.6, 0.1, plus_start=True)
    ])
    print(f"[3] weak regime, {ntraj} trajectories: "
          f"I(ends) ZZ-dominated {mi_zz:.4f} vs X-dominated {mi_x:.4f}")
    assert mi_zz > 4 * mi_x, (mi_zz, mi_x)

    print("OK: measurement-only trajectories reproduce both stabilizer "
          "limits exactly and the entangling/disentangling competition")


if __name__ == "__main__":
    main()
