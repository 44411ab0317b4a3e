"""A/B: de Rijk column-norm presort on the cold Jacobi panel (VERDICT r4 #2).

Hypothesis (round-4 convergence insight): the warm chain converges in fewer
sweeps because the panel receives NEARLY-SORTED columns.  If sorting is the
active ingredient, presorting the COLD input should let sweeps drop below 10.

Phase 1 (CPU, interpret-exact arithmetic): build realistic chi=64 TEBD theta
panels by running a quench with the oracle gram SVD, then measure, for each
(sweeps, presort) cell, the worst-case S-spectrum error and subspace-projector
error vs the exact SVD.  Phase 2 (TPU, run with JAX_PLATFORMS unset): time the
production TEBD step at the surviving settings.

Run: python examples/ab_jacobi_presort.py [--tpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ON_TPU = "--tpu" in sys.argv

import jax

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import kernels_jacobi as kj
from tensorcircuit_ng_tpu.models import tebd as tebd_mod

kj.LANES = False  # record predates the lane-major kernel (ab_jacobi_lanes.py) - pin the
# sublane-major grid so the documented numbers reproduce


def collect_thetas(n=24, chi=64, steps=6, dt=0.05, seed=0):
    """Run a transverse-field quench with gram SVD and capture the two-site
    theta panels the truncation actually sees (cold, un-sorted columns)."""
    old = tebd_mod.SVD_MODE
    tebd_mod.SVD_MODE = "gram"
    try:
        eng = tebd_mod.ParallelTEBD(n, chi=chi)
        # random product start -> entanglement grows fast (worst case for SVD)
        rng = np.random.default_rng(seed)
        kets = rng.normal(size=(n, 2)) + 1j * rng.normal(size=(n, 2))
        kets /= np.linalg.norm(kets, axis=1, keepdims=True)
        eng = tebd_mod.ParallelTEBD(n, chi=chi, initial=[k for k in kets])
        g = tc.ops.gates.rzz_matrix(0.7).reshape(4, 4) @ np.kron(
            tc.ops.gates.rx_matrix(0.4).reshape(2, 2), tc.ops.gates.rx_matrix(0.3).reshape(2, 2)
        )
        thetas = []
        orig = tebd_mod._svd_batched

        def spy(theta, chi_, vh0=None):
            thetas.append(np.asarray(theta))
            return orig(theta, chi_, vh0)

        tebd_mod._svd_batched = spy
        try:
            for _ in range(steps):
                eng.apply_two_site_layer(jnp.asarray(g), parity=0)
                eng.apply_two_site_layer(jnp.asarray(g), parity=1)
        finally:
            tebd_mod._svd_batched = orig
        return thetas
    finally:
        tebd_mod.SVD_MODE = old


def panel_errors(theta, sweeps, presort, chi=64):
    """Worst-case errors vs exact SVD over the batch of panels in theta."""
    u, s, vh = kj.jacobi_svd_pallas(jnp.asarray(theta), sweeps, True, presort)
    u, s, vh = np.asarray(u), np.asarray(s), np.asarray(vh)
    ue, se, vhe = np.linalg.svd(theta, full_matrices=False)
    k = min(chi, s.shape[-1])
    s_err = np.max(np.abs(s[..., :k] - se[..., :k]) / (se[..., :1] + 1e-30))
    # top-k right-subspace projector error (what truncation keeps)
    perr = 0.0
    for b in range(theta.shape[0]):
        P = vh[b, :k].conj().T @ vh[b, :k]
        Pe = vhe[b, :k].conj().T @ vhe[b, :k]
        perr = max(perr, np.linalg.norm(P - Pe, 2))
    # isometry defect of vh rows (Vidal form needs this)
    g = vh[..., :k, :] @ np.conj(np.swapaxes(vh[..., :k, :], -1, -2))
    iso = np.max(np.abs(g - np.eye(k)))
    return float(s_err), float(perr), float(iso)


def phase1():
    kj._INTERPRET = True
    print("collecting realistic TEBD panels (n=24 chi=64 quench, gram oracle)...")
    thetas = collect_thetas()
    # late-step panels are the hard ones (spread spectrum, truncation active)
    hard = thetas[-4:]
    print(f"captured {len(thetas)} panel batches; probing the last {len(hard)}")
    for sweeps in (6, 8, 10, 12):
        for presort in (False, True):
            s_err = perr = iso = 0.0
            for th in hard:
                a, b, c = panel_errors(th, sweeps, presort)
                s_err, perr, iso = max(s_err, a), max(perr, b), max(iso, c)
            tag = "presort" if presort else "cold   "
            print(
                f"sweeps={sweeps:2d} {tag}: max rel S err {s_err:9.3e}  "
                f"subspace proj err {perr:9.3e}  vh isometry defect {iso:9.3e}"
            )


def phase2():
    """On-chip timing: production TEBD step at candidate settings."""
    from tensorcircuit_ng_tpu.models.tebd import ParallelTEBD

    n, chi, K = 60, 64, 50
    g = np.asarray(
        tc.ops.gates.rzz_matrix(0.1).reshape(4, 4)
        @ np.kron(tc.ops.gates.rx_matrix(0.07).reshape(2, 2), np.eye(2))
    )

    def time_step(sweeps, presort):
        tebd_mod.JACOBI_SWEEPS = sweeps
        tebd_mod.JACOBI_PRESORT = presort
        eng = ParallelTEBD(n, chi=chi)
        t0 = time.perf_counter()
        for _ in range(K):
            eng.apply_two_site_layer(jnp.asarray(g), parity=0)
            eng.apply_two_site_layer(jnp.asarray(g), parity=1)
        # force a host fetch (axon: block_until_ready is not enough)
        _ = float(jnp.real(jnp.sum(jnp.abs(eng.gammas[0]))))
        dt = (time.perf_counter() - t0) / K * 1000
        print(f"sweeps={sweeps} presort={presort}: {dt:.2f} ms/step (K={K}, incl compile amortized? no -- warmed)")
        return dt

    # warm the compile first at default
    print("phase 2 on", jax.devices())
    for sweeps, presort in ((10, False), (10, True), (8, True), (6, True)):
        time_step(sweeps, presort)


if __name__ == "__main__":
    if ON_TPU:
        phase2()
    else:
        phase1()
