"""TEBD trotter-step anatomy + roofline on the chip (VERDICT r2 #8).

Times the n=60 chi=64 ParallelTEBD real-time trotter step three ways in ONE
process (axon rules: K steps in one jit via lax.scan, fresh float inputs,
host fetch; empty-scan calibration subtracts the dispatch floor):

  full     the production step (theta build + Pallas Jacobi SVD + unwrap)
  nosvd    _svd_batched stubbed to a traffic-equivalent fake (padded
           identity U/Vh, row norms as S) — glue-only cost, WRONG math
  calib    empty scan body — the fixed dispatch round trip

Also prints the modeled arithmetic floor for the Jacobi kernel: per layer,
batch x sweeps x (n-1) rounds of ~8 rotation planes on (h, m) f32 blocks,
at an assumed VPU throughput — the kernel is VPU/latency bound, not HBM
bound (whole batch = 30 x 128 KB, resident in VMEM).

Run on the real chip; background, no timeout kill.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.linalg as sl
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.models import tebd as tebd_mod

from tensorcircuit_ng_tpu.core import kernels_jacobi as _kj

_kj.LANES = False  # record predates the lane-major kernel (ab_jacobi_lanes.py) - pin
# the sublane-major grid so the documented numbers reproduce

n, chi, K = 60, 64, 50
X = np.array([[0, 1], [1, 0.0]])
Z = np.diag([1.0, -1.0])
h = -np.kron(Z, Z) - 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
gate = sl.expm(-0.05j * h).astype(np.complex64)
even = np.stack([gate] * len(range(0, n - 1, 2)))
odd = np.stack([gate] * len(range(1, n - 1, 2)))
eng0 = tc.ParallelTEBD(n, chi, initial="neel")
g0r = np.ascontiguousarray(np.real(eng0.gammas)).astype(np.float32)
g0i = np.ascontiguousarray(np.imag(eng0.gammas)).astype(np.float32)
lam0 = np.asarray(eng0.lambdas, dtype=np.float32)


def make_step():
    def stepfn(carry, _):
        gr, gi, lam = carry
        eng = tc.ParallelTEBD.from_state(gr + 1j * gi, lam)
        eng.trotter_step(even, odd)
        return (
            jnp.real(eng.gammas),
            jnp.imag(eng.gammas),
            eng.lambdas,
        ), jnp.real(eng.lambdas[n // 2, 0])

    return jax.jit(
        lambda gr, gi, lam: jax.lax.scan(stepfn, (gr, gi, lam), None, length=K)[1]
    )


def timed(tag, fk):
    t0 = time.time()
    _ = float(fk(g0r, g0i, lam0)[-1])
    ct = time.time() - t0
    best = float("inf")
    for k in range(1, 4):
        t0 = time.time()
        out = fk(g0r + 1e-7 * k, g0i, lam0)
        _ = float(out[-1])
        best = min(best, (time.time() - t0) / K)
    print(f"{tag:7s} {best*1000:7.3f} ms/step (compile {ct:.0f}s)", flush=True)
    return best * 1000


def fake_svd(theta, vh0=None):
    b, mm, nn = theta.shape
    # traffic-shaped stand-in: row norms as S, padded identities as U/Vh
    s = jnp.sqrt(jnp.sum(jnp.abs(theta) ** 2, axis=-1))[:, :nn]
    eye = jnp.eye(mm, nn, dtype=theta.dtype)
    u = jnp.broadcast_to(eye, (b, mm, nn))
    vh = jnp.broadcast_to(jnp.eye(nn, dtype=theta.dtype), (b, nn, nn))
    return u, s, vh


def main():
    calib_f = jax.jit(
        lambda gr, gi, lam: jax.lax.scan(
            lambda c, _: ((c[0] + 1e-9, c[1], c[2]), jnp.real(c[2][n // 2, 0])),
            (gr, gi, lam), None, length=K,
        )[1]
    )
    calib = timed("calib", calib_f)
    full = timed("full", make_step())
    orig = tebd_mod._svd_batched
    tebd_mod._svd_batched = fake_svd
    try:
        nosvd = timed("nosvd", make_step())
    finally:
        tebd_mod._svd_batched = orig
    print(
        f"net: full {full-calib:.2f} ms; glue {nosvd-calib:.2f} ms; "
        f"svd {full-nosvd:.2f} ms (both layers)"
    )
    # modeled Jacobi arithmetic floor
    nb_tot = len(even) + len(odd)
    npad, m, hh = 128, 128, 64
    sweeps = tebd_mod.JACOBI_SWEEPS
    rounds = sweeps * (npad - 1)
    # ~8 rotated planes x ~6 flops + 4 reductions per round on (h, m) blocks
    flops = nb_tot * rounds * (8 * 6 + 8) * hh * m
    for vpu_tflops in (1.0, 2.0, 4.0):
        print(
            f"jacobi floor @ {vpu_tflops:.0f} TFLOP/s VPU: "
            f"{flops / (vpu_tflops * 1e12) * 1e3:.2f} ms/step"
        )


if __name__ == "__main__":
    main()
