"""One-process A/B: ML_MODE 'stack' vs 'perlayer' on the N=20 L=4 VQE step."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import kernels

n = 20
nlayers = 4
K = 200
pairs = tuple((i, i + 1) for i in range(n - 1))
rng = np.random.default_rng(5)


def energy(p):
    c = tc.Circuit(n)
    c.h_layer()
    for l in range(nlayers):
        c.zzrx_layer(pairs, p[l, 0, : n - 1], p[l, 1])
    return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()


def run(tag):
    vg = jax.value_and_grad(energy)

    def body(p, _):
        v, g = vg(p)
        return p - 0.01 * g, v

    f = jax.jit(lambda p: jax.lax.scan(body, p, None, length=K))
    p0 = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
    t0 = time.time()
    out = f(p0)
    e0 = float(out[1][-1])
    ct = time.time() - t0
    best = float("inf")
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
        t0 = time.time()
        out = f(p)
        _ = float(out[1][-1])
        best = min(best, (time.time() - t0) / K)
    print(f"{tag:10s} {best*1000:7.3f} ms/step  (compile {ct:.1f}s, e={e0:.5f})",
          flush=True)
    return best * 1000, e0


# calibration: empty scan
f0 = jax.jit(
    lambda p: jax.lax.scan(lambda c, _: (c * 0.999, jnp.sum(c)), p, None, length=K)
)
p0 = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
float(f0(p0)[1][-1])
t0 = time.time()
float(f0(p0 + 1e-6)[1][-1])
print(f"calib      {(time.time()-t0)/K*1000:7.3f} ms/step", flush=True)

kernels.ML_MODE = "stack"
ms_s, e_s = run("stack")
kernels.ML_MODE = "perlayer"
ms_p, e_p = run("perlayer")
kernels.ML_MODE = "stack"
print(f"speedup: {ms_p/ms_s:.3f}x; |dE|={abs(e_s-e_p):.2e}")
