"""A/B on the real chip: stack VJP + XLA readout vs fused-energy stack VJP.

One process, calibration jit first, K=250 scan-in-jit, fresh inputs, host
fetch (CLAUDE.md axon timing rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

n, nlayers, K = 20, 4, 250
pairs = [(i, i + 1) for i in range(n - 1)]
rng = np.random.default_rng(42)


def build(p):
    c = tc.Circuit(n)
    c.h_layer()
    for l in range(nlayers):
        c.zzrx_layer(pairs, p[l, 0, : n - 1], p[l, 1])
    return c


def e_old(p):
    c = build(p)
    return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()


def e_new(p):
    return build(p).expectation_zzx_energy(pairs, 1.0, -1.0)


def stepper(efn):
    vg = jax.value_and_grad(efn)

    def body(p, _):
        v, g = vg(p)
        return p - 0.01 * g, v

    return jax.jit(lambda p: jax.lax.scan(body, p, None, length=K))


def timed(tag, fk):
    p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
    t0 = time.time()
    out = fk(p)
    e_final = float(out[1][-1])
    ct = time.time() - t0
    best = float("inf")
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=(nlayers, 2, n)) * 0.1, jnp.float32)
        t0 = time.time()
        out = fk(p)
        _ = float(out[1][-1])
        best = min(best, (time.time() - t0) / K)
    print(f"{tag:10s} {best*1000:7.3f} ms/step  (compile {ct:.0f}s, E={e_final:.4f})",
          flush=True)
    return best * 1000, e_final


def main():
    # calibration: empty-ish scan
    fcal = jax.jit(
        lambda p: jax.lax.scan(lambda c, _: (c * 0.999, jnp.sum(c)), p, None, length=K)
    )
    p = jnp.asarray(rng.normal(size=(nlayers, 2, n)), jnp.float32)
    float(fcal(p)[1][-1])
    t0 = time.time()
    float(fcal(p + 1e-6)[1][-1])
    print(f"calib      {(time.time()-t0)/K*1000:7.3f} ms/step", flush=True)

    ms_old, e1 = timed("old", stepper(e_old))
    ms_new, e2 = timed("fused", stepper(e_new))
    # same seed sequence per timed() call -> first fresh params differ, but
    # final energies from the SAME initial p would match; cross-check loosely
    print(f"speedup {ms_old/ms_new:.3f}x", flush=True)

    # correctness on chip: same params through both (values only)
    pp = jnp.asarray(np.full((nlayers, 2, n), 0.11), jnp.float32)
    vo = float(jax.jit(e_old)(pp))
    vn = float(jax.jit(e_new)(pp))
    print(f"E old={vo:.5f} new={vn:.5f} diff={abs(vo-vn):.2e}", flush=True)
    assert abs(vo - vn) < 1e-2


if __name__ == "__main__":
    main()
