"""Component-level timing of the N=20 L=4 TFIM VQE step (scan-in-jit)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

n = 20
nlayers = 4
K = 50
pairs = [(i, i + 1) for i in range(n - 1)]
rng = np.random.default_rng(42)


def timed(tag, make_body, params_shape):
    def fk(p):
        def body(carry, _):
            return make_body(carry), None

        out, _ = jax.lax.scan(body, p, None, length=K)
        return jnp.sum(jnp.real(out)) if out.dtype.kind == "c" else jnp.sum(out)

    f = jax.jit(fk)
    p0 = jnp.asarray(rng.normal(size=params_shape) * 0.1, dtype=jnp.float32)
    t0 = time.time()
    float(f(p0))
    compile_t = time.time() - t0
    best = float("inf")
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=params_shape) * 0.1, dtype=jnp.float32)
        t0 = time.time()
        float(f(p))
        best = min(best, (time.time() - t0) / K)
    print(f"{tag:34s} {best*1000:8.3f} ms/iter   (compile {compile_t:.1f}s)")


def full_energy(params):
    c = tc.Circuit(n)
    c.h_layer()
    for l in range(nlayers):
        c.rzz_product(pairs, params[l, 0, : n - 1])
        c.rx_layer(params[l, 1])
    return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()


if __name__ == "__main__":
    from tensorcircuit_ng_tpu.core import statevec as sv

    psi0 = None

    # 1. forward energy only
    timed("fwd energy", lambda p: p + 1e-9 * full_energy(p), (nlayers, 2, n))

    # 2. value_and_grad (the bench body)
    vg = jax.value_and_grad(full_energy)
    def vg_body(p):
        v, g = vg(p)
        return p - 0.01 * g
    timed("fwd+bwd (value_and_grad)", vg_body, (nlayers, 2, n))

    # 3. rx_layer only (4 layers fwd)
    def rx_only(p):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(nlayers):
            c.rx_layer(p[l, 1])
        return jnp.real(c.state()[0])
    timed("fwd 4x rx_layer", lambda p: p + 1e-9 * rx_only(p), (nlayers, 2, n))
    timed("bwd 4x rx_layer", lambda p: p - 1e-9 * jax.grad(rx_only)(p), (nlayers, 2, n))

    # 4. rzz_product only
    def zz_only(p):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(nlayers):
            c.rzz_product(pairs, p[l, 0, : n - 1])
        return jnp.real(c.state()[0])
    timed("fwd 4x rzz_product", lambda p: p + 1e-9 * zz_only(p), (nlayers, 2, n))
    timed("bwd 4x rzz_product", lambda p: p - 1e-9 * jax.grad(zz_only)(p), (nlayers, 2, n))

    # 5. energy readout only
    def energy_only(p):
        c = tc.Circuit(n)
        c.h_layer()
        c.rx_layer(p[0, 1])
        return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()
    timed("fwd 1x rx + energy readout", lambda p: p + 1e-9 * energy_only(p), (nlayers, 2, n))
    timed("bwd 1x rx + energy readout", lambda p: p - 1e-9 * jax.grad(energy_only)(p), (nlayers, 2, n))
