"""Decompose the N=20 zzrx layer fwd+bwd cost: raw Pallas kernel vs XLA glue.

Measures, on the real chip (scan-in-jit, fresh outer inputs, host fetch):
  calib            empty scan body (dispatch floor)
  kernel_fwd_raw   4x _pallas_zzrx_fwd per iter, f32 planes end to end
  kernel_bwd_raw   4x _pallas_zzrx_bwd per iter, f32 planes end to end
  layer_fwd        4x fused_zzrx_layer per iter (complex API: conversions +
                   outer kron matmul + lane matmul)
  layer_vg         value_and_grad of sum(real/imag) after 4 fused layers
                   (isolates layer fwd+bwd without energy readout)
  glue_vg          value_and_grad of outer+lane matmuls ONLY (XLA AD), incl.
                   complex<->planes conversion per layer, no Pallas
  step_vg          the full bench body (reference point, ~4.4 ms/step)

Interpretation: layer_vg - kernel_fwd_raw - kernel_bwd_raw ~= per-step XLA
glue (conversions, residual moves, outer/lane AD). If glue dominates, the fix
is an L-layer stack custom VJP that stays in f32 planes across layers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import kernels
from tensorcircuit_ng_tpu.core import kernels_rowlayer as krl

n = 20
nlayers = 4
K = 200
pairs = tuple((i, i + 1) for i in range(n - 1))
rng = np.random.default_rng(0)

R, LANES = 2 ** 13, 2 ** 7  # (8192, 128) f32 planes
NK = krl.MAX_KERNEL_QUBITS_ZZRX  # 10 kernel row qubits
NOUTER = 13 - NK


def timed(tag, fn, p_shape, extra=None):
    """fn(p, extra) -> scalar f32; scan K times inside one jit."""

    def fk(p, e):
        def body(c, _):
            return fn(c, e), None

        out, _ = jax.lax.scan(body, p, None, length=K)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), out, jnp.float32(0.0)
        )

    f = jax.jit(fk)
    e0 = extra if extra is not None else jnp.float32(0.0)
    p0 = jnp.asarray(rng.normal(size=p_shape) * 0.1, jnp.float32)
    t0 = time.time()
    float(f(p0, e0))
    ct = time.time() - t0
    best = float("inf")
    for _ in range(3):
        p = jnp.asarray(rng.normal(size=p_shape) * 0.1, jnp.float32)
        t0 = time.time()
        float(f(p, e0))
        best = min(best, (time.time() - t0) / K)
    print(f"{tag:18s} {best*1000:8.3f} ms/iter   (compile {ct:.1f}s)", flush=True)
    return best * 1000


def main():
    shapes_p = (nlayers, 2, n)

    # 0. calibration
    timed("calib", lambda p, e: p * 0.999, shapes_p)

    # 1. raw fwd kernel x4 (planes in/out, no conversions/outer/lane)
    def kf(p, e):
        sr = jnp.broadcast_to(p[0, 0, 0] * 1e-3 + 2.0 ** -10, (R, LANES))
        si = jnp.zeros((R, LANES), jnp.float32)
        for l in range(nlayers):
            sr, si = krl._pallas_zzrx_fwd(
                pairs, n, p[l, 0, : n - 1], p[l, 1, :NK], sr, si
            )
        return p + 1e-9 * jnp.sum(sr[0, :8])

    timed("kernel_fwd_raw", kf, shapes_p)

    # 2. raw bwd kernel x4
    def kb(p, e):
        y = jnp.broadcast_to(p[0, 0, 0] * 1e-3 + 2.0 ** -10, (R, LANES))
        yr, yi = y, y * 0.1
        cr, ci = y * 0.5, y * 0.05
        acc = jnp.float32(0.0)
        for l in range(nlayers):
            # faithful adjoint chain: ct flows layer to layer, y is a saved
            # residual per layer (constant here, timing only)
            cr, ci, dz, dt = krl._pallas_zzrx_bwd(
                pairs, n, p[l, 0, : n - 1], p[l, 1, :NK], yr, yi, cr, ci
            )
            acc = acc + jnp.sum(dz) + jnp.sum(dt)
        return p + 1e-9 * (acc + jnp.sum(cr[0, :8]))

    timed("kernel_bwd_raw", kb, shapes_p)

    # 3. complex-API layer fwd x4
    def lf(p, e):
        dim = 2 ** n
        psi = jnp.full((dim,), 1.0 / np.sqrt(dim), jnp.float32).astype(jnp.complex64)
        psi = psi * (1.0 + 1e-3 * p[0, 0, 0]).astype(jnp.complex64)
        for l in range(nlayers):
            psi = kernels.fused_zzrx_layer(psi, pairs, p[l, 0, : n - 1], p[l, 1])
        return p + 1e-9 * jnp.real(psi[0])

    timed("layer_fwd", lf, shapes_p)

    # 4. layer fwd+bwd via value_and_grad (no readout)
    def lsum(p):
        dim = 2 ** n
        psi = jnp.full((dim,), 1.0 / np.sqrt(dim), jnp.float32).astype(jnp.complex64)
        for l in range(nlayers):
            psi = kernels.fused_zzrx_layer(psi, pairs, p[l, 0, : n - 1], p[l, 1])
        return jnp.real(psi[0]) * jnp.float32(2.0 ** 10)

    lvg = jax.value_and_grad(lsum)

    def lb(p, e):
        v, g = lvg(p)
        return p - 0.01 * g + 1e-9 * v

    timed("layer_vg", lb, shapes_p)

    # 5. outer+lane matmul glue ONLY (XLA AD), with per-layer conversions
    from tensorcircuit_ng_tpu.ops.gates import rx_matrix

    def gsum(p):
        sr = jnp.full((R, LANES), 2.0 ** -10, jnp.float32)
        si = jnp.zeros((R, LANES), jnp.float32)
        for l in range(nlayers):
            psi = (sr + 1j * si).astype(jnp.complex64)
            og = jax.vmap(lambda t: rx_matrix(t).astype(psi.dtype))(p[l, 1, :NOUTER])
            mo = og[0]
            for j in range(1, NOUTER):
                mo = jnp.kron(mo, og[j])
            psi = jnp.reshape(
                mo @ jnp.reshape(psi, (2 ** NOUTER, -1)), (R, LANES)
            )
            lg = jax.vmap(lambda t: rx_matrix(t).astype(psi.dtype))(p[l, 1, 13:])
            m = lg[0]
            for j in range(1, 7):
                m = jnp.kron(m, lg[j])
            psi = psi @ m.T
            sr = jnp.real(psi)
            si = jnp.imag(psi)
        return sr[0, 0] * jnp.float32(2.0 ** 10)

    gvg = jax.value_and_grad(gsum)

    def gb(p, e):
        v, g = gvg(p)
        return p - 0.01 * g + 1e-9 * v

    timed("glue_vg", gb, shapes_p)

    # 6. the full step (reference)
    def energy(p):
        c = tc.Circuit(n)
        c.h_layer()
        for l in range(nlayers):
            c.zzrx_layer(pairs, p[l, 0, : n - 1], p[l, 1])
        return jnp.real(c.expectation_zz_sum(pairs)) - c.expectation_x_sum()

    evg = jax.value_and_grad(energy)

    def eb(p, e):
        v, g = evg(p)
        return p - 0.01 * g + 1e-9 * v

    timed("step_vg", eb, shapes_p)


if __name__ == "__main__":
    main()
