"""Rematerialization: trade FLOPs for activation memory with jax.checkpoint
(reference ``examples/checkpoint_memsave.py`` role, TPU-first framing).

Backprop through a deep circuit normally keeps every gate's intermediate
alive for the backward pass — O(depth * gates * 2^n) activation memory.
Wrapping each layer's state map in ``jax.checkpoint`` (remat) drops those
activations and recomputes them during the backward, leaving values and
gradients IDENTICAL while storing only the layer-boundary states.

Validated three ways:
1. value and grad bit-agree between the plain and remat versions;
2. ``jax.ad_checkpoint.print_saved_residuals`` — the authoritative list of
   what AD stores — shrinks from ~1.4k saved tensors (every per-gate
   intermediate) to ~55 (one state per layer boundary), >10x fewer bytes;
3. the scanned form (``experimental.scan_circuit_layers``, O(1) program
   size in depth, the recommended shape for big TPU compiles) agrees too.

NOTE the fused ``zzrx_layer`` kernel path is intentionally NOT used here:
its custom VJP already pins its own minimal residual set, so remat has
nothing to drop — remat matters for the generic per-gate path.
"""

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import ad_checkpoint

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.experimental import scan_circuit_layers

# sized for the CI box: per-gate XLA-CPU compile grows ~quadratically in
# unrolled depth (the scan form below is the depth-scalable shape)
n, depth = 12, 6
pairs = [(i, i + 1) for i in range(n - 1)]

_DT_BYTES = {"f32": 4, "f64": 8, "c64": 8, "c128": 16, "i32": 4, "i64": 8, "bf16": 2}


def layer(c, p):
    # generic per-gate path (NOT the fused custom-VJP kernel, see docstring)
    for k, (a, b) in enumerate(pairs):
        c.rzz(a, b, theta=p[0, k])
    for q in range(n):
        c.rx(q, theta=p[1, q])


def layer_state(ps, p):
    c = tc.Circuit(n, inputs=ps)
    layer(c, p)
    return c.state()


def readout(ps):
    c = tc.Circuit(n, inputs=ps)
    return jnp.real(c.expectation_zzx_energy(pairs, 1.0, -1.0))


def make_energy(remat):
    f = jax.checkpoint(layer_state) if remat else layer_state

    def energy(params):
        c = tc.Circuit(n)
        c.h_layer()
        ps = c.state()
        for l in range(depth):
            ps = f(ps, params[l])
        return readout(ps)

    return energy


def energy_scan(params):
    c = tc.Circuit(n)
    c.h_layer()
    return readout(scan_circuit_layers(c, layer, params).state())


def residual_bytes(f, params):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ad_checkpoint.print_saved_residuals(f, params)
    lines = buf.getvalue().strip().splitlines()
    total = 0
    for line in lines:
        m = re.match(r"\s*(\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        shape = [int(s) for s in m.group(2).split(",") if s]
        total += int(np.prod(shape)) * _DT_BYTES.get(m.group(1), 4) if shape else 4
    return len(lines), total


rng = np.random.default_rng(0)
params = jnp.asarray(rng.normal(size=(depth, 2, n)) * 0.3, jnp.float32)

v0, g0 = jax.jit(jax.value_and_grad(make_energy(False)))(params)
v1, g1 = jax.jit(jax.value_and_grad(make_energy(True)))(params)
v2, g2 = jax.jit(jax.value_and_grad(energy_scan))(params)
print(f"E plain/remat/scan: {float(v0):.6f} {float(v1):.6f} {float(v2):.6f}")
assert abs(float(v1) - float(v0)) < 1e-5
assert abs(float(v2) - float(v0)) < 1e-5
np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)
np.testing.assert_allclose(np.asarray(g2), np.asarray(g0), atol=1e-5)

n_plain, b_plain = residual_bytes(make_energy(False), params)
n_remat, b_remat = residual_bytes(make_energy(True), params)
print(f"saved residuals: plain {n_plain} tensors / {b_plain/2**20:.2f} MiB, "
      f"remat {n_remat} tensors / {b_remat/2**20:.2f} MiB")
assert n_remat < n_plain / 10, "remat must drop the per-gate intermediates"
assert b_remat < b_plain / 5, "remat must cut saved-activation bytes"
print("checkpoint/remat: identical grads, >10x fewer saved activations; "
      "scan form agrees")
