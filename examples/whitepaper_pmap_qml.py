"""Data-parallel QML via jax.pmap: the batch split across the device mesh.

Reference-whitepaper figure family (behavioral port of
``examples/ng_whitepaper/VIA_pmap_qml.py``): each device holds a shard of
the training batch, runs the same quantum model, and gradients meet in a
``pmean`` — the standard data-parallel recipe, here with a quantum circuit
as the model.

Self-validating twice: (1) the pmap-computed loss/grad equals the
single-device full-batch computation at step 0; (2) the trained classifier
separates the synthetic dataset (>90% accuracy).

Run on CPU with:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/whitepaper_pmap_qml.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")  # virtual-mesh demo

import jax.numpy as jnp
import optax

import tensorcircuit_ng_tpu as tc

N, LAYERS = 6, 2
NDEV = jax.local_device_count()
BATCH = 16 * NDEV
rng = np.random.default_rng(5)

# teacher-student task: labels come from a hidden random instance of the
# SAME ansatz, so a separating function is guaranteed representable and
# training progress is the thing under test
x_all = rng.uniform(-1, 1, size=(512, N)).astype(np.float32)


def qmodel(params, x):
    c = tc.Circuit(N)
    for q in range(N):
        c.ry(q, theta=np.pi * x[q])
    k = 0
    for _ in range(LAYERS):
        for q in range(N - 1):
            c.cnot(q, q + 1)
        for q in range(N):
            c.ry(q, theta=params[k])
            k += 1
        for q in range(N):
            c.rz(q, theta=params[k])
            k += 1
    return jnp.real(c.expectation_ps(z=[0]))


def loss_fn(params, xb, yb):
    logits = jax.vmap(qmodel, in_axes=(None, 0))(params, xb)
    p = 0.5 * (1.0 + logits)  # map <Z> to [0, 1]
    p = jnp.clip(p, 1e-6, 1 - 1e-6)
    return -jnp.mean(yb * jnp.log(p) + (1 - yb) * jnp.log(1 - p))


nparams = LAYERS * 2 * N
teacher = jnp.asarray(rng.normal(size=(nparams,)) * 0.7, jnp.float32)
t_logits = np.asarray(jax.vmap(qmodel, in_axes=(None, 0))(teacher, jnp.asarray(x_all)))
y_all = (t_logits > np.median(t_logits)).astype(np.float32)  # balanced classes

opt = optax.adam(0.1)


def pstep(params, opt_state, xb, yb):
    l, g = jax.value_and_grad(loss_fn)(params, xb, yb)
    l = jax.lax.pmean(l, axis_name="i")
    g = jax.lax.pmean(g, axis_name="i")  # data-parallel grad reduction
    updates, opt_state = opt.update(g, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, l


pupdate = jax.pmap(pstep, axis_name="i")

params = jnp.asarray(rng.normal(size=(nparams,)) * 0.1, jnp.float32)
opt_state = opt.init(params)
rep = lambda t: jax.device_put_replicated(t, jax.local_devices())
p_r, o_r = rep(params), rep(opt_state)

# --- step-0 exactness check: pmap pmean == single-device full batch -------
xb0 = x_all[:BATCH].reshape(NDEV, -1, N)
yb0 = y_all[:BATCH].reshape(NDEV, -1)
l_full = float(loss_fn(params, jnp.asarray(x_all[:BATCH]), jnp.asarray(y_all[:BATCH])))
shard = lambda t: jax.device_put_sharded(list(t), jax.local_devices())
_, _, l_p = pupdate(p_r, o_r, shard(xb0), shard(yb0))
assert abs(float(l_p[0]) - l_full) < 1e-5, (float(l_p[0]), l_full)
print(f"step-0 parity: pmap loss {float(l_p[0]):.6f} == full-batch {l_full:.6f}")

# --- train ----------------------------------------------------------------
for epoch in range(80):
    order = rng.permutation(len(x_all))[:BATCH]
    xb = x_all[order].reshape(NDEV, -1, N)
    yb = y_all[order].reshape(NDEV, -1)
    p_r, o_r, l = pupdate(p_r, o_r, shard(xb), shard(yb))
    if epoch % 20 == 0:
        print(f"epoch {epoch:2d}  loss {float(l[0]):.4f}")

params_f = jnp.asarray(np.asarray(p_r[0]))
logits = jax.vmap(qmodel, in_axes=(None, 0))(params_f, jnp.asarray(x_all))
acc = float(np.mean(((np.asarray(logits) > 0).astype(np.float32) == y_all)))
print(f"train accuracy {acc:.3f}")
assert acc > 0.9, acc
print("OK: pmap data-parallel QML validated (step-0 parity + accuracy)")
