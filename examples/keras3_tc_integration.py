"""Keras 3 (JAX backend) + quantum circuits: functional layers, batched weights.

Reference role: ``examples/keras3_tc_integration.py`` — two integration
features keras 3 unlocks when its backend is JAX:

1. OO-to-functional: a stateful ``keras.layers.Dense`` is reused inside a
   pure jitted loss through ``stateless_call`` (weights passed explicitly),
   so the whole hybrid quantum-classical model stays a function JAX can
   transform.
2. Weight batching: ``vmap`` over the NETWORK weights (not just the data)
   trains an ensemble of hybrid models in one compiled program — the MXU
   sees one batched matmul instead of ``wbatch`` dispatches.

Self-validating: the task is linearly separable (label = first input bit),
so every ensemble member must reach 100% train accuracy.
"""

import os
import sys

os.environ["KERAS_BACKEND"] = "jax"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import keras
import optax

import tensorcircuit_ng_tpu as tc

K = tc.set_backend("jax")

batch, n = 8, 6
layer = keras.layers.Dense(1, activation="sigmoid")
layer.build([batch, n])

rng = np.random.default_rng(42)
data_x = rng.choice([0, 1], size=batch * n).reshape([batch, n]).astype(np.float32)
data_y = data_x[:, :1]  # label = first bit: linearly separable


def loss(xs, ys, params, weights):
    c = tc.Circuit(n)
    for i in range(n):
        c.rx(i, theta=xs[i])
    for i in range(n - 1):
        c.cx(i, i + 1)
    for i in range(n):
        c.rz(i, theta=params[i])
    outputs = jnp.stack([jnp.real(c.expectation_ps(z=[i])) for i in range(n)])
    ypred, _ = layer.stateless_call(weights, [], outputs)
    return jnp.mean(keras.losses.binary_crossentropy(ys, ypred)), ypred


# --- 1. functional reuse: data-batched hybrid training -------------------
vgf = K.jit(
    K.vectorized_value_and_grad(
        loss, argnums=(2, 3), vectorized_argnums=(0, 1), has_aux=True
    )
)
params = K.implicit_randn(shape=[n])
w = K.implicit_randn(shape=[n, 1])
b = K.implicit_randn(shape=[1])
opt = K.optimizer(optax.adam(5e-2))
for i in range(150):
    (v, yp), gs = vgf(data_x, data_y, params, [w, b])
    params, [w, b] = opt.update(gs, (params, [w, b]))
    if i % 50 == 0:
        print("loss", float(K.mean(v)))
acc = float(np.mean((np.asarray(yp)[:, 0] > 0.5) == (data_y[:, 0] > 0.5)))
print("single-model accuracy", acc)
assert acc == 1.0

# --- 2. vmap over the network weights: ensemble in one program -----------
vgf2 = K.jit(
    K.vmap(
        K.vectorized_value_and_grad(
            loss, argnums=(2, 3), vectorized_argnums=(0, 1), has_aux=True
        ),
        vectorized_argnums=(2, 3),
    )
)
wbatch = 4
params = K.implicit_randn(shape=[wbatch, n])
w = K.implicit_randn(shape=[wbatch, n, 1])
b = K.implicit_randn(shape=[wbatch, 1])
opt = K.optimizer(optax.adam(5e-2))
for i in range(150):
    (v, yp), gs = vgf2(data_x, data_y, params, [w, b])
    params, [w, b] = opt.update(gs, (params, [w, b]))
    if i % 50 == 0:
        print("ensemble losses", np.round(np.asarray(K.mean(v, axis=-1)), 4))
yp = np.asarray(yp)
for k in range(wbatch):
    acc = float(np.mean((yp[k, :, 0] > 0.5) == (data_y[:, 0] > 0.5)))
    print(f"ensemble member {k} accuracy {acc}")
    assert acc == 1.0
print("OK: keras-3 stateless_call hybrid + weight-batched ensemble trained")
