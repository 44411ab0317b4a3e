"""TF interface + tf.keras adapter, exercised against the REAL TensorFlow.

Round-1 assumed TF absent from the image; it is installed (2.21), so the
torch-style gradient bridge (reference interfaces/tensorflow.py) and
KerasLayer (reference keras.py) are tested for real here.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc


def _energy(params):
    c = tc.Circuit(3)
    for i in range(3):
        c.rx(i, theta=params[i])
    c.cnot(0, 1)
    c.cnot(1, 2)
    return jnp.real(c.expectation_ps(z=[0, 2]))


@pytest.mark.slow  # keras_layer_trains covers the TF bridge end-to-end in the gate
def test_tensorflow_interface_value_and_grad():
    from tensorcircuit_ng_tpu.interfaces.tensorflow import tensorflow_interface

    f_tf = tensorflow_interface(_energy, jit=True)
    x = tf.Variable([0.3, 0.5, 0.7], dtype=tf.float32)
    with tf.GradientTape() as tape:
        y = f_tf(x)
    g = tape.gradient(y, x)
    v2, g2 = jax.value_and_grad(_energy)(jnp.asarray([0.3, 0.5, 0.7]))
    np.testing.assert_allclose(float(y), float(v2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), atol=1e-4)


def test_keras_layer_trains():
    from tensorcircuit_ng_tpu.keras import KerasLayer

    def f(w, x):
        c = tc.Circuit(2)
        c.rx(0, theta=w[0] + x[0])
        c.rx(1, theta=w[1] + x[1])
        c.cnot(0, 1)
        return jnp.real(c.expectation_ps(z=[1]))

    layer = KerasLayer(f, weights_shape=(2,))
    x = tf.constant([[0.1, 0.2]], dtype=tf.float32)
    with tf.GradientTape() as tape:
        y = layer(x)
        loss = tf.reduce_sum((y + 1.0) ** 2)  # target <Z>=-1: far from init
    grads = tape.gradient(loss, layer.trainable_variables)
    assert grads and all(np.isfinite(np.asarray(g)).all() for g in grads)
    opt = tf.keras.optimizers.SGD(0.4)
    before = float(loss)
    for _ in range(6):  # 6 steps suffice for the <0.75x check (suite budget)
        with tf.GradientTape() as tape:
            loss = tf.reduce_sum((layer(x) + 1.0) ** 2)
        opt.apply_gradients(zip(tape.gradient(loss, layer.trainable_variables), layer.trainable_variables))
    assert float(loss) < 0.75 * before  # the quantum layer actually trains
