"""End-to-end QML: amplitude-encoding image classifier through BOTH NN
interfaces (flax ``KerasLayer`` role and ``TorchLayer``).

The reference demos this workflow extensively (``examples/mnist_qml.py``
etc., using ``templates/dataset.py`` amplitude encoding); no network egress
exists here, so the dataset is a synthetic two-class 8x8 image family
(stripes vs checkerboard + pixel noise) with the exact same shape as the
MNIST pipeline: image -> ``templates.dataset.amplitude_encoding`` -> 6-qubit
state -> hardware-efficient ansatz -> Z readouts -> linear head.

Self-validating: both interfaces must reach >90% test accuracy, CPU, <60 s.

Run: PYTHONPATH=. python examples/qml_amplitude_classifier.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.templates.dataset import amplitude_encoding

N = 6  # qubits: 2^6 = 64 amplitudes = one 8x8 image
LAYERS = 3


def make_dataset(n_samples=400, seed=0):
    """Two 8x8 image classes: vertical stripes vs checkerboard, + noise."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    col = np.arange(8)
    stripes = np.tile((col % 2).astype(float), (8, 1))
    checker = (np.add.outer(col, col) % 2).astype(float)
    for i in range(n_samples):
        base = stripes if i % 2 == 0 else checker
        img = 0.35 + 0.65 * base + rng.normal(0, 0.35, size=(8, 8))
        xs.append(img.clip(0, None))
        ys.append(i % 2)
    xs = np.stack(xs).astype(np.float32)
    ys = np.asarray(ys, dtype=np.int32)
    cut = int(0.8 * n_samples)
    return xs[:cut], ys[:cut], xs[cut:], ys[cut:]


_ZSIGNS = np.stack(
    [
        1.0 - 2.0 * ((np.arange(2**N) >> (N - 1 - q)) & 1)
        for q in range(N)
    ]
).astype(np.float32)  # (N, 2^N): ±1 of each qubit per basis state


def qpred(weights, head, img):
    """One sample: encode -> ansatz -> all-qubit Z readout -> linear logit."""
    psi = amplitude_encoding(img, N).astype(jnp.complex64)
    c = tc.Circuit(N, inputs=psi)
    for l in range(LAYERS):
        c.ry_layer(weights[l, :, 0])
        for q in range(N - 1):
            c.cnot(q, q + 1)
        c.rz_layer(weights[l, :, 1])
    # all <Z_q> in one pass from the Born masses (diagonal observables)
    mass = jnp.abs(c.state()) ** 2
    feats = _ZSIGNS @ mass
    return jnp.dot(head[:N], feats) + head[N]


def batched_logits(weights, head, imgs):
    return jax.vmap(lambda im: qpred(weights, head, im))(imgs)


def accuracy(weights, head, imgs, labels):
    logits = batched_logits(weights, head, jnp.asarray(imgs))
    return float(np.mean((np.asarray(logits) > 0) == (labels == 1)))


def train_flax(x_tr, y_tr, x_te, y_te):
    """Train through the flax QuantumLayer (the KerasLayer role)."""
    import optax
    from tensorcircuit_ng_tpu.keras import QuantumLayer

    layer = QuantumLayer(
        f=lambda w, h, imgs: batched_logits(w, h, imgs),
        weights_shape=[(LAYERS, N, 2), (N + 1,)],
    )
    params = layer.init(jax.random.key(0), jnp.asarray(x_tr[:2]))

    def loss_fn(params, imgs, labels):
        logits = layer.apply(params, imgs)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))

    opt = optax.adam(0.05)
    st = opt.init(params)

    @jax.jit
    def step(params, st, imgs, labels):
        l, g = jax.value_and_grad(loss_fn)(params, imgs, labels)
        up, st = opt.update(g, st, params)
        return optax.apply_updates(params, up), st, l

    xb = jnp.asarray(x_tr)
    yb = jnp.asarray(y_tr, dtype=jnp.float32)
    for ep in range(25):
        params, st, l = step(params, st, xb, yb)
    w = params["params"]["w0"]
    h = params["params"]["w1"]
    acc = accuracy(np.asarray(w), np.asarray(h), x_te, y_te)
    print(f"flax QuantumLayer: final loss {float(l):.4f}, test acc {acc:.3f}")
    return acc


def train_torch(x_tr, y_tr, x_te, y_te):
    """Train the same model through TorchLayer (jax VJP under torch.autograd)."""
    import torch

    from tensorcircuit_ng_tpu.torchnn import TorchLayer

    net = TorchLayer(
        f=lambda w, h, imgs: batched_logits(w, h, imgs),
        weights_shape=[(LAYERS, N, 2), (N + 1,)],
        use_jit=True,
    )
    opt = torch.optim.Adam(net.parameters(), lr=0.05)
    lossf = torch.nn.BCEWithLogitsLoss()
    xb = torch.tensor(x_tr)
    yb = torch.tensor(y_tr, dtype=torch.float32)
    for ep in range(25):
        opt.zero_grad()
        logits = net(xb)
        loss = lossf(logits, yb)
        loss.backward()
        opt.step()
    w, h = [np.asarray(p.detach().numpy()) for p in net.parameters()]
    acc = accuracy(w, h, x_te, y_te)
    print(f"TorchLayer:        final loss {float(loss):.4f}, test acc {acc:.3f}")
    return acc


if __name__ == "__main__":
    t0 = time.time()
    x_tr, y_tr, x_te, y_te = make_dataset()
    acc_flax = train_flax(x_tr, y_tr, x_te, y_te)
    acc_torch = train_torch(x_tr, y_tr, x_te, y_te)
    dt = time.time() - t0
    print(f"total {dt:.1f}s")
    assert acc_flax > 0.9, f"flax path accuracy too low: {acc_flax}"
    assert acc_torch > 0.9, f"torch path accuracy too low: {acc_torch}"
    assert dt < 120, f"too slow: {dt:.1f}s"
    print("QML AMPLITUDE CLASSIFIER: OK")
