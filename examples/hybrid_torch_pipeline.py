"""Hybrid pipeline: quantum layer in JAX, neural head in torch, one autograd.

Reference role: ``examples/hybrid_gpu_pipeline.py`` — the quantum function
runs on the accelerator framework (there TF/GPU, here JAX, which targets the
TPU when one is attached) while the classical network and the training loop
live in torch; gradients flow end-to-end through the framework bridge
(``tc.TorchLayer`` = jax VJP wrapped in ``torch.autograd.Function``).  The
reference trains on downloaded MNIST pairs; this image has no egress, so the
port uses a synthetic binarized 9-pixel task with a known-learnable label
and asserts perfect training accuracy instead of just printing timings.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import torch

import tensorcircuit_ng_tpu as tc

n, nlayers = 9, 3
rng = np.random.default_rng(1)
x_all = rng.choice([0.0, 1.0], size=(256, n)).astype(np.float32)
y_all = x_all[:, 0:1]  # learnable target through the Z_0-ish feature

x_torch = torch.tensor(x_all)
y_torch = torch.tensor(y_all)


def qpreds_single(weights, x):
    c = tc.Circuit(n)
    for i in range(n):
        c.rx(i, theta=x[i] * np.pi / 2)
    for j in range(nlayers):
        for i in range(n - 1):
            c.cnot(i, i + 1)
        for i in range(n):
            c.rx(i, theta=weights[2 * j, i])
            c.ry(i, theta=weights[2 * j + 1, i])
    return jnp.stack([jnp.real(c.expectation_ps(z=[i])) for i in range(n)])


def qpreds(weights, xs):
    # batch rides one vmap: the TPU sees a single batched program
    return jax.vmap(lambda x: qpreds_single(weights, x))(xs)


quantumnet = tc.TorchLayer(qpreds, weights_shape=[2 * nlayers, n], use_jit=True)
model = torch.nn.Sequential(quantumnet, torch.nn.Linear(n, 1), torch.nn.Sigmoid())

criterion = torch.nn.BCELoss()
opt = torch.optim.Adam(model.parameters(), lr=2e-2)
nbatch, nepochs = 32, 120
times = []
for epoch in range(nepochs):
    idx = rng.integers(0, x_all.shape[0], size=nbatch)
    inputs, labels = x_torch[idx], y_torch[idx]
    opt.zero_grad()
    t0 = time.time()
    yps = model(inputs)
    loss = criterion(yps.reshape(nbatch, 1), labels.reshape(nbatch, 1))
    loss.backward()
    opt.step()
    times.append(time.time() - t0)
    if epoch % 40 == 0:
        print(f"epoch {epoch}: loss {float(loss):.4f}")

print(f"training time per step: {np.mean(times[1:]) * 1000:.1f} ms")
with torch.no_grad():
    pred = model(x_torch).numpy()
acc = float(np.mean((pred[:, 0] > 0.5) == (y_all[:, 0] > 0.5)))
print(f"train accuracy: {acc}")
assert acc == 1.0
# gradients really crossed the bridge: quantum weights moved
w = list(quantumnet.parameters())[0]
assert float(torch.abs(w).max()) > 0.0 and w.grad is not None
print("OK: torch <- bridge <- jax hybrid trained end to end")
