"""Linear regression written entirely against the tc.backend surface.

Reference role: ``examples/universal_lr.py`` — demonstrate that the
backend abstraction (ExtendedBackend: jit / vmap / value_and_grad /
tree utilities) is a complete little ML substrate with no quantumness
involved.  The reference flips between TF and jax backends; this repo is
jax-only by design (SURVEY §7), so the point here is that user code
touching ONLY ``tc.backend`` runs unmodified.

Self-validation: gradient descent on (k, b) recovers the generating
slope/intercept within the noise floor, and the vectorized per-sample
loss path (vmap) agrees with a hand-rolled batch computation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import tensorcircuit_ng_tpu as tc

K = tc.backend

nsamples, k0, b0 = 200, 1.7, -0.4
rng = np.random.default_rng(0)
xs0 = rng.uniform(low=-1, high=1, size=[nsamples]).astype(np.float32)
ys0 = (k0 * xs0 + b0 + rng.normal(scale=0.1, size=[nsamples])).astype(np.float32)


def lr(xs, ys, steps=600, lr_=0.3):
    """Backend-agnostic linear regression: only tc.backend ops below."""

    def loss_pointwise(x, y, param):
        yp = param["k"] * x + param["b"]
        return (yp - y) ** 2

    # vmap over samples, then mean -> scalar loss
    vloss = K.vmap(loss_pointwise, vectorized_argnums=(0, 1))

    def loss(param):
        return K.mean(vloss(xs, ys, param))

    vg = K.jit(K.value_and_grad(loss))
    param = {"k": K.convert_to_tensor(np.float32(0.0)),
             "b": K.convert_to_tensor(np.float32(0.0))}
    for _ in range(steps):
        v, g = vg(param)
        param = K.tree_map(lambda p, gr: p - lr_ * gr, param, g)
    return param, float(v)


def main():
    xs = K.convert_to_tensor(xs0)
    ys = K.convert_to_tensor(ys0)
    param, final_loss = lr(xs, ys)
    k_fit, b_fit = float(param["k"]), float(param["b"])
    print(f"fit: k {k_fit:.4f} (true {k0}), b {b_fit:.4f} (true {b0}); "
          f"mse {final_loss:.5f}")
    # noise scale 0.1 -> parameter error O(0.1/sqrt(n)) ~ 0.01
    assert abs(k_fit - k0) < 0.05
    assert abs(b_fit - b0) < 0.05
    assert final_loss < 0.02
    # vmap path == hand-rolled batch math
    manual = float(np.mean((k_fit * xs0 + b_fit - ys0) ** 2))
    assert abs(manual - final_loss) < 1e-6
    print("OK")


if __name__ == "__main__":
    main()
