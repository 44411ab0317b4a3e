"""Composing jit / vmap / grad / vectorized_value_and_grad over circuits
(reference ``examples/nested_vmap_grad.py``, ``matprod_vmap.py`` and
``vmap_randomness.py`` roles).

Four composition patterns that production QML code leans on, each checked
against a straightforward loop implementation:

1. vmap over DATA x grad over WEIGHTS (the QML workhorse): per-sample
   gradients of a parameterized circuit expectation, batched in one XLA
   program via ``K.vmap`` + ``K.grad`` composed in both orders.
2. NESTED vmap: a (3 x 4) grid of (data, weight) pairs evaluated by
   vmap(vmap(f)) matches the 12 pointwise evaluations.
3. vvag (``vectorized_value_and_grad``): batch values + shared-weight
   gradient accumulation equals the sum of per-sample gradients.
4. RANDOMNESS under jit+vmap: per-trajectory sampling with split PRNG
   keys is reproducible (same key -> same samples) and independent
   (different keys -> different samples), via the backend
   ``stateful_randn`` surface inside a jitted vmap.

Reference behavior anchors: ``tensorcircuit/backends/jax_backend.py``
(vmap/grad/vvag), ``examples/nested_vmap_grad.py:1-60``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

K = tc.backend
N = 4


def f(theta, alpha):
    """<Z0> of a 2-layer ansatz: theta = data angles, alpha = weights."""
    c = tc.Circuit(N)
    for j in range(2):
        for i in range(N):
            c.rx(i, theta=theta[j])
            c.ry(i, theta=alpha[j])
        for i in range(N - 1):
            c.cnot(i, i + 1)
    return jnp.real(c.expectation_ps(z=[0]))


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    thetas = jnp.asarray(rng.normal(size=(3, 2)), jnp.float32)  # batch of data
    alphas = jnp.asarray(rng.normal(size=(2,)), jnp.float32)  # shared weights

    # [1] vmap-over-data of grad-over-weights, both orders
    g_inner = K.jit(K.vmap(K.grad(f, argnums=1), vectorized_argnums=0))
    gs = np.asarray(g_inner(thetas, alphas))
    gs_loop = np.stack(
        [np.asarray(K.grad(f, argnums=1)(t, alphas)) for t in thetas]
    )
    assert np.allclose(gs, gs_loop, atol=1e-6)
    # grad of the batch-mean via grad-of-vmap (outer grad, inner vmap)
    def batch_mean(a):
        return jnp.mean(K.vmap(f, vectorized_argnums=0)(thetas, a))

    g_outer = np.asarray(K.jit(K.grad(batch_mean))(alphas))
    assert np.allclose(g_outer, gs_loop.mean(axis=0), atol=1e-6)
    print(f"[1] vmap(grad) == loop and grad(vmap) == mean: g = {g_outer}")

    # [2] nested vmap over a (3 x 4) grid
    alphas_grid = jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)
    ff = K.jit(
        K.vmap(K.vmap(f, vectorized_argnums=1), vectorized_argnums=0)
    )
    grid = np.asarray(ff(thetas, alphas_grid))
    loop = np.array([[float(f(t, a)) for a in alphas_grid] for t in thetas])
    assert grid.shape == (3, 4) and np.allclose(grid, loop, atol=1e-6)
    print(f"[2] nested vmap grid (3,4): max |dv| = {np.abs(grid - loop).max():.2e}")

    # [3] vvag: values for each sample + gradient summed over the batch
    vvag = K.jit(K.vectorized_value_and_grad(f, argnums=1, vectorized_argnums=0))
    vals, grad = vvag(thetas, alphas)
    assert np.allclose(
        np.asarray(vals), np.array([float(f(t, alphas)) for t in thetas]), atol=1e-6
    )
    assert np.allclose(np.asarray(grad), gs_loop.sum(axis=0), atol=1e-5)
    print(f"[3] vvag: batch values {np.asarray(vals).round(4)}, grad == sum of per-sample")

    # [4] randomness under jit+vmap with split keys
    def traj(key):
        noise = K.stateful_randn(key, shape=[2], stddev=0.1)
        return f(thetas[0] + noise, alphas)

    vtraj = K.jit(K.vmap(traj))
    key = K.get_random_state(42)
    keys = jax.random.split(key, 8)
    r1, r2 = np.asarray(vtraj(keys)), np.asarray(vtraj(keys))
    r3 = np.asarray(vtraj(jax.random.split(K.get_random_state(7), 8)))
    assert np.allclose(r1, r2)  # reproducible
    assert not np.allclose(r1, r3)  # key-dependent
    assert len(np.unique(r1.round(6))) > 1  # per-lane keys differ
    print(f"[4] jit+vmap randomness: reproducible, key-dependent, lane-independent")
    print("OK: vmap/grad/vvag/randomness compose as documented")
