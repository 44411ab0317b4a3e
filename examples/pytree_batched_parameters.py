"""Structured (pytree) circuit parameters under vmap / vvag / optax.

Reference role: ``examples/batched_parameters_structures.py`` — circuit
parameters need not be one flat tensor: a nested dict/tuple pytree flows
through jit, vmap, grad and the optimizer untouched.  Functional jax makes
this free; the demo asserts it rather than claims it:

  1. a dict-of-tensors ansatz {"zz": (L, n-1), "rx": (L, n), "scale": ()}
     trains under optax with the SAME trajectory as an equivalent
     flat-tensor parametrization (bitwise-equal initial energies, equal
     final energies to f32);
  2. ``K.vvag`` (vectorized value-and-grad) over a BATCH of pytrees gives
     per-sample grads identical to a python loop of per-sample grads;
  3. tree-structured gradients preserve the structure (same treedef).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

import tensorcircuit_ng_tpu as tc

K = tc.set_backend("jax")

n, L, batch = 6, 2, 4
pairs = [(i, i + 1) for i in range(n - 1)]


def energy_tree(params):
    c = tc.Circuit(n)
    c.h_layer()
    for l in range(L):
        c.zzrx_layer(
            pairs,
            params["scale"] * params["zz"][l],
            params["scale"] * params["rx"][l],
        )
    return jnp.real(c.expectation_zzx_energy(pairs, 1.0, -1.0))


def energy_flat(flat):
    zz = jnp.reshape(flat[: L * (n - 1)], (L, n - 1))
    rx = jnp.reshape(flat[L * (n - 1) : L * (2 * n - 1)], (L, n))
    scale = flat[-1]
    return energy_tree({"zz": zz, "rx": rx, "scale": scale})


rng = np.random.default_rng(9)
tree0 = {
    "zz": jnp.asarray(rng.normal(size=(L, n - 1)) * 0.2, jnp.float32),
    "rx": jnp.asarray(rng.normal(size=(L, n)) * 0.2, jnp.float32),
    "scale": jnp.asarray(1.0, jnp.float32),
}
flat0 = jnp.concatenate(
    [jnp.ravel(tree0["zz"]), jnp.ravel(tree0["rx"]), tree0["scale"][None]]
)

# --- 1. identical training trajectories, tree vs flat --------------------
def train(energy, p):
    vg = jax.jit(jax.value_and_grad(energy))
    opt = optax.adam(0.05)
    state = opt.init(p)
    for _ in range(100):
        v, g = vg(p)
        upd, state = opt.update(g, state)
        p = optax.apply_updates(p, upd)
    return float(vg(p)[0])


e0t = float(jax.jit(energy_tree)(tree0))
e0f = float(jax.jit(energy_flat)(flat0))
assert e0t == e0f, (e0t, e0f)  # bitwise: same ops, same order
et = train(energy_tree, tree0)
ef = train(energy_flat, flat0)
print(f"tree-trained E = {et:.6f}, flat-trained E = {ef:.6f}")
assert abs(et - ef) < 1e-4

# --- 2. vvag over a batch of pytrees vs a python loop --------------------
trees = {
    "zz": jnp.asarray(rng.normal(size=(batch, L, n - 1)) * 0.2, jnp.float32),
    "rx": jnp.asarray(rng.normal(size=(batch, L, n)) * 0.2, jnp.float32),
    "scale": jnp.ones((batch,), jnp.float32),
}
vvag = K.jit(K.vvag(energy_tree, argnums=0, vectorized_argnums=0))
vs, gs = vvag(trees)
for b in range(batch):
    one = {k: v[b] for k, v in trees.items()}
    v1, g1 = jax.value_and_grad(energy_tree)(one)
    assert abs(float(vs[b]) - float(v1)) < 1e-5
    for k in one:
        np.testing.assert_allclose(
            np.asarray(gs[k][b]), np.asarray(g1[k]), atol=1e-5
        )
print(f"vvag over {batch} pytree samples == per-sample grads")

# --- 3. gradient treedef preserved ---------------------------------------
g_tree = jax.grad(energy_tree)(tree0)
assert jax.tree.structure(g_tree) == jax.tree.structure(tree0)
assert g_tree["zz"].shape == (L, n - 1) and g_tree["scale"].shape == ()
print("gradient pytree structure preserved")
print("OK")
