"""Randomness under jit/vmap: keys, status tensors, and MC trajectories.

Reference role: ``examples/vmap_randomness.py`` — the interplay between
jit, vmap and random generation.  The reference demos ``stateful_randn``
key plumbing on two backends; the tpu framework is jax-only, where the
rules are sharper and worth stating as executable facts:

  1. a PRNG key is explicit data: the same key into a jitted function
     yields bit-identical samples, split keys yield independent streams;
  2. vmapping over a batch of keys gives per-row independent randomness
     (never broadcast one key across vmap rows);
  3. the framework's *status* convention (uniform [0,1) tensors driving
     measurement collapse / ``unitary_kraus`` choices) composes with vmap:
     a vmapped batch of Monte-Carlo noise trajectories with independent
     statuses reproduces the exact density-matrix channel average.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc

K = tc.set_backend("jax")
n, batch = 6, 512

# --- 1. keys are explicit, deterministic data ----------------------------
@K.jit
def f(a, key):
    return a + K.stateful_randn(key, [n])


key = K.get_random_state(42)
r1 = np.asarray(f(K.ones([n], dtype="float32"), key))
r2 = np.asarray(f(K.ones([n], dtype="float32"), key))
np.testing.assert_array_equal(r1, r2)  # same key -> identical samples
k1, k2 = jax.random.split(key)
r3 = np.asarray(f(K.ones([n], dtype="float32"), k1))
assert np.abs(r1 - r3).max() > 1e-3  # split keys -> different streams
print("1. same-key determinism + split-key independence: OK")

# --- 2. vmap over keys -> independent rows -------------------------------
keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(batch))
vf = K.jit(jax.vmap(f, in_axes=(0, 0)))
rows = np.asarray(vf(K.ones([batch, n], dtype="float32"), keys))
# all rows distinct, and the batch mean concentrates around the base value
assert len({rows[i].tobytes() for i in range(batch)}) == batch
assert np.abs(rows.mean() - 1.0) < 5.0 / np.sqrt(batch * n)
print("2. vmapped keys give independent rows: OK")

# --- 3. status-driven MC trajectories vs the exact DM channel ------------
gamma = 0.25
px = 0.3


def trajectory(theta, status):
    c = tc.Circuit(n)
    for i in range(n):
        c.rx(i, theta=theta)
    for i in range(n - 1):
        c.cnot(i, i + 1)
    # one stochastic X error per qubit, chosen by the status entries
    for i in range(n):
        c.unitary_kraus(
            [np.sqrt(1 - px) * np.eye(2), np.sqrt(px) * tc.gates._x_matrix],
            i,
            status=status[i],
        )
    return jnp.real(c.expectation_ps(z=[n // 2]))


vtraj = K.jit(jax.vmap(trajectory, in_axes=(None, 0)))
statuses = jax.random.uniform(key, (batch, n))
mc = float(np.mean(np.asarray(vtraj(0.7, statuses))))

dmc = tc.DMCircuit(n)
for i in range(n):
    dmc.rx(i, theta=0.7)
for i in range(n - 1):
    dmc.cnot(i, i + 1)
for i in range(n):
    dmc.generaldepolarizing(i, p=(px, 0.0, 0.0))
exact = float(np.real(dmc.expectation_ps(z=[n // 2])))

se = float(np.std(np.asarray(vtraj(0.7, statuses)))) / np.sqrt(batch)
print(f"3. MC <Z_{n//2}> = {mc:.4f} vs DM exact {exact:.4f} "
      f"(se {se:.4f})")
assert abs(mc - exact) < 4 * se + 1e-3
print("OK")
