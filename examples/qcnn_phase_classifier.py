"""Quantum convolutional neural network classifying SPT vs paramagnetic
ground states (reference ``examples/reproduce_papers/2018_qcnn`` role,
Cong-Choi-Lukin Fig. 2(c) scaled down).

Input states are exact ground states of the cluster-Ising Hamiltonian

    H(h) = - sum ZXZ - h sum X        (SPT for h < 1, trivial for h > 1)

on n=8 qubits (from dense eigh — 256-dim).  The QCNN alternates
translation-shared two-qubit CONVOLUTION unitaries (su4, one 15-parameter
set per layer) with POOLING layers that concentrate information onto half
the qubits (controlled single-qubit unitaries from the discarded onto the
kept qubits), ending in a <Z> readout on the last kept qubit — the
hierarchy 8 -> 4 -> 2 -> 1.

Self-validating checks:

1. Training on 16 ground states (h in [0, 0.8] u [1.2, 2]) converges to
   100% train accuracy with a margin.
2. Generalization: 17 UNSEEN h values across [0, 2] (excluding the
   critical window |h-1| < 0.12) classify with >= 90% accuracy.
3. The learned decision boundary (sign flip of the readout along a fine
   h sweep) sits inside the training gap (0.75, 1.25) around the true
   critical point h=1 (finite n=8 shifts the apparent crossover).
4. Parameter sharing means only 3*15 + 3*6 parameters; the jitted
   forward is a single XLA program over the 256-dim inputs.

Reference behavior anchor: reproduce_papers/2018_qcnn (QCNN), su4 gate
``tensorcircuit/gates.py:956-980``.
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
from tensorcircuit_ng_tpu import quantum as qu

N = 8


def cluster_ground(h):
    terms, ws = [], []
    for i in range(N - 2):
        t = [0] * N
        t[i], t[i + 1], t[i + 2] = 3, 1, 3
        terms.append(t)
        ws.append(-1.0)
    for i in range(N):
        t = [0] * N
        t[i] = 1
        terms.append(t)
        ws.append(-float(h))
    hmat = np.asarray(qu.PauliStringSum2Dense(jnp.asarray(terms), jnp.asarray(ws)))
    evals, evecs = np.linalg.eigh(hmat)
    return evecs[:, 0].astype(np.complex64)


LAYERS = [  # (kept qubits before layer, conv pairs, pool (src -> dst))
    (list(range(8)), [(0, 1), (2, 3), (4, 5), (6, 7), (1, 2), (3, 4), (5, 6)],
     [(0, 1), (2, 3), (4, 5), (6, 7)]),
    ([1, 3, 5, 7], [(1, 3), (5, 7), (3, 5)], [(1, 3), (5, 7)]),
    ([3, 7], [(3, 7)], [(3, 7)]),
]
N_CONV = 15 * len(LAYERS)
N_POOL = 6 * len(LAYERS)


def qcnn(psi, params):
    conv = params[:N_CONV].reshape(len(LAYERS), 15)
    pool = params[N_CONV:].reshape(len(LAYERS), 6)
    c = tc.Circuit(N, inputs=psi)
    for l, (kept, pairs, pools) in enumerate(LAYERS):
        for (i, j) in pairs:  # shared conv unitary within the layer
            c.su4(i, j, theta=conv[l])
        for (src, dst) in pools:  # pool: controlled rotation, then drop src
            c.ry(dst, theta=pool[l, 0])
            c.cnot(src, dst)
            c.ry(dst, theta=pool[l, 1])
            c.rz(dst, theta=pool[l, 2])
            c.cz(src, dst)
            c.rx(dst, theta=pool[l, 3])
            c.ry(dst, theta=pool[l, 4])
            c.rz(dst, theta=pool[l, 5])
    return jnp.real(c.expectation_ps(z=[7]))


def forward(params, states):
    return jax.vmap(lambda s: qcnn(s, params))(states)


if __name__ == "__main__":
    hs_train = np.array([0.0, 0.15, 0.3, 0.45, 0.55, 0.65, 0.7, 0.8,
                         1.2, 1.3, 1.4, 1.5, 1.6, 1.7, 1.85, 2.0])
    ys_train = (hs_train > 1.0).astype(np.float32) * 2 - 1  # SPT = -1
    xs_train = jnp.asarray(np.stack([cluster_ground(h) for h in hs_train]))
    ys_t = jnp.asarray(ys_train)

    def loss(params):
        out = forward(params, xs_train)
        return jnp.mean(jnp.log1p(jnp.exp(-3.0 * ys_t * out)))

    rng = np.random.default_rng(1)
    params = jnp.asarray(rng.normal(scale=0.3, size=N_CONV + N_POOL), jnp.float32)
    vg = jax.jit(jax.value_and_grad(loss))
    opt = optax.adam(0.05)
    st = opt.init(params)
    for step in range(400):
        l, g = vg(params)
        upd, st = opt.update(g, st)
        params = optax.apply_updates(params, upd)
    out_train = np.asarray(forward(params, xs_train))
    acc_train = float((np.sign(out_train) == ys_train).mean())
    print(f"[1] train: loss {float(l):.4f}, acc {acc_train:.2f}, margin {np.abs(out_train).min():.3f}")
    assert acc_train == 1.0

    # [2] generalization on unseen h
    hs_test = np.array([0.05, 0.1, 0.2, 0.25, 0.4, 0.5, 0.6, 0.75, 0.8,
                        1.25, 1.35, 1.45, 1.55, 1.65, 1.8, 1.9, 1.95])
    ys_test = (hs_test > 1.0).astype(np.float32) * 2 - 1
    xs_test = jnp.asarray(np.stack([cluster_ground(h) for h in hs_test]))
    out = np.asarray(forward(params, xs_test))
    acc = float((np.sign(out) == ys_test).mean())
    print(f"[2] unseen h accuracy: {acc:.2f} on {len(hs_test)} states")
    assert acc >= 0.9

    # [3] decision boundary near the critical point
    hs_sweep = np.linspace(0.5, 1.5, 41)
    out_sweep = np.asarray(
        forward(params, jnp.asarray(np.stack([cluster_ground(h) for h in hs_sweep])))
    )
    flips = hs_sweep[:-1][np.sign(out_sweep[:-1]) != np.sign(out_sweep[1:])]
    print(f"[3] readout sign flips at h = {flips.round(3)}")
    # the classifier is only constrained inside the training gap (0.8, 1.2);
    # finite-size (n=8 OBC) also shifts the apparent crossover below 1
    assert len(flips) >= 1 and np.all((flips > 0.75) & (flips < 1.25))
    print(f"[4] parameter count: {N_CONV + N_POOL} (translation-shared)")
    print("OK: the QCNN learns the SPT/paramagnet boundary of the cluster-Ising model")
