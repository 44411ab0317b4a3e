"""Quantum continual learning with elastic weight consolidation
(reference ``examples/reproduce_papers/2021_quantum_continual_learning``
role, Jiang et al. 2021 scaled down).

One 6-qubit PQC BODY (shared parameters) with per-task readout HEADS
(<Z_0> for task A, <Z_5> for task B) learns two classification tasks
SEQUENTIALLY:

    task A: label = sign of a functional of features 0-2
    task B: label = sign of a functional of features 3-5

After task A, the diagonal FISHER INFORMATION of the task-A loss
(squared per-sample gradients through jit+vmap) anchors the shared
parameters with an EWC penalty lam * F_i (w_i - w_i^A)^2 while task B
trains.

Self-validating checks:

1. Plain sequential fine-tuning FORGETS: task-A accuracy collapses from
   1.00 to <= 0.8 while task B trains to >= 0.95.
2. EWC RETAINS: with the Fisher penalty (lam=30), BOTH tasks sit at
   >= 0.95 — continual learning succeeds with identical budgets.
3. The Fisher is anisotropic and steers the update: the top-quartile
   Fisher coordinates hold > 60% of the total Fisher mass, and the
   task-B parameter update under EWC is smaller along high-Fisher
   directions than along low-Fisher ones.

Reference behavior anchor: reproduce_papers/2021_quantum_continual_learning.
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

N, NLAYERS = 6, 3
NP = NLAYERS * 2 * N
EPOCHS, LAM = 250, 30.0
HEAD_A, HEAD_B = 0, 5


def make_task(rng, feats, m=32):
    x = rng.uniform(0, np.pi, (m, N)).astype(np.float32)
    w = np.zeros(N)
    w[feats] = rng.choice([-1.0, 1.0], len(feats)) * rng.uniform(0.8, 1.2, len(feats))
    y = (np.cos(x) @ w > 0).astype(np.float32) * 2 - 1
    return jnp.asarray(x), jnp.asarray(y)


def model(params, x, head):
    c = tc.Circuit(N)
    for i in range(N):
        c.rx(i, theta=x[i])
    p = params.reshape(NLAYERS, 2, N)
    for l in range(NLAYERS):
        for i in range(N):
            c.ry(i, theta=p[l, 0, i])
        for i in range(N - 1):
            c.cnot(i, i + 1)
        for i in range(N):
            c.rz(i, theta=p[l, 1, i])
    return 2.0 * jnp.real(c.expectation_ps(z=[head]))


def task_loss(params, xs, ys, head):
    out = jax.vmap(lambda x: model(params, x, head))(xs)
    return jnp.mean(jnp.log1p(jnp.exp(-3.0 * ys * out)))


def accuracy(params, xs, ys, head):
    out = np.asarray(jax.vmap(lambda x: model(params, x, head))(xs))
    return float((np.sign(out) == np.asarray(ys)).mean())


def train(params, xs, ys, head, penalty=None, epochs=EPOCHS):
    def loss(p):
        l = task_loss(p, xs, ys, head)
        if penalty is not None:
            fisher, anchor = penalty
            l = l + LAM * jnp.sum(fisher * (p - anchor) ** 2)
        return l

    vg = jax.jit(jax.value_and_grad(loss))
    opt = optax.adam(0.05)
    st = opt.init(params)
    for _ in range(epochs):
        l, g = vg(params)
        upd, st = opt.update(g, st)
        params = optax.apply_updates(params, upd)
    return params


def fisher_diag(params, xs, ys, head):
    per_sample = jax.jit(
        jax.vmap(
            lambda x, y: jax.grad(lambda p: task_loss(p, x[None], y[None], head))(params)
        )
    )(xs, ys)
    return jnp.mean(per_sample**2, axis=0)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    xa, ya = make_task(rng, [0, 1, 2])
    xb, yb = make_task(rng, [3, 4, 5])
    p0 = jnp.asarray(rng.normal(scale=0.1, size=NP), jnp.float32)

    pa = train(p0, xa, ya, HEAD_A)
    acc_a0 = accuracy(pa, xa, ya, HEAD_A)
    print(f"task A trained: acc = {acc_a0:.2f}")
    assert acc_a0 >= 0.95

    # [1] naive sequential fine-tuning forgets task A
    pb_naive = train(pa, xb, yb, HEAD_B)
    acc_a_naive = accuracy(pb_naive, xa, ya, HEAD_A)
    acc_b_naive = accuracy(pb_naive, xb, yb, HEAD_B)
    print(f"[1] naive: task B {acc_b_naive:.2f}, task A {acc_a0:.2f} -> {acc_a_naive:.2f}")
    assert acc_b_naive >= 0.95
    assert acc_a_naive <= 0.8

    # [2] EWC with the task-A Fisher retains task A
    f = fisher_diag(pa, xa, ya, HEAD_A)
    pb_ewc = train(pa, xb, yb, HEAD_B, penalty=(f, pa))
    acc_a_ewc = accuracy(pb_ewc, xa, ya, HEAD_A)
    acc_b_ewc = accuracy(pb_ewc, xb, yb, HEAD_B)
    print(f"[2] EWC:   task B {acc_b_ewc:.2f}, task A retained {acc_a_ewc:.2f}")
    assert acc_a_ewc >= 0.95 and acc_b_ewc >= 0.95

    # [3] the Fisher is anisotropic and steers the update
    f_np = np.asarray(f)
    order = np.argsort(f_np)
    q = NP // 4
    top_mass = f_np[order[-q:]].sum() / f_np.sum()
    delta = np.abs(np.asarray(pb_ewc - pa))
    move_hi = delta[order[-q:]].mean()
    move_lo = delta[order[:q]].mean()
    print(
        f"[3] Fisher top-quartile mass = {top_mass:.2f}; |dp| along high-F "
        f"{move_hi:.3f} < low-F {move_lo:.3f}"
    )
    assert top_mass > 0.6
    assert move_hi < move_lo
    print("OK: EWC with the quantum Fisher diagonal defeats catastrophic forgetting")
