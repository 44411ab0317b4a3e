"""Quantum Circuit Born Machine: generative modeling with an MMD loss
(reference ``examples/reproduce_papers/2018_qcbm`` role, Liu & Wang 2018).

An n=8 Born machine p(x) = |<x|U(theta)|0>|^2 is trained to reproduce a
bimodal Gaussian-mixture target over bitstring integers, using the
kernel MMD loss

    L = || E_{x~p} phi(x) - E_{x~q} phi(x) ||^2
      = <K>_{pp} - 2 <K>_{pq} + <K>_{qq}

with a multi-bandwidth RBF kernel, computed EXACTLY from the state
probabilities (the paper's exact-gradient setting), jitted end to end.

Self-validating checks:

1. The MMD loss with the exact kernel is a proper divergence here:
   L(q, q) = 0 and L(p0, q) > 0 for the untrained circuit.
2. Training drives total variation distance TV(p, q) below 0.08 (from
   ~0.5 untrained) and MMD below 5e-4 (from 0.23).
3. The learned distribution is genuinely bimodal: both target modes
   carry >= 80% of their target mass, and sampling from the circuit
   (``c.sample`` with fixed PRNG) produces an empirical histogram whose
   mode locations match.

Reference behavior anchor: ``reproduce_papers/2018_qcbm`` (MMD QCBM).
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

N, NLAYERS = 8, 6
DIM = 2**N


def target_dist():
    xs = np.arange(DIM)
    q = np.exp(-((xs - 70) ** 2) / (2 * 20**2)) + 0.7 * np.exp(
        -((xs - 180) ** 2) / (2 * 14**2)
    )
    return jnp.asarray(q / q.sum(), jnp.float32)


def kernel_matrix():
    xs = np.arange(DIM, dtype=np.float64)
    d2 = (xs[:, None] - xs[None, :]) ** 2
    k = sum(np.exp(-d2 / (2 * s)) for s in (0.25, 4.0, 64.0, 1024.0))
    return jnp.asarray(k, jnp.float32)


def probs(params):
    c = tc.Circuit(N)
    p = params.reshape(NLAYERS, 2, N)
    for i in range(N):
        c.h(i)
    for l in range(NLAYERS):
        for i in range(N):
            c.rz(i, theta=p[l, 0, i])
            c.rx(i, theta=p[l, 1, i])
        for i in range(l % 2, N - 1, 2):
            c.cnot(i, i + 1)
    return jnp.abs(c.state()) ** 2


K_MAT = kernel_matrix()
Q = target_dist()


def mmd(p, q):
    d = p - q
    return d @ (K_MAT @ d)


if __name__ == "__main__":
    rng = np.random.default_rng(7)
    params = jnp.asarray(rng.normal(scale=0.1, size=NLAYERS * 2 * N), jnp.float32)

    # [1] proper divergence
    assert float(mmd(Q, Q)) < 1e-10
    l0 = float(mmd(probs(params), Q))
    tv0 = 0.5 * float(jnp.abs(probs(params) - Q).sum())
    print(f"[1] MMD(q,q) = 0; untrained MMD = {l0:.5f}, TV = {tv0:.3f}")
    assert l0 > 1e-4

    # [2] train
    loss = jax.jit(jax.value_and_grad(lambda th: mmd(probs(th), Q)))
    opt = optax.adam(0.05)
    st = opt.init(params)
    for step in range(600):
        l, g = loss(params)
        upd, st = opt.update(g, st)
        params = optax.apply_updates(params, upd)
    p_fin = probs(params)
    tv = 0.5 * float(jnp.abs(p_fin - Q).sum())
    print(f"[2] trained: MMD = {float(l):.2e}, TV(p, q) = {tv:.4f}")
    assert float(l) < 5e-4 and tv < 0.08

    # [3] bimodality + sampling histogram
    p_np = np.asarray(p_fin)
    for lo, hi, label in ((40, 100, "mode@70"), (150, 210, "mode@180")):
        mass_p = p_np[lo:hi].sum()
        mass_q = float(np.asarray(Q)[lo:hi].sum())
        print(f"[3] {label}: learned mass {mass_p:.3f} vs target {mass_q:.3f}")
        assert mass_p > 0.8 * mass_q
    c = tc.Circuit(N)  # rebuild for sampling with trained params
    p = params.reshape(NLAYERS, 2, N)
    for i in range(N):
        c.h(i)
    for l in range(NLAYERS):
        for i in range(N):
            c.rz(i, theta=p[l, 0, i])
            c.rx(i, theta=p[l, 1, i])
        for i in range(l % 2, N - 1, 2):
            c.cnot(i, i + 1)
    samples = c.sample(batch=4096, allow_state=True, format="count_dict_bin",
                       random_generator=jax.random.PRNGKey(0))
    ints = np.array([int(k, 2) for k, v in samples.items() for _ in range(int(v))])
    frac_modes = ((ints >= 40) & (ints < 100)).mean() + ((ints >= 150) & (ints < 210)).mean()
    frac_exact = float(p_np[40:100].sum() + p_np[150:210].sum())
    sig = np.sqrt(frac_exact * (1 - frac_exact) / 4096)
    print(
        f"[3] 4096 circuit samples: {frac_modes:.2%} in the mode windows "
        f"(exact state mass {frac_exact:.2%} +- {sig:.2%})"
    )
    assert abs(frac_modes - frac_exact) < 4 * sig + 1e-3  # sampler matches state
    assert frac_modes > 0.75  # mass concentrated on the two modes
    print("OK: the Born machine learns the bimodal target (exact-MMD QCBM)")
