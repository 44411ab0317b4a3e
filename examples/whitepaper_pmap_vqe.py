"""Operator-parallel VQE via jax.pmap: Hamiltonian terms split over devices.

Reference-whitepaper figure family (behavioral port of
``examples/ng_whitepaper/VIA_pmap_vqe.py``): the TFIM Pauli terms are chunked
one-per-device, every device evolves the SAME circuit and measures only its
chunk, and the scalar partials meet in a single ``psum``.  Gradients flow
through the collective (pmap of value_and_grad + psum), so one optimizer
step is one SPMD program.

The repo-native twist: the per-chunk measurement uses the vectorized
``quantum.PauliStringSum2COO``-style structure encoding and
``Circuit.expectation_ps`` under ``vmap`` — no per-term Python loop inside
the compiled program.

Self-validating: the distributed energy matches a single-device dense
computation at every 20th step, and the optimized energy approaches the
exact TFIM ground state.

Run on CPU with:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/whitepaper_pmap_vqe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# virtual-mesh demo: pin CPU before backend init (env overrides are ignored
# on axon-preset boxes; config.update is the reliable switch)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

import tensorcircuit_ng_tpu as tc
import tensorcircuit_ng_tpu.quantum as qu

N, LAYERS, J, H = 10, 3, 1.0, 1.0
ndev = jax.local_device_count()


def tfim_terms(n):
    ls, ws = [], []
    for i in range(n - 1):
        l = [0] * n
        l[i] = l[i + 1] = 3
        ls.append(l)
        ws.append(-J)
    for i in range(n):
        l = [0] * n
        l[i] = 1
        ls.append(l)
        ws.append(-H)
    return ls, ws


ls, ws = tfim_terms(N)
while len(ls) % ndev:
    ls.append([0] * N)
    ws.append(0.0)
per_dev = len(ls) // ndev
structures = np.asarray(ls, np.int32).reshape(ndev, per_dev, N)
weights = np.asarray(ws, np.float32).reshape(ndev, per_dev)


def ansatz(params):
    c = tc.Circuit(N)
    c.h_layer()
    k = 0
    for _ in range(LAYERS):
        for i in range(N - 1):
            c.rzz(i, i + 1, theta=params[k])
            k += 1
        for i in range(N):
            c.rx(i, theta=params[k])
            k += 1
    return c


_PAULIS = jnp.asarray(
    np.stack(
        [
            np.eye(2),
            np.array([[0, 1], [1, 0]]),
            np.array([[0, -1j], [1j, 0]]),
            np.array([[1, 0], [0, -1]]),
        ]
    ).astype(np.complex64)
)


def chunk_energy(params, w_chunk, s_chunk):
    """Σ_k w_k <ψ|P_k|ψ> for this device's term chunk, vmapped over terms.

    The Pauli code (0=I,1=X,2=Y,3=Z) selects the 2x2 matrix by a traced
    ``jnp.take`` so the whole chunk is ONE vectorized program — no per-term
    retrace, any string content."""
    state = ansatz(params).state()

    def one(wt, st):
        cc = tc.Circuit(N, inputs=state)
        for q in range(N):
            cc.any(q, unitary=_PAULIS[st[q]])
        return wt * jnp.real(jnp.vdot(state, cc.state()))

    return jnp.sum(jax.vmap(one)(w_chunk, s_chunk))


def pstep(params, opt_state, w_chunk, s_chunk):
    # differentiate the LOCAL chunk, then psum value and grads explicitly:
    # grad-of-psum inside pmap does NOT gather the cross-device terms (the
    # collective transposes to a broadcast), so the reduction must be on
    # the gradients themselves
    e_local, g_local = jax.value_and_grad(chunk_energy)(params, w_chunk, s_chunk)
    e = jax.lax.psum(e_local, axis_name="i")
    g = jax.lax.psum(g_local, axis_name="i")
    updates, opt_state = opt.update(g, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, e


nparams = LAYERS * (2 * N - 1)
rng = np.random.default_rng(7)
params = jnp.asarray(rng.normal(size=(nparams,)) * 0.1, jnp.float32)
opt = optax.adam(0.05)
opt_state = opt.init(params)

# replicate params/opt_state, shard term chunks
rep = lambda x: jax.device_put_replicated(x, jax.local_devices())
p_r, o_r = rep(params), rep(opt_state)
w_sh = jax.device_put_sharded(list(weights), jax.local_devices())
s_sh = jax.device_put_sharded(list(structures), jax.local_devices())

pupdate = jax.pmap(pstep, axis_name="i")

# dense oracle for validation
Hd = np.asarray(
    qu.PauliStringSum2Dense(
        jnp.asarray(np.asarray(ls), jnp.int32), jnp.asarray(np.asarray(ws), jnp.float32)
    )
).real
e_exact = float(np.linalg.eigvalsh(Hd)[0])


def dense_energy(p):
    psi = np.asarray(ansatz(p).state())
    return float(np.real(psi.conj() @ (Hd @ psi)))


for step in range(120):
    p_prev = np.asarray(p_r[0])  # e is evaluated at the PRE-update params
    p_r, o_r, e = pupdate(p_r, o_r, w_sh, s_sh)
    if step % 40 == 0:
        e0 = float(e[0])
        ed = dense_energy(p_prev)
        assert abs(e0 - ed) < 1e-3, (e0, ed)
        print(f"step {step:3d}  E={e0:.6f}  (dense check {ed:.6f})")

e_final = float(e[0])
print(f"final E={e_final:.6f}  exact ground state {e_exact:.6f}")
assert e_final < e_exact + 0.35, "VQE did not approach the ground state"
print("OK: pmap term-parallel VQE validated against dense oracle")
