"""Variational MERA energy with an MPO-form Hamiltonian expectation.

Reference role: ``examples/mera_extra_mpo.py`` — a multi-scale
entanglement renormalization ansatz optimized against an MPO Hamiltonian
(the reference routes tenpy MPOs through quimb; here the MPO is built
directly as a :class:`QuOperator` from the standard 3x3 TFIM block form
via :func:`quantum.tn2qop`).

Self-validation at n=8, g=1: the exact critical-TFIM ground energy is
computed by dense diagonalization; the trained MERA (brick-wall of
two-qubit unitaries with log-depth top tensors) must land within 1% —
MERA's natural regime IS the critical point — and the MPO expectation
must agree with the dense-Hamiltonian expectation to f32 round-off.
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

n, g = 8, 1.0
STEPS = 800


def tfim_mpo_tensors(n, g):
    """(wl, out, in, wr) numpy blocks (tn2qop convention) of
    H = -sum ZZ - g sum X."""
    X = np.array([[0, 1], [1, 0.0]])
    Z = np.diag([1.0, -1.0])
    I = np.eye(2)
    W = np.zeros((3, 2, 2, 3))  # (wl, s_out, s_in, wr)
    W[0, :, :, 0] = I
    W[1, :, :, 0] = Z
    W[2, :, :, 0] = -g * X
    W[2, :, :, 1] = -Z
    W[2, :, :, 2] = I
    return [
        (W[2:3] if i == 0 else (W[:, :, :, 0:1] if i == n - 1 else W)).astype(
            np.complex64
        )
        for i in range(n)
    ]


def su4(params):
    """Two-qubit unitary from 15 params: exp(-i sum_k p_k P_k)."""
    paulis = [np.eye(2), np.array([[0, 1], [1, 0]]),
              np.array([[0, -1j], [1j, 0]]), np.diag([1, -1])]
    basis = np.stack([
        np.kron(a, b) for i, a in enumerate(paulis) for j, b in enumerate(paulis)
        if (i, j) != (0, 0)
    ]).astype(np.complex64)
    h = jnp.einsum("k,kab->ab", params.astype(jnp.complex64), jnp.asarray(basis))
    return jax.scipy.linalg.expm(-1j * h)


def mera(params):
    """Brick-wall MERA: disentangler + isometry alternation, log2(n) scales."""
    c = tc.Circuit(n)
    idx = 0
    # scale 1: two rounds of the full brick wall (disentangler depth)
    for _rep in range(2):
        for layer_pairs in ([(i, i + 1) for i in range(0, n - 1, 2)],
                            [(i, i + 1) for i in range(1, n - 1, 2)]):
            for (a, b) in layer_pairs:
                c.any(a, b, unitary=su4(params[idx])); idx += 1
    # scale 2: stride-2 couplings (renormalized sites)
    for (a, b) in [(0, 2), (4, 6), (2, 4)]:
        c.any(a, b, unitary=su4(params[idx])); idx += 1
    # scale 3: stride-4 top tensor
    c.any(0, 4, unitary=su4(params[idx])); idx += 1
    return c, idx


N_BLOCKS = 14 + 3 + 1


def main():
    mpo = qu.tn2qop(tfim_mpo_tensors(n, g))
    h_dense = np.asarray(qu.PauliStringSum2Dense(
        [[3 if k in (i, i + 1) else 0 for k in range(n)] for i in range(n - 1)]
        + [[1 if k == i else 0 for k in range(n)] for i in range(n)],
        [-1.0] * (n - 1) + [-g] * n,
    ))
    e_exact = float(np.linalg.eigvalsh(h_dense)[0])

    h_dense_j = jnp.asarray(h_dense)

    @jax.jit
    def energy(params):
        c, _ = mera(params)
        psi = c.state()
        return jnp.real(psi.conj() @ (h_dense_j @ psi))

    mpo_mat = jnp.asarray(mpo.eval_matrix())  # QuOperator -> dense once

    @jax.jit
    def energy_mpo(params):
        c, _ = mera(params)
        psi = c.state()
        return jnp.real(psi.conj() @ (mpo_mat @ psi))

    rng = np.random.default_rng(42)
    params = jnp.asarray(rng.normal(size=(N_BLOCKS, 15)) * 0.1, jnp.float32)
    opt = optax.adam(optax.cosine_decay_schedule(0.03, STEPS, 0.05))
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(energy))
    for i in range(STEPS):
        v, grad = vg(params)
        upd, state = opt.update(grad, state)
        params = optax.apply_updates(params, upd)
    e_mera = float(energy(params))
    e_mpo = float(energy_mpo(params))
    rel = (e_mera - e_exact) / abs(e_exact)
    print(f"critical TFIM n={n}: exact GS {e_exact:.6f}, MERA {e_mera:.6f} "
          f"(rel err {rel:.2%})")
    print(f"MPO-form expectation: {e_mpo:.6f} (dense {e_mera:.6f})")
    assert abs(e_mpo - e_mera) < 1e-3  # QuOperator MPO == dense H
    assert rel < 0.01, rel  # MERA captures the critical point to <1%
    print("OK")


if __name__ == "__main__":
    main()
