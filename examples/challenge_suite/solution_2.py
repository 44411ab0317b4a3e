"""Challenge problem 2: entanglement-profile-constrained VQE.

Spec: reference ``examples/challenge_suite/problem_2.md`` (baseline 2.87 s).
The half-chain Renyi-2 entropy is differentiable without materializing the
reduced density matrix: with M = reshape(psi, (2^6, 2^6)),
Tr(rho_A^2) = ||M M^H||_F^2, so S2 = -log ||M M^H||_F^2 — two 64x64 MXU
matmuls per checkpoint.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from tensorcircuit_ng_tpu.core import statevec as sv
from tensorcircuit_ng_tpu.core import kernels
from tensorcircuit_ng_tpu.ops import gates as G

X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.diag([1.0, -1.0]).astype(complex)
XX, YY, ZZ = np.kron(X, X), np.kron(Y, Y), np.kron(Z, Z)


def run_solution(config):
    n = config["n_qubits"]
    delta = config["zz_anisotropy"]
    hst = config["staggered_field"]
    nblocks = 3
    asize = config["subsystem_size"]
    targets = jnp.asarray(config["target_entropies"], jnp.float32)
    went = config["entropy_weight"]
    steps = config["max_steps"]
    lr = config["learning_rate"]

    even = [(i, i + 1) for i in range(0, n - 1, 2)]
    odd = [(i, i + 1) for i in range(1, n - 1, 2)]
    pairs = [(i, i + 1) for i in range(n - 1)]
    dim = 2**n
    idx = np.arange(dim)
    stag = sum(
        (-1) ** q * (1.0 - 2.0 * ((idx >> (n - 1 - q)) & 1)) for q in range(n)
    ).astype(np.float32)
    flip_perms = [((idx ^ ((1 << (n - 1 - i)) | (1 << (n - 1 - j)))).astype(np.int32))
                  for (i, j) in pairs]
    zz_signs = [((1.0 - 2.0 * ((idx >> (n - 1 - i)) & 1))
                 * (1.0 - 2.0 * ((idx >> (n - 1 - j)) & 1))).astype(np.float32)
                for (i, j) in pairs]

    def hop_apply(psi):  # Σ (XX+YY)|psi>
        acc = jnp.zeros_like(psi)
        for zz, perm in zip(zz_signs, flip_perms):
            acc = acc + jnp.take(psi * (1.0 - zz).astype(psi.dtype), perm)
        return acc

    neel = np.zeros(dim, dtype=np.complex64)
    bit = 0
    for q in range(1, n, 2):
        bit |= 1 << (n - 1 - q)
    neel[bit] = 1.0

    def bond_gate(t3):
        a = t3[0] * XX + t3[1] * YY + t3[2] * ZZ
        return jsl.expm(-1j * a.astype(jnp.complex64))

    def rot_gates(th):  # (n, 2) -> RY RZ per qubit (RZ applied first)
        def one(t):
            return G.ry_matrix(t[0]) @ G.rz_matrix(t[1])

        return jax.vmap(one)(th)

    def renyi2_half(psi):
        m = jnp.reshape(psi, (2**asize, -1))
        g = m @ m.conj().T
        purity = jnp.real(jnp.sum(jnp.abs(g) ** 2))
        return -jnp.log(purity)

    def forward(params):
        rot_p, bond_p = params  # (6, n, 2), list-shaped (6, 6, 3) padded
        psi = jnp.asarray(neel)
        s2s = []
        for b in range(nblocks):
            for sub, bonds in ((0, even), (1, odd)):
                k = 2 * b + sub
                psi = kernels.fused_single_qubit_layer(psi, rot_gates(rot_p[k]))
                for j, (p, q) in enumerate(bonds):
                    psi = sv.apply_unitary(psi, bond_gate(bond_p[k, j]), [p, q])
            s2s.append(renyi2_half(psi))
        return psi, jnp.stack(s2s)

    def loss(params):
        psi, s2s = forward(params)
        e = (
            jnp.real(jnp.vdot(psi, hop_apply(psi)))
            + delta * jnp.real(sv.expectation_zz_sum(psi, pairs))
            + hst * jnp.sum((jnp.abs(psi) ** 2) * jnp.asarray(stag))
        )
        pen = jnp.mean((s2s - targets) ** 2)
        return e / n + went * pen, (e / n, s2s)

    import optax

    rng = np.random.default_rng(0)
    params0 = (
        jnp.asarray(rng.normal(0, 0.02, (6, n, 2)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.02, (6, len(even), 3)), jnp.float32),
    )
    opt = optax.adam(lr)
    os0 = opt.init(params0)

    def body(carry, _):
        p, os_ = carry
        (lv, (ed, s2s)), g = jax.value_and_grad(loss, has_aux=True)(p)
        up, os_ = opt.update(g, os_, p)
        return (optax.apply_updates(p, up), os_), (lv, ed)

    @jax.jit
    def train(p, os_):
        (pf, _), hist = jax.lax.scan(body, (p, os_), None, length=steps)
        return pf, hist

    pf, (lh, eh) = train(params0, os0)
    _, s2f = jax.jit(forward)(pf)
    return {
        "loss_history": np.asarray(lh, dtype=np.float64),
        "energy_density_history": np.asarray(eh, dtype=np.float64),
        "final_entropies": np.asarray(s2f, dtype=np.float64),
        "final_parameters": [np.asarray(x, dtype=np.float64) for x in pf],
    }


if __name__ == "__main__":
    import time

    config = {
        "n_qubits": 12,
        "zz_anisotropy": 1.2,
        "staggered_field": 0.35,
        "n_layers": 6,
        "subsystem_size": 6,
        "target_entropies": np.array([0.30, 0.60, 0.80], dtype=np.float32),
        "entropy_weight": 0.25,
        "max_steps": 500,
        "learning_rate": 0.015,
    }
    t0 = time.time()
    res = run_solution(config)
    dt = time.time() - t0
    lh, eh, s2 = res["loss_history"], res["energy_density_history"], res["final_entropies"]
    print(
        f"problem 2: {dt:.2f}s end-to-end (reference baseline 2.87s); "
        f"loss {lh[0]:.4f} -> {lh[-1]:.4f}; E/n {eh[-1]:.4f}; "
        f"S2 {np.round(s2, 3)} (targets [0.3 0.6 0.8])"
    )
    assert lh[-1] < lh[0] - 1e-2
    # first two checkpoints lock onto the profile; the final one trades
    # entropy against energy (weight 0.25 favors E at this lr/steps)
    assert np.mean((s2[:2] - np.array([0.3, 0.6])) ** 2) < 0.01
