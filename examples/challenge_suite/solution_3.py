"""Challenge problem 3: probability-aware post-selected many-body cooling.

Spec: reference ``examples/challenge_suite/problem_3.md`` (baseline 2.46 s).
Post-selection is differentiable: each event projects an even qubit onto
|0>, records log p, and renormalizes; the loss couples the cooled TFIM
energy density to the mean log branch probability.  All 300 updates run in
one jitted ``lax.scan``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from tensorcircuit_ng_tpu.core import statevec as sv


def run_solution(config):
    n = config["n_qubits"]
    hx = config["transverse_field"]
    nsteps = config["n_steps"]
    wlog = config["log_probability_weight"]
    steps = config["max_steps"]
    lr = config["learning_rate"]

    pairs = [(i, i + 1) for i in range(n - 1)]
    even_bonds = [(i, i + 1) for i in range(0, n - 1, 2)]
    odd_bonds = [(i, i + 1) for i in range(1, n - 1, 2)]
    sel_qubits = list(range(0, n, 2))

    XX = np.kron([[0, 1], [1, 0]], [[0, 1], [1, 0]]).astype(complex)
    import scipy.linalg  # eigenbasis of XX for closed-form exp (commutes with ZZ diag? no)

    def bond_gate(txx, tzz):
        # exp[-i(txx XX + tzz ZZ)]: XX and ZZ commute on two qubits
        # (both diagonal in the Bell-like basis): split exactly
        # exp(-i tzz ZZ) diagonal; exp(-i txx XX) = cos I - i sin XX
        dzz = jnp.exp(-1j * tzz * jnp.asarray([1.0, -1.0, -1.0, 1.0]))
        m = jnp.cos(txx) * jnp.diag(dzz) - 1j * jnp.sin(txx) * (
            jnp.asarray(XX) * dzz[None, :]
        )
        return m

    def trajectory(params):
        bond_p, rx_p = params  # (nsteps, 6, 2), (nsteps, n)
        psi = jnp.full((2**n,), 2.0 ** (-n / 2), dtype=jnp.complex64)
        logps = []
        for t in range(nsteps):
            bonds = even_bonds if t % 2 == 0 else odd_bonds
            for b, (i, j) in enumerate(bonds):
                psi = sv.apply_unitary(psi, bond_gate(bond_p[t, b, 0], bond_p[t, b, 1]), [i, j])
            from tensorcircuit_ng_tpu.ops.gates import rx_matrix

            gates = jax.vmap(lambda th: rx_matrix(th).astype(jnp.complex64))(rx_p[t])
            from tensorcircuit_ng_tpu.core import kernels

            psi = kernels.fused_single_qubit_layer(psi, gates)
            for q in sel_qubits:
                proj = sv.project_slot(psi, q, 0, renormalize=False)
                p_event = jnp.real(jnp.vdot(proj, proj))
                logps.append(jnp.log(p_event + 1e-12))
                psi = proj / jnp.sqrt(p_event + 1e-12).astype(proj.dtype)
        return psi, jnp.stack(logps)

    def loss(params):
        psi, logps = trajectory(params)
        e = -jnp.real(sv.expectation_zz_sum(psi, pairs)) - hx * sv.expectation_x_sum(psi)
        return e / n - wlog * jnp.mean(logps), (e / n, jnp.mean(logps))

    import optax

    opt = optax.adam(lr)
    params0 = (
        jnp.zeros((nsteps, len(even_bonds), 2), jnp.float32) + 0.01,
        jnp.zeros((nsteps, n), jnp.float32) + 0.01,
    )
    ostate0 = opt.init(params0)

    def body(carry, _):
        p, os_ = carry
        (lv, (ed, mlp)), g = jax.value_and_grad(loss, has_aux=True)(p)
        up, os_ = opt.update(g, os_, p)
        return (optax.apply_updates(p, up), os_), (lv, ed, mlp)

    @jax.jit
    def train(p, os_):
        (pf, _), hist = jax.lax.scan(body, (p, os_), None, length=steps)
        return pf, hist

    pf, (lh, eh, ph) = train(params0, ostate0)
    return {
        "loss_history": np.asarray(lh, dtype=np.float64),
        "energy_density_history": np.asarray(eh, dtype=np.float64),
        "mean_log_probability_history": np.asarray(ph, dtype=np.float64),
        "final_parameters": [np.asarray(x, dtype=np.float64) for x in pf],
    }


if __name__ == "__main__":
    import time

    config = {
        "n_qubits": 12,
        "transverse_field": 0.9,
        "n_steps": 10,
        "log_probability_weight": 0.05,
        "max_steps": 300,
        "learning_rate": 0.01,
    }
    t0 = time.time()
    res = run_solution(config)
    dt = time.time() - t0
    eh = res["energy_density_history"]
    ph = res["mean_log_probability_history"]
    print(
        f"problem 3: {dt:.2f}s end-to-end (reference baseline 2.46s); "
        f"energy density {eh[0]:.5f} -> {eh[-1]:.5f}; mean log p {ph[-1]:.3f}"
    )
    assert eh[-1] < eh[0] - 1e-3
