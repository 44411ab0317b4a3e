"""Challenge problem 7: 16-qubit measurement-feedback VQE.

Spec: reference ``examples/challenge_suite/problem_7.md`` (baseline 63.84 s).
Mid-circuit measurement with classical feedback, fully traced: the ancilla
outcome m comes from the externalized-status convention (status < p0),
projection+renormalization stay differentiable, and the feedback RZZ angle
is the branch-select (1-m)*theta0 + m*theta1.  All 64 trajectories run as
one vmap with FIXED per-trajectory uniforms; 100 Adam updates in one scan.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from tensorcircuit_ng_tpu.core import statevec as sv
from tensorcircuit_ng_tpu.core import kernels
from tensorcircuit_ng_tpu.ops import gates as G

CNOT = np.asarray(G.GATES["cnot"]().matrix()).reshape(2, 2, 2, 2)


def run_solution(config):
    nd = config["n_data_qubits"]
    na = config["n_ancilla_qubits"]
    n = config["n_qubits"]
    nlayers = config["n_layers"]
    ntraj = config["n_trajectories"]
    scale = config["initial_parameter_scale"]
    steps = config["max_steps"]
    lr = config["learning_rate"]
    seed = config["seed"]
    hx = config["transverse_field"]

    data_pairs = [(i, i + 1) for i in range(nd - 1)]
    ent_pairs = [(na + i if False else 8 + i, i) for i in range(nd)]

    def trajectory(params, status):
        td, ta, te, tf0, tf1, tp = params
        psi = sv.init_state(n)
        for l in range(nlayers):
            gates = jnp.concatenate(
                [
                    jax.vmap(G.ry_matrix)(td[l]),
                    jax.vmap(G.ry_matrix)(ta[l]),
                ]
            ).astype(jnp.complex64)
            psi = kernels.fused_single_qubit_layer(psi, gates)
            psi = sv.apply_zz_product_phase(psi, ent_pairs, te[l])
            for a in range(8, 15):
                psi = sv.apply_unitary(psi, CNOT, [a, a + 1])
            # measure all ancillas (externalized randomness)
            ms = []
            for i in range(na):
                q = 8 + i
                marg = sv.marginal_probability(psi, [q])
                p0 = jnp.real(marg[0])
                m = (status[l, i] >= p0).astype(jnp.int32)
                psi = sv.project_slot(psi, q, m, renormalize=True)
                ms.append(m.astype(jnp.float32))
            ms = jnp.stack(ms)
            fb = (1.0 - ms) * tf0[l] + ms * tf1[l]
            psi = sv.apply_zz_product_phase(psi, ent_pairs, fb)
            for i in range(nd - 1):
                psi = sv.apply_unitary(psi, CNOT, [i, i + 1])
            rzg = jnp.concatenate(
                [
                    jax.vmap(G.rz_matrix)(tp[l]),
                    jnp.broadcast_to(np.eye(2, dtype=np.complex64), (na, 2, 2)),
                ]
            ).astype(jnp.complex64)
            psi = kernels.fused_single_qubit_layer(psi, rzg)
        e = -jnp.real(sv.expectation_zz_sum(psi, data_pairs)) - hx * jnp.real(
            sv.expectation_1q_sum(
                psi, np.array([[0.0, 1.0], [1.0, 0.0]]), wires=range(nd)
            )
        )
        return e

    rng = np.random.default_rng(seed)
    status = jnp.asarray(rng.uniform(size=(ntraj, nlayers, na)), jnp.float32)

    def avg_energy(params):
        es = jax.vmap(lambda s: trajectory(params, s))(status)
        return jnp.mean(es)

    import optax

    params0 = tuple(
        jnp.asarray(rng.normal(0, scale, (nlayers, nd)), jnp.float32)
        for _ in range(6)
    )
    opt = optax.adam(lr)
    os0 = opt.init(params0)

    def body(carry, _):
        p, os_ = carry
        e, g = jax.value_and_grad(avg_energy)(p)
        up, os_ = opt.update(g, os_, p)
        return (optax.apply_updates(p, up), os_), e

    @jax.jit
    def train(p, os_):
        (pf, _), hist = jax.lax.scan(body, (p, os_), None, length=steps)
        return pf, hist

    pf, hist = train(params0, os0)
    return {
        "energy_history": np.asarray(hist, dtype=np.float64),
        "final_parameters": [np.asarray(x, dtype=np.float64) for x in pf],
    }


if __name__ == "__main__":
    import time

    config = {
        "n_data_qubits": 8,
        "n_ancilla_qubits": 8,
        "n_qubits": 16,
        "n_layers": 2,
        "n_trajectories": 64,
        "initial_parameter_scale": 0.1,
        "max_steps": 100,
        "learning_rate": 0.02,
        "seed": 2047,
        "transverse_field": 1.05,
    }
    t0 = time.time()
    res = run_solution(config)
    dt = time.time() - t0
    h = res["energy_history"]
    print(
        f"problem 7: {dt:.2f}s end-to-end (reference baseline 63.84s); "
        f"trajectory-averaged E {h[0]:.4f} -> {h[-1]:.4f}"
    )
    assert h[-1] < h[0] - 0.3
