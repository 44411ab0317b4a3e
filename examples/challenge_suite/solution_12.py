"""Challenge problem 12: circuit training against a DMRG-MPS target.

Spec: reference ``examples/challenge_suite/problem_12.md``. The evaluator
normally supplies a quimb DMRG MPS; standalone, the in-repo two-site DMRG
(``tensorcircuit_ng_tpu.dmrg``) produces the chi=8 XXZ target. The circuit
ket is simulated EXACTLY as an MPS (bond <= 16 for two SU4 brickwork
layers, never 2^32 anything) with traced gates, and the loss is the direct
bra-ket transfer-network overlap |<MPS|circuit>|^2.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import dmrg as D
from tensorcircuit_ng_tpu.ops import gates as G


def run_solution(config):
    n = config["n_qubits"]
    delta = config["zz_anisotropy"]
    stag = config["staggered_field"]
    chi = config["dmrg_chi"]
    sweeps = config["dmrg_sweeps"]
    nlayers = config["n_layers"]
    steps = config["max_steps"]
    lr = config["learning_rate"]
    scale = config["initial_parameter_scale"]
    seed = config["seed"]

    if "dmrg_state" in config:
        target = [np.asarray(t) for t in config["dmrg_state"]]
    else:
        _, target = D.dmrg(D.xxz_mpo(n, delta, stag), chi=chi, sweeps=sweeps)
    target = [t.astype(np.complex64) for t in target]

    even = [(i, i + 1) for i in range(0, n - 1, 2)]
    odd = [(i, i + 1) for i in range(1, n - 1, 2)]
    layer_bonds = [even, odd]

    def circuit_tensors(params):
        c = tc.MPSCircuit(n)
        # Neel |0101...>
        for q in range(1, n, 2):
            c.x(q)
        k = 0
        for l in range(nlayers):
            for (i, j) in layer_bonds[l % 2]:
                c.any(i, j, unitary=G.su4_matrix(params[k]), name="su4")
                k += 1
        return c.tensors

    def fidelity(params):
        ts = circuit_tensors(params)
        e = jnp.ones((1, 1), dtype=jnp.complex64)
        for tb, tk in zip(target, ts):
            e = jnp.einsum("xy,xpa,ypb->ab", e, jnp.conj(tb), tk)
        ov = e.reshape(())
        return jnp.abs(ov) ** 2

    n_gates = len(even) + len(odd)

    def loss(params):
        return 1.0 - fidelity(params)

    import optax

    rng = np.random.default_rng(seed)
    params0 = jnp.asarray(rng.normal(0, scale, (n_gates, 15)), jnp.float32)
    opt = optax.adam(lr)
    os0 = opt.init(params0)

    def body(carry, _):
        p, os_ = carry
        lv, g = jax.value_and_grad(loss)(p)
        up, os_ = opt.update(g, os_, p)
        return (optax.apply_updates(p, up), os_), 1.0 - lv

    @jax.jit
    def train(p, os_):
        (pf, _), hist = jax.lax.scan(body, (p, os_), None, length=steps)
        return pf, hist

    pf, fhist = train(params0, os0)
    return {
        "fidelity_history": np.asarray(fhist, dtype=np.float64),
        "final_parameters": np.asarray(pf, dtype=np.float64),
    }


if __name__ == "__main__":
    import time

    config = {
        "n_qubits": 32,
        "zz_anisotropy": 1.4,
        "staggered_field": 0.2,
        "dmrg_chi": 8,
        "dmrg_sweeps": 4,
        "dmrg_tolerance": 1e-7,
        "n_layers": 2,
        "max_steps": 5000,
        "learning_rate": 0.02,
        "initial_parameter_scale": 0.02,
        "seed": 2039,
        "fidelity_threshold": 0.85,
    }
    t0 = time.time()
    res = run_solution(config)
    dt = time.time() - t0
    h = res["fidelity_history"]
    print(
        f"problem 12: {dt:.2f}s end-to-end; fidelity {h[0]:.5f} -> {h[-1]:.5f} "
        f"(threshold {config['fidelity_threshold']})"
    )
    assert h[-1] > config["fidelity_threshold"]
