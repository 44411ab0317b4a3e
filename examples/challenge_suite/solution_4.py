"""Challenge problem 4: trainable Kraus noise calibration from multi-circuit data.

Spec: reference ``examples/challenge_suite/problem_4.md`` (baseline 11.83 s).
The asymmetric bit-flip channel is expressed directly as traced Kraus
tensors (K built from sigmoid-parameterized probabilities), inserted after
every entangler in exact density-matrix simulations of four probe states;
the (4, 13) observable table is differentiable w.r.t. the channel
parameters and fitted by MSE.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.core import statevec as sv


def run_solution(config):
    n = config["n_qubits"]
    ang = config["entangler_angle"]
    steps = config["max_steps"]
    lr = config["learning_rate"]

    even = [(i, i + 1) for i in range(0, n - 1, 2)]
    odd = [(i, i + 1) for i in range(1, n - 1, 2)]
    dim = 2**n
    idx = np.arange(dim)
    zdiags = np.stack(
        [1.0 - 2.0 * ((idx >> (n - 1 - q)) & 1) for q in range(n)]
    ).astype(np.float32)  # (n, dim)
    parity = np.prod(zdiags, axis=0).astype(np.float32)

    # probe initial states
    ghz = np.zeros(dim, dtype=np.complex64)
    ghz[0] = ghz[-1] = 1 / np.sqrt(2)
    bell = np.array([0, 1, 1, 0], dtype=np.complex64) / np.sqrt(2)
    pair = bell.copy()
    bellchain = pair
    for _ in range(n // 2 - 1):
        bellchain = np.kron(bellchain, bell)
    zeros = np.zeros(dim, dtype=np.complex64)
    zeros[0] = 1.0
    plus = np.full(dim, 2.0 ** (-n / 2), dtype=np.complex64)
    probes = [ghz, bellchain, zeros, plus]

    rxx = np.asarray(
        tc.gates.rxx_matrix(ang, dtype="complex64")
    )  # concrete -> numpy (axon rule)

    def kraus_of(p01, p10):
        z = jnp.zeros(())
        k0 = jnp.stack(
            [jnp.stack([jnp.sqrt(1 - p01), z]), jnp.stack([z, jnp.sqrt(1 - p10)])]
        ).astype(jnp.complex64)
        k1 = jnp.stack([jnp.stack([z, jnp.sqrt(p10)]), jnp.stack([z, z])]).astype(
            jnp.complex64
        )
        k2 = jnp.stack([jnp.stack([z, z]), jnp.stack([jnp.sqrt(p01), z])]).astype(
            jnp.complex64
        )
        return [k0, k1, k2]

    def apply_channel_rho(rho, ks, q):
        acc = None
        for k in ks:
            t = sv.apply_unitary(rho, k, [q])
            t = sv.apply_unitary(t, k.conj(), [q + n])
            acc = t if acc is None else acc + t
        return acc

    def table(p01, p10):
        ks = kraus_of(p01, p10)
        rows = []
        for psi0 in probes:
            psi = jnp.asarray(psi0)
            rho = jnp.reshape(jnp.outer(psi, jnp.conj(psi)), (-1,))
            for bonds in (even, odd):
                for (i, j) in bonds:
                    rho = sv.apply_unitary(rho, rxx, [i, j])
                    rho = sv.apply_unitary(rho, rxx.conj(), [i + n, j + n])
                    rho = apply_channel_rho(rho, ks, i)
                    rho = apply_channel_rho(rho, ks, j)
            diag = jnp.real(jnp.diagonal(jnp.reshape(rho, (dim, dim))))
            obs = [jnp.sum(diag * zdiags[q]) for q in range(n)]
            obs.append(jnp.sum(diag * parity))
            rows.append(jnp.stack(obs))
        return jnp.stack(rows)  # (4, n+1)

    target = jax.jit(table)(
        jnp.asarray(config["true_p01"], jnp.float32),
        jnp.asarray(config["true_p10"], jnp.float32),
    )

    def loss(r):
        p01 = jax.nn.sigmoid(r[0])
        p10 = jax.nn.sigmoid(r[1])
        return jnp.mean((table(p01, p10) - target) ** 2)

    import optax

    def logit(p):
        return float(np.log(p / (1 - p)))

    r0 = jnp.asarray([logit(config["initial_p01"]), logit(config["initial_p10"])], jnp.float32)
    opt = optax.adam(lr)
    os0 = opt.init(r0)

    def body(carry, _):
        r, os_ = carry
        lv, g = jax.value_and_grad(loss)(r)
        up, os_ = opt.update(g, os_, r)
        return (optax.apply_updates(r, up), os_), lv

    @jax.jit
    def train(r, os_):
        (rf, _), hist = jax.lax.scan(body, (r, os_), None, length=steps)
        return rf, hist

    rf, hist = train(r0, os0)
    pf = jax.nn.sigmoid(rf)
    fitted = jax.jit(table)(pf[0], pf[1])
    return {
        "loss_history": np.asarray(hist, dtype=np.float64),
        "final_probabilities": np.asarray(pf, dtype=np.float64),
        "fitted_expectations": np.asarray(fitted, dtype=np.float64),
    }


if __name__ == "__main__":
    import time

    config = {
        "n_qubits": 12,
        "entangler_angle": 0.31,
        "true_p01": 0.034,
        "true_p10": 0.011,
        "initial_p01": 0.070,
        "initial_p10": 0.040,
        "max_steps": 120,
        "learning_rate": 0.04,
        "probability_absolute_tolerance": 2e-4,
    }
    t0 = time.time()
    res = run_solution(config)
    dt = time.time() - t0
    p = res["final_probabilities"]
    print(
        f"problem 4: {dt:.2f}s end-to-end (reference baseline 11.83s); "
        f"fitted p01={p[0]:.5f} (true 0.034), p10={p[1]:.5f} (true 0.011)"
    )
    assert abs(p[0] - 0.034) < 2e-4 and abs(p[1] - 0.011) < 2e-4
