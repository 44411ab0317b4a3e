"""Challenge problem 6: digital-analog hybrid VQE with trainable analog blocks.

Spec: reference ``examples/challenge_suite/problem_6.md`` (baseline 26.83 s).
Analog blocks are genuine continuous-time Schrödinger ODE evolutions
(``jax.experimental.ode.odeint`` with the configured tolerances) of the
trainable XY + staggered-Z Hamiltonian — matrix-free: H|psi> is two fused
bit-arithmetic passes (hopping = flip-both masked by (1 - zz), staggered Z
diagonal).  Digital blocks are fused RZ·RY·RZ single-qubit layers.
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


def run_solution(config):
    n = config["n_qubits"]
    nblocks = config["n_blocks"]
    tmin, tmax = config["t_min"], config["t_max"]
    rtol, atol = config["ode_rtol"], config["ode_atol"]
    mxstep = config.get("ode_max_steps", 16)
    steps = config["max_steps"]
    lr = config["learning_rate"]

    pairs = [(i, i + 1) for i in range(n - 1)]
    dim = 2**n
    idx = np.arange(dim, dtype=np.int64)

    # static numpy masks (real -> safe jit constants)
    def zbit(q):
        return 1.0 - 2.0 * ((idx >> (n - 1 - q)) & 1)

    stag_diag = sum((-1) ** i * zbit(i) for i in range(n)).astype(np.float32)
    zz_signs = [ (zbit(i) * zbit(j)).astype(np.float32) for (i, j) in pairs ]
    flip_masks = [ (1 << (n - 1 - i)) | (1 << (n - 1 - j)) for (i, j) in pairs ]
    flip_perms = [ (idx ^ m).astype(np.int32) for m in flip_masks ]

    def hop_apply(psi):
        """Σ_pairs (XX + YY)|psi> = Σ flip_both(psi * (1 - zz))  (Y⊗Y = -XX·ZZ)."""
        acc = jnp.zeros_like(psi)
        for zz, perm in zip(zz_signs, flip_perms):
            masked = psi * (1.0 - zz).astype(psi.dtype)
            acc = acc + jnp.take(masked, perm)
        return acc

    def analog_rhs(psi, t, J, D):
        hpsi = J.astype(psi.dtype) * hop_apply(psi) + (
            D.astype(psi.dtype) * stag_diag.astype(psi.dtype)
        ) * psi
        return -1j * hpsi

    from jax.experimental.ode import odeint

    def analog_evolve(psi, tl, J, D):
        # real/imag split (odeint wants real pytrees)
        def rhs_ri(y, t, J, D):
            p = y[0] + 1j * y[1]
            d = analog_rhs(p, t, J, D)
            return jnp.stack([jnp.real(d), jnp.imag(d)])

        y0 = jnp.stack([jnp.real(psi), jnp.imag(psi)])
        ts = jnp.stack([jnp.zeros_like(tl), tl])
        ys = odeint(rhs_ri, y0, ts, J, D, rtol=rtol, atol=atol, mxstep=1000 * mxstep)
        return (ys[1, 0] + 1j * ys[1, 1]).astype(psi.dtype)

    # Neel |0101...>
    bit = 0
    for q in range(1, n, 2):
        bit |= 1 << (n - 1 - q)
    init = np.zeros(dim, dtype=np.complex64)
    init[bit] = 1.0

    def rot_block(th):
        return G.rz_matrix(th[0]) @ G.ry_matrix(th[1]) @ G.rz_matrix(th[2])

    def state(params):
        s, j, d_, rot = params
        psi = jnp.asarray(init)
        for l in range(nblocks):
            tl = tmin + (tmax - tmin) * jax.nn.sigmoid(s[l])
            psi = analog_evolve(psi, tl, jnp.tanh(j[l]), jnp.tanh(d_[l]))
            gates = jax.vmap(rot_block)(rot[l])
            psi = kernels.fused_single_qubit_layer(psi, gates)
        return psi

    def energy(params):
        psi = state(params)
        e_hop = jnp.real(jnp.vdot(psi, hop_apply(psi)))  # Σ <XX+YY>
        e_zz = jnp.real(sv.expectation_zz_sum(psi, pairs))
        prob = jnp.abs(psi) ** 2
        e_st = jnp.sum(prob * jnp.asarray(stag_diag))
        return 0.7 * e_hop + 1.1 * e_zz + 0.25 * e_st

    import optax

    rng = np.random.default_rng(0)
    params0 = (
        jnp.zeros((nblocks,), jnp.float32),
        jnp.full((nblocks,), 0.1, jnp.float32),
        jnp.full((nblocks,), 0.1, jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (nblocks, n, 3)), jnp.float32),
    )
    opt = optax.adam(lr)
    ostate0 = opt.init(params0)

    def body(carry, _):
        p, os_ = carry
        e, g = jax.value_and_grad(energy)(p)
        up, os_ = opt.update(g, os_, p)
        return (optax.apply_updates(p, up), os_), e / n

    @jax.jit
    def train(p, os_):
        (pf, _), hist = jax.lax.scan(body, (p, os_), None, length=steps)
        return pf, hist

    pf, hist = train(params0, ostate0)
    s, j, d_, rot = pf
    return {
        "energy_density_history": np.asarray(hist, dtype=np.float64),
        "final_times": np.asarray(tminmax(s, tmin, tmax), dtype=np.float64),
        "final_couplings": np.tanh(np.asarray(j, dtype=np.float64)),
        "final_detunings": np.tanh(np.asarray(d_, dtype=np.float64)),
        "final_rotations": np.asarray(rot, dtype=np.float64),
    }


def tminmax(s, tmin, tmax):
    return tmin + (tmax - tmin) / (1.0 + np.exp(-np.asarray(s)))


if __name__ == "__main__":
    import time

    config = {
        "n_qubits": 14,
        "n_blocks": 4,
        "t_min": 0.05,
        "t_max": 0.50,
        "ode_rtol": 1e-6,
        "ode_atol": 1e-6,
        "ode_max_steps": 16,
        "max_steps": 100,
        "learning_rate": 0.12,
    }
    t0 = time.time()
    res = run_solution(config)
    dt = time.time() - t0
    h = res["energy_density_history"]
    print(
        f"problem 6: {dt:.2f}s end-to-end (reference baseline 26.83s); "
        f"energy density {h[0]:.5f} -> {h[-1]:.5f}; times {np.round(res['final_times'],3)}"
    )
    assert h[-1] < h[0] - 1e-3
