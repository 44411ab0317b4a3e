"""Challenge problem 11: spin-1 Haldane-chain VQE with string order.

Spec: reference ``examples/challenge_suite/problem_11.md`` (baseline 68.08 s;
exact-diag reference 4.63 s).  d=3 flat-state engine: single-site rotations
via eigenbasis closed forms, bond gates via traced 9x9 expm, string-order
correlators as pure diagonal (base-3 digit arithmetic) observables.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp

from tensorcircuit_ng_tpu.core import statevec as sv

SX = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=complex) / np.sqrt(2)
SY = np.array([[0, -1j, 0], [1j, 0, -1j], [0, 1j, 0]], dtype=complex) / np.sqrt(2)
SZ = np.diag([1.0, 0.0, -1.0]).astype(complex)

# eigenbasis of Sy for closed-form Ry(theta) with traced theta
_EVALS_Y, _EVECS_Y = np.linalg.eigh(SY)


def run_solution(config):
    n = config["n_sites"]
    nlayers = config["n_layers"]
    beta = config["beta"]
    dion = config["single_ion_anisotropy"]
    steps = config["max_steps"]
    lr = config["learning_rate"]
    scale = config["initial_parameter_scale"]
    seed = config["seed"]

    d = 3
    dim = d**n
    even_bonds = [(i, i + 1) for i in range(0, n - 1, 2)]
    odd_bonds = [(i, i + 1) for i in range(1, n - 1, 2)]
    bonds = [(i, i + 1) for i in range(n - 1)]

    # bond Hamiltonian pieces (9x9, numpy constants)
    SS = sum(np.kron(a, a) for a in (SX, SY, SZ))
    SS2 = SS @ SS
    HB = SS + beta * SS2  # energy bond term
    XXYY = np.kron(SX, SX) + np.kron(SY, SY)
    ZZ = np.kron(SZ, SZ)
    SZ2 = SZ @ SZ

    # Neel |+1,-1,...>: site i digit 0 if even (basis order |+1>,|0>,|-1>), 2 if odd
    idx0 = 0
    for i in range(n):
        idx0 = idx0 * d + (0 if i % 2 == 0 else 2)
    init = np.zeros(dim, dtype=np.complex64)
    init[idx0] = 1.0

    def rz(phi):
        return jnp.diag(jnp.exp(-1j * phi * jnp.asarray([1.0, 0.0, -1.0]))).astype(
            jnp.complex64
        )

    def ry(theta):
        ph = jnp.exp(-1j * theta * jnp.asarray(_EVALS_Y))
        return (_EVECS_Y * ph[None, :]) @ _EVECS_Y.conj().T

    import jax.scipy.linalg as jsl

    def bond_gate(theta, phi):
        a = theta * XXYY + phi * ZZ + beta * SS2
        return jsl.expm(-1j * a.astype(jnp.complex64))

    def one_layer(psi, layer_params):
        # identical layer structure -> lax.scan keeps the compiled program
        # one-layer sized (the full unroll exceeds the TPU compile budget)
        rot_l, pe_l, po_l = layer_params
        rots = jax.vmap(lambda t: rz(t[0]) @ ry(t[1]) @ rz(t[2]))(rot_l)
        for i in range(n):
            psi = sv.apply_unitary(psi, rots[i], [i], d)
        ge = jax.vmap(lambda t: bond_gate(t[0], t[1]))(pe_l)
        for b, (i, j) in enumerate(even_bonds):
            psi = sv.apply_unitary(psi, ge[b], [i, j], d)
        go = jax.vmap(lambda t: bond_gate(t[0], t[1]))(po_l)
        for b, (i, j) in enumerate(odd_bonds):
            psi = sv.apply_unitary(psi, go[b], [i, j], d)
        return psi, None

    def ansatz_state(params):
        rot, pe, po = params
        psi = jnp.asarray(init)
        psi, _ = jax.lax.scan(one_layer, psi, (rot, pe, po))
        return psi

    def energy(params):
        psi = ansatz_state(params)
        e = 0.0
        for (i, j) in bonds:
            phi = sv.apply_unitary(psi, HB, [i, j], d)
            e = e + jnp.real(jnp.vdot(psi, phi))
        for i in range(n):
            phi = sv.apply_unitary(psi, SZ2, [i], d)
            e = e + dion * jnp.real(jnp.vdot(psi, phi))
        return e

    import optax

    rng = np.random.default_rng(seed)
    params0 = (
        jnp.asarray(rng.normal(0, scale, (nlayers, n, 3)), jnp.float32),
        jnp.asarray(rng.normal(0, scale, (nlayers, len(even_bonds), 2)), jnp.float32),
        jnp.asarray(rng.normal(0, scale, (nlayers, len(odd_bonds), 2)), jnp.float32),
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

    # string order O^z(i,j) = <Sz_i prod_k exp(i pi Sz_k) Sz_j>: fully
    # diagonal -> evaluate from |psi|^2 with base-3 digit arithmetic
    @jax.jit
    def string_orders(p):
        psi = ansatz_state(p)
        prob = jnp.abs(psi) ** 2
        idx = jnp.arange(dim, dtype=jnp.int32)

        def digit(i):
            return (idx // (d ** (n - 1 - i))) % d

        def sz_of(dg):
            return 1.0 - dg.astype(jnp.float32)  # digit 0->+1, 1->0, 2->-1

        def one(i, j):
            val = sz_of(digit(i)) * sz_of(digit(j))
            for k in range(i + 1, j):
                dg = digit(k)
                val = val * jnp.where(dg == 1, 1.0, -1.0)
            return jnp.sum(prob * val)

        return jnp.stack([one(0, n - 1), one(1, n - 2), one(2, n - 3)])

    so = string_orders(pf)
    return {
        "energy_density_history": np.asarray(hist, dtype=np.float64),
        "string_orders": np.asarray(so, dtype=np.float64),
        "final_parameters": [np.asarray(x, dtype=np.float64) for x in pf],
    }


if __name__ == "__main__":
    import time

    config = {
        "n_sites": 12,
        "n_layers": 5,
        "beta": 0.20,
        "single_ion_anisotropy": 0.15,
        "max_steps": 500,
        "learning_rate": 0.03,
        "initial_parameter_scale": 0.05,
        "seed": 2041,
    }
    t0 = time.time()
    res = run_solution(config)
    dt = time.time() - t0
    h = res["energy_density_history"]
    print(
        f"problem 11: {dt:.2f}s end-to-end (reference baseline 68.08s); "
        f"energy density {h[0]:.5f} -> {h[-1]:.5f}; "
        f"string orders {np.round(res['string_orders'], 4)}"
    )
    assert h[-1] < h[0] - 5e-3
    # Haldane phase: string order negative and of substantial magnitude
    assert np.all(res["string_orders"] < -0.1)
