"""VQE on qutrits: hopping + clock-field Hamiltonian on ``QuditCircuit``
(reference ``examples/vqe_qudit_example.py`` role).

Two-qutrit (d=3) Hamiltonian

    H = -J/2 (S Sd + Sd S)  -  h (Zc x I + I x Zc)

with Zc = (Z + Zd)/2 the Hermitian clock observable (Z = diag(1, w, w^2),
w = exp(2 pi i / 3)) and S the cyclic shift.  The ansatz uses two-level
subspace rotations ry(j,k) and RXX-type entanglers, optimized with optax
through jit+grad on the energy.

Self-validating checks:

1. The energy function evaluated on the identity ansatz equals
   <00|H|00> computed directly from the dense Hamiltonian.
2. Autodiff gradient matches finite differences at a random point.
3. Optimization converges to the exact ground state energy from
   ``numpy.linalg.eigh`` within 1e-3 (the d^2 = 9 dimensional problem is
   solvable exactly), and the optimized state has fidelity > 0.999 with
   the exact ground eigenvector (up to phase).

Reference behavior anchor: ``tensorcircuit/quditcircuit.py`` +
``quditgates.py`` (rx/ry/rz subspace rotations, rxx entangler).
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

D = 3
N = 2
J, HF = 1.0, 0.6


def dense_h():
    w = np.exp(2j * np.pi / D)
    z = np.diag(w ** np.arange(D))
    s = np.roll(np.eye(D), 1, axis=0)  # cyclic shift |j> -> |j+1>
    zc = (z + z.conj().T) / 2
    eye = np.eye(D)
    hop = np.kron(s, s.conj().T) + np.kron(s.conj().T, s)
    h = -J / 2 * hop - HF * (np.kron(zc, eye) + np.kron(eye, zc))
    assert np.allclose(h, h.conj().T)
    return h.astype(np.complex64)


H = dense_h()
EVALS, EVECS = np.linalg.eigh(H)
E0 = float(EVALS[0])

NLAYERS = 3
# per layer: ry(0;01), ry(0;12), ry(1;01), ry(1;12), rz(0;01), rz(1;01),
# then two rxx entanglers in different subspace pairs
NP_PER_LAYER = 8


def build(params):
    c = tc.QuditCircuit(N, dim=D)
    p = params.reshape(NLAYERS, NP_PER_LAYER)
    for l in range(NLAYERS):
        c.ry(0, theta=p[l, 0], j=0, k=1)
        c.ry(0, theta=p[l, 1], j=1, k=2)
        c.ry(1, theta=p[l, 2], j=0, k=1)
        c.ry(1, theta=p[l, 3], j=1, k=2)
        c.rz(0, theta=p[l, 4], j=0, k=1)
        c.rz(1, theta=p[l, 5], j=0, k=1)
        c.rxx(0, 1, theta=p[l, 6], j1=0, k1=1, j2=0, k2=1)
        c.rxx(0, 1, theta=p[l, 7], j1=1, k1=2, j2=1, k2=2)
    return c


def energy(params):
    psi = build(params).state()
    hpsi = jnp.asarray(H) @ psi
    return jnp.real(jnp.vdot(psi, hpsi))


if __name__ == "__main__":
    # [1] identity ansatz reproduces <00|H|00>
    e_id = float(energy(jnp.zeros(NLAYERS * NP_PER_LAYER, dtype=jnp.float32)))
    e_00 = float(np.real(H[0, 0]))
    print(f"[1] identity ansatz energy {e_id:.6f} vs <00|H|00> = {e_00:.6f}")
    assert abs(e_id - e_00) < 1e-5

    # [2] autodiff vs finite differences
    rng = np.random.default_rng(3)
    p0 = jnp.asarray(rng.normal(scale=0.3, size=NLAYERS * NP_PER_LAYER), jnp.float32)
    g_ad = np.asarray(jax.grad(energy)(p0))
    eps = 1e-3
    g_fd = np.array(
        [
            (
                float(energy(p0.at[i].add(eps)))
                - float(energy(p0.at[i].add(-eps)))
            )
            / (2 * eps)
            for i in range(4)
        ]
    )
    fd_err = np.max(np.abs(g_ad[:4] - g_fd))
    print(f"[2] autodiff vs finite-diff on 4 coords: max |dg| = {fd_err:.2e}")
    assert fd_err < 5e-3

    # [3] optimize to the exact ground state
    vg = jax.jit(jax.value_and_grad(energy))
    opt = optax.adam(0.08)
    params = p0
    state = opt.init(params)
    for step in range(400):
        e, g = vg(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    e_fin = float(e)
    psi = np.asarray(build(params).state())
    fid = abs(np.vdot(EVECS[:, 0], psi)) ** 2
    print(
        f"[3] VQE: E = {e_fin:.6f} vs exact E0 = {E0:.6f} "
        f"(gap to E1 = {EVALS[1] - EVALS[0]:.3f}), fidelity = {fid:.5f}"
    )
    assert abs(e_fin - E0) < 1e-3
    assert fid > 0.999
    print("OK: qutrit VQE reaches the exact ground state through subspace rotations")
