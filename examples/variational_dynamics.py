"""Variational quantum dynamics (McLachlan) vs exact evolution.

Reference examples variational_dynamics*.py role: evolve TFIM real-time
dynamics inside a fixed-depth variational manifold by integrating

    A(theta) theta_dot = C(theta),
    A_ij = Re[<d_i psi|d_j psi> - <d_i psi|psi><psi|d_j psi>]
    C_i  = Im[<d_i psi|H|psi> - <d_i psi|psi><psi|H|psi>]

with the repo's `experimental.dynamics_matrix` (the QFIM/4 with projector)
and a jitted RHS.  Self-validating against the exact Krylov evolution from
`timeevol` on <Z_center>(t) and state fidelity.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# exact-oracle validation example: run on host CPU (the axon TPU
# tunnel cannot fetch complex host values; see CLAUDE.md)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu import experimental

n, L = 6, 3
g = 1.0  # transverse field
dt, steps = 0.02, 40  # T = 0.8
pairs = [(i, i + 1) for i in range(n - 1)]


def ansatz_state(theta):
    """L layers of [exp(-i th_zz/2 ZZ) bonds, rx fields]; theta (L, 2, n)."""
    c = tc.Circuit(n)
    for l in range(L):
        c.zzrx_layer(pairs, theta[l, 0, : n - 1], theta[l, 1])
    return c.state()


def hpsi(psi):
    """H |psi> for H = -sum ZZ - g sum X (matrix-free via the circuit API)."""
    c = tc.Circuit(n, inputs=psi)
    out = jnp.zeros_like(psi)
    for a, b in pairs:
        cc = tc.Circuit(n, inputs=psi)
        cc.z(a)
        cc.z(b)
        out = out - cc.state()
    for q in range(n):
        cc = tc.Circuit(n, inputs=psi)
        cc.x(q)
        out = out - g * cc.state()
    return out


a_fn = experimental.dynamics_matrix(lambda p: ansatz_state(jnp.reshape(p, (L, 2, n))))


@jax.jit
def rhs(flat):
    theta = jnp.reshape(flat, (L, 2, n))
    psi = ansatz_state(theta)
    jac = jax.jacrev(
        lambda p: (jnp.real(ansatz_state(jnp.reshape(p, (L, 2, n)))),
                   jnp.imag(ansatz_state(jnp.reshape(p, (L, 2, n)))))
    )(flat)
    jacc = jac[0] + 1j * jac[1]  # (dim, nparams)
    hps = hpsi(psi)
    braket = jnp.conj(jacc.T) @ psi
    c_vec = jnp.imag(jnp.conj(jacc.T) @ hps - braket * jnp.vdot(psi, hps))
    a = a_fn(flat)
    # Tikhonov-regularized solve (the standard McLachlan practicality).
    # Sign: minimizing ||sum_j dtheta_j |d_j psi> + iH|psi>|| gives
    # A theta_dot = +Im<d_i psi|H|psi> (projected).  NOTE the <Z>(t) check
    # alone cannot catch a flipped sign here: H and psi0 are real, so the
    # quench is time-reversal symmetric and <Z>(-t) = <Z>(t) — only the
    # final-state fidelity distinguishes forward from backward evolution.
    theta_dot = jnp.linalg.solve(a + 1e-4 * jnp.eye(a.shape[0]), c_vec)
    return theta_dot


def main():
    flat = jnp.zeros((L * 2 * n,), jnp.float32)
    zs = []
    for _ in range(steps):
        # RK2 (midpoint) integration of the variational flow
        k1 = rhs(flat)
        k2 = rhs(flat + 0.5 * dt * k1)
        flat = flat + dt * k2
        psi = ansatz_state(jnp.reshape(flat, (L, 2, n)))
        cc = tc.Circuit(n, inputs=psi)
        zs.append(float(jnp.real(cc.expectation_ps(z=[n // 2]))))

    # exact oracle: dense evolution of the same quench
    import scipy.linalg as sl

    zmat = np.diag([1.0, -1.0])
    xmat = np.array([[0.0, 1.0], [1.0, 0.0]])

    def kron_at(op, qs):
        out = np.ones((1, 1))
        for i in range(n):
            out = np.kron(out, op if i in qs else np.eye(2))
        return out

    H = np.zeros((2**n, 2**n))
    for a, b in pairs:
        H -= kron_at(zmat, (a, b))
    for q in range(n):
        H -= g * kron_at(xmat, (q,))
    psi0 = np.zeros(2**n, dtype=np.complex128)
    psi0[0] = 1.0
    zs_exact = []
    u_dt = sl.expm(-1j * dt * H)
    psit = psi0
    zobs = kron_at(zmat, (n // 2,))
    for _ in range(steps):
        psit = u_dt @ psit
        zs_exact.append(float(np.real(np.vdot(psit, zobs @ psit))))

    err = np.abs(np.asarray(zs) - np.asarray(zs_exact)).max()
    print(f"<Z_{n//2}>(t): variational vs exact, max|err| = {err:.4f}")
    print(f"  t=[0,{dt*steps}]: var ends {zs[-1]:.4f}, exact {zs_exact[-1]:.4f}")
    # final-state fidelity
    psi_v = np.asarray(ansatz_state(jnp.reshape(flat, (L, 2, n))), dtype=complex)
    fid = abs(np.vdot(psit, psi_v / np.linalg.norm(psi_v)))
    print(f"  final fidelity {fid:.5f}")
    assert err < 0.05, err
    assert fid > 0.99, fid
    print("OK")


if __name__ == "__main__":
    main()
