"""Quantum singular value transformation: polynomial matrix functions
(reference ``examples/qsvt.py`` role).

QSVT applies a degree-d polynomial to the singular values of a
block-encoded matrix using d applications of the encoding unitary
interleaved with projector-controlled phases (Gilyen et al. 2019).

Construction, derived from scratch rather than fitted conventions: the
Hermitian dilation ``U = [[A, sqrt(I-AA)],[sqrt(I-AA), -A]]`` restricted to
each eigen-subspace of A acts as the reflection
``R(x) = [[x, s],[s, -x]]`` (s = sqrt(1-x^2)), while the Wx-convention QSP
signal operator is ``W(x) = [[x, is],[is, x]]``.  The exact identity

    R(x) = e^{-i pi/2} e^{i pi/4 Z} W(x) e^{i pi/4 Z}

converts any Wx phase sequence (phi_0..phi_d) into reflection phases
(phi_0 - pi/4, phi_1 - pi/2, ..., phi_{d-1} - pi/2, phi_d - pi/4) with a
known global phase i^d.  The projector phase e^{i phi (2P-I)} with
P = |0><0| on the ancilla is exactly ``rz(ancilla, theta=-2 phi)``.

Two self-validating checks on a random 8x8 Hermitian A (4-qubit circuit):

1. CLOSED FORM: all-zero Wx phases give P = T_d (Chebyshev) exactly, so
   the circuit block must equal ``i^3 (4A^3 - 3A)`` at d=3.
2. QSVT THEOREM: for optax-fitted phases targeting f(x)=x, the circuit
   block must equal ``V P(Lambda) V^H`` where P(lambda) is computed from
   the SINGLE-QUBIT QSP model — circuit and 2x2 model must agree
   eigenvalue by eigenvalue, independent of fit quality.

Everything runs through the public ``tc.Circuit`` surface (rz + ``any``
gates), jitted where it counts.
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


def block_encode(a):
    """Hermitian dilation of A (||A|| <= 1): one extra qubit."""
    d = a.shape[0]
    w, v = np.linalg.eigh(a)
    s = v @ np.diag(np.sqrt(np.clip(1.0 - w**2, 0.0, None))) @ v.conj().T
    top = np.concatenate([a, s], axis=1)
    bot = np.concatenate([s, -a], axis=1)
    u = np.concatenate([top, bot], axis=0).astype(np.complex64)
    assert np.allclose(u @ u.conj().T, np.eye(2 * d), atol=1e-5)
    return u


def wx_to_reflection(phases_wx):
    """Convert Wx-convention QSP phases to reflection-convention phases.

    Derived from R(x) = e^{-i pi/2} e^{i pi/4 Z} W(x) e^{i pi/4 Z}, which
    gives U_wx = i^d * M_reflection; the reflection block must therefore be
    multiplied by the returned gphase = i^d to recover P.
    """
    d = len(phases_wx) - 1
    out = np.asarray(phases_wx, dtype=np.float64).copy()
    out[0] -= np.pi / 4
    out[-1] -= np.pi / 4
    out[1:-1] -= np.pi / 2
    return out, 1j**d


def qsvt_block(a, phases_wx):
    """Top-left block of the QSVT circuit for Hermitian A, Wx phases."""
    dim = a.shape[0]
    nsys = int(np.log2(dim))
    u = block_encode(a)
    phases_r, gphase = wx_to_reflection(phases_wx)
    c = tc.Circuit(nsys + 1)  # qubit 0 = ancilla (most significant)
    wires = tuple(range(nsys + 1))
    # matrix product is right-to-left: apply e^{i phi_d Z_P} first
    for k in range(len(phases_r) - 1, -1, -1):
        c.rz(0, theta=-2.0 * phases_r[k])
        if k > 0:
            c.any(*wires, unitary=u, name="U")
    m = np.asarray(c.matrix())
    return m[:dim, :dim] * gphase


def qsp_value(phases, x):
    """<0|U_phi(x)|0> in the Wx convention (single-qubit model)."""
    s = jnp.sqrt(jnp.clip(1.0 - x * x, 0.0, 1.0))
    w = jnp.array([[x, 1j * s], [1j * s, x]], dtype=jnp.complex64)
    m = jnp.diag(jnp.exp(1j * phases[0] * jnp.array([1.0, -1.0])))
    for k in range(1, phases.shape[0]):
        m = m @ w @ jnp.diag(jnp.exp(1j * phases[k] * jnp.array([1.0, -1.0])))
    return m[0, 0]


qsp_grid = jax.jit(jax.vmap(qsp_value, in_axes=(None, 0)))


def fit_phases(target_fn, degree, steps=400):
    xs = jnp.linspace(-0.85, 0.85, 41)
    ys = target_fn(xs)

    def loss(phi):
        p = qsp_grid(phi, xs)
        return jnp.mean((jnp.real(p) - ys) ** 2) + 0.2 * jnp.mean(jnp.imag(p) ** 2)

    phi = jnp.linspace(-0.1, 0.1, degree + 1)
    opt = optax.adam(0.05)
    st = opt.init(phi)
    vg = jax.jit(jax.value_and_grad(loss))
    for _ in range(steps):
        l, g = vg(phi)
        up, st = opt.update(g, st)
        phi = optax.apply_updates(phi, up)
    return np.asarray(phi), float(l)


def main():
    rng = np.random.default_rng(7)
    h = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    a = (h + h.conj().T) / 2
    a = (0.75 / np.abs(np.linalg.eigvalsh(a)).max()) * a
    a = a.astype(np.complex64)
    lam, v = np.linalg.eigh(a)

    # --- check 1: zero Wx phases = Chebyshev T_3, closed form -------------
    d = 3
    blk = qsvt_block(a, np.zeros(d + 1))
    t3 = v @ np.diag(4 * lam**3 - 3 * lam) @ v.conj().T
    err1 = np.linalg.norm(blk - t3) / np.linalg.norm(t3)
    print(f"[1] T_3(A) closed form: rel err {err1:.2e}")
    assert err1 < 2e-5, err1

    # --- check 2: fitted f(x)=x; circuit block == eigen-applied QSP model -
    phi, fit_loss = fit_phases(lambda x: x, degree=3)
    blk2 = qsvt_block(a, phi)
    p_lam = np.asarray(qsp_grid(jnp.asarray(phi), jnp.asarray(lam)))
    model = v @ np.diag(p_lam) @ v.conj().T
    err_theorem = np.linalg.norm(blk2 - model) / np.linalg.norm(model)
    err_target = np.abs(np.real(p_lam) - lam).max()
    print(f"[2] fitted f(x)=x: fit loss {fit_loss:.2e}, "
          f"max |Re P(l)-l| {err_target:.2e}, "
          f"circuit-vs-model rel err {err_theorem:.2e}")
    assert err_theorem < 5e-5, err_theorem  # theorem: exact up to f32
    assert err_target < 5e-2, err_target    # fit quality (reported)

    print("OK: QSVT circuit realizes polynomial matrix functions "
          "(Chebyshev closed form + QSP-model agreement)")


if __name__ == "__main__":
    main()
