"""Sharded statevector engine: exact n-qubit state split across the mesh.

The capability the reference (slicing-only, experimental.py:760-1249) cannot
express: one exact statevector held jointly by all devices, with top-qubit
gates as ppermute butterflies (see parallel/sharded_state.py docstring for
the memory model).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import tensorcircuit_ng_tpu as tc
from tensorcircuit_ng_tpu.parallel.sharded_state import ShardedStatevec
from tensorcircuit_ng_tpu.ops.gates import rx_matrix, rzz_matrix


def test_sharded_statevec_matches_dense():
    n = 12
    mesh = Mesh(np.array(jax.devices()[:8]), ("sv",))
    sv = ShardedStatevec(n, mesh)
    rng = np.random.default_rng(0)
    th = rng.normal(size=(n,)) * 0.7

    @jax.jit
    def program():
        psi = sv.init_zero()
        for q in range(n):
            psi = sv.h(psi, q)
        for q in range(n):
            psi = sv.apply(psi, rx_matrix(th[q]), [q])
        for q in range(0, n - 1, 2):  # CNOTs incl. top (device) qubits
            psi = sv.apply(psi, np.asarray(tc.gates.cnot().tensor), [q, q + 1])
        for q in range(1, n - 1, 2):
            psi = sv.apply(psi, rzz_matrix(0.3), [q, q + 1])
        return psi, sv.expectation_z(psi, [0, 5]), sv.norm_sq(psi)

    psi, e, nn = program()
    c = tc.Circuit(n)
    for q in range(n):
        c.h(q)
    for q in range(n):
        c.rx(q, theta=th[q])
    for q in range(0, n - 1, 2):
        c.cnot(q, q + 1)
    for q in range(1, n - 1, 2):
        c.rzz(q, q + 1, theta=0.3)
    np.testing.assert_allclose(
        float(e), float(np.real(np.asarray(c.expectation_ps(z=[0, 5])))), atol=1e-5
    )
    np.testing.assert_allclose(float(nn), 1.0, atol=1e-5)
    psi_gather = np.asarray(jax.jit(sv.gather)(psi))
    np.testing.assert_allclose(psi_gather, np.asarray(c.state()), atol=1e-5)
    # general (non-diagonal) op on a TOP qubit: swap-in, apply, swap-out
    ex = jax.jit(lambda p: jnp.real(sv.expectation(p, [(tc.gates.x().tensor, [1])])))(
        psi
    )
    np.testing.assert_allclose(
        float(ex), float(np.real(np.asarray(c.expectation_ps(x=[1])))), atol=1e-5
    )


def test_sharded_statevec_grad_flows():
    """value_and_grad through the sharded SPMD program (VQE-style)."""
    n = 10
    mesh = Mesh(np.array(jax.devices()[:4]), ("sv",))
    sv = ShardedStatevec(n, mesh)

    def energy(th):
        psi = sv.init_zero()
        for q in range(n):
            psi = sv.h(psi, q)
        for q in range(n):
            psi = sv.apply(psi, rx_matrix(th[q]), [q])
        for q in range(n - 1):
            psi = sv.apply(psi, rzz_matrix(0.5), [q, q + 1])
        return jnp.real(sv.expectation_z(psi, [3, 4]))

    th = jnp.asarray(np.linspace(0.1, 0.9, n), jnp.float32)
    v, g = jax.jit(jax.value_and_grad(energy))(th)

    def energy_dense(th):
        c = tc.Circuit(n)
        for q in range(n):
            c.h(q)
        for q in range(n):
            c.rx(q, theta=th[q])
        for q in range(n - 1):
            c.rzz(q, q + 1, theta=0.5)
        return jnp.real(c.expectation_ps(z=[3, 4]))

    v2, g2 = jax.jit(jax.value_and_grad(energy_dense))(th)
    np.testing.assert_allclose(float(v), float(v2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), atol=1e-4)
