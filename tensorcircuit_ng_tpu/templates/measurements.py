"""Expectation templates (reference ``templates/measurements.py``).

``operator_expectation`` dispatches dense / sparse / MVP / QuOperator
Hamiltonians (reference ``templates/measurements.py:156``); the spin-model
helpers compute ⟨H⟩ term by term on the dense engine.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..backend import backend as K
from ..quantum import QuOperator

Tensor = Any

__all__ = [
    "any_measurements",
    "any_local_measurements",
    "operator_expectation",
    "sparse_expectation",
    "mpo_expectation",
    "spin_glass_measurements",
    "heisenberg_measurements",
    "parameterized_measurements",
    "parameterized_local_measurements",
]


def operator_expectation(c: Any, hamiltonian: Any) -> Tensor:
    """⟨psi|H|psi⟩ for dense matrix, sparse BCOO, callable MVP, or QuOperator."""
    psi = c.state() if hasattr(c, "state") else jnp.reshape(jnp.asarray(c), (-1,))
    psi = jnp.reshape(psi, (-1,))
    if isinstance(hamiltonian, QuOperator):
        h = hamiltonian.eval_matrix()
        return jnp.real(jnp.vdot(psi, h @ psi))
    if callable(hamiltonian) and not hasattr(hamiltonian, "shape"):
        return jnp.real(jnp.vdot(psi, hamiltonian(psi)))
    if K.is_sparse(hamiltonian):
        return jnp.real(jnp.vdot(psi, hamiltonian @ psi))
    h = jnp.asarray(hamiltonian)
    return jnp.real(jnp.vdot(psi, h @ psi.astype(h.dtype)))


def sparse_expectation(c: Any, hamiltonian: Any) -> Tensor:
    return operator_expectation(c, hamiltonian)


def mpo_expectation(c: Any, mpo: Any) -> Tensor:
    return operator_expectation(c, mpo)


def any_measurements(c: Any, structures: Tensor, onehot: bool = False) -> Tensor:
    """⟨P⟩ for a Pauli structure [n] with entries 0-3 (reference naming)."""
    structures = np.asarray(structures)
    x = [int(i) for i in np.nonzero(structures == 1)[0]]
    y = [int(i) for i in np.nonzero(structures == 2)[0]]
    z = [int(i) for i in np.nonzero(structures == 3)[0]]
    return c.expectation_ps(x=x, y=y, z=z)


def any_local_measurements(c: Any, structures: Tensor, wires: Sequence[int]) -> Tensor:
    structures = np.asarray(structures)
    x, y, z = [], [], []
    for s, w in zip(structures, wires):
        if s == 1:
            x.append(int(w))
        elif s == 2:
            y.append(int(w))
        elif s == 3:
            z.append(int(w))
    return c.expectation_ps(x=x, y=y, z=z)


def heisenberg_measurements(
    c: Any,
    g: Any,
    hzz: float = 1.0,
    hxx: float = 1.0,
    hyy: float = 1.0,
    hz: float = 0.0,
    hx: float = 0.0,
    hy: float = 0.0,
    reuse: bool = True,
) -> Tensor:
    """⟨H_heisenberg⟩ over graph bonds (reference ``measurements.py:70``)."""
    e = 0.0
    try:
        edges = list(g.edges)
    except AttributeError:
        edges = list(g)
    for a, b in edges:
        if hzz != 0:
            e += hzz * c.expectation_ps(z=[a, b], reuse=reuse)
        if hxx != 0:
            e += hxx * c.expectation_ps(x=[a, b], reuse=reuse)
        if hyy != 0:
            e += hyy * c.expectation_ps(y=[a, b], reuse=reuse)
    n = c.nqubits
    for i in range(n):
        if hz != 0:
            e += hz * c.expectation_ps(z=[i], reuse=reuse)
        if hx != 0:
            e += hx * c.expectation_ps(x=[i], reuse=reuse)
        if hy != 0:
            e += hy * c.expectation_ps(y=[i], reuse=reuse)
    return jnp.real(e)


def spin_glass_measurements(c: Any, g: Any, reuse: bool = True) -> Tensor:
    """Ising energy with graph edge/node weights (reference ``measurements.py``)."""
    e = 0.0
    for a, b, data in g.edges(data=True):
        w = data.get("weight", 1.0)
        e += w * c.expectation_ps(z=[a, b], reuse=reuse)
    for node, data in g.nodes(data=True):
        w = data.get("weight", 0.0)
        if w != 0:
            e += w * c.expectation_ps(z=[node], reuse=reuse)
    return jnp.real(e)


def parameterized_measurements(
    c: Any, structures: Tensor, onehot: bool = False, reuse: bool = True
) -> Tensor:
    """Differentiable-through Pauli-structure measurement (traced structures).

    ``structures``: float/int tensor [n] of pauli codes; uses the traced
    per-qubit operator-select pattern so the structure can be batched.
    """
    from ..parallel.mesh import pauli_term_expectation

    psi = c.state()
    return pauli_term_expectation(psi, jnp.asarray(structures, dtype=jnp.int32))


def parameterized_local_measurements(
    c: Any, structures: Tensor, onehot: bool = False, reuse: bool = True
) -> Tensor:
    """Per-wire single-Pauli expectations from a structure tensor.

    Reference ``measurements.py:88-153`` (``any_local_measurements`` alias):
    ``structures`` is [nwires, 4] Pauli weights, or [nwires] integer codes
    with ``onehot=True``; returns the real [nwires] expectation stack.
    Differentiable/jittable through the structure tensor.
    """
    from ..ops.gates import _i_matrix, _x_matrix, _y_matrix, _z_matrix

    s = jnp.asarray(structures)
    if onehot:
        s = jax.nn.one_hot(s.astype(jnp.int32), 4, dtype=jnp.float32)
    paulis = np.stack([_i_matrix, _x_matrix, _y_matrix, _z_matrix]).astype(
        np.complex64
    )
    nwires = s.shape[0]
    outs = []
    for i in range(nwires):
        m = jnp.tensordot(s[i].astype(jnp.complex64), jnp.asarray(paulis), axes=1)
        outs.append(jnp.real(c.expectation((m, [i]), reuse=reuse)))
    return jnp.stack(outs)
