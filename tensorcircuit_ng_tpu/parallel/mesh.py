"""Mesh helpers and term-sharded Hamiltonian expectation.

The operator/term-sharding pattern of the reference's whitepaper VQE
(``examples/ng_whitepaper/VIA_sharding_vqe.py:33-70``): Pauli structures and
weights are sharded over a 1-D mesh axis, GSPMD shards the vmapped term loop
and inserts the final AllReduce over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import statevec

Tensor = Any

__all__ = ["default_mesh", "term_sharded_expectation", "pauli_term_expectation"]


def default_mesh(axis_name: str = "devices", devices: Optional[Sequence[Any]] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (axis_name,))


_PAULIS_NP = np.stack(
    [
        np.eye(2),
        np.array([[0, 1], [1, 0]]),
        np.array([[0, -1j], [1j, 0]]),
        np.array([[1, 0], [0, -1]]),
    ]
)


def pauli_term_expectation(psi: Tensor, code: Tensor) -> Tensor:
    """⟨psi|P(code)|psi⟩ with traced per-qubit pauli codes [n] (0..3)."""
    n = statevec.num_slots(psi)
    paulis = jnp.asarray(_PAULIS_NP, dtype=psi.dtype)
    phi = psi
    for q in range(n):
        m = jnp.take(paulis, code[q], axis=0)
        phi = statevec.apply_unitary(phi, m, [q])
    return jnp.real(jnp.vdot(psi, phi))


def term_sharded_expectation(
    state_fn: Callable[..., Tensor],
    structures: Tensor,
    weights: Tensor,
    mesh: Optional[Mesh] = None,
    axis_name: str = "devices",
) -> Callable[..., Tensor]:
    """Build ``energy(params) = Σ_i w_i ⟨psi(params)|P_i|psi(params)⟩`` with the
    term axis sharded over the mesh.

    Pad ``structures``/``weights`` so the term count divides the mesh size
    (identity strings with weight 0 are safe pads).
    """
    if mesh is None:
        mesh = default_mesh(axis_name)
    s_shard = NamedSharding(mesh, P(axis_name, None))
    w_shard = NamedSharding(mesh, P(axis_name))
    structures = jax.device_put(jnp.asarray(structures, dtype=jnp.int32), s_shard)
    weights = jax.device_put(jnp.asarray(weights), w_shard)

    # multi-process rule: globally-sharded arrays span non-addressable
    # devices and cannot be CLOSED OVER by a jitted function — they must be
    # passed as arguments with explicit in_shardings
    def energy_impl(structures: Tensor, weights: Tensor, *params: Any) -> Tensor:
        psi = state_fn(*params)
        evs = jax.vmap(pauli_term_expectation, in_axes=(None, 0))(psi, structures)
        return jnp.sum(evs * weights.astype(evs.dtype))

    jitted = jax.jit(energy_impl)

    def energy(*params: Any) -> Tensor:
        return jitted(structures, weights, *params)

    return energy
