"""QUBO / Ising optimization via QAOA (reference ``applications/optimization.py:85,316``)."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..templates.conversions import QUBO_to_Ising
from ..templates.ansatz import QAOA_ansatz_for_Ising

__all__ = ["QUBO_QAOA", "cvar_loss", "cvar_from_counts", "ising_energy_vector"]


def ising_energy_vector(structures: Sequence[Sequence[int]], weights: Sequence[float], offset: float = 0.0) -> jnp.ndarray:
    """Diagonal energy over all 2^n basis states for Z-type structures."""
    n = len(structures[0])
    e = np.full(2**n, offset, dtype=float)
    basis = np.arange(2**n)
    for l, w in zip(structures, weights):
        term = np.full(2**n, w, dtype=float)
        for q, v in enumerate(l):
            if v == 3:
                bit = (basis >> (n - 1 - q)) & 1
                term = term * (1 - 2 * bit)
        e += term
    return jnp.asarray(e)


def cvar_loss(probs: jnp.ndarray, energies: jnp.ndarray, alpha: float = 0.25) -> jnp.ndarray:
    """Conditional value at risk of the energy distribution (reference ``:316``)."""
    order = jnp.argsort(energies)
    p = probs[order]
    e = energies[order]
    cum = jnp.cumsum(p)
    w = jnp.clip(jnp.minimum(cum, alpha) - (cum - p), 0.0, None)
    return jnp.sum(w * e) / alpha


def cvar_from_counts(counts: Dict[str, int], energy_fn: Callable[[str], float], alpha: float = 0.25) -> float:
    pairs = sorted(((energy_fn(k), v) for k, v in counts.items()))
    total = sum(v for _, v in pairs)
    cutoff = alpha * total
    acc = 0.0
    used = 0.0
    for e, v in pairs:
        take = min(v, cutoff - used)
        if take <= 0:
            break
        acc += take * e
        used += take
    return acc / max(used, 1e-12)


def QUBO_QAOA(
    Q: Any,
    nlayers: int = 3,
    steps: int = 200,
    learning_rate: float = 0.05,
    alpha: Optional[float] = None,
    seed: int = 42,
    callback: Optional[Callable[[int, float], None]] = None,
) -> Tuple[jnp.ndarray, float, str]:
    """Optimize a QUBO with QAOA; returns (params, best energy, best bitstring).

    ``alpha`` switches the loss to CVaR_alpha (reference ``:85-200``).
    """
    structures, weights, offset = QUBO_to_Ising(Q)
    n = np.asarray(Q).shape[0]
    energies = ising_energy_vector(structures, weights, offset)

    def loss(params: jnp.ndarray) -> jnp.ndarray:
        c = QAOA_ansatz_for_Ising(params, nlayers, structures, weights)
        p = c.probability()
        p = p / jnp.sum(p)
        if alpha is not None:
            return cvar_loss(p, energies, alpha)
        return jnp.sum(p * energies)

    import optax

    params = jnp.asarray(
        np.random.default_rng(seed).uniform(0.0, 0.5, size=2 * nlayers),
        dtype=jnp.float32,
    )
    opt = optax.adam(learning_rate)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss))
    for step in range(steps):
        v, g = vg(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        if callback is not None:
            callback(step, float(v))
    c = QAOA_ansatz_for_Ising(params, nlayers, structures, weights)
    p = np.asarray(c.probability())
    best_idx = int(np.argmax(p))
    best_bits = format(best_idx, f"0{n}b")
    e_best = float(np.asarray(energies)[best_idx])
    return params, e_best, best_bits
