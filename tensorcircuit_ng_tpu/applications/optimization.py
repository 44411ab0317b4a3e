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


# ======================================================================
# reference-parity QUBO/CVaR API (applications/optimization.py:22-364)
# ======================================================================

import jax
from functools import partial as _partial


def Ising_loss(c: Any, pauli_terms: Any, weights: Sequence[float]) -> Any:
    """Σ_k w_k ⟨Z...Z⟩ over 1- and 2-local Ising terms (reference :22)."""
    loss = 0.0
    for k, term in enumerate(pauli_terms):
        ones = [l for l, v in enumerate(term) if v == 1]
        if len(ones) == 1:
            loss += weights[k] * c.expectation_ps(z=[ones[0]])
        else:
            loss += weights[k] * c.expectation_ps(z=ones[:2])
    return jnp.real(loss)


def QAOA_loss(
    nlayers: int,
    pauli_terms: Any,
    weights: Sequence[float],
    params: Any,
    full_coupling: bool = False,
    mixer: str = "X",
) -> Any:
    """Ising loss of the QAOA ansatz state (reference :57)."""
    from ..templates.ansatz import QAOA_ansatz_for_Ising

    c = QAOA_ansatz_for_Ising(
        params, nlayers, pauli_terms, weights, mixer=mixer, full_coupling=full_coupling
    )
    return Ising_loss(c, pauli_terms, weights)


def cvar_value(r: Any, p: Any, percent: float) -> Any:
    """CVaR of outcomes ``r`` with probabilities ``p`` (reference :163).

    Differentiable jnp implementation (sort + cumsum + mask).
    """
    r = jnp.asarray(r, dtype=jnp.float32)
    p = jnp.asarray(p, dtype=jnp.float32)
    order = jnp.argsort(r)
    r_s = r[order]
    p_s = p[order]
    cum = jnp.cumsum(p_s)
    mask = (cum < percent).astype(jnp.float32)
    head = jnp.sum(mask * p_s * r_s)
    last_idx = jnp.argmax((cum >= percent).astype(jnp.int32))
    prev_cum = jnp.where(last_idx > 0, cum[last_idx - 1], 0.0)
    tail = (percent - prev_cum) * r_s[last_idx]
    return (head + tail) / percent


def _qubo_values(Q: Any) -> Any:
    """Cost x^T Q x of every binary assignment, shape [2^n] (helper)."""
    Q = np.asarray(Q, dtype=np.float32)
    n = Q.shape[0]
    states = ((np.arange(2**n)[:, None] >> np.arange(n - 1, -1, -1)) & 1).astype(
        np.float32
    )
    return jnp.asarray(np.einsum("si,ij,sj->s", states, Q, states))


def cvar_from_circuit(circuit: Any, nsamples: int, Q: Any, alpha: float) -> Any:
    """CVaR from sampled measurement outcomes (reference :197)."""
    from .. import quantum as qu
    from ..backend import backend as K

    p = jnp.real(circuit.probability())
    p = p / jnp.sum(p)
    idx = K.probability_sample(nsamples, p)
    values = _qubo_values(Q)
    counts = jnp.zeros(p.shape[0]).at[idx].add(1.0)
    probs = counts / nsamples
    return cvar_value(values, probs, alpha)


def cvar_from_expectation(circuit: Any, Q: Any, alpha: float) -> Any:
    """CVaR from the exact outcome distribution (reference :244)."""
    p = jnp.real(circuit.probability())
    p = p / jnp.sum(p)
    return cvar_value(_qubo_values(Q), p, alpha)


def _cvar_loss_ref(
    nlayers: int,
    Q: Any,
    nsamples: int,
    alpha: float,
    expectation_based: bool,
    params: Any,
) -> Any:
    from ..templates.ansatz import QAOA_ansatz_for_Ising
    from ..templates.conversions import QUBO_to_Ising

    pauli_terms, weights, _ = QUBO_to_Ising(Q)
    c = QAOA_ansatz_for_Ising(params, nlayers, pauli_terms, weights)
    if expectation_based:
        return cvar_from_expectation(c, Q, alpha)
    return cvar_from_circuit(c, nsamples, Q, alpha)


def QUBO_QAOA_cvar(
    Q: Any,
    nlayers: int,
    alpha: float,
    nsamples: int = 1000,
    callback: Optional[Callable[..., None]] = None,
    expectation_based: bool = False,
    maxiter: int = 1000,
    init_params: Optional[Any] = None,
) -> Any:
    """COBYLA optimization of the CVaR objective (reference :316)."""
    import scipy.optimize as sopt

    loss = _partial(_cvar_loss_ref, nlayers, Q, nsamples, alpha, expectation_based)

    def f_np(x: Any) -> float:
        return float(np.asarray(jax.device_get(loss(jnp.asarray(x, dtype=jnp.float32)))))

    if init_params is None:
        init_params = np.random.normal(scale=0.5, size=[2 * nlayers])
    r = sopt.minimize(
        f_np, np.asarray(init_params), method="COBYLA", callback=callback,
        options={"maxiter": maxiter},
    )
    return r.x
