"""DQAS: differentiable quantum architecture search (reference ``applications/dqas.py:190,666``).

Probabilistic-model view: a categorical distribution over operation choices
per layer slot; the objective is E_{ops~p}[loss(circuit(ops, params))],
optimized by Monte-Carlo score-function gradients for the structure
parameters plus plain AD for the circuit parameters.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["DQAS_search"]


def DQAS_search(
    op_pool: Sequence[Callable[[Any, Any, int], None]],
    nslots: int,
    loss_fn: Callable[[Sequence[int], jnp.ndarray], jnp.ndarray],
    nparams_per_slot: int = 1,
    batch: int = 16,
    steps: int = 100,
    lr_struct: float = 0.1,
    lr_param: float = 0.05,
    seed: int = 42,
    verbose: bool = False,
) -> Tuple[List[int], jnp.ndarray, List[float]]:
    """Search over op choices per slot.

    ``loss_fn(ops, params)`` evaluates a concrete architecture; returns the
    best op sequence, trained parameters, and the loss history.
    """
    import optax

    rng = np.random.default_rng(seed)
    npool = len(op_pool) if not callable(op_pool) else op_pool  # allow int
    if not isinstance(npool, int):
        npool = len(op_pool)
    alpha = jnp.zeros((nslots, npool), dtype=jnp.float32)  # structure logits
    params = jnp.asarray(
        rng.normal(size=(nslots, nparams_per_slot)) * 0.1, dtype=jnp.float32
    )
    opt_s = optax.adam(lr_struct)
    opt_p = optax.adam(lr_param)
    st_s = opt_s.init(alpha)
    st_p = opt_p.init(params)

    history: List[float] = []
    for step in range(steps):
        probs = np.asarray(jax.nn.softmax(alpha, axis=-1))
        samples = np.stack(
            [[rng.choice(npool, p=probs[s]) for s in range(nslots)] for _ in range(batch)]
        )
        losses = []
        grads_p = jnp.zeros_like(params)
        for b in range(batch):
            ops = [int(x) for x in samples[b]]
            v, gp = jax.value_and_grad(lambda p: loss_fn(ops, p))(params)
            losses.append(float(v))
            grads_p = grads_p + gp / batch
        losses_np = np.asarray(losses)
        baseline = losses_np.mean()
        # score-function gradient for structure logits
        galpha = np.zeros_like(np.asarray(alpha))
        for b in range(batch):
            adv = (losses_np[b] - baseline) / (losses_np.std() + 1e-8)
            for s in range(nslots):
                onehot = np.zeros(npool)
                onehot[samples[b, s]] = 1.0
                galpha[s] += adv * (onehot - probs[s]) / batch
        updates, st_s = opt_s.update(jnp.asarray(galpha, dtype=jnp.float32), st_s, alpha)
        alpha = optax.apply_updates(alpha, updates)
        updates, st_p = opt_p.update(grads_p, st_p, params)
        params = optax.apply_updates(params, updates)
        history.append(float(baseline))
        if verbose and step % 10 == 0:
            print(f"step {step}: mean loss {baseline:.6f}")
    best_ops = [int(np.argmax(np.asarray(alpha)[s])) for s in range(nslots)]
    return best_ops, params, history
