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


# ======================================================================
# reference-parity DQAS infrastructure (applications/dqas.py:38-972)
# ======================================================================

import itertools as _itertools
import sys as _sys
from typing import Iterator

_op_pool: Sequence[Any] = []


def set_op_pool(l: Sequence[Any]) -> None:
    """Set the global operator pool (role of reference ``dqas.py:38``)."""
    global _op_pool
    _op_pool = l


def get_op_pool() -> Sequence[Any]:
    """Get the global operator pool (role of reference ``dqas.py:44``)."""
    return _op_pool


def get_var(name: str) -> Any:
    """Fetch a local from the nearest enclosing frame that defines it.

    Plays the role of the reference's fixed-depth stack peek (``dqas.py:52``)
    but walks outward until the name is found, so helpers may be nested at
    any depth inside the search loop.
    """
    frame = _sys._getframe(1)
    while frame is not None:
        if name in frame.f_locals:
            return frame.f_locals[name]
        frame = frame.f_back
    raise KeyError(f"no enclosing DQAS frame defines {name!r}")


def verbose_output(max_prob: bool = True, weight: bool = True) -> None:
    """Report loop diagnostics from inside a DQAS search (role of ref :64)."""
    lines: List[str] = []
    if max_prob:
        peaks = np.asarray(get_var("prob")).max(axis=1)
        lines.append(f"max probability for each layer:\n{peaks}")
    if weight:
        active = get_weights(get_var("nnp"), get_var("stp"))
        lines.append(f"associating weights: {np.asarray(active)}")
    print("\n".join(lines))


def preset_byprob(prob: Any) -> List[int]:
    """Draw one op index per layer via vectorized inverse-CDF sampling
    (role of reference :86)."""
    prob = np.asarray(prob, dtype=np.float64)
    cdf = np.cumsum(prob, axis=1)
    u = np.random.random(prob.shape[0]) * cdf[:, -1]
    picks = (u[:, None] > cdf).sum(axis=1)
    return np.minimum(picks, prob.shape[1] - 1).astype(int).tolist()


def get_preset(stp: Any) -> Any:
    """argmax op per layer (role of reference :96)."""
    return jnp.argmax(jnp.asarray(stp), axis=1)


def get_weights(nnp: Any, stp: Any = None, preset: Optional[Sequence[int]] = None) -> Any:
    """Per-layer weights selected by preset/argmax(stp) (role of ref :100)."""
    nnp = jnp.asarray(nnp)
    idx = get_preset(stp) if preset is None else jnp.asarray(preset, dtype=jnp.int32)
    return jnp.take_along_axis(nnp, idx[:, None], axis=1)[:, 0]


def get_weights_v2(nnp: Any, preset: Sequence[int]) -> Any:
    """Multi-param-per-op variant (role of reference :118): gathers the
    chosen op's parameter row per layer, squeezing a trailing singleton."""
    nnp = jnp.asarray(nnp)
    if nnp.ndim != 3:
        return get_weights(nnp, preset=list(preset))
    idx = jnp.asarray(preset, dtype=jnp.int32)[:, None, None]
    picked = jnp.take_along_axis(nnp, jnp.broadcast_to(idx, (nnp.shape[0], 1, nnp.shape[2])), axis=1)[:, 0, :]
    return picked[:, 0] if nnp.shape[2] == 1 else picked


def parallel_kernel(
    prob: Any,
    gdata: Any,
    nnp: Any,
    kernel_func: Callable[[Any, Any, Sequence[int]], Tuple[Any, Any]],
) -> Tuple[Any, Any, Any]:
    """One MC sample: draw a preset, evaluate, return (loss, gnnp, ∇lnP).

    Role of reference :133; ∇_stp lnP(preset) for a softmax categorical is
    onehot(preset) − prob, built here by row indexing into an identity. The
    reference reseeds np.random because it forks worker processes; we run
    in-process (vmap supersedes pools on TPU) so reseeding is deliberately
    omitted — it would clobber the caller's seed.
    """
    prob = np.asarray(prob)
    preset = preset_byprob(prob)
    loss, gnnp = kernel_func(gdata, nnp, preset)
    score = np.eye(prob.shape[1])[preset] - prob
    return loss, gnnp, jnp.asarray(score, dtype=jnp.float32)


def void_generator() -> Iterator[Any]:
    return _itertools.repeat(None)


def single_generator(g: Any) -> Iterator[Any]:
    return _itertools.repeat(g)


def history_loss() -> Any:
    """Current baseline loss inside a DQAS loop (role of reference :175)."""
    return np.asarray(get_var("avcost1"))


def repr_op(element: Any) -> str:
    """Readable operator name (role of reference :179)."""
    if isinstance(element, str):
        return element
    if isinstance(element, (list, tuple)):
        return str(tuple(map(repr_op, element)))
    first_doc_line = (getattr(element, "__doc__", None) or "").split("\n", 1)[0]
    return first_doc_line or repr(element)


DQAS_search_simple = DQAS_search  # keep the compact API under its own name


def _dqas_search_reference(
    kernel_func: Callable[[Any, Any, Sequence[int]], Tuple[Any, Any]],
    *,
    g: Optional[Iterator[Any]] = None,
    op_pool: Optional[Sequence[Any]] = None,
    p: Optional[int] = None,
    p_nnp: Optional[int] = None,
    p_stp: Optional[int] = None,
    batch: int = 300,
    prethermal: int = 0,
    epochs: int = 100,
    parallel_num: int = 0,
    verbose: bool = False,
    verbose_func: Optional[Callable[[], None]] = None,
    history_func: Optional[Callable[[], Any]] = None,
    prob_clip: Optional[float] = None,
    baseline_func: Optional[Callable[[Sequence[float]], float]] = None,
    pertubation_func: Optional[Callable[[], Any]] = None,
    nnp_initial_value: Optional[Any] = None,
    stp_initial_value: Optional[Any] = None,
    network_opt: Any = None,
    structure_opt: Any = None,
    prethermal_opt: Any = None,
    prethermal_preset: Optional[Sequence[int]] = None,
    stp_regularization: Optional[Callable[[Any, Any], Any]] = None,
    nnp_regularization: Optional[Callable[[Any, Any], Any]] = None,
) -> Tuple[Any, Any, Sequence[Any]]:
    """Reference-signature DQAS entrypoint (``dqas.py:190``), JAX-native.

    ``kernel_func(gdata, nnp, preset) -> (loss, grad_nnp)``; the structure
    distribution updates by REINFORCE with the batch-mean baseline;
    ``parallel_num`` is accepted for parity — batching replaces
    multiprocessing on TPU (the reference itself notes vmap supersedes it).
    """
    import optax

    if op_pool is None:
        op_pool = get_op_pool()
    c = len(op_pool)
    set_op_pool(op_pool)
    if g is None:
        g = void_generator()
    if network_opt is None:
        network_opt = optax.adam(0.1)
    if structure_opt is None:
        structure_opt = optax.adam(0.1, b1=0.8, b2=0.99)
    if prethermal_opt is None:
        prethermal_opt = optax.adam(0.1)
    if nnp_initial_value is None:
        if p_nnp is None:
            p_nnp = p
        if p_nnp is None:
            raise ValueError(
                "cannot infer the nnp parameter shape: pass nnp_initial_value, p_nnp, or p"
            )
        nnp_initial_value = np.random.uniform(size=[p_nnp, c])
    if stp_initial_value is None:
        if p_stp is None:
            p_stp = p
        if p_stp is None:
            raise ValueError(
                "cannot infer the stp parameter shape: pass stp_initial_value, p_stp, or p"
            )
        stp_initial_value = np.zeros([p_stp, c])
    if p is None:
        p = stp_initial_value.shape[0]
    if baseline_func is None:
        baseline_func = np.mean
    nnp = jnp.asarray(nnp_initial_value, dtype=jnp.float32)
    stp = jnp.asarray(stp_initial_value, dtype=jnp.float32)
    net_state = network_opt.init(nnp)
    struct_state = structure_opt.init(stp)
    pre_state = prethermal_opt.init(nnp)
    history: List[Any] = []
    avcost1 = 0.0

    prob = jax.nn.softmax(stp, axis=-1)
    for _, gdata in zip(range(prethermal), g):
        preset = prethermal_preset or preset_byprob(prob)
        _, gnnp = kernel_func(gdata, nnp, preset)
        updates, pre_state = prethermal_opt.update(jnp.asarray(gnnp), pre_state, nnp)
        nnp = optax.apply_updates(nnp, updates)

    for epoch in range(epochs):
        prob = jax.nn.softmax(stp, axis=-1)
        if prob_clip is not None:
            prob = jnp.clip(prob, (1 - prob_clip) / c, prob_clip)
            prob = prob / jnp.sum(prob, axis=1, keepdims=True)
        deri_stp, deri_nnp, costl = [], [], []
        stp_pen = (
            stp_regularization(stp, nnp) if stp_regularization is not None else 0.0
        )
        nnp_pen = (
            nnp_regularization(stp, nnp) if nnp_regularization is not None else 0.0
        )
        for _, gdata in zip(range(batch), g):
            loss, gnnp, gs = parallel_kernel(
                prob,
                gdata,
                nnp + pertubation_func() if pertubation_func is not None else nnp,
                kernel_func,
            )
            lossf = float(np.real(np.asarray(jax.device_get(loss))))
            deri_stp.append((lossf - float(np.asarray(avcost1))) * np.asarray(gs))
            deri_nnp.append(np.asarray(jax.device_get(gnnp)))
            costl.append(lossf)
        avcost1 = baseline_func(costl)
        batched_gs = jnp.asarray(np.mean(deri_stp, axis=0), dtype=jnp.float32) + stp_pen
        batched_gnnp = jnp.asarray(np.mean(deri_nnp, axis=0), dtype=jnp.float32) + nnp_pen
        updates, net_state = network_opt.update(batched_gnnp, net_state, nnp)
        nnp = optax.apply_updates(nnp, updates)
        updates, struct_state = structure_opt.update(batched_gs, struct_state, stp)
        stp = optax.apply_updates(stp, updates)
        if verbose:  # pragma: no cover
            print(f"epoch {epoch}: mean loss {np.mean(costl):.6f} baseline {avcost1:.6f}")
            if verbose_func is not None:
                verbose_func()
        if history_func is not None:
            history.append(history_func())
        else:
            history.append(float(np.mean(costl)))
    return stp, nnp, history


_DQAS_search_simple_impl = DQAS_search_simple


def _dqas_dispatch(*args: Any, **kws: Any) -> Any:
    """``DQAS_search``: reference kernel_func API, or the compact
    (op_pool, nslots, loss_fn) form kept for backward compatibility."""
    if "loss_fn" in kws or "nslots" in kws or (len(args) >= 3 and not callable(args[0])):
        return _DQAS_search_simple_impl(*args, **kws)
    return _dqas_search_reference(*args, **kws)


DQAS_search = _dqas_dispatch  # type: ignore[assignment]


def qaoa_simple_train(
    preset: Sequence[int],
    graph: Any,
    vag_func: Optional[Any] = None,
    epochs: int = 60,
    batch: int = 1,
    nnp_shape: Optional[Sequence[int]] = None,
    nnp_initial_value: Optional[Any] = None,
    opt: Any = None,
    verbose: bool = False,
) -> Tuple[Any, float]:
    """Train circuit weights for a FIXED preset (reference ``dqas.py:454``)."""
    import optax

    from . import vags as _vags

    if vag_func is None:
        vag_func = _vags.qaoa_vag_energy
    if hasattr(graph, "edges"):
        gen = single_generator(graph)
    elif isinstance(graph, (list, tuple)):
        def _cyc() -> Iterator[Any]:
            while True:
                for gg in graph:
                    yield gg

        gen = _cyc()
    else:
        gen = graph
    c = len(get_op_pool())
    if nnp_initial_value is None:
        shape = list(nnp_shape) if nnp_shape is not None else [len(preset), c]
        nnp_initial_value = np.random.uniform(size=shape)
    nnp = jnp.asarray(nnp_initial_value, dtype=jnp.float32)
    if opt is None:
        opt = optax.adam(0.05)
    state = opt.init(nnp)
    loss = 0.0
    for _epoch in range(epochs):
        grad = jnp.zeros_like(nnp)
        lsum = 0.0
        for _ in range(batch):
            gdata = next(gen)
            loss, gnnp = vag_func(gdata, nnp, preset)
            grad = grad + jnp.asarray(gnnp) / batch
            lsum += float(np.real(np.asarray(jax.device_get(loss)))) / batch
        updates, state = opt.update(grad, state, nnp)
        nnp = optax.apply_updates(nnp, updates)
        if verbose and _epoch % 10 == 0:  # pragma: no cover
            print(f"epoch {_epoch}: loss {lsum:.6f}")
    return nnp, lsum


def parallel_qaoa_train(
    preset: Sequence[int],
    g: Any,
    vag_func: Any = None,
    opt: Any = None,
    epochs: int = 60,
    tries: int = 16,
    batch: int = 1,
    cores: int = 0,
    loc: float = 0.0,
    scale: float = 0.2,
    verbose: bool = False,
) -> Sequence[Any]:
    """Multi-restart training for a fixed preset (reference ``dqas.py:528``).

    The reference farms tries over multiprocessing; here restarts run
    sequentially (or could be vmapped by the caller) — TPU-friendly.
    """
    c = len(get_op_pool())
    results = []
    for t in range(tries):
        init = np.random.normal(loc=loc, scale=scale, size=[len(preset), c])
        nnp, loss = qaoa_simple_train(
            preset, g, vag_func=vag_func, epochs=epochs, batch=batch,
            nnp_initial_value=init, opt=opt, verbose=False,
        )
        results.append((nnp, loss))
        if verbose:  # pragma: no cover
            print(f"try {t}: loss {loss:.6f}")
    return results


def evaluate_everyone(
    vag_func: Any,
    gdata: Iterator[Any],
    nnp: Any,
    presets: Sequence[Sequence[int]],
    batch: int = 1,
) -> Sequence[Tuple[Any, float]]:
    """Mean loss of each candidate preset (reference ``dqas.py:598``)."""
    losses = []
    nnp = jnp.asarray(nnp, dtype=jnp.float32)
    for preset in presets:
        loss = 0.0
        for _, g in zip(range(batch), gdata):
            loss += float(np.real(np.asarray(jax.device_get(vag_func(g, nnp, preset)[0]))))
        losses.append((preset, loss / batch))
    return losses


# -- probabilistic-model (VAN/MADE) based DQAS (reference dqas.py:621-972) --


def van_sample(prob_model: Any, batch_size: int, key: Optional[Any] = None) -> Tuple[Any, List[Any]]:
    """Sample architectures + per-sample ∇lnP pytrees from a MADE model.

    Reference ``dqas.py:621`` (TF GradientTape); here ``prob_model`` is a
    dict ``{"model": flax MADE, "params": pytree}``; returns (samples,
    [grad pytree per sample]).
    """
    model, params = prob_model["model"], prob_model["params"]
    if key is None:
        key = jax.random.key(np.random.randint(0, 2**31 - 1))
    samples = model.apply(params, key, batch_size, method=model.sample)

    def lnp_one(p: Any, x: Any) -> Any:
        return model.apply(p, x[None, :], method=model.log_prob)[0]

    glnprob_list = [jax.grad(lnp_one)(params, samples[i]) for i in range(batch_size)]
    return samples, glnprob_list


def van_regularization(prob_model: Any, nnp: Any = None, lbd_w: float = 0.01, lbd_b: float = 0.01) -> Any:
    """L2 regularization over the VAN's kernels/biases (reference :636)."""
    params = prob_model["params"] if isinstance(prob_model, dict) else prob_model
    leaves = jax.tree_util.tree_leaves_with_path(params)
    reg = 0.0
    for path, leaf in leaves:
        name = str(path[-1]) if path else ""
        lbd = lbd_b if "bias" in name else lbd_w
        reg = reg + lbd * jnp.sum(jnp.asarray(leaf) ** 2)
    return reg


def micro_sample(
    prob_model: Any,
    batch_size: int,
    repetitions: Optional[List[int]] = None,
    key: Optional[Any] = None,
) -> Tuple[Any, List[Any]]:
    """van_sample with layer-repetition expansion (reference ``dqas.py:642``)."""
    samples, glnprob_list = van_sample(prob_model, batch_size, key=key)
    samples = np.asarray(jax.device_get(samples)).astype(np.int32)
    if repetitions:
        # expand layer choices to their repeated slots by column gather
        samples = samples[:, np.asarray(repetitions, dtype=np.intp)]
    return jnp.asarray(samples), glnprob_list


def DQAS_search_pmb(
    kernel_func: Callable[[Any, Any, Sequence[int]], Tuple[Any, Any]],
    prob_model: Any,
    *,
    sample_func: Optional[Callable[..., Any]] = None,
    g: Optional[Iterator[Any]] = None,
    op_pool: Optional[Sequence[Any]] = None,
    p_nnp: Optional[int] = None,
    batch: int = 16,
    epochs: int = 20,
    verbose: bool = False,
    nnp_initial_value: Optional[Any] = None,
    network_opt: Any = None,
    structure_opt: Any = None,
    loss_func: Optional[Callable[[Any], Any]] = None,
    loss_derivative_func: Optional[Callable[[Any], Any]] = None,
    validate_period: int = 0,
) -> Tuple[Any, Any, Sequence[Any]]:
    """Probabilistic-model-based DQAS (reference ``dqas.py:666``).

    The architecture distribution is an autoregressive model (MADE); its
    parameters update by REINFORCE over sampled presets; circuit weights by
    the kernel gradients.
    """
    import optax

    if op_pool is None:
        op_pool = get_op_pool()
    c = len(op_pool)
    set_op_pool(op_pool)
    if g is None:
        g = void_generator()
    if sample_func is None:
        sample_func = van_sample
    if network_opt is None:
        network_opt = optax.adam(0.1)
    if structure_opt is None:
        structure_opt = optax.adam(0.01)
    model, mparams = prob_model["model"], prob_model["params"]
    if nnp_initial_value is None:
        if p_nnp is None:
            p_nnp = model.n
        nnp_initial_value = np.random.uniform(size=[p_nnp, c])
    nnp = jnp.asarray(nnp_initial_value, dtype=jnp.float32)
    net_state = network_opt.init(nnp)
    struct_state = structure_opt.init(mparams)
    history: List[Any] = []
    for epoch in range(epochs):
        samples, glnprob_list = sample_func(prob_model, batch)
        samples_np = np.asarray(jax.device_get(samples)).astype(np.int32)
        losses, gnnps = [], []
        for b in range(batch):
            gdata = next(g)
            # binary MADE bits -> op index (c == 2) or modulo for small pools
            preset = [int(x) % c for x in samples_np[b]]
            loss, gnnp = kernel_func(gdata, nnp, preset)
            losses.append(float(np.real(np.asarray(jax.device_get(loss)))))
            gnnps.append(np.asarray(jax.device_get(gnnp)))
        baseline = float(np.mean(losses))
        # REINFORCE over the model parameters
        gstruct = jax.tree_util.tree_map(jnp.zeros_like, mparams)
        for b in range(batch):
            adv = (losses[b] - baseline) / batch
            gstruct = jax.tree_util.tree_map(
                lambda acc, gl: acc + adv * gl, gstruct, glnprob_list[b]
            )
        updates, struct_state = structure_opt.update(gstruct, struct_state, mparams)
        mparams = optax.apply_updates(mparams, updates)
        prob_model["params"] = mparams
        gnnp_mean = jnp.asarray(np.mean(gnnps, axis=0), dtype=jnp.float32)
        updates, net_state = network_opt.update(gnnp_mean, net_state, nnp)
        nnp = optax.apply_updates(nnp, updates)
        history.append(baseline)
        if verbose:  # pragma: no cover
            print(f"epoch {epoch}: mean loss {baseline:.6f}")
    return prob_model, nnp, history
