"""Contraction engine: path finding, execution, slicing, cost introspection.

Counterpart of the reference's contraction machinery (``cons.py:845-1260``):
paths come from opt_einsum (greedy/optimal/branch/custom optimizers, matching
``set_contractor``), execution is an opt_einsum expression dispatched to
jax.numpy (one fused XLA program under jit), and **index slicing** splits the
largest indices so each slice's biggest intermediate fits in memory — the
reference's cotengra ``slicing_reconf_opts`` role (``experimental.py:936``),
implemented with a greedy frequency heuristic.  Paths are cached by IR
signature (the reference's stable-node-id path cache, ``cons.py:773-800``).
"""

from __future__ import annotations

import logging
import math
from functools import lru_cache
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .einsum_ir import EinsumIR

logger = logging.getLogger(__name__)

Tensor = Any

__all__ = [
    "find_path",
    "contract_ir",
    "contraction_info",
    "choose_slices",
    "sliced_contract_ir",
]

_PATH_CACHE: Dict[Tuple, Any] = {}
_INFO_PRINTED: set = set()


def _optimizer_from_config(opts: Optional[dict] = None) -> Any:
    from .. import config

    cfg = config.current()
    method = cfg.contractor
    options = dict(cfg.contractor_options or {})
    if opts:
        options.update(opts)
        method = options.pop("method", method)
    # meta-options consumed by contract_ir, not by path optimizers
    options.pop("contraction_info", None)
    options.pop("debug_level", None)
    if method in ("auto", "plain"):
        return "auto" if method == "auto" else None
    if method == "custom":
        return options.get("optimizer")
    if method in ("treesa", "sa"):
        from .native import TreeSAOptimizer, treesa_available

        if treesa_available():
            return TreeSAOptimizer(**options)
        logger.warning("treesa native lib unavailable; falling back to greedy")
        return "greedy"
    return method  # "greedy", "optimal", "branch-2", "dp", ...


def find_path(ir: EinsumIR, optimizer: Any = None) -> Tuple[List[Tuple[int, int]], Any]:
    """Find (and cache) a pairwise contraction path for the IR."""
    import opt_einsum as oe

    if optimizer is None:
        optimizer = _optimizer_from_config()
    key = (ir.signature(), str(optimizer))
    if key in _PATH_CACHE:
        return _PATH_CACHE[key]
    subscripts = ir.to_subscripts()
    shapes = ir.shapes()
    if optimizer is None:  # "plain": left-to-right pairwise
        path = [(0, 1)] * (len(shapes) - 1)
        info = None
    else:
        path, info = oe.contract_path(
            subscripts, *shapes, shapes=True, optimize=optimizer
        )
        if (
            isinstance(optimizer, str)
            and optimizer in ("auto", "greedy")
            and info is not None
            and float(info.opt_cost) > 1e10
        ):
            # hard network: greedy-class paths can be orders of magnitude off
            # (measured 10^27.4 -> 10^24.8 on an 8x8 depth-16 grid circuit);
            # escalate to the seeded annealer, keep whichever plan is better
            from .native import TreeSAOptimizer, treesa_available

            if treesa_available():
                path2, info2 = oe.contract_path(
                    subscripts,
                    *shapes,
                    shapes=True,
                    optimize=TreeSAOptimizer(
                        n_iters=400000, restarts=2, size_weight=0.5
                    ),
                )
                if float(info2.opt_cost) < float(info.opt_cost):
                    path, info = path2, info2
    _PATH_CACHE[key] = (path, info)
    return path, info


def contraction_info(ir: EinsumIR, optimizer: Any = None) -> Dict[str, Any]:
    """FLOP / max-intermediate-size report (reference ``cons.py:1084-1120``)."""
    _, info = find_path(ir, optimizer)
    if info is None:
        return {}
    return {
        "flops": float(info.opt_cost),
        "log10[FLOPs]": math.log10(max(info.opt_cost, 1)),
        "log2[SIZE]": math.log2(max(info.largest_intermediate, 1)),
        "largest_intermediate": float(info.largest_intermediate),
        "path": info.path,
    }


def get_tn_info(obj: Any, output_order: Any = None) -> Tuple[List[Tuple[int, ...]], Tuple[int, ...], Dict[int, int]]:
    """Export the ``(inputs, output, size_dict)`` contraction topology.

    Reference parity: ``cons.py:804`` (``get_tn_info`` over tn node lists).
    Here the topology IS the framework's :class:`EinsumIR`; accepts an
    ``EinsumIR`` directly or any circuit exposing ``_expanded_qir`` (uses its
    state network).  ``output_order`` is accepted for signature parity and
    ignored (the IR's output ordering is canonical wire order).
    """
    if isinstance(obj, EinsumIR):
        ir = obj
    elif hasattr(obj, "_expanded_qir"):
        from . import einsum_ir as _eir

        ir = _eir.circuit_state_ir(obj._expanded_qir(), obj._nqubits, d=getattr(obj, "_d", 2))
    else:
        raise TypeError(f"get_tn_info expects an EinsumIR or a circuit, got {type(obj)}")
    return list(ir.inputs), tuple(ir.output), dict(ir.size_dict)


def _contraction_steps(
    inputs: Sequence[Tuple[int, ...]],
    output: Tuple[int, ...],
    size_dict: Dict[int, int],
    path: Any,
) -> List[Tuple[Tuple[int, ...], str]]:
    """Pairwise einsum steps ((operand positions), subscripts) for a path.

    Cached per signature by the callers; executed with plain ``jnp.einsum``
    so numpy constants lift directly and tracers pass through — opt_einsum's
    own jax backend re-jits and calls ``np.asarray`` on results, which breaks
    under an outer trace and cannot fetch complex buffers on axon.
    """
    import opt_einsum as oe

    shapes = [tuple(size_dict[i] for i in inp) for inp in inputs]
    ids = sorted({i for inp in inputs for i in inp} | set(output))
    sym = {i: oe.get_symbol(k) for k, i in enumerate(ids)}
    lhs = ",".join("".join(sym[i] for i in inp) for inp in inputs)
    rhs = "".join(sym[i] for i in output)
    _, info = oe.contract_path(f"{lhs}->{rhs}", *shapes, shapes=True, optimize=path)
    return [
        (tuple(contraction[0]), contraction[2])
        for contraction in info.contraction_list
    ]


def _execute_steps(steps: Sequence[Tuple[Tuple[int, ...], str]], operands: Sequence[Any]) -> Any:
    ops = list(operands)
    for positions, es in steps:
        # positions come sorted descending from opt_einsum; the einsum
        # subscripts follow this pop order
        arrs = [ops.pop(i) for i in positions]
        ops.append(jnp.einsum(es, *arrs))
    assert len(ops) == 1
    return ops[0]


_STEPS_CACHE: Dict[Tuple, Any] = {}


def _steps_for(
    inputs: Sequence[Tuple[int, ...]],
    output: Tuple[int, ...],
    size_dict: Dict[int, int],
    path: Any,
) -> List[Tuple[Tuple[int, ...], str]]:
    key = (tuple(inputs), tuple(output), tuple(sorted(size_dict.items())), str(path))
    if key not in _STEPS_CACHE:
        _STEPS_CACHE[key] = _contraction_steps(inputs, output, size_dict, path)
    return _STEPS_CACHE[key]


def contract_ir(
    ir: EinsumIR,
    optimizer: Any = None,
    dry_run: bool = False,
    strip_exponent: bool = False,
) -> Any:
    """Contract the IR into its output tensor (jit/vmap/grad-transparent).

    ``dry_run`` returns zeros of the output shape without contracting (the
    reference's ``debug_level=2`` shape-only mode, ``cons.py:928-946``);
    ``strip_exponent`` rescales operands and returns ``(value, log_factor)``
    with the true result = value * exp(log_factor) — for huge-magnitude
    networks (reference ``cons.py:736-740``).
    """
    from .. import config as _cfg

    meta = dict(_cfg.current().contractor_options or {})
    if int(meta.get("debug_level", 0)) >= 2:
        dry_run = True  # reference cons.py:928-946 shape-only mode
    out_shape = tuple(ir.size_dict[i] for i in ir.output)
    if dry_run:
        t0 = ir.tensors[0]
        return jnp.zeros(out_shape, dtype=t0.dtype if hasattr(t0, "dtype") else np.asarray(t0).dtype)
    if meta.get("contraction_info"):
        sig = ir.signature()
        if sig not in _INFO_PRINTED:
            _INFO_PRINTED.add(sig)
            info = contraction_info(ir, optimizer)
            if info:
                print(
                    "------ contraction cost summary ------\n"
                    f"log10[FLOPs]: {info['log10[FLOPs]']:.3f}  "
                    f"log2[SIZE]: {info['log2[SIZE]']:.3f}  "
                    f"ops: {len(ir.inputs)}"
                )
    path, _ = find_path(ir, optimizer)
    steps = _steps_for(ir.inputs, ir.output, ir.size_dict, path)
    if not strip_exponent:
        return _execute_steps(steps, ir.tensors)
    scaled = []
    log_factor = jnp.zeros((), dtype=jnp.float32)
    for t in ir.tensors:
        # no eager jnp.asarray: numpy constants must stay numpy (axon cannot
        # lower complex device-array constants inside jit)
        s = jnp.max(jnp.abs(t))
        s = jnp.where(s == 0, 1.0, s)
        scaled.append(t / s.astype(t.dtype))
        log_factor = log_factor + jnp.log(s).astype(jnp.float32)
    val = _execute_steps(steps, scaled)
    return val, log_factor


# ------------------------------------------------------------------
# slicing
# ------------------------------------------------------------------


def choose_slices(
    ir: EinsumIR,
    target_size: int = 2**28,
    max_slices: int = 4096,
    optimizer: Any = None,
) -> List[int]:
    """Greedy slice-index selection until the largest intermediate fits.

    Repeatedly: find path on the (sliced) network, identify the largest
    intermediate, slice the most frequent index appearing in it.  This is
    the role cotengra's ``slicing_reconf_opts`` plays in the reference.
    """
    import opt_einsum as oe

    sliced: List[int] = []
    cur_inputs = [list(inp) for inp in ir.inputs]

    for _ in range(int(math.log2(max_slices)) + 1):
        sub_ir = EinsumIR(
            [tuple(i for i in inp if i not in sliced) for inp in cur_inputs],
            tuple(i for i in ir.output if i not in sliced),
            ir.size_dict,
            ir.tensors,
        )
        try:
            path, info = oe.contract_path(
                sub_ir.to_subscripts(), *sub_ir.shapes(), shapes=True,
                optimize=optimizer if optimizer is not None else "greedy",
            )
        except Exception:  # pragma: no cover
            break
        # locate the largest intermediate from the contraction list itself
        big_inds: List[str] = []
        big_size = 0
        for contraction in info.contraction_list:
            einsum_str = contraction[2]
            out_part = einsum_str.split("->")[1]
            size = 1
            for ch in out_part:
                size *= info.size_dict[ch]
            if size > big_size:
                big_size = size
                big_inds = list(out_part)
        if big_size <= target_size or not big_inds:
            break
        # map symbols back to ids
        ids = sorted(
            {i for inp in sub_ir.inputs for i in inp} | set(sub_ir.output)
        )
        sym2id = {oe.get_symbol(k): i for k, i in enumerate(ids)}
        # most frequent index (among network inputs) in the big intermediate;
        # NEVER slice an open output index — sliced_contract_ir SUMS over
        # slices, which would marginalize an output leg
        out_set = set(ir.output)
        freq: Dict[int, int] = {}
        for ch in big_inds:
            iid = sym2id.get(ch)
            if iid is None or iid in out_set:
                continue
            freq[iid] = sum(1 for inp in cur_inputs if iid in inp)
        if not freq:
            break
        pick = max(freq, key=lambda k: (freq[k], k))
        sliced.append(pick)
    return sliced


def sliced_contract_ir(
    ir: EinsumIR,
    sliced_indices: Sequence[int],
    slice_ids: Optional[Tensor] = None,
    optimizer: Any = None,
    slice_weights: Optional[Tensor] = None,
) -> Tensor:
    """Contract with the given indices sliced; sums over slice assignments.

    ``slice_ids`` optionally restricts to a subset of slice assignments
    (int tensor of flat slice ids) — the distribution hook: shard the full
    id range over devices, every device sums its own slice subset.
    """
    import opt_einsum as oe

    bad = [i for i in sliced_indices if i in set(ir.output)]
    if bad:
        raise ValueError(
            f"cannot slice open output indices {bad}: the slice sum would "
            "marginalize an output leg"
        )
    d_sizes = [ir.size_dict[i] for i in sliced_indices]
    nslices = int(np.prod(d_sizes)) if sliced_indices else 1
    if slice_ids is None:
        slice_ids = jnp.arange(nslices)

    sub_inputs = [tuple(i for i in inp if i not in set(sliced_indices)) for inp in ir.inputs]
    sub_ir = EinsumIR(
        sub_inputs,
        tuple(i for i in ir.output if i not in set(sliced_indices)),
        ir.size_dict,
        ir.tensors,
    )
    path, _ = find_path(sub_ir, optimizer)
    steps = _steps_for(sub_ir.inputs, sub_ir.output, sub_ir.size_dict, path)

    def one_slice(flat_id: Tensor) -> Tensor:
        # decode flat id into per-index values
        vals = []
        rem = flat_id
        for sz in reversed(d_sizes):
            vals.append(rem % sz)
            rem = rem // sz
        vals = list(reversed(vals))
        operands = []
        for inp, t in zip(ir.inputs, ir.tensors):
            tt = t  # numpy stays numpy; jnp.take lifts it without a transfer
            cur_axes = list(inp)
            for sid, sval in zip(sliced_indices, vals):
                if sid in cur_axes:
                    ax = cur_axes.index(sid)
                    tt = jnp.take(tt, sval, axis=ax)
                    cur_axes.pop(ax)
            operands.append(tt)
        return _execute_steps(steps, operands)

    out_shape = tuple(ir.size_dict[i] for i in sub_ir.output)
    dtype = jnp.asarray(ir.tensors[0]).dtype
    if slice_weights is None:
        slice_weights = jnp.ones(slice_ids.shape, dtype=jnp.float32)

    def body(acc, sw):
        sid, w = sw
        return acc + w.astype(dtype) * one_slice(sid), None

    init = jnp.zeros(out_shape, dtype=dtype)
    acc, _ = jax.lax.scan(body, init, (slice_ids, slice_weights))
    return acc


# ======================================================================
# reference-parity contraction API (cons.py:29-1314)
# ======================================================================

_SYMBOLS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def get_symbol(i: int) -> str:
    """Deterministic einsum symbol for index i (reference ``cons.get_symbol``)."""
    if i < len(_SYMBOLS):
        return _SYMBOLS[i]
    return chr(192 + i - len(_SYMBOLS))


def sorted_edges(ir: EinsumIR) -> List[int]:
    """Deterministic index ordering of an IR (reference ``sorted_edges``:
    stable-id edge sort; our indices are already integers)."""
    seen: List[int] = []
    for inds in ir.inputs:
        for ix in inds:
            if ix not in seen:
                seen.append(ix)
    return seen


def set_tensornetwork_backend(backend: Optional[str] = None, set_global: bool = True) -> Any:
    """Reference compatibility: the engine is jax-only here (``cons.py:84``)."""
    if backend not in (None, "jax"):
        raise ValueError("this framework executes contractions on jax only")
    return "jax"


class NodesReturn(Exception):
    """Raised by the "before" pseudo-contractor to hand back the uncontracted
    network (reference ``cons.py:964``); carries the IR."""

    def __init__(self, nodes: Any):
        self.nodes = nodes
        super().__init__("uncontracted network captured")


def plain_contractor(ir: EinsumIR, output: Optional[Sequence[int]] = None) -> Any:
    """Pairwise left-to-right contraction, no path search (reference :429)."""
    return contract_ir(ir, optimizer=None)


def experimental_contractor(
    ir: EinsumIR, output: Optional[Sequence[int]] = None, local_steps: int = 2
) -> Any:
    """Greedy path with single-gate prefusion (reference ``cons.py:377``).

    Our IR lowering already fuses single-qubit chains (statevec layer), so
    this reduces to the greedy planned contraction.
    """
    return contract_ir(ir, optimizer="greedy")


def custom(
    ir: EinsumIR,
    optimizer: Any = None,
    output: Optional[Sequence[int]] = None,
    **kws: Any,
) -> Any:
    """Contract with a user-supplied opt_einsum path optimizer (ref :1007)."""
    return contract_ir(ir, optimizer=optimizer)


def custom_stateful(
    ir: EinsumIR,
    optimizer_class: Any = None,
    output: Optional[Sequence[int]] = None,
    **opt_kws: Any,
) -> Any:
    """Contract with a stateful optimizer CLASS instantiated per call (ref :1053)."""
    opt = optimizer_class(**opt_kws) if optimizer_class is not None else None
    return contract_ir(ir, optimizer=opt)


import opt_einsum as _oe


class OMEOptimizer(_oe.paths.PathOptimizer):
    """Simulated-annealing tree optimizer slot (reference ``cons.py:653``:
    the Rust omeco TreeSA; here the native C++ TreeSA plays that role)."""

    def __init__(self, **options: Any):
        from .native import TreeSAOptimizer, treesa_available

        # accept the reference's option names (sc_target/betas/ntrials map
        # loosely onto iteration count / weighting)
        n_iters = int(options.pop("niters", options.pop("steps", options.pop("n_iters", 2000))))
        size_weight = float(options.pop("size_weight", 0.6))
        seed = int(options.pop("seed", 42))
        if treesa_available():
            self._opt = TreeSAOptimizer(n_iters=n_iters, size_weight=size_weight, seed=seed)
        else:  # pragma: no cover
            self._opt = "greedy"

    def __call__(self, inputs: Any, output: Any, size_dict: Any, *args: Any, **kws: Any) -> Any:
        if callable(self._opt):
            return self._opt(inputs, output, size_dict, *args, **kws)
        import opt_einsum

        return opt_einsum.paths.greedy(inputs, output, size_dict)


def contraction_info_decorator(f: Any) -> Any:
    """Wrap an IR-producing function to print cost info per call (ref :1084)."""
    import functools

    @functools.wraps(f)
    def wrapper(*args: Any, **kws: Any) -> Any:
        out = f(*args, **kws)
        try:
            info = contraction_info(out if isinstance(out, EinsumIR) else args[0])
            print(
                "------ contraction cost summary ------\n"
                f"log10[FLOPs]: {info.get('log10[FLOPs]', 0):.3f}  "
                f"log2[SIZE]: {info.get('log2[SIZE]', 0):.1f}  "
                f"ops: {len(info.get('path', []))}"
            )
        except Exception:  # pragma: no cover
            pass
        return out

    return wrapper


_CAPTURE = {"on": False, "store": None}


def function_nodes_capture(f: Any) -> Any:
    """Decorator: calls raise :class:`NodesReturn` with the built IR instead
    of contracting (reference ``function_nodes_capture``)."""
    import functools

    @functools.wraps(f)
    def wrapper(*args: Any, **kws: Any) -> Any:
        with runtime_nodes_capture() as store:
            out = f(*args, **kws)
        if store["ir"] is not None:
            raise NodesReturn(store["ir"])
        return out

    return wrapper


class runtime_nodes_capture:
    """Context manager capturing the last IR built inside (reference name)."""

    def __enter__(self) -> Dict[str, Any]:
        self._store = {"ir": None}
        _CAPTURE["on"] = True
        _CAPTURE["store"] = self._store
        return self._store

    def __exit__(self, *exc: Any) -> None:
        _CAPTURE["on"] = False
        _CAPTURE["store"] = None


def _maybe_capture(ir: EinsumIR) -> None:
    if _CAPTURE["on"] and _CAPTURE["store"] is not None:
        _CAPTURE["store"]["ir"] = ir


def split_rules(
    max_singular_values: Optional[int] = None,
    max_truncation_err: Optional[float] = None,
    relative: bool = False,
) -> Dict[str, Any]:
    """Canonical split-rule dict for gate SVD splitting (reference :1269+)."""
    return {
        "max_singular_values": max_singular_values,
        "max_truncation_err": max_truncation_err,
        "relative": relative,
    }


__all__ += [
    "get_symbol",
    "sorted_edges",
    "set_tensornetwork_backend",
    "NodesReturn",
    "plain_contractor",
    "experimental_contractor",
    "custom",
    "custom_stateful",
    "OMEOptimizer",
    "contraction_info_decorator",
    "function_nodes_capture",
    "runtime_nodes_capture",
    "split_rules",
]
