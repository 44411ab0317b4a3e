"""Misc helpers (reference ``utils.py``): staging/run benchmark, arg aliasing."""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Optional, Sequence, Tuple

__all__ = ["benchmark", "arg_alias", "return_partial", "append", "cost_analysis"]


def cost_analysis(f: Callable[..., Any], *args: Any, **kws: Any) -> dict:
    """XLA cost analysis of a jitted function: FLOPs, bytes accessed, etc.

    The tracing/profiling hook of SURVEY.md §5 — analog of the reference's
    ``contraction_info=True`` cost report (``cons.py:1084-1120``) but for any
    compiled program.
    """
    import jax

    jitted = f if hasattr(f, "lower") else jax.jit(f)
    compiled = jitted.lower(*args, **kws).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return dict(ca)
    except Exception:
        return {}


def benchmark(f: Callable[..., Any], *args: Any, tries: int = 5, verbose: bool = True) -> Tuple[Any, float, float]:
    """(result, staging_time, running_time) — compile vs steady-state timing.

    Reference ``utils.py:219``; blocks on jax async dispatch.
    """
    import jax

    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    staging = time.time() - t0
    t0 = time.time()
    for _ in range(tries):
        out = f(*args)
    jax.block_until_ready(out)
    running = (time.time() - t0) / tries
    if verbose:
        print(f"staging time: {staging:.6f}s, running time: {running:.6f}s")
    return out, staging, running


def arg_alias(
    f: Optional[Callable[..., Any]] = None,
    alias_dict: Optional[dict] = None,
    fix_doc: bool = True,
) -> Callable[..., Any]:
    """Decorator mapping alternative kwarg names onto canonical ones.

    Reference ``utils.py:132``: ``@arg_alias(alias_dict={"theta": ["angle"]})``.
    """

    def deco(func: Callable[..., Any]) -> Callable[..., Any]:
        @functools.wraps(func)
        def wrapper(*args: Any, **kws: Any) -> Any:
            for canonical, aliases in (alias_dict or {}).items():
                for a in aliases:
                    if a in kws and canonical not in kws:
                        kws[canonical] = kws.pop(a)
            return func(*args, **kws)

        return wrapper

    if f is not None:
        return deco(f)
    return deco


def return_partial(f: Callable[..., Any], return_argnums: Any = 0) -> Callable[..., Any]:
    """Wrap f to return only selected outputs (reference helper)."""
    if isinstance(return_argnums, int):
        return_argnums = (return_argnums,)

    @functools.wraps(f)
    def wrapper(*args: Any, **kws: Any) -> Any:
        out = f(*args, **kws)
        picked = tuple(out[i] for i in return_argnums)
        return picked[0] if len(picked) == 1 else picked

    return wrapper


def append(f: Callable[..., Any], *post: Callable[..., Any]) -> Callable[..., Any]:
    """Compose post-processing functions after f (reference helper)."""

    @functools.wraps(f)
    def wrapper(*args: Any, **kws: Any) -> Any:
        out = f(*args, **kws)
        for p in post:
            out = p(out)
        return out

    return wrapper


def is_sequence(x: Any) -> bool:
    """True for list/tuple (reference ``utils.py`` helper)."""
    return isinstance(x, (list, tuple))


def is_number(x: Any) -> bool:
    """True for python/numpy scalar numbers (reference ``utils.py`` helper)."""
    import numbers

    import numpy as _np

    return isinstance(x, (numbers.Number, _np.number))


def is_m1mac() -> bool:
    """True on Apple-silicon macOS (reference ``utils.py`` helper)."""
    import platform

    return platform.system() == "Darwin" and platform.processor() == "arm"


def gpu_memory_share(flag: bool = True) -> None:
    """Set ``TF_FORCE_GPU_ALLOW_GROWTH`` (reference ``utils.py:13``; no-op on TPU)."""
    import os

    os.environ["TF_FORCE_GPU_ALLOW_GROWTH"] = "true" if flag else "false"
