"""ctypes bindings for native (C++) components.

The reference rides on external native engines for contraction-path search
(kahypar, omeco — SURVEY.md §2.6); here the equivalent is an in-repo C++
simulated-annealing tree optimizer (``native/treesa.cpp``) compiled on first
use with g++ and loaded via ctypes.  Falls back gracefully when no compiler
is available.
"""

from __future__ import annotations

import ctypes
import logging
import math
import os
import subprocess
import tempfile
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["treesa_available", "treesa_path", "TreeSAOptimizer"]

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _build_lib() -> Optional[str]:
    src = os.path.join(_native_dir(), "treesa.cpp")
    out = os.path.join(_native_dir(), "libtreesa.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", out, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except (OSError, subprocess.SubprocessError) as e:
        logger.warning("treesa native build failed: %s", e)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _build_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    base_args = [
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_uint64,
    ]
    lib.treesa_optimize.restype = ctypes.c_double
    lib.treesa_optimize.argtypes = base_args + [ctypes.POINTER(ctypes.c_int)]
    lib.treesa_optimize_seeded.restype = ctypes.c_double
    lib.treesa_optimize_seeded.argtypes = base_args + [
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _LIB = lib
    return _LIB


def treesa_available() -> bool:
    return _load() is not None


def treesa_path(
    inputs: Sequence[Sequence[Any]],
    output: Sequence[Any],
    size_dict: dict,
    n_iters: int = 2000,
    t0: float = 10.0,
    t1: float = 0.05,
    size_weight: float = 0.6,
    seed: int = 42,
    init_path: Optional[List[Tuple[int, int]]] = None,
) -> List[Tuple[int, int]]:
    """SA-optimized contraction path in linear (opt_einsum) format.

    ``init_path`` (linear format) seeds the annealer — pass a known-good
    plan (e.g. opt_einsum greedy) and SA starts there instead of from its
    own internal greedy tree, so the result can only improve on the seed.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native treesa library unavailable (no g++?)")
    ids = sorted({i for inp in inputs for i in inp} | set(output))
    id2pos = {x: k for k, x in enumerate(ids)}
    flat: List[int] = []
    offsets = [0]
    for inp in inputs:
        flat.extend(id2pos[i] for i in inp)
        offsets.append(len(flat))
    out_inds = [id2pos[i] for i in output]
    log2_sizes = [math.log2(size_dict[i]) for i in ids]

    n = len(inputs)
    flat_a = (ctypes.c_int * max(len(flat), 1))(*flat)
    off_a = (ctypes.c_int * len(offsets))(*offsets)
    out_a = (ctypes.c_int * max(len(out_inds), 1))(*out_inds)
    sz_a = (ctypes.c_double * len(log2_sizes))(*log2_sizes)
    path_a = (ctypes.c_int * (2 * (n - 1)))()
    common = (
        n, len(ids), flat_a, off_a, out_a, len(out_inds), sz_a,
        int(n_iters), float(t0), float(t1), float(size_weight), int(seed),
    )
    if init_path is not None:
        ssa = _linear_to_ssa(init_path, n)
        flat_ssa = [x for pair in ssa for x in pair]
        init_a = (ctypes.c_int * len(flat_ssa))(*flat_ssa)
        score = lib.treesa_optimize_seeded(*common, init_a, path_a)
    else:
        score = lib.treesa_optimize(*common, path_a)
    if score < 0:
        raise RuntimeError("treesa optimization failed")
    ssa = [(path_a[2 * k], path_a[2 * k + 1]) for k in range(n - 1)]
    return _ssa_to_linear(ssa, n)


def _linear_to_ssa(path: List[Tuple[int, int]], n: int) -> List[Tuple[int, int]]:
    """Convert an opt_einsum linear path to SSA-id pairs."""
    ids = list(range(n))
    out = []
    next_ssa = n
    for pair in path:
        ia, ib = (pair if len(pair) == 2 else (pair[0], pair[0]))
        if ia > ib:
            ia, ib = ib, ia
        out.append((ids[ia], ids[ib]))
        ids.pop(ib)
        ids.pop(ia)
        ids.append(next_ssa)
        next_ssa += 1
    return out


def _ssa_to_linear(ssa: List[Tuple[int, int]], n: int) -> List[Tuple[int, int]]:
    """Convert SSA-id pairs to opt_einsum linear path (positions in live list)."""
    ids = list(range(n))
    out = []
    next_ssa = n
    for a, b in ssa:
        ia = ids.index(a)
        ib = ids.index(b)
        if ia > ib:
            ia, ib = ib, ia
        out.append((ia, ib))
        ids.pop(ib)
        ids.pop(ia)
        ids.append(next_ssa)
        next_ssa += 1
    return out


try:
    from opt_einsum.paths import PathOptimizer as _OEPathOptimizer
except ImportError:  # pragma: no cover
    _OEPathOptimizer = object  # type: ignore


class TreeSAOptimizer(_OEPathOptimizer):
    """opt_einsum-compatible path optimizer backed by the C++ SA engine.

    Plug in anywhere an ``optimize=`` argument is accepted, or via
    ``tc.set_contractor("custom", optimizer=TreeSAOptimizer())``.
    """

    def __init__(
        self,
        n_iters: int = 2000,
        size_weight: float = 0.6,
        seed: int = 42,
        seed_from_greedy: bool = True,
        restarts: int = 2,
        skip_below_log10_flops: float = 9.0,
    ):
        self.n_iters = n_iters
        self.size_weight = size_weight
        self.seed = seed
        self.seed_from_greedy = seed_from_greedy
        self.restarts = max(1, restarts)
        #: easy-network policy: when the greedy seed's cost is already below
        #: 10^this, annealing cannot buy back its multi-second search time —
        #: return the seed immediately (measured: treesa burned 5-16 s to
        #: TIE greedy on every chain case in benchmarks/path_quality_results
        #: .json; set to -inf to always anneal)
        self.skip_below_log10_flops = float(skip_below_log10_flops)

    def _greedy_seed(self, inputs, output, size_dict):
        try:
            import opt_einsum as oe

            return oe.paths.greedy(
                [frozenset(i) for i in inputs], frozenset(output), size_dict
            )
        except Exception:  # pragma: no cover
            return None

    def _path_cost(self, path, inputs, output, size_dict):
        import opt_einsum as oe

        try:
            shapes = [tuple(size_dict[i] for i in inp) for inp in inputs]
            lhs = ",".join("".join(inp) for inp in inputs)
            expr = lhs + "->" + "".join(output)
            _, info = oe.contract_path(expr, *shapes, shapes=True, optimize=path)
            return float(info.opt_cost)
        except Exception:  # pragma: no cover
            return float("inf")

    def __call__(self, inputs, output, size_dict, memory_limit=None):
        # opt_einsum passes inputs as list of frozensets/strs of symbols
        inputs = [sorted(inp) for inp in inputs]
        output = sorted(output)
        if len(inputs) == 1:
            return [(0,)]
        init = (
            self._greedy_seed(inputs, output, size_dict)
            if self.seed_from_greedy
            else None
        )
        if init is not None and self.skip_below_log10_flops > 0:
            seed_cost = self._path_cost(init, inputs, output, size_dict)
            if seed_cost < 10.0**self.skip_below_log10_flops:
                return list(init)
        candidates = []
        if init is not None:
            candidates.append(list(init))
        for r in range(self.restarts):
            candidates.append(
                treesa_path(
                    inputs,
                    output,
                    size_dict,
                    n_iters=self.n_iters,
                    t0=2.0 if init is not None else 10.0,
                    size_weight=self.size_weight,
                    seed=self.seed + 1000 * r,
                    init_path=list(init) if init is not None else None,
                )
            )
        best = min(
            candidates, key=lambda p: self._path_cost(p, inputs, output, size_dict)
        )
        return best

