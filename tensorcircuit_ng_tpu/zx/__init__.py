"""ZX-calculus subsystem.

Counterpart of reference ``zx/`` (built on pyzx_param): a self-contained ZX
graph (:mod:`graph`), circuit→ZX conversion (:mod:`converter`), spider-fusion
simplification, tensor evaluation through the einsum-IR engine, and the
jittable exact-scalar arithmetic of reference ``zx/evaluator.py:23-284``
(:class:`~tensorcircuit_ng_tpu.zx.evaluator.ExactScalarArray`).
"""

from .graph import ZXGraph, Spider
from .converter import circuit_to_zx
from .evaluator import ExactScalarArray, gf2_matmul, gf2_rank
from .simplifier import simplify, remove_identities, color_change

__all__ = [
    "ZXGraph",
    "Spider",
    "circuit_to_zx",
    "ExactScalarArray",
    "gf2_matmul",
    "gf2_rank",
    "simplify",
    "remove_identities",
    "color_change",
]
