"""Exact scalar arithmetic for stabilizer ZX evaluation.

Counterpart of reference ``zx/evaluator.py:23-284``: exact scalars of the
ring Z[ω] (ω = e^{iπ/4}) scaled by powers of √2 — (a + bω + cω² + dω³)·√2^p
with jittable integer coefficient arithmetic, plus GF(2) linear algebra for
stabilizer-graph evaluation.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

Tensor = Any

__all__ = ["ExactScalarArray", "gf2_matmul", "gf2_rank"]


class ExactScalarArray:
    """Batched exact scalars (a + bω + cω² + dω³)·(√2)^p, ω = e^{iπ/4}.

    ``coeffs``: int array [..., 4]; ``power``: int array [...].  Multiply is
    exact integer arithmetic under jit; ``to_complex`` materializes floats.
    """

    def __init__(self, coeffs: Tensor, power: Optional[Tensor] = None):
        self.coeffs = jnp.asarray(coeffs, dtype=jnp.int32)
        if power is None:
            power = jnp.zeros(self.coeffs.shape[:-1], dtype=jnp.int32)
        self.power = jnp.asarray(power, dtype=jnp.int32)

    # constructors ------------------------------------------------------

    @classmethod
    def one(cls, shape: Tuple[int, ...] = ()) -> "ExactScalarArray":
        c = np.zeros(shape + (4,), dtype=np.int32)
        c[..., 0] = 1
        return cls(jnp.asarray(c))

    @classmethod
    def zero(cls, shape: Tuple[int, ...] = ()) -> "ExactScalarArray":
        return cls(jnp.zeros(shape + (4,), dtype=jnp.int32))

    @classmethod
    def from_phase_eighth(cls, k: Union[int, Tensor], shape: Tuple[int, ...] = ()) -> "ExactScalarArray":
        """ω^k  (phase multiples of π/4); k may be a traced int array."""
        k = jnp.asarray(k, dtype=jnp.int32) % 8
        sign = jnp.where(k >= 4, -1, 1).astype(jnp.int32)
        pos = k % 4
        c = sign[..., None] * jax.nn.one_hot(pos, 4, dtype=jnp.int32)
        return cls(c)

    # arithmetic --------------------------------------------------------

    def __mul__(self, other: "ExactScalarArray") -> "ExactScalarArray":
        a = self.coeffs
        b = other.coeffs
        # polynomial multiply mod (ω^4 = -1)
        out = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), dtype=jnp.int32)
        for i in range(4):
            for j in range(4):
                k = i + j
                term = a[..., i] * b[..., j]
                if k < 4:
                    out = out.at[..., k].add(term)
                else:
                    out = out.at[..., k - 4].add(-term)
        return ExactScalarArray(out, self.power + other.power)

    def __add__(self, other: "ExactScalarArray") -> "ExactScalarArray":
        # addition requires matching √2 powers; normalize using ω-identities:
        # √2 = ω + ω⁻¹ = ω - ω³, so multiply the smaller-power operand
        pa, pb = self.power, other.power
        diff = pa - pb
        # only static alignment supported under jit when powers are traced
        # equal; for mixed powers fall back to complex (documented limitation)
        if (
            isinstance(pa, jnp.ndarray)
            and isinstance(pb, jnp.ndarray)
            and pa.shape == pb.shape
        ):
            try:
                if bool(jnp.all(diff == 0)):
                    return ExactScalarArray(self.coeffs + other.coeffs, pa)
            except Exception:
                pass
        # align by multiplying by (√2)^{diff} as (ω - ω³)^diff — host path
        sa = np.asarray(self.coeffs)
        sb = np.asarray(other.coeffs)
        ppa = np.asarray(pa)
        ppb = np.asarray(pb)
        target = np.minimum(ppa, ppb)
        root2 = np.array([0, 1, 0, -1], dtype=np.int64)  # ω - ω³ = √2

        def lift(c: np.ndarray, times: int) -> np.ndarray:
            for _ in range(times):
                c = _poly_mul_np(c, root2)
            return c

        out = np.zeros(np.broadcast_shapes(sa.shape, sb.shape), dtype=np.int64)
        flat_shape = out.shape[:-1]
        sa_b = np.broadcast_to(sa, out.shape).copy()
        sb_b = np.broadcast_to(sb, out.shape).copy()
        ppa_b = np.broadcast_to(ppa, flat_shape)
        ppb_b = np.broadcast_to(ppb, flat_shape)
        t_b = np.broadcast_to(target, flat_shape)
        it = np.nditer(np.zeros(flat_shape) if flat_shape else np.zeros(1), flags=["multi_index"])
        while not it.finished:
            mi = it.multi_index if flat_shape else ()
            ca = lift(sa_b[mi].astype(np.int64), int(ppa_b[mi] - t_b[mi]))
            cb = lift(sb_b[mi].astype(np.int64), int(ppb_b[mi] - t_b[mi]))
            out[mi] = ca + cb
            it.iternext()
        return ExactScalarArray(jnp.asarray(out, dtype=jnp.int32), jnp.asarray(t_b, dtype=jnp.int32))

    def __neg__(self) -> "ExactScalarArray":
        return ExactScalarArray(-self.coeffs, self.power)

    def scale_sqrt2(self, k: int) -> "ExactScalarArray":
        return ExactScalarArray(self.coeffs, self.power + k)

    def to_complex(self) -> Tensor:
        w = jnp.exp(1j * jnp.pi / 4).astype(jnp.complex64)
        basis = jnp.stack([w**0, w**1, w**2, w**3])
        val = jnp.sum(self.coeffs.astype(jnp.complex64) * basis, axis=-1)
        return val * (jnp.sqrt(2.0).astype(jnp.complex64) ** self.power.astype(jnp.complex64))

    def __repr__(self) -> str:
        return f"ExactScalarArray(coeffs={np.asarray(self.coeffs)}, power={np.asarray(self.power)})"

    @classmethod
    def create(cls, coeffs: Any, power: Any = None) -> "ExactScalarArray":
        """Constructor alias (reference ``ExactScalarArray.create``)."""
        return cls(coeffs, power)

    def prod(self, axis: int = 0) -> "ExactScalarArray":
        """Product-reduce along an axis via repeated exact multiplies (ref name)."""
        arrs = [
            ExactScalarArray(
                np.take(np.asarray(self.coeffs), i, axis=axis),
                np.take(np.asarray(self.power), i, axis=axis),
            )
            for i in range(self.coeffs.shape[axis])
        ]
        out = arrs[0]
        for a in arrs[1:]:
            out = out * a
        return out

    def sum(self, axis: int = 0) -> "ExactScalarArray":
        """Sum-reduce along an axis with exact power alignment (ref name)."""
        arrs = [
            ExactScalarArray(
                np.take(np.asarray(self.coeffs), i, axis=axis),
                np.take(np.asarray(self.power), i, axis=axis),
            )
            for i in range(self.coeffs.shape[axis])
        ]
        out = arrs[0]
        for a in arrs[1:]:
            out = out + a
        return out

    def reduce(self, op: str = "prod", axis: int = 0) -> "ExactScalarArray":
        """Named reduction dispatcher (reference ``reduce``)."""
        return self.prod(axis) if op == "prod" else self.sum(axis)


def _poly_mul_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.zeros(4, dtype=np.int64)
    for i in range(4):
        for j in range(4):
            k = i + j
            if k < 4:
                out[k] += a[i] * b[j]
            else:
                out[k - 4] -= a[i] * b[j]
    return out


def gf2_matmul(a: Tensor, b: Tensor) -> Tensor:
    """(a @ b) mod 2 on int arrays — jittable (reference GF(2) matmul)."""
    return jnp.mod(jnp.matmul(jnp.asarray(a, dtype=jnp.int32), jnp.asarray(b, dtype=jnp.int32)), 2)


def gf2_rank(m: Tensor) -> int:
    """GF(2) rank (host-side elimination)."""
    from ..core.tableau import _gf2_rank

    return _gf2_rank(np.asarray(m).astype(np.uint8))


def evaluate(compiled: Any, params: Any) -> Any:
    """Evaluate a compiled scalar graph on a parameter batch.

    Reference ``zx/evaluator.py evaluate``: params rows are (f-bits…,
    outcome bits…, 1); returns the probability/amplitude per row.  Our
    compiled graphs are dense-engine closures (see ``zx/scalar_graph.py``).
    """
    return compiled.eval(params)
