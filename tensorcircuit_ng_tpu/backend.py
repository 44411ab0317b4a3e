"""JAX-native backend exposing the reference's ``ExtendedBackend`` surface.

The reference supports five interchangeable ML backends behind an abstract
interface of ~140 numerics/AD/JIT methods (reference
``backends/abstract_backend.py:305-2595``).  This framework is TPU-native and
JAX-only: one concrete backend, with the same method names so reference user
code written against ``K = tc.backend`` ports directly.  A thin "numpy" mode
reuses the same methods eagerly (JAX on CPU without jit) for debugging.

Custom AD rules for SVD/QR/eigh (reference ``backends/jax_ops.py:19-183``)
live in :mod:`tensorcircuit_ng_tpu.core.linalg`.
"""

from __future__ import annotations

import functools
import math
import warnings
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax import tree_util

from . import config

Tensor = Any

__all__ = ["JaxBackend", "backend", "get_backend"]


def _dtype(d: Optional[str]) -> Any:
    if d is None:
        return None
    return jnp.dtype(d)


class NumpyCOO:
    """COO sparse matrix whose buffers stay numpy until they meet a tracer.

    Drop-in for the backend sparse type (reference jax backend returns BCOO,
    ``backends/jax_backend.py``); here buffers are host numpy so jit programs
    can close over sparse (complex) Hamiltonians on the axon TPU backend —
    complex device arrays cannot be lowered as jit constants there.  ``@``
    is a scatter-add contraction: out[r] += v * b[c] (one XLA scatter, MXU
    unaffected).  Traced/array buffers are kept as-is, so the type also
    works when constructed inside a jit trace.
    """

    def __init__(self, indices: Any, values: Any, shape: Any) -> None:
        import jax.core as _core

        def keep(x: Any) -> Any:
            if isinstance(x, _core.Tracer):
                return x
            return np.asarray(x)

        self.indices = keep(indices)
        self.values = keep(values)
        self.shape = tuple(int(s) for s in shape)
        self.ndim = 2
        self.dtype = self.values.dtype

    def __matmul__(self, b: Tensor) -> Tensor:
        rows = self.indices[:, 0]
        cols = self.indices[:, 1]
        vals = self.values
        if getattr(b, "ndim", 1) > 1:
            vals = vals.reshape(vals.shape + (1,) * (b.ndim - 1))
        contrib = vals * jnp.take(b, cols, axis=0)
        out_shape = (self.shape[0],) + tuple(b.shape[1:])
        out = jnp.zeros(out_shape, dtype=contrib.dtype)
        return out.at[rows].add(contrib)

    def matvec(self, b: Tensor) -> Tensor:
        """Sparse-dense product (LinearOperator-style alias of ``@``)."""
        return self.__matmul__(b)

    def todense(self) -> Tensor:
        rows = self.indices[:, 0]
        cols = self.indices[:, 1]
        out = jnp.zeros(self.shape, dtype=self.values.dtype)
        return out.at[rows, cols].add(self.values)

    def to_scipy(self) -> Any:
        import scipy.sparse as sp

        return sp.coo_matrix(
            (np.asarray(self.values), (np.asarray(self.indices[:, 0]), np.asarray(self.indices[:, 1]))),
            shape=self.shape,
        )

    def __repr__(self) -> str:
        return f"NumpyCOO(shape={self.shape}, nnz={self.values.shape[0]}, dtype={self.dtype})"


class JaxBackend:
    """The TPU/JAX backend. Mirrors reference ``backends/jax_backend.py:203``."""

    name = "jax"

    # ---------------- tensor creation ----------------

    def convert_to_tensor(self, a: Any, dtype: Optional[str] = None) -> Tensor:
        t = jnp.asarray(a)
        if dtype is not None:
            t = t.astype(_dtype(dtype))
        return t

    def cast(self, a: Tensor, dtype: str) -> Tensor:
        return jnp.asarray(a).astype(_dtype(dtype))

    def eye(self, N: int, dtype: Optional[str] = None, M: Optional[int] = None) -> Tensor:
        return jnp.eye(N, M, dtype=_dtype(dtype or config.dtypestr()))

    def ones(self, shape: Sequence[int], dtype: Optional[str] = None) -> Tensor:
        return jnp.ones(shape, dtype=_dtype(dtype or config.dtypestr()))

    def zeros(self, shape: Sequence[int], dtype: Optional[str] = None) -> Tensor:
        return jnp.zeros(shape, dtype=_dtype(dtype or config.dtypestr()))

    def copy(self, a: Tensor) -> Tensor:
        return jnp.asarray(a)

    def arange(self, start: int, stop: Optional[int] = None, step: int = 1) -> Tensor:
        if stop is None:
            return jnp.arange(start, step=step)
        return jnp.arange(start, stop, step)

    def implicit_randn(self, shape=None, mean=0.0, stddev=1.0) -> Tensor:
        key = self._next_key()
        shape = shape if shape is not None else ()
        if isinstance(shape, int):
            shape = (shape,)
        return (
            jax.random.normal(key, tuple(shape), dtype=_dtype(config.rdtypestr()))
            * stddev
            + mean
        )

    def implicit_randu(self, shape=None, low=0.0, high=1.0) -> Tensor:
        key = self._next_key()
        shape = shape if shape is not None else ()
        if isinstance(shape, int):
            shape = (shape,)
        return jax.random.uniform(
            key, tuple(shape), dtype=_dtype(config.rdtypestr()), minval=low, maxval=high
        )

    def implicit_randc(self, a, shape=None, p=None) -> Tensor:
        key = self._next_key()
        a = jnp.asarray(a)
        shape = shape if shape is not None else ()
        if isinstance(shape, int):
            shape = (shape,)
        return jax.random.choice(key, a, shape=tuple(shape), p=p)

    # explicit stateless randoms (status/key driven, jit/vmap safe)
    def stateful_randn(self, g, shape=None, mean=0.0, stddev=1.0, dtype=None) -> Tensor:
        shape = shape if shape is not None else ()
        if isinstance(shape, int):
            shape = (shape,)
        return (
            jax.random.normal(g, tuple(shape), dtype=_dtype(dtype or config.rdtypestr()))
            * stddev
            + mean
        )

    def stateful_randu(self, g, shape=None, low=0.0, high=1.0, dtype=None) -> Tensor:
        shape = shape if shape is not None else ()
        if isinstance(shape, int):
            shape = (shape,)
        return jax.random.uniform(
            g,
            tuple(shape),
            dtype=_dtype(dtype or config.rdtypestr()),
            minval=low,
            maxval=high,
        )

    def stateful_randc(self, g, a, shape=None, p=None) -> Tensor:
        shape = shape if shape is not None else ()
        if isinstance(shape, int):
            shape = (shape,)
        return jax.random.choice(g, jnp.asarray(a), shape=tuple(shape), p=p)

    # key management (reference jax backend get_random_state/set_random_state)
    _rng_key = None

    def set_random_state(self, seed: Optional[Union[int, Any]] = None) -> None:
        if seed is None:
            seed = np.random.randint(0, 2**31 - 1)
        if isinstance(seed, int):
            self._rng_key = jax.random.PRNGKey(seed)
        else:
            self._rng_key = seed

    def _key_is_stale(self) -> bool:
        """True when the stored key is a tracer that ESCAPED its trace.

        In this jax, ops on concrete inputs inside a jit trace still
        produce tracers, so any implicit_rand* under jit stores a traced
        key; after that trace exits the key is an escaped tracer and the
        next consumer would die with UnexpectedTracerError at jaxpr
        finalization (found by the benchmark sweep: circuit.sample under
        jit, then MPSCircuit.sample under jit).  A LIVE tracer — the
        in-trace ``set_random_state(key)`` reference pattern, possibly
        seen from a nested vmap/jit — has its trace in the current
        parent_trace chain and must be preserved."""
        k = self._rng_key
        if not isinstance(k, jax.core.Tracer):
            return False
        try:
            from jax._src import core as _jcore

            t = _jcore.trace_ctx.trace
            while t is not None:
                if t is k._trace:
                    return False
                t = getattr(t, "parent_trace", None)
            return True
        except Exception:
            return True  # introspection failed: reseeding is the safe side

    def get_random_state(self, seed: Optional[int] = None) -> Any:
        if seed is not None:
            return jax.random.PRNGKey(seed)
        if self._rng_key is None or self._key_is_stale():
            self.set_random_state()
        return self._rng_key

    def _next_key(self) -> Any:
        if self._rng_key is None or self._key_is_stale():
            self.set_random_state()
        self._rng_key, sub = jax.random.split(self._rng_key)
        return sub

    def random_split(self, key: Any, num: int = 2) -> Any:
        return jax.random.split(key, num)

    # ---------------- shapes / structure ----------------

    def shape_tuple(self, a: Tensor) -> Tuple[int, ...]:
        return tuple(a.shape)

    def shape_concat(self, values, axis=0) -> Tensor:
        return jnp.concatenate(values, axis=axis)

    def shape_prod(self, values) -> Tensor:
        return jnp.prod(jnp.asarray(values))

    def sizen(self, a: Tensor) -> int:
        return int(np.prod(a.shape)) if a.shape else 1

    def size(self, a: Tensor) -> Tensor:
        return jnp.asarray(np.prod(a.shape))

    def reshape(self, a: Tensor, shape: Sequence[int]) -> Tensor:
        return jnp.reshape(a, shape)

    def reshape2(self, a: Tensor) -> Tensor:
        """Reshape to (2, 2, ..., 2) (reference abstract_backend.py)."""
        nleg = int(np.log2(self.sizen(a)))
        return jnp.reshape(a, [2] * nleg)

    def reshapem(self, a: Tensor) -> Tensor:
        """Reshape to a square matrix."""
        l = int(np.sqrt(self.sizen(a)))
        return jnp.reshape(a, [l, l])

    def transpose(self, a: Tensor, perm: Optional[Sequence[int]] = None) -> Tensor:
        return jnp.transpose(a, perm)

    def tile(self, a: Tensor, rep) -> Tensor:
        return jnp.tile(a, rep)

    def stack(self, a: Sequence[Tensor], axis: int = 0) -> Tensor:
        return jnp.stack(a, axis=axis)

    def concat(self, a: Sequence[Tensor], axis: int = 0) -> Tensor:
        return jnp.concatenate(a, axis=axis)

    def slice(self, a: Tensor, starts, sizes) -> Tensor:
        return jax.lax.dynamic_slice(a, starts, sizes)

    def gather1d(self, a: Tensor, indices: Tensor) -> Tensor:
        return jnp.take(a, indices)

    def scatter(self, a: Tensor, indices: Tensor, updates: Tensor) -> Tensor:
        """Set a[indices] = updates; indices shape [n, rank] (reference scatter)."""
        indices = jnp.asarray(indices)
        if indices.ndim == 1:
            indices = indices[:, None]
        return a.at[tuple(indices[:, i] for i in range(indices.shape[1]))].set(updates)

    def coo_sparse_matrix(self, indices: Tensor, values: Tensor, shape) -> Any:
        """COO sparse matrix with HOST-resident buffers (see NumpyCOO).

        Unlike BCOO (which eagerly device-puts its buffers), concrete
        index/value planes stay numpy so the matrix can be closed over by
        jit programs on the axon TPU backend, where complex device arrays
        cannot be lowered as constants.  Traced values pass through.
        """
        return NumpyCOO(indices, values, tuple(shape))

    def coo_sparse_matrix_from_numpy(self, a: Any) -> Any:
        import scipy.sparse as sp

        acoo = sp.coo_matrix(a)
        return self.coo_sparse_matrix(
            np.stack([acoo.row, acoo.col], axis=1), acoo.data, acoo.shape
        )

    def sparse_dense_matmul(self, sp_a: Any, b: Tensor) -> Tensor:
        return sp_a @ b

    def lobpcg(
        self,
        a: Tensor,
        x: Tensor,
        m: Optional[Tensor] = None,
        largest: bool = False,
        tol: float = 0.0,
        max_iter: int = 100,
    ) -> Tuple[Tensor, Tensor]:
        """Smallest/largest eigenpairs via LOBPCG (reference jax_ops ``_lobpcg``).

        ``a`` may be dense, sparse (NumpyCOO/BCOO), or a matvec callable;
        ``x`` is the (dim, k) initial block.  Returns (eigenvalues, vectors).
        """
        from jax.experimental.sparse.linalg import lobpcg_standard

        if callable(a) and not hasattr(a, "shape"):
            mv = a
        elif self.is_sparse(a):
            mv = lambda v: a @ v
        else:
            amat = jnp.asarray(a)
            mv = lambda v: amat @ v
        x = jnp.asarray(x)
        is_complex = jnp.iscomplexobj(x) or jnp.iscomplexobj(mv(x[:, :1]))
        if is_complex:
            # jax lobpcg is real-only: embed Hermitian H as the real
            # symmetric [[Re, -Im], [Im, Re]] acting on stacked (Re; Im)
            dim = x.shape[0]

            def mv_real(v2):
                c = v2[:dim] + 1j * v2[dim:]
                out = mv(c.astype(x.dtype))
                return jnp.concatenate([jnp.real(out), jnp.imag(out)], axis=0).astype(
                    jnp.float32
                )

            x_real = jnp.concatenate(
                [jnp.real(x), jnp.imag(x)], axis=0
            ).astype(jnp.float32)
            op = mv_real if largest else (lambda v: -mv_real(v))
            theta, u, _ = lobpcg_standard(op, x_real, m=max_iter)
            vals = theta if largest else -theta
            vecs = (u[:dim] + 1j * u[dim:]).astype(x.dtype)
            norm = jnp.linalg.norm(vecs, axis=0, keepdims=True)
            return vals, vecs / jnp.where(norm == 0, 1.0, norm)
        op = mv if largest else (lambda v: -mv(v))
        theta, u, _ = lobpcg_standard(op, x, m=max_iter)
        vals = theta if largest else -theta
        return vals, u

    def is_sparse(self, a: Any) -> bool:
        from jax.experimental import sparse as jsparse

        return isinstance(a, (jsparse.BCOO, jsparse.BCSR, NumpyCOO))

    def to_dense(self, sp_a: Any) -> Tensor:
        return sp_a.todense()

    # ---------------- elementwise / math ----------------

    def real(self, a: Tensor) -> Tensor:
        return jnp.real(a)

    def imag(self, a: Tensor) -> Tensor:
        return jnp.imag(a)

    def conj(self, a: Tensor) -> Tensor:
        return jnp.conj(a)

    def adjoint(self, a: Tensor) -> Tensor:
        return jnp.conj(jnp.swapaxes(a, -1, -2))

    def abs(self, a: Tensor) -> Tensor:
        return jnp.abs(a)

    def sign(self, a: Tensor) -> Tensor:
        return jnp.sign(a)

    def exp(self, a: Tensor) -> Tensor:
        return jnp.exp(a)

    def log(self, a: Tensor) -> Tensor:
        return jnp.log(a)

    def sqrt(self, a: Tensor) -> Tensor:
        return jnp.sqrt(a)

    def square(self, a: Tensor) -> Tensor:
        return jnp.square(a)

    def sin(self, a: Tensor) -> Tensor:
        return jnp.sin(a)

    def cos(self, a: Tensor) -> Tensor:
        return jnp.cos(a)

    def tan(self, a: Tensor) -> Tensor:
        return jnp.tan(a)

    def tanh(self, a: Tensor) -> Tensor:
        return jnp.tanh(a)

    def acos(self, a: Tensor) -> Tensor:
        return jnp.arccos(a)

    def asin(self, a: Tensor) -> Tensor:
        return jnp.arcsin(a)

    def atan(self, a: Tensor) -> Tensor:
        return jnp.arctan(a)

    def atan2(self, y: Tensor, x: Tensor) -> Tensor:
        return jnp.arctan2(y, x)

    def acosh(self, a: Tensor) -> Tensor:
        return jnp.arccosh(a)

    def asinh(self, a: Tensor) -> Tensor:
        return jnp.arcsinh(a)

    def atanh(self, a: Tensor) -> Tensor:
        return jnp.arctanh(a)

    def cosh(self, a: Tensor) -> Tensor:
        return jnp.cosh(a)

    def sinh(self, a: Tensor) -> Tensor:
        return jnp.sinh(a)

    def sigmoid(self, a: Tensor) -> Tensor:
        return jax.nn.sigmoid(a)

    def relu(self, a: Tensor) -> Tensor:
        return jax.nn.relu(a)

    def softmax(self, a: Tensor, axis: Optional[int] = None) -> Tensor:
        return jax.nn.softmax(a, axis=axis if axis is not None else -1)

    def power(self, a: Tensor, b) -> Tensor:
        return jnp.power(a, b)

    def mod(self, x: Tensor, y: Tensor) -> Tensor:
        return jnp.mod(x, y)

    def floor(self, a: Tensor) -> Tensor:
        return jnp.floor(a)

    def ceil(self, a: Tensor) -> Tensor:
        return jnp.ceil(a)

    def round(self, a: Tensor) -> Tensor:
        return jnp.round(a)

    def clip(self, a: Tensor, a_min, a_max) -> Tensor:
        return jnp.clip(a, a_min, a_max)

    def maximum(self, a: Tensor, b: Tensor) -> Tensor:
        return jnp.maximum(a, b)

    def minimum(self, a: Tensor, b: Tensor) -> Tensor:
        return jnp.minimum(a, b)

    # ---------------- reductions / comparisons ----------------

    def sum(self, a: Tensor, axis=None, keepdims: bool = False) -> Tensor:
        return jnp.sum(a, axis=axis, keepdims=keepdims)

    def mean(self, a: Tensor, axis=None, keepdims: bool = False) -> Tensor:
        return jnp.mean(a, axis=axis, keepdims=keepdims)

    def std(self, a: Tensor, axis=None, keepdims: bool = False) -> Tensor:
        return jnp.std(a, axis=axis, keepdims=keepdims)

    def max(self, a: Tensor, axis=None) -> Tensor:
        return jnp.max(a, axis=axis)

    def min(self, a: Tensor, axis=None) -> Tensor:
        return jnp.min(a, axis=axis)

    def argmax(self, a: Tensor, axis: int = 0) -> Tensor:
        return jnp.argmax(a, axis=axis)

    def argmin(self, a: Tensor, axis: int = 0) -> Tensor:
        return jnp.argmin(a, axis=axis)

    def cumsum(self, a: Tensor, axis: Optional[int] = None) -> Tensor:
        return jnp.cumsum(a, axis=axis)

    def prod(self, a: Tensor, axis: Optional[int] = None) -> Tensor:
        return jnp.prod(a, axis=axis)

    def norm(self, a: Tensor) -> Tensor:
        return jnp.linalg.norm(a)

    def unique_with_counts(self, a: Tensor, **kws) -> Tuple[Tensor, Tensor]:
        vals, counts = jnp.unique(a, return_counts=True, **kws)
        return vals, counts

    def relative_entropy(self, p: Tensor, q: Tensor) -> Tensor:
        return jnp.sum(p * (jnp.log(p) - jnp.log(q)))

    def equal(self, a: Tensor, b: Tensor) -> Tensor:
        return a == b

    def not_equal(self, a: Tensor, b: Tensor) -> Tensor:
        return a != b

    def greater(self, a: Tensor, b: Tensor) -> Tensor:
        return a > b

    def less(self, a: Tensor, b: Tensor) -> Tensor:
        return a < b

    def greater_equal(self, a: Tensor, b: Tensor) -> Tensor:
        return a >= b

    def less_equal(self, a: Tensor, b: Tensor) -> Tensor:
        return a <= b

    def where(self, cond: Tensor, x: Tensor, y: Tensor) -> Tensor:
        return jnp.where(cond, x, y)

    def onehot(self, a: Tensor, num: int) -> Tensor:
        return jax.nn.one_hot(a, num)

    one_hot = onehot

    def cond(self, pred, true_fn, false_fn, *operands):
        return jax.lax.cond(pred, true_fn, false_fn, *operands)

    def switch(self, index, branches, *operands):
        return jax.lax.switch(index, branches, *operands)

    def scan(self, f, init, xs=None, length=None):
        return jax.lax.scan(f, init, xs, length=length)

    def while_loop(self, cond_fn, body_fn, init):
        return jax.lax.while_loop(cond_fn, body_fn, init)

    def fori_loop(self, lower, upper, body_fn, init):
        return jax.lax.fori_loop(lower, upper, body_fn, init)

    def stop_gradient(self, a: Tensor) -> Tensor:
        return jax.lax.stop_gradient(a)

    # ---------------- linear algebra ----------------

    def matmul(self, a: Tensor, b: Tensor) -> Tensor:
        if self.is_sparse(a):
            return a @ b
        return jnp.matmul(a, b)

    def tensordot(self, a: Tensor, b: Tensor, axes) -> Tensor:
        return jnp.tensordot(a, b, axes=axes)

    def einsum(self, expr: str, *tensors: Tensor, **kws) -> Tensor:
        return jnp.einsum(expr, *tensors, **kws)

    def outer_product(self, a: Tensor, b: Tensor) -> Tensor:
        return jnp.tensordot(a, b, axes=0)

    def kron(self, a: Tensor, b: Tensor) -> Tensor:
        return jnp.kron(a, b)

    def trace(self, a: Tensor) -> Tensor:
        return jnp.trace(a)

    def det(self, a: Tensor) -> Tensor:
        return jnp.linalg.det(a)

    def inv(self, a: Tensor) -> Tensor:
        return jnp.linalg.inv(a)

    def solve(self, a: Tensor, b: Tensor, **kws) -> Tensor:
        return jnp.linalg.solve(a, b)

    def svd(self, a: Tensor, full_matrices: bool = False):
        from .core import linalg as _linalg

        return _linalg.adaware_svd(a)

    def qr(self, a: Tensor):
        from .core import linalg as _linalg

        return _linalg.adaware_qr(a)

    def rq(self, a: Tensor):
        from .core import linalg as _linalg

        return _linalg.adaware_rq(a)

    def eigh(self, a: Tensor):
        return jnp.linalg.eigh(a)

    def eig(self, a: Tensor):
        return jnp.linalg.eig(a)

    def eigvalsh(self, a: Tensor) -> Tensor:
        return jnp.linalg.eigvalsh(a)

    def expm(self, a: Tensor) -> Tensor:
        import jax.scipy.linalg as jsl

        return jsl.expm(a)

    def eigsh_lobpcg(self, a, k: int = 1, which: str = "SA", **kws):
        from .core import linalg as _linalg

        return _linalg.lobpcg(a, k=k, **kws)

    def schur(self, a: Tensor, output: str = "real"):
        import jax.scipy.linalg as jsl

        return jsl.schur(a, output=output)

    def diagflat(self, a: Tensor) -> Tensor:
        return jnp.diagflat(a)

    def diag(self, a: Tensor, k: int = 0) -> Tensor:
        return jnp.diag(a, k=k)

    def moveaxis(self, a: Tensor, source, destination) -> Tensor:
        return jnp.moveaxis(a, source, destination)

    def searchsorted(self, a: Tensor, v: Tensor, side: str = "left") -> Tensor:
        return jnp.searchsorted(a, v, side=side)

    # ---------------- dtype / device / numpy ----------------

    def dtype(self, a: Tensor) -> str:
        return str(a.dtype)

    def numpy(self, a: Tensor) -> np.ndarray:
        return np.asarray(a)

    def item(self, a: Tensor) -> Any:
        return np.asarray(a).item()

    def is_tensor(self, a: Any) -> bool:
        return isinstance(a, jnp.ndarray)

    def device(self, a: Tensor) -> Any:
        return list(a.devices())[0]

    def device_move(self, a: Tensor, dev: Any) -> Tensor:
        return jax.device_put(a, dev)

    def to_dlpack(self, a: Tensor) -> Any:
        return jax.dlpack.to_dlpack(a)

    def from_dlpack(self, a: Any) -> Tensor:
        return jax.dlpack.from_dlpack(a)

    # ---------------- AD / JIT / vmap ----------------

    def grad(self, f: Callable, argnums=0, has_aux: bool = False) -> Callable:
        return jax.grad(f, argnums=argnums, has_aux=has_aux)

    def value_and_grad(self, f: Callable, argnums=0, has_aux: bool = False) -> Callable:
        return jax.value_and_grad(f, argnums=argnums, has_aux=has_aux)

    def jvp(self, f: Callable, inputs, v):
        one_input = not isinstance(inputs, (list, tuple))
        if one_input:
            inputs, v = (inputs,), (v,)
        out, tangent = jax.jvp(f, tuple(inputs), tuple(v))
        return out, tangent

    def vjp(self, f: Callable, inputs, v):
        one_input = not isinstance(inputs, (list, tuple))
        if one_input:
            inputs = (inputs,)
        out, vjp_fn = jax.vjp(f, *inputs)
        grads = vjp_fn(v)
        if one_input:
            grads = grads[0]
        return out, grads

    def jacfwd(self, f: Callable, argnums=0) -> Callable:
        return jax.jacfwd(f, argnums=argnums)

    def jacrev(self, f: Callable, argnums=0) -> Callable:
        return jax.jacrev(f, argnums=argnums)

    def hessian(self, f: Callable, argnums=0) -> Callable:
        return jax.hessian(f, argnums=argnums)

    def jit(
        self,
        f: Callable,
        static_argnums=None,
        jit_compile: Optional[bool] = None,
        **kws: Any,
    ) -> Callable:
        return jax.jit(f, static_argnums=static_argnums, **kws)

    def vmap(self, f: Callable, vectorized_argnums: Union[int, Sequence[int]] = 0) -> Callable:
        """vmap over selected positional args, broadcasting the rest.

        Mirrors reference ``backends/jax_backend.py:904-919``.
        """
        if isinstance(vectorized_argnums, int):
            vectorized_argnums = (vectorized_argnums,)
        vargs = tuple(vectorized_argnums)

        @functools.wraps(f)
        def wrapper(*args: Any, **kws: Any):
            in_axes = tuple(0 if i in vargs else None for i in range(len(args)))
            return jax.vmap(f, in_axes=in_axes)(*args, **kws)

        return wrapper

    def vectorized_value_and_grad(
        self,
        f: Callable,
        argnums: Union[int, Sequence[int]] = 0,
        vectorized_argnums: Union[int, Sequence[int]] = 0,
        has_aux: bool = False,
    ) -> Callable:
        """vvag: vmapped value-and-grad with shared weights.

        Per-example inputs ride ``vectorized_argnums``; gradients w.r.t.
        ``argnums`` are summed over the batch when the arg is shared
        (reference ``backends/jax_backend.py:920-962``).
        """
        if isinstance(argnums, int):
            argnums_t = (argnums,)
        else:
            argnums_t = tuple(argnums)
        if isinstance(vectorized_argnums, int):
            vargs = (vectorized_argnums,)
        else:
            vargs = tuple(vectorized_argnums)

        vg = jax.value_and_grad(f, argnums=argnums_t, has_aux=has_aux)

        @functools.wraps(f)
        def wrapper(*args: Any, **kws: Any):
            in_axes = tuple(0 if i in vargs else None for i in range(len(args)))
            values, grads = jax.vmap(vg, in_axes=in_axes)(*args, **kws)
            # sum grads over batch for non-vectorized (shared) argnums
            new_grads = []
            for an, g in zip(argnums_t, grads):
                if an in vargs:
                    new_grads.append(g)
                else:
                    new_grads.append(tree_util.tree_map(lambda x: jnp.sum(x, axis=0), g))
            if isinstance(argnums, int):
                grads_out = new_grads[0]
            else:
                grads_out = tuple(new_grads)
            return values, grads_out

        return wrapper

    vvag = vectorized_value_and_grad

    # ---------------- pytrees ----------------

    def tree_map(self, f: Callable, *pytrees: Any) -> Any:
        return tree_util.tree_map(f, *pytrees)

    def tree_flatten(self, pytree: Any):
        return tree_util.tree_flatten(pytree)

    def tree_unflatten(self, treedef: Any, leaves: Any) -> Any:
        return tree_util.tree_unflatten(treedef, leaves)

    # ---------------- sampling ----------------

    def probability_sample(
        self, shots: int, p: Tensor, status: Optional[Tensor] = None, g: Any = None
    ) -> Tensor:
        """Inverse-CDF categorical sampling shared by all samplers.

        Mirrors reference ``abstract_backend.py:1828``: given probabilities
        ``p [m]`` and uniform ``status [shots]``, return int indices [shots].
        """
        p = p / jnp.sum(p)
        if status is None:
            if g is None:
                g = self._next_key()
            status = jax.random.uniform(g, (shots,), dtype=p.dtype if jnp.issubdtype(p.dtype, jnp.floating) else jnp.float32)
        status = jnp.asarray(status)
        cdf = jnp.cumsum(p)
        return jnp.searchsorted(cdf, status, side="right").astype(jnp.int32)

    # ---------------- optimizers ----------------

    def optimizer(self, optimizer: Any) -> Any:
        """Wrap an optax optimizer into a stateful object with ``update``."""
        return _OptaxOptimizer(optimizer)

    optax_optimizer = optimizer


class _OptaxOptimizer:
    """Stateful optax wrapper (reference ``backends/jax_backend.py:34-46``)."""

    def __init__(self, optimizer: Any) -> None:
        self.optimizer = optimizer
        self.state = None

    def update(self, grads: Any, params: Any) -> Any:
        import optax

        if self.state is None:
            self.state = self.optimizer.init(params)
        updates, self.state = self.optimizer.update(grads, self.state, params)
        return optax.apply_updates(params, updates)


backend = JaxBackend()


def get_backend(name: str = "jax") -> JaxBackend:
    # single concrete backend; "numpy" mode shares it (jax on cpu, eager)
    return backend


# ---------------------------------------------------------------------------
# reference-parity method batch (reference ``backends/abstract_backend.py`` /
# ``backends/jax_backend.py``): elementwise/bit ops, structural helpers,
# iterative eigensolver, Bessel special function
# ---------------------------------------------------------------------------


def _jb(name):
    def deco(f):
        setattr(JaxBackend, name, f)
        return f

    return deco


@_jb("all")
def _all(self, a, axis=None):
    return jnp.all(a, axis=axis)


@_jb("any")
def _any(self, a, axis=None):
    return jnp.any(a, axis=axis)


@_jb("argsort")
def _argsort(self, a, axis=-1):
    return jnp.argsort(a, axis=axis)


@_jb("sort")
def _sort(self, a, axis=-1):
    return jnp.sort(a, axis=axis)


@_jb("lexsort")
def _lexsort(self, keys, axis=-1):
    return jnp.lexsort(keys, axis=axis)


@_jb("top_k")
def _top_k(self, a, k):
    return jax.lax.top_k(a, k)


@_jb("reverse")
def _reverse(self, a):
    return a[::-1]


@_jb("expand_dims")
def _expand_dims(self, a, axis):
    return jnp.expand_dims(a, axis)


@_jb("ones_like")
def _ones_like(self, a):
    return jnp.ones_like(a)


@_jb("zeros_like")
def _zeros_like(self, a):
    return jnp.zeros_like(a)


@_jb("repeat")
def _repeat(self, a, repeats, axis=None):
    return jnp.repeat(a, repeats, axis=axis)


@_jb("meshgrid")
def _meshgrid(self, *args, **kws):
    return jnp.meshgrid(*args, **kws)


@_jb("floor_divide")
def _floor_divide(self, x, y):
    return jnp.floor_divide(x, y)


@_jb("bitwise_and")
def _bitwise_and(self, x, y):
    return jnp.bitwise_and(x, y)


@_jb("bitwise_or")
def _bitwise_or(self, x, y):
    return jnp.bitwise_or(x, y)


@_jb("bitwise_xor")
def _bitwise_xor(self, x, y):
    return jnp.bitwise_xor(x, y)


@_jb("left_shift")
def _left_shift(self, x, y):
    return jnp.left_shift(x, y)


@_jb("right_shift")
def _right_shift(self, x, y):
    return jnp.right_shift(x, y)


@_jb("popc")
def _popc(self, a):
    return jax.lax.population_count(a)


@_jb("i")
def _i(self, dtype=None):
    from . import config as _config

    return jnp.asarray(1j, dtype=dtype or _config.dtypestr())


@_jb("reshaped")
def _reshaped(self, a, d):
    if not isinstance(d, int) or d <= 0:
        raise ValueError("d must be a positive integer.")
    size = int(np.prod(a.shape)) if a.shape else 1
    if size == 0:
        # reference convention: empty input -> canonical empty vector (0,)
        return jnp.reshape(a, (0,))
    nleg = int(round(math.log(size, d))) if size > 1 else 0
    if d**nleg != size:
        raise ValueError(f"tensor size {size} is not a power of {d}")
    return jnp.reshape(a, [d] * nleg)


@_jb("matvec")
def _matvec(self, A, x):
    if hasattr(A, "matvec"):  # NumpyCOO / LinearOperator duck type
        return A.matvec(x)
    return jnp.tensordot(A, x, axes=[[1], [0]])


@_jb("sqrtmh")
def _sqrtmh(self, a, psd=False):
    e, v = jnp.linalg.eigh(a)
    if psd:
        e = jnp.clip(e, 0.0, None)
    e = jnp.sqrt(e).astype(v.dtype)
    return (v * e[..., None, :]) @ jnp.conj(jnp.swapaxes(v, -1, -2))


@_jb("jaxy_scan")
def _jaxy_scan(self, f, init, xs):
    if xs is None:
        raise ValueError("Either xs or length must be provided.")
    return jax.lax.scan(f, init, xs)


@_jb("lobpcg_standard")
def _lobpcg_standard(self, a, x0, m=100, tol=None):
    from jax.experimental.sparse.linalg import lobpcg_standard as _lob

    if callable(a) and not hasattr(a, "shape"):
        op = a
    else:
        mat = a
        op = lambda x: (
            mat.matvec(x) if hasattr(mat, "matvec") else jnp.tensordot(mat, x, [[1], [0]])
        )
    # jax finds the LARGEST eigenvalues, matching the reference contract
    theta, u, iters = _lob(op, x0, m=m, tol=tol)
    return theta, u, iters


@_jb("sparse_csr_from_coo")
def _sparse_csr_from_coo(self, coo, strict=False):
    try:
        from jax.experimental import sparse as jsparse

        return jsparse.BCSR.from_bcoo(coo)
    except Exception:
        if not strict:
            return coo
        raise


@_jb("special_jv")
def _special_jv(self, v, z, M):
    """[J_0(z), ..., J_{v-1}(z)] via Miller downward recurrence (jit/AD-safe)."""
    from .timeevol import _bessel_jn_miller

    return _bessel_jn_miller(v - 1, z)[:v]
