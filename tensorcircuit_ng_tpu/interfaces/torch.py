"""Torch interface: wrap a JAX quantum function as ``torch.autograd.Function``.

Reference ``interfaces/torch.py:17-123``: forward converts torch→numpy→jax,
backward replays the JAX VJP with the incoming torch cotangent.  Works for
pytree inputs/outputs; tensors cross via numpy (dlpack optional).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .tensortrans import general_args_to_numpy, numpy_args_to_backend

Tensor = Any

__all__ = ["torch_interface", "torch_interface_kws", "pytorch_interface"]


def torch_interface(fun: Callable[..., Any], jit: bool = False, enable_dlpack: bool = False) -> Callable[..., Any]:
    """Wrap jax-backed ``fun`` so torch tensors flow in/out with autograd."""
    import torch

    if jit:
        fun = jax.jit(fun)

    def vjp_fun(*args: Any):
        return jax.vjp(fun, *args)

    if jit:
        vjp_fun = jax.jit(vjp_fun)

    class Fun(torch.autograd.Function):  # type: ignore
        @staticmethod
        def forward(ctx: Any, *x: Any) -> Any:
            x_np = general_args_to_numpy(x)
            x_jax = numpy_args_to_backend(x_np)
            y, vjp = jax.vjp(fun, *x_jax)
            ctx.vjp = vjp
            ctx.out_avals = jax.tree_util.tree_map(
                lambda t: (tuple(t.shape), t.dtype), y
            )
            y_np = general_args_to_numpy(y)
            y_torch = numpy_args_to_backend(y_np, target="torch")
            ctx.single_out = not isinstance(y_torch, (tuple, list))
            return y_torch if ctx.single_out else tuple(y_torch)

        @staticmethod
        def backward(ctx: Any, *grad_y: Any) -> Any:
            gy = grad_y[0] if ctx.single_out else tuple(grad_y)
            gy_np = general_args_to_numpy(gy)
            gy_jax = numpy_args_to_backend(gy_np)
            # match cotangent shape/dtype exactly to the primal outputs
            gy_jax = jax.tree_util.tree_map(
                lambda g, sd: jnp.reshape(jnp.asarray(g), sd[0]).astype(sd[1]),
                gy_jax,
                ctx.out_avals,
            )
            grads = ctx.vjp(gy_jax)
            g_np = general_args_to_numpy(grads)
            g_torch = numpy_args_to_backend(g_np, target="torch")
            if not isinstance(g_torch, (tuple, list)):
                g_torch = (g_torch,)
            # torch requires real grads for real leaves; conj for complex
            return tuple(g_torch)

    def wrapper(*args: Any) -> Any:
        return Fun.apply(*args)

    return wrapper


pytorch_interface = torch_interface


def torch_interface_kws(f: Callable[..., Any], jit: bool = False, **kws: Any) -> Callable[..., Any]:
    """Like :func:`torch_interface` but closing over keyword args (reference ``:126``)."""
    from functools import partial

    return torch_interface(partial(f, **kws), jit=jit)
