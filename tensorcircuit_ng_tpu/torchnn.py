"""Torch nn.Module wrappers (reference ``torchnn.py:16-138``)."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import numpy as np
import torch

__all__ = ["QuantumNet", "TorchLayer", "TorchHardwareLayer", "HardwareNet"]


class QuantumNet(torch.nn.Module):  # type: ignore[misc]
    """torch module around a jax-backed ``f(*weights, *inputs) -> output``.

    Reference ``torchnn.py:16``: gradients flow through the torch interface
    (jax VJP under ``torch.autograd.Function``).
    """

    def __init__(
        self,
        f: Callable[..., Any],
        weights_shape: Union[Tuple[int, ...], Sequence[Tuple[int, ...]]],
        initializer: Optional[Callable[..., Any]] = None,
        use_jit: bool = False,
        enable_dlpack: bool = False,
        use_interface: Optional[Callable[..., Any]] = None,
    ):
        super().__init__()
        if use_interface is None:
            from .interfaces.torch import torch_interface as use_interface  # type: ignore

        if weights_shape and isinstance(weights_shape[0], int):
            weights_shape = [tuple(weights_shape)]
        self.f = use_interface(f, jit=use_jit)
        self.ws = torch.nn.ParameterList()
        for s in weights_shape:
            if initializer is not None:
                w0 = torch.tensor(np.asarray(initializer(s)), dtype=torch.float32)
            else:
                w0 = 0.1 * torch.randn(*s)
            self.ws.append(torch.nn.Parameter(w0))

    def forward(self, *inputs: Any) -> Any:
        return self.f(*self.ws, *inputs)


TorchLayer = QuantumNet


class HardwareNet(torch.nn.Module):  # type: ignore[misc]
    """Hardware variant: parameter-shift gradients through the torch bridge.

    Reference ``torchnn.py HardwareNet``: the wrapped callable is assumed
    non-AD-able (QPU execution), so the backward pass uses parameter-shift.
    """

    def __init__(self, f: Callable[..., Any], weights_shape: Any, **kws: Any):
        super().__init__()
        from .experimental import parameter_shift_grad

        import jax.numpy as jnp

        grad_f = parameter_shift_grad(f)

        class _Fun(torch.autograd.Function):  # type: ignore
            @staticmethod
            def forward(ctx: Any, *ws: Any):
                np_ws = [np.asarray(w.detach()) for w in ws]
                ctx.np_ws = np_ws
                y = f(*[jnp.asarray(w) for w in np_ws])
                return torch.tensor(np.asarray(y))

            @staticmethod
            def backward(ctx: Any, dy: Any):
                g = grad_f(*[jnp.asarray(w) for w in ctx.np_ws])
                scale = float(np.asarray(dy))
                if not isinstance(g, tuple):
                    g = (g,)
                return tuple(torch.tensor(scale * np.asarray(gi)) for gi in g)

        self._fun = _Fun
        shapes = weights_shape
        if shapes and isinstance(shapes[0], int):
            shapes = [tuple(shapes)]
        self.ws = torch.nn.ParameterList(
            [torch.nn.Parameter(0.1 * torch.randn(*s)) for s in shapes]
        )

    def forward(self) -> Any:
        return self._fun.apply(*self.ws)


TorchHardwareLayer = HardwareNet
