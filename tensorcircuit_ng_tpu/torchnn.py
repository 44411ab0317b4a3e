"""Torch nn.Module wrappers (reference ``torchnn.py:16-138``)."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = ["QuantumNet", "TorchLayer", "TorchHardwareLayer", "HardwareNet"]


def _make_net(use_interface: Callable[..., Any]):
    import torch

    class _QuantumNet(torch.nn.Module):  # type: ignore
        """torch module around ``f(weights, inputs) -> output`` (jax-backed)."""

        def __init__(
            self,
            f: Callable[..., Any],
            weights_shape: Union[Tuple[int, ...], Sequence[Tuple[int, ...]]],
            initializer: Optional[Callable[..., Any]] = None,
            use_jit: bool = False,
            enable_dlpack: bool = False,
        ):
            super().__init__()
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

    return _QuantumNet


def QuantumNet(
    f: Callable[..., Any],
    weights_shape: Any,
    initializer: Optional[Any] = None,
    use_jit: bool = False,
    **kws: Any,
) -> Any:
    from .interfaces.torch import torch_interface

    net_cls = _make_net(torch_interface)
    return net_cls(f, weights_shape, initializer=initializer, use_jit=use_jit)


TorchLayer = QuantumNet


def HardwareNet(f: Callable[..., Any], weights_shape: Any, **kws: Any) -> Any:
    """Hardware variant: parameter-shift gradients through the torch bridge."""
    from .experimental import parameter_shift_grad
    from .interfaces.torch import torch_interface
    import torch
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

    class _Net(torch.nn.Module):  # type: ignore
        def __init__(self) -> None:
            super().__init__()
            shapes = weights_shape
            if shapes and isinstance(shapes[0], int):
                shapes = [tuple(shapes)]
            self.ws = torch.nn.ParameterList(
                [torch.nn.Parameter(0.1 * torch.randn(*s)) for s in shapes]
            )

        def forward(self) -> Any:
            return _Fun.apply(*self.ws)

    return _Net()


TorchHardwareLayer = HardwareNet
