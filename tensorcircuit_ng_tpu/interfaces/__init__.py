"""Cross-framework function bridges (reference ``interfaces/``).

The framework is JAX-native; these adapters let the same differentiable
quantum function drive torch training loops, scipy optimizers, or plain
numpy callers — via VJP + dlpack/numpy conversion, mirroring reference
``interfaces/torch.py:17-123``, ``interfaces/scipy.py:15``,
``interfaces/numpy.py:14``.
"""

from .torch import torch_interface, torch_interface_kws, pytorch_interface
from .scipy import scipy_interface, scipy_optimize_interface
from .numpy import numpy_interface, np_interface
from .tensorflow import tensorflow_interface, tf_interface
from .tensortrans import general_args_to_numpy, numpy_args_to_backend


def jax_interface(fun, jit: bool = False):
    """Identity adapter: this framework is JAX-native, so a jax-facing wrap
    of a backend function is the function itself (kept for reference parity,
    reference ``interfaces/jax.py:69``)."""
    import jax

    return jax.jit(fun) if jit else fun

__all__ = [
    "jax_interface",
    "tensorflow_interface",
    "tf_interface",
    "torch_interface",
    "torch_interface_kws",
    "pytorch_interface",
    "scipy_interface",
    "scipy_optimize_interface",
    "numpy_interface",
    "np_interface",
    "general_args_to_numpy",
    "numpy_args_to_backend",
]
