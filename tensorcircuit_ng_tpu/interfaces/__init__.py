"""Cross-framework function bridges (reference ``interfaces/``).

The framework is JAX-native; these adapters let the same differentiable
quantum function drive torch training loops, scipy optimizers, or plain
numpy callers — via VJP + dlpack/numpy conversion, mirroring reference
``interfaces/torch.py:17-123``, ``interfaces/scipy.py:15``,
``interfaces/numpy.py:14``.
"""

from .torch import torch_interface, torch_interface_kws, pytorch_interface
from .scipy import scipy_interface, scipy_optimize_interface
from .numpy import numpy_interface
from .tensortrans import general_args_to_numpy, numpy_args_to_backend

__all__ = [
    "torch_interface",
    "torch_interface_kws",
    "pytorch_interface",
    "scipy_interface",
    "scipy_optimize_interface",
    "numpy_interface",
    "general_args_to_numpy",
    "numpy_args_to_backend",
]
