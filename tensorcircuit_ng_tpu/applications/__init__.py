"""Application-level research workflows (reference ``applications/``).

The reference declares this layer legacy/"not maintained"
(``docs/source/infras.rst:103``); the TPU rebuild keeps the load-bearing
entry points: QUBO/CVaR optimization, DQAS differentiable architecture
search, autoregressive models (MADE) for VQNHE-style workflows, layer
generators, and graph datasets.
"""

from . import optimization
from . import dqas
from . import layers
from . import graphdata
from . import finance
from . import physics
from . import ensemble
from . import vqes

__all__ = ["optimization", "dqas", "layers", "graphdata"]
