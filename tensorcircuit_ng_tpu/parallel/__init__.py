"""Distribution: device meshes, sliced contraction, multi-host helpers.

TPU-native realization of the reference's parallelism stack (SURVEY.md §2.5):
slice parallelism over the ICI mesh (``DistributedContractor``,
reference ``experimental.py:760-1249``), term/operator sharding, and
batch/data parallelism riding plain ``vmap`` + GSPMD shardings.
"""

from .distributed import DistributedContractor
from .mesh import default_mesh, term_sharded_expectation

__all__ = ["DistributedContractor", "default_mesh", "term_sharded_expectation"]
