"""Distribution: device meshes, sliced contraction, multi-host helpers.

TPU-native realization of the reference's parallelism stack (SURVEY.md §2.5):
slice parallelism over the ICI mesh (``DistributedContractor``,
reference ``experimental.py:760-1249``), term/operator sharding, and
batch/data parallelism riding plain ``vmap`` + GSPMD shardings.
"""

from .distributed import DistributedContractor
from .mesh import default_mesh, term_sharded_expectation
from .sharded_state import ShardedStatevec


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None, **kws):
    """Initialize jax.distributed for multi-host runs (reference
    ``examples/multi_host/multicontroller_vqe.py:63-140`` pattern; on TPU
    pods all arguments are auto-detected)."""
    import jax

    if coordinator_address is None:
        jax.distributed.initialize(**kws)
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kws,
        )


__all__ = [
    "DistributedContractor",
    "ShardedStatevec",
    "default_mesh",
    "term_sharded_expectation",
    "initialize_distributed",
]
