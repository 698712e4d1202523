"""Distribution layer: device meshes, sharded vectors, halo-exchange
stencil operators (the framework-owned replacement for the reference's
user-delegated MPI distribution — SURVEY.md §2 parallelism inventory)."""

from .mesh import (
    comm_setup,
    comm_close,
    make_mesh,
    distribute,
    replicate,
    shard_rows,
    P,
    Mesh,
    NamedSharding,
)
from .stencil import ShardedPoisson2D, ShardedGinzburgLandau
from .bell import ShardedBellOperator

__all__ = [
    "ShardedBellOperator",
    "comm_setup",
    "comm_close",
    "make_mesh",
    "distribute",
    "replicate",
    "shard_rows",
    "P",
    "Mesh",
    "NamedSharding",
    "ShardedPoisson2D",
    "ShardedGinzburgLandau",
]
