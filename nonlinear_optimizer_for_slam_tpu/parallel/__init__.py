from . import distributed
from .distributed import initialize, make_global_factor_mesh, process_info
from .mesh import FACTOR_AXIS, factor_sharding, make_factor_mesh
from .sharded import shard_solve, sharded_quadratic

__all__ = [
    "FACTOR_AXIS",
    "distributed",
    "factor_sharding",
    "initialize",
    "make_factor_mesh",
    "make_global_factor_mesh",
    "process_info",
    "shard_solve",
    "sharded_quadratic",
]
