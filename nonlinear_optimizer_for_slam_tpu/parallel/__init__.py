from .mesh import FACTOR_AXIS, factor_sharding, make_factor_mesh
from .sharded import shard_solve, sharded_quadratic

__all__ = [
    "FACTOR_AXIS",
    "factor_sharding",
    "make_factor_mesh",
    "shard_solve",
    "sharded_quadratic",
]
