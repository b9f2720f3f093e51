"""Device mesh, sharding rules, and the pjit inference engine."""

from .mesh import build_mesh, mesh_shape_from_config
from .sharding import param_shardings, PARTITION_RULES

__all__ = [
    "build_mesh",
    "mesh_shape_from_config",
    "param_shardings",
    "PARTITION_RULES",
]
