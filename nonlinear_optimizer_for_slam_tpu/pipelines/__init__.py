from . import fused_d2d, fused_registration, loop_closure, matching, ndt, registration
from .loop_closure import LoopClosure, LoopClosureDetector
from .fused_d2d import D2dRegistrar
from .fused_registration import (
    FusedRegistrationResult,
    HybridRegistrar,
    NdtRegistrar,
    register_ndt_fused,
)
from .ndt import (
    NdtMap,
    NdtMapAccumulator,
    build_ndt_map,
    filter_points,
    voxel_covariances,
    voxel_normals,
)
from .registration import (
    RegistrationResult,
    register_d2d_ndt,
    register_ndt,
    register_point_to_plane,
)

__all__ = [
    "fused_d2d",
    "fused_registration",
    "matching",
    "ndt",
    "registration",
    "D2dRegistrar",
    "FusedRegistrationResult",
    "HybridRegistrar",
    "LoopClosure",
    "LoopClosureDetector",
    "loop_closure",
    "NdtMap",
    "NdtMapAccumulator",
    "NdtRegistrar",
    "RegistrationResult",
    "build_ndt_map",
    "filter_points",
    "register_d2d_ndt",
    "register_ndt",
    "register_ndt_fused",
    "register_point_to_plane",
    "voxel_covariances",
    "voxel_normals",
]
