from . import matching, ndt, registration
from .ndt import NdtMap, build_ndt_map, filter_points
from .registration import RegistrationResult, register_ndt

__all__ = [
    "matching",
    "ndt",
    "registration",
    "NdtMap",
    "build_ndt_map",
    "filter_points",
    "RegistrationResult",
    "register_ndt",
]
