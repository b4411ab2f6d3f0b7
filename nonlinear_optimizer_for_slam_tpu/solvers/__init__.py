from . import autodiff, linear, lm, manifolds
from .lm import Summary
from .minimizers import (
    MahalanobisDistanceMinimizer,
    MahalanobisDistanceMinimizer3DOF,
    PointToPlaneMinimizer,
    ReprojectionErrorMinimizer,
)

__all__ = [
    "autodiff",
    "linear",
    "lm",
    "manifolds",
    "Summary",
    "MahalanobisDistanceMinimizer",
    "MahalanobisDistanceMinimizer3DOF",
    "PointToPlaneMinimizer",
    "ReprojectionErrorMinimizer",
]
