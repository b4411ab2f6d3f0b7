from . import autodiff, linear, lm, manifolds, pose_graph
from .lm import Summary
from .minimizers import (
    MahalanobisDistanceMinimizer,
    MahalanobisDistanceMinimizer3DOF,
    PointToPlaneMinimizer,
    ReprojectionErrorMinimizer,
)
from .pose_graph import ConstraintType, PoseGraphOptimizer

__all__ = [
    "autodiff",
    "linear",
    "lm",
    "manifolds",
    "pose_graph",
    "Summary",
    "ConstraintType",
    "MahalanobisDistanceMinimizer",
    "MahalanobisDistanceMinimizer3DOF",
    "PointToPlaneMinimizer",
    "PoseGraphOptimizer",
    "ReprojectionErrorMinimizer",
]
