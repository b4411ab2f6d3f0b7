from . import autodiff, bundle_adjustment, linear, lm, manifolds, pose_graph, problem
from .lm import Summary
from .minimizers import (
    MahalanobisDistanceMinimizer,
    solve_reprojection_batch,
    MahalanobisDistanceMinimizer3DOF,
    PointToPlaneMinimizer,
    ReprojectionErrorMinimizer,
)
from .bundle_adjustment import BAData, BundleAdjuster
from .pose_graph import ConstraintType, PoseGraphOptimizer, PoseGraphOptimizer2D
from .problem import GenericOptions, PoseOptimizer, Problem

__all__ = [
    "autodiff",
    "bundle_adjustment",
    "BAData",
    "BundleAdjuster",
    "linear",
    "lm",
    "manifolds",
    "pose_graph",
    "problem",
    "GenericOptions",
    "PoseOptimizer",
    "Problem",
    "Summary",
    "ConstraintType",
    "MahalanobisDistanceMinimizer",
    "MahalanobisDistanceMinimizer3DOF",
    "PointToPlaneMinimizer",
    "PoseGraphOptimizer",
    "PoseGraphOptimizer2D",
    "ReprojectionErrorMinimizer",
    "solve_reprojection_batch",
]
