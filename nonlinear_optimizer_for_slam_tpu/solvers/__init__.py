from . import autodiff, batched, bundle_adjustment, fixed_lag, graph_init, inertial, linear, lm, manifolds, pose_graph, pose_landmark, problem, sim3_graph
from .fixed_lag import FixedLagSmoother
from .lm import Summary
from .batched import (
    finalize_solve_batch,
    solve_mahalanobis_batch,
    solve_mahalanobis_batch_async,
    solve_point_to_plane_batch,
    solve_point_to_plane_batch_async,
    solve_reprojection_batch,
    solve_reprojection_batch_async,
)
from .minimizers import (
    MahalanobisDistanceMinimizer,
    MahalanobisDistanceMinimizer3DOF,
    PointToPlaneMinimizer,
    ReprojectionErrorMinimizer,
)
from .bundle_adjustment import BAData, BundleAdjuster
from .pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
    PoseGraphOptimizer2D,
    edge_information_to_world,
    sqrt_info_from_information,
)
from .inertial import FixedLagInertialSmoother, InertialGraphOptimizer
from .sim3_graph import Sim3GraphOptimizer
from .pose_landmark import PoseLandmark2DOptimizer, PoseLandmarkOptimizer
from .problem import GenericOptions, PoseOptimizer, Problem

__all__ = [
    "autodiff",
    "batched",
    "finalize_solve_batch",
    "solve_mahalanobis_batch",
    "solve_mahalanobis_batch_async",
    "solve_point_to_plane_batch",
    "solve_point_to_plane_batch_async",
    "solve_reprojection_batch_async",
    "bundle_adjustment",
    "BAData",
    "BundleAdjuster",
    "fixed_lag",
    "FixedLagSmoother",
    "linear",
    "lm",
    "manifolds",
    "graph_init",
    "pose_graph",
    "pose_landmark",
    "PoseLandmarkOptimizer",
    "PoseLandmark2DOptimizer",
    "inertial",
    "InertialGraphOptimizer",
    "FixedLagInertialSmoother",
    "sim3_graph",
    "Sim3GraphOptimizer",
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
    "edge_information_to_world",
    "sqrt_info_from_information",
]
