"""TPU-native nonlinear least-squares framework for SLAM factor problems.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ChanghyeonKim93/nonlinear_optimizer_for_slam: Gauss-Newton /
Levenberg-Marquardt solvers for NDT Mahalanobis-distance scan alignment
(6-DoF and planar 3-DoF), reprojection-error pose estimation,
point-to-plane ICP, SE(3) pose-graph optimization with switchable
constraints, and Schur-complement bundle adjustment — with fused Pallas
evaluation kernels and shard_map/psum multi-chip scaling in place of the
reference's AVX/NEON SIMD and thread pool.
"""

from . import core, ops, parallel, pipelines, solvers, utils
from .core import (
    CauchyLoss,
    ExponentialLoss,
    HuberLoss,
    LinearSolverType,
    MinimizerType,
    Options,
    Pose,
    Pose2,
    TrivialLoss,
)
from .solvers import (
    BAData,
    BundleAdjuster,
    ConstraintType,
    FixedLagInertialSmoother,
    InertialGraphOptimizer,
    MahalanobisDistanceMinimizer,
    MahalanobisDistanceMinimizer3DOF,
    PointToPlaneMinimizer,
    PoseGraphOptimizer,
    PoseGraphOptimizer2D,
    PoseLandmark2DOptimizer,
    PoseLandmarkOptimizer,
    ReprojectionErrorMinimizer,
    Sim3GraphOptimizer,
    Summary,
    edge_information_to_world,
    sqrt_info_from_information,
)
from . import io  # noqa: F401  (g2o dataset IO)

__version__ = "0.1.0"
