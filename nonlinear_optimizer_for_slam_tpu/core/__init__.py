from .options import (
    ConvergenceHandle,
    LinearSolverType,
    MinimizerType,
    OptimizationHandle,
    Options,
)
from .losses import (
    CauchyLoss,
    ExponentialLoss,
    HuberLoss,
    LossFunction,
    TrivialLoss,
)
from .pose import Pose, Pose2
from . import lie

__all__ = [
    "ConvergenceHandle",
    "LinearSolverType",
    "MinimizerType",
    "OptimizationHandle",
    "Options",
    "CauchyLoss",
    "ExponentialLoss",
    "HuberLoss",
    "LossFunction",
    "TrivialLoss",
    "Pose",
    "Pose2",
    "lie",
]
