from .options import (
    ConvergenceHandle,
    LinearSolverType,
    MinimizerType,
    OptimizationHandle,
    Options,
)
from .losses import (
    CauchyLoss,
    DCSLoss,
    ExponentialLoss,
    GemanMcClureLoss,
    HuberLoss,
    LossFunction,
    TrivialLoss,
    TukeyLoss,
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
    "DCSLoss",
    "ExponentialLoss",
    "GemanMcClureLoss",
    "HuberLoss",
    "LossFunction",
    "TrivialLoss",
    "TukeyLoss",
    "Pose",
    "Pose2",
    "lie",
]
