"""NDT scan-to-map registration: the outer ICP loop.

Mirrors the reference's OptimizePoseAnalytic* drivers
(mahalanobis tests/simple_optimization_test.cc:543-575): up to 10 outer
iterations of {match correspondences at current pose -> inner LM solve},
stopping when the pose delta drops below 1e-5 in both translation norm and
quaternion vector norm.

Host/device boundary (SURVEY section 7.2): matching and the inner LM solve
are each single jitted device programs; only the tiny pose and the outer
convergence check ride on the host between them.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core import pose as pose_mod
from ..core.options import Options
from ..core.pose import Pose
from ..solvers.lm import Summary
from ..solvers.minimizers import _MinimizerBase
from . import matching
from .ndt import NdtMap

OUTER_MAX_ITERATIONS = 10  # reference: tests/simple_optimization_test.cc:480
OUTER_TOLERANCE = 1e-5  # :565-568


@dataclasses.dataclass
class RegistrationResult:
    pose: Pose
    outer_iterations: int
    summaries: list  # per-outer-iteration inner Summary


def register_ndt(
    ndt_map: NdtMap,
    local_points: np.ndarray,
    initial_pose: Pose,
    minimizer: _MinimizerBase,
    options: Options,
    search_radius: float = 1.0,
    num_neighbors: int = 2,
    max_outer_iterations: int = OUTER_MAX_ITERATIONS,
    outer_tolerance: float = OUTER_TOLERANCE,
) -> RegistrationResult:
    """Full scan-to-map registration with re-matching per outer iteration."""
    valid = ndt_map.valid_only()
    dtype = minimizer.dtype
    means = jnp.asarray(valid.means, dtype)
    sqrt_infos = jnp.asarray(valid.sqrt_informations, dtype)
    points = jnp.asarray(local_points, dtype)
    points_mask = jnp.ones(points.shape[0], dtype)

    pose = initial_pose.copy()
    last_pose = pose.copy()
    summaries = []
    outer_iter = 0
    for outer_iter in range(max_outer_iterations):
        data = matching.match_point_cloud(
            means,
            sqrt_infos,
            points,
            points_mask,
            jnp.asarray(pose.rotation, dtype),
            jnp.asarray(pose.translation, dtype),
            search_radius=search_radius,
            num_neighbors=num_neighbors,
        )
        pose, summary = minimizer.solve(options, data, pose)
        summaries.append(summary)

        diff = pose.inverse() * last_pose
        dq = pose_mod.np_rotmat_to_quat(diff.rotation)
        if (
            np.linalg.norm(diff.translation) < outer_tolerance
            and np.linalg.norm(dq[1:]) < outer_tolerance
        ):
            break
        last_pose = pose.copy()

    return RegistrationResult(pose=pose, outer_iterations=outer_iter, summaries=summaries)
