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
from ..ops import mahalanobis
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


def register_d2d_ndt(
    ndt_map: NdtMap,
    local_points: np.ndarray,
    initial_pose: Pose,
    minimizer: _MinimizerBase,
    options: Options,
    scan_voxel_resolution: float = 0.5,
    search_radius: float = 1.0,
    max_outer_iterations: int = OUTER_MAX_ITERATIONS,
    outer_tolerance: float = OUTER_TOLERANCE,
) -> RegistrationResult:
    """Distribution-to-distribution (D2D) NDT / generalized-ICP
    registration: the scan is itself summarized as an NDT map and voxel
    GAUSSIANS are matched, not raw points (Stoyanov et al. IJRR'12 D2D-NDT;
    Segal et al. RSS'09 GICP). Beyond the reference, which is strictly
    point-to-distribution (mahalanobis .../types.h Correspondence).

    Each matched pair contributes r = W^{1/2} (R mu_s + t - mu_m) with the
    GICP combined-covariance whitening W = (Sigma_m + R Sigma_s R^T)^{-1},
    recomputed at the current rotation every outer iteration (the standard
    GICP approximation: W is held fixed during the inner LM solve, exactly
    like correspondences are). The inner problem is then literally
    ``MahalanobisData`` — the flagship solver (any backend, any mesh
    sharding) runs unchanged; only the whitening differs from
    scan-point-to-voxel NDT.

    Voxel covariances come eigenvalue-floored from the map (GICP's
    plane-regularization, see ``ndt.voxel_covariances``); the scan map is
    built unquirked (``identity_moment=False``) at
    ``scan_voxel_resolution``. D2D cost scales with #voxel pairs
    (~hundreds), not #points — it is the cheap coarse-alignment mode.
    """
    from . import ndt as ndt_mod

    map_valid = ndt_map.valid_only()
    map_means = np.asarray(map_valid.means)
    map_covs = ndt_mod.voxel_covariances(map_valid)

    scan_map = ndt_mod.build_ndt_map(
        np.asarray(local_points), scan_voxel_resolution, identity_moment=False
    ).valid_only()
    if scan_map.num_voxels == 0:
        raise ValueError(
            "register_d2d_ndt: no valid scan voxel passed the count/"
            "eigenvalue tests — scan_voxel_resolution "
            f"({scan_voxel_resolution}) is too fine for the scan density "
            "(each voxel needs >= 5 points and lambda_max >= 0.01)"
        )
    scan_means = np.asarray(scan_map.means)  # local frame
    scan_covs = ndt_mod.voxel_covariances(scan_map)

    dtype = minimizer.dtype
    pose = initial_pose.copy()
    last_pose = pose.copy()
    summaries = []
    outer_iter = 0
    for outer_iter in range(max_outer_iterations):
        R = np.asarray(pose.rotation)
        warped = scan_means @ R.T + pose.translation

        # Host-side nearest-mean matching: both sets are tiny (hundreds).
        d2 = np.sum(
            (warped[:, None, :] - map_means[None, :, :]) ** 2, axis=-1
        )
        idx = np.argmin(d2, axis=1)
        mask = (
            d2[np.arange(len(idx)), idx] <= search_radius * search_radius
        ).astype(np.float64)

        # GICP whitening at the current rotation: symmetric inverse sqrt
        # of Sigma_m + R Sigma_s R^T per pair.
        combined = map_covs[idx] + np.einsum(
            "ij,mjk,lk->mil", R, scan_covs, R
        )
        w, V = np.linalg.eigh(combined)
        inv_sqrt_w = 1.0 / np.sqrt(np.maximum(w, 1e-12))
        sqrt_infos = np.einsum(
            "mik,mk,mjk->mij", V, inv_sqrt_w, V
        )

        data = mahalanobis.MahalanobisData(
            points=jnp.asarray(scan_means, dtype),
            means=jnp.asarray(map_means[idx], dtype),
            sqrt_infos=jnp.asarray(sqrt_infos, dtype),
            mask=jnp.asarray(mask, dtype),
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

    return RegistrationResult(
        pose=pose, outer_iterations=outer_iter, summaries=summaries
    )


def register_point_to_plane(
    ndt_map: NdtMap,
    local_points: np.ndarray,
    initial_pose: Pose,
    minimizer: _MinimizerBase,
    options: Options,
    search_radius: float = 1.0,
    max_flatness: float = 0.2,
    max_thickness: float = None,
    num_neighbors: int = 4,
    trim_distance: float = 0.3,
    max_outer_iterations: int = OUTER_MAX_ITERATIONS,
    outer_tolerance: float = OUTER_TOLERANCE,
) -> RegistrationResult:
    """Point-to-plane ICP against the NDT map's voxel planes.

    The reference lists point-to-plane as TBD (README) and only sketches
    the factor in its unbuilt generic module
    (pose_optimizer/cost_functors.h:106-157); this is the full
    registration loop for it. Each valid voxel whose flatness
    (lambda_min / lambda_max) is at most ``max_flatness`` — and, when
    ``max_thickness`` is set, whose point stddev along the normal (in
    meters, see ``ndt.voxel_normals``) is at most ``max_thickness`` —
    contributes a plane (mean, normal); every scan point matches the best
    of its ``num_neighbors`` nearest in-radius voxel planes (minimum
    perpendicular distance — see ``matching.match_point_to_plane`` for
    why nearest-mean association alone biases plane factors), matches
    beyond ``trim_distance`` are rejected, and the loss-weighted
    point-to-plane distance is minimized with ``minimizer`` (typically
    ``PointToPlaneMinimizer``).

    For accurate planes, build the map with
    ``ndt.build_ndt_map(..., identity_moment=False)`` and gate with
    ``max_thickness`` (a few cm): that excludes plane-boundary voxels
    whose mixed point sets produce tilted normals, the dominant p2p error
    source. The default leaves thickness gating off because the
    reference-parity map build (the quirked default) pads every voxel's
    thickness by 1/count of isotropic variance.
    """
    from . import ndt as ndt_mod

    valid = ndt_map.valid_only()
    normals_np, flatness, thickness = ndt_mod.voxel_normals(valid)
    ok = flatness <= max_flatness
    if max_thickness is not None:
        ok &= thickness <= max_thickness
    weights_np = ok.astype(np.float64)

    dtype = minimizer.dtype
    means = jnp.asarray(valid.means, dtype)
    normals = jnp.asarray(normals_np, dtype)
    weights = jnp.asarray(weights_np, dtype)
    points = jnp.asarray(local_points, dtype)
    points_mask = jnp.ones(points.shape[0], dtype)

    pose = initial_pose.copy()
    last_pose = pose.copy()
    summaries = []
    outer_iter = 0
    for outer_iter in range(max_outer_iterations):
        data = matching.match_point_to_plane(
            means,
            normals,
            weights,
            points,
            points_mask,
            jnp.asarray(pose.rotation, dtype),
            jnp.asarray(pose.translation, dtype),
            search_radius=search_radius,
            num_neighbors=num_neighbors,
            trim_distance=trim_distance,
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
