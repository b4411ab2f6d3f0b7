"""Loop-closure detection: propose revisit candidates from estimated
poses, verify them by scan-to-keyframe-map registration, and emit
pose-graph edges whitened by the REGISTRATION'S OWN uncertainty.

The reference has no loop-closure machinery at all — its pose-graph
fixture plants loop constraints by hand (pose_graph_optimizer/tests/
simple_optimization_test.cc:93-122) and its registration solvers output
a bare pose. This module closes that gap with the standard
radius-candidate + geometric-verification recipe, and adds what the
reference's empty ``Summary`` never could: every accepted edge carries
``sqrt_info = cholesky(J^T W J)`` evaluated at the verified pose
(``MahalanobisDistanceMinimizer.information``), so the backend weighs
each closure by how well the geometry actually constrains it — a
corridor-like keyframe yields a soft edge along its degenerate axis
instead of a fixed hand-tuned weight.

Verification is two-staged like production systems: a cheap coarse
D2D/GICP alignment (hundreds of voxel pairs) corrects a drifted initial
guess, then full point-to-NDT registration refines and is judged on
matched-fraction overlap and correction magnitude.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.losses import ExponentialLoss
from ..core.options import Options
from ..core.pose import Pose, np_rotmat_to_quat
from ..solvers.minimizers import MahalanobisDistanceMinimizer
from ..solvers.pose_graph import edge_information_to_world
from . import matching, ndt, registration


@dataclasses.dataclass
class LoopClosure:
    """A verified loop-closure edge: ``relative_pose`` is T_ref<-query
    (the query scan's pose expressed in the reference keyframe's frame),
    ready for ``PoseGraphOptimizer.set_constraint(reference_id, query_id,
    relative_pose, LOOP, sqrt_info=...)``."""

    reference_id: int
    query_id: int
    relative_pose: Pose
    sqrt_info: np.ndarray  # (6, 6) cholesky factor of the GN information
    matched_fraction: float
    final_cost: float
    correction: float  # |verified - guessed| translation, meters


@dataclasses.dataclass
class _Keyframe:
    pose: Pose
    ndt_map: "ndt.NdtMap"


class LoopClosureDetector:
    """Radius-gated loop proposal + registration-verified acceptance.

    ``candidate_radius`` is in the ESTIMATED frame (the whole point of a
    loop closure is that estimates have drifted; widen it with expected
    drift). ``min_id_gap`` keeps odometry neighbors from masquerading as
    loops. Acceptance needs: registration converged inside
    ``max_translation_correction`` / ``max_rotation_correction`` of the
    guess, and at least ``min_match_fraction`` of the query scan matched
    to the keyframe's map at the verified pose (the overlap test — a
    wrong-place candidate fails it even when LM converges somewhere).
    """

    def __init__(
        self,
        voxel_resolution: float = 1.0,
        candidate_radius: float = 1.0,
        min_id_gap: int = 10,
        search_radius: float = 1.0,
        max_translation_correction: float = 1.0,
        max_rotation_correction: float = 0.5,
        min_match_fraction: float = 0.5,
        coarse_d2d: bool = True,
        options: Optional[Options] = None,
        loss=None,
        dtype=jnp.float32,
        identity_moment: bool = True,
    ):
        self.voxel_resolution = voxel_resolution
        self.candidate_radius = candidate_radius
        self.min_id_gap = min_id_gap
        self.search_radius = search_radius
        self.max_translation_correction = max_translation_correction
        self.max_rotation_correction = max_rotation_correction
        self.min_match_fraction = min_match_fraction
        self.coarse_d2d = coarse_d2d
        self.options = options if options is not None else Options()
        self.loss = loss if loss is not None else ExponentialLoss()
        # Keyframe maps default to the quirked (identity_moment=True)
        # build on purpose: the +I/count offset fattens sparse-scan voxel
        # covariances exactly like classical NDT covariance
        # regularization, widening the convergence basin when the initial
        # guess carries real odometry drift. Unquirked maps from noisy
        # few-hundred-point scans are sharp to the sensor noise (~cm) and
        # strand LM in local minima decimeters out. Set False only for
        # dense low-noise keyframe scans.
        self.identity_moment = identity_moment
        self.minimizer = MahalanobisDistanceMinimizer(
            dtype=dtype
        ).set_loss_function(self.loss)
        self._keyframes: Dict[int, _Keyframe] = {}

    # ------------------------------------------------------------------
    def add_keyframe(
        self, keyframe_id: int, scan_points: np.ndarray, pose_estimate: Pose
    ) -> None:
        """Register a keyframe: its scan (SENSOR frame) becomes an NDT map
        to verify future revisits against; ``pose_estimate`` is the
        current best world pose (update it via :meth:`update_pose` as the
        backend refines it)."""
        pts = np.asarray(scan_points, np.float64)
        try:
            from .. import native

            m = native.build_ndt_map(
                pts, self.voxel_resolution,
                identity_moment=self.identity_moment,
            )
        except Exception:
            m = ndt.build_ndt_map(
                pts, self.voxel_resolution,
                identity_moment=self.identity_moment,
            )
        if int(m.valid.sum()) == 0:
            raise ValueError(
                f"add_keyframe({keyframe_id}): no valid NDT voxel (every "
                f"voxel needs >= 5 points and lambda_max >= 0.01 at "
                f"resolution {self.voxel_resolution}); a later detect() "
                "against an empty map cannot match anything"
            )
        self._keyframes[keyframe_id] = _Keyframe(pose_estimate.copy(), m)

    def update_pose(self, keyframe_id: int, pose_estimate: Pose) -> None:
        self._keyframes[keyframe_id].pose = pose_estimate.copy()

    def remove_keyframe(self, keyframe_id: int) -> None:
        """Drop a keyframe (and its map) — bound memory on long runs by
        evicting keyframes the caller can no longer close against (e.g.
        marginalized out of a fixed-lag window)."""
        self._keyframes.pop(keyframe_id, None)

    def keyframe_ids(self) -> List[int]:
        return sorted(self._keyframes)

    # ------------------------------------------------------------------
    def detect(
        self,
        query_id: int,
        scan_points: np.ndarray,
        pose_estimate: Pose,
        eligible=None,
    ) -> Optional[LoopClosure]:
        """Try to close a loop for the query scan (SENSOR frame) at the
        current ``pose_estimate``. Returns the best verified closure
        (nearest candidate wins) or None.

        ``eligible``: optional container of keyframe ids the CALLER can
        still use (e.g. a fixed-lag smoother's active window). Filtering
        here — not on the returned closure — matters: an ineligible
        nearest candidate must not shadow an eligible farther one, and
        verification registrations are not wasted on unusable edges."""
        cands = []
        for kid, kf in self._keyframes.items():
            if abs(query_id - kid) < self.min_id_gap:
                continue
            if eligible is not None and kid not in eligible:
                continue
            d = np.linalg.norm(
                kf.pose.translation - pose_estimate.translation
            )
            if d <= self.candidate_radius:
                cands.append((d, kid))
        cands.sort()

        pts = np.asarray(scan_points, np.float64)
        for _, kid in cands:
            closure = self._verify(kid, query_id, pts, pose_estimate)
            if closure is not None:
                return closure
        return None

    # ------------------------------------------------------------------
    def _verify(
        self, kid: int, query_id: int, pts: np.ndarray, est: Pose
    ) -> Optional[LoopClosure]:
        kf = self._keyframes[kid]
        guess = kf.pose.inverse() * est  # T_ref<-query from estimates

        pose = guess
        if self.coarse_d2d:
            try:
                res = registration.register_d2d_ndt(
                    kf.ndt_map,
                    pts,
                    pose,
                    self.minimizer,
                    self.options,
                    scan_voxel_resolution=self.voxel_resolution / 2.0,
                    search_radius=self.search_radius,
                )
                pose = res.pose
            except ValueError:
                pass  # scan too sparse for a D2D pyramid level; go fine

        res = registration.register_ndt(
            kf.ndt_map, pts, pose, self.minimizer, self.options,
            search_radius=self.search_radius,
        )
        pose = res.pose

        # correction vs the odometry-chain guess
        diff = guess.inverse() * pose
        t_corr = float(np.linalg.norm(diff.translation))
        q_corr = np_rotmat_to_quat(diff.rotation)
        ang_corr = 2.0 * float(
            np.arctan2(np.linalg.norm(q_corr[1:]), abs(q_corr[0]))
        )
        if (
            t_corr > self.max_translation_correction
            or ang_corr > self.max_rotation_correction
        ):
            return None

        # overlap + information at the verified pose (one extra matching)
        valid = kf.ndt_map.valid_only()
        dtype = self.minimizer.dtype
        data = matching.match_point_cloud(
            jnp.asarray(valid.means, dtype),
            jnp.asarray(valid.sqrt_informations, dtype),
            jnp.asarray(pts, dtype),
            jnp.ones(pts.shape[0], dtype),
            jnp.asarray(pose.rotation, dtype),
            jnp.asarray(pose.translation, dtype),
            search_radius=self.search_radius,
        )
        k = data.mask.shape[0] // pts.shape[0]
        per_point = np.asarray(data.mask).reshape(pts.shape[0], k)
        fraction = float(per_point.max(axis=1).mean())
        if fraction < self.min_match_fraction:
            return None

        final_cost = float(np.asarray(res.summaries[-1].final_cost))
        if not np.isfinite(final_cost):
            return None

        H = self.minimizer.information(data, pose)
        # the registration information is measurement-frame (translation
        # tangent in the reference-keyframe frame); the pose-graph edge
        # residual's translation rows are world-frame — conjugate by the
        # keyframe's current world rotation so anisotropic axes (e.g. a
        # corridor-degenerate soft direction) land on the right world
        # axes (solvers.pose_graph.edge_information_to_world)
        H = edge_information_to_world(H, kf.pose.rotation)
        # tiny jitter keeps cholesky alive on degenerate geometry; the
        # resulting near-zero rows whiten those directions to ~nothing,
        # which is exactly the right edge weight for them
        L = np.linalg.cholesky(H + 1e-9 * np.eye(6))
        return LoopClosure(
            reference_id=kid,
            query_id=query_id,
            relative_pose=pose,
            sqrt_info=L.T,  # upper-triangular whitener, r' = S r
            matched_fraction=fraction,
            final_cost=final_cost,
            correction=t_corr,
        )
