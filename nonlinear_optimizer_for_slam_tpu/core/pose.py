"""Host-side pose types.

Lightweight numpy stand-ins for the Eigen ``Isometry3d`` / ``Isometry2d``
aliases the reference API passes around (reference: types.h:30-33). Device
code never touches these classes — solvers operate on raw ``(t, q)`` arrays;
these exist so that user-facing APIs read like the reference's.
"""

from __future__ import annotations

import numpy as np

# NOTE: host-side pose math is PURE NUMPY on purpose. Routing it through
# the jnp functions in core.lie would eagerly dispatch ~30 tiny ops to the
# accelerator per conversion (~50-70 ms per solve call on TPU, measured) —
# dominating the actual 5 ms jitted solve. Device code uses core.lie; the
# host uses these numpy twins.


def np_quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """(w, x, y, z) unit quaternion -> 3x3 rotation matrix (numpy)."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def np_quat_to_rotmat_batch(q: np.ndarray) -> np.ndarray:
    """(N, 4) (w, x, y, z) quaternions -> (N, 3, 3) rotations, fully
    vectorized (round 5: the per-edge python-loop conversion cost
    ~200 ms alone on a 29k-edge chordal init)."""
    q = np.asarray(q, np.float64)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((len(q), 3, 3))
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - w * z)
    R[:, 0, 2] = 2 * (x * z + w * y)
    R[:, 1, 0] = 2 * (x * y + w * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - w * x)
    R[:, 2, 0] = 2 * (x * z - w * y)
    R[:, 2, 1] = 2 * (y * z + w * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def np_rotmat_to_quat_batch(R: np.ndarray) -> np.ndarray:
    """(N, 3, 3) rotations -> (N, 4) unit quaternions (w, x, y, z);
    vectorized Shepperd best-candidate selection matching
    :func:`np_rotmat_to_quat` row for row."""
    R = np.asarray(R, np.float64)
    m00, m01, m02 = R[:, 0, 0], R[:, 0, 1], R[:, 0, 2]
    m10, m11, m12 = R[:, 1, 0], R[:, 1, 1], R[:, 1, 2]
    m20, m21, m22 = R[:, 2, 0], R[:, 2, 1], R[:, 2, 2]
    tr = m00 + m11 + m22
    scores = np.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
         1.0 - m00 - m11 + m22], axis=1
    )
    best = np.argmax(scores, axis=1)
    s = 2.0 * np.sqrt(
        np.maximum(scores[np.arange(len(R)), best], 0.0) + 1e-30
    )
    cands = np.stack(
        [
            np.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s,
                      (m10 - m01) / s], axis=1),
            np.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s,
                      (m02 + m20) / s], axis=1),
            np.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s,
                      (m12 + m21) / s], axis=1),
            np.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s,
                      0.25 * s], axis=1),
        ],
        axis=1,
    )  # (N, 4 candidates, 4)
    q = cands[np.arange(len(R)), best]
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def np_rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix -> unit quaternion (w, x, y, z) (numpy,
    Shepperd-style best-candidate selection)."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22
    scores = np.array(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22]
    )
    best = int(np.argmax(scores))
    s = 2.0 * np.sqrt(max(scores[best], 0.0) + 1e-30)
    if best == 0:
        q = np.array([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s])
    elif best == 1:
        q = np.array([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s])
    elif best == 2:
        q = np.array([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s])
    else:
        q = np.array([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s])
    return q / np.linalg.norm(q)


def np_axis_angle_to_quat(w: np.ndarray) -> np.ndarray:
    """Axis-angle 3-vector -> (w, x, y, z); same small-angle branch as the
    reference ComputeQuaternion (mahalanobis_distance_minimizer.cc:20-33)."""
    theta = np.linalg.norm(w)
    if theta < 1e-6:
        return np.concatenate([[1.0], 0.5 * np.asarray(w)])
    half = 0.5 * theta
    return np.concatenate([[np.cos(half)], np.sin(half) / theta * np.asarray(w)])


class Pose:
    """SE(3) pose: rotation (3,3) + translation (3,). Mirrors Eigen::Isometry3d."""

    __slots__ = ("rotation", "translation")

    def __init__(self, rotation=None, translation=None):
        self.rotation = (
            np.eye(3) if rotation is None else np.asarray(rotation, dtype=np.float64)
        )
        self.translation = (
            np.zeros(3)
            if translation is None
            else np.asarray(translation, dtype=np.float64)
        )

    @staticmethod
    def identity() -> "Pose":
        return Pose()

    @staticmethod
    def from_matrix(T: np.ndarray) -> "Pose":
        T = np.asarray(T, dtype=np.float64)
        return Pose(T[:3, :3], T[:3, 3])

    @staticmethod
    def from_quat_trans(q, t) -> "Pose":
        q = np.asarray(q, dtype=np.float64)
        return Pose(np_quat_to_rotmat(q), t)

    @staticmethod
    def from_axis_angle(angle: float, axis, translation=None) -> "Pose":
        axis = np.asarray(axis, dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        q = np_axis_angle_to_quat(angle * axis)
        return Pose(np_quat_to_rotmat(q), translation)

    def matrix(self) -> np.ndarray:
        T = np.eye(4)
        T[:3, :3] = self.rotation
        T[:3, 3] = self.translation
        return T

    def quaternion(self) -> np.ndarray:
        """Quaternion (w, x, y, z)."""
        return np_rotmat_to_quat(self.rotation)

    def inverse(self) -> "Pose":
        Rt = self.rotation.T
        return Pose(Rt, -Rt @ self.translation)

    def __mul__(self, other):
        if isinstance(other, Pose):
            return Pose(
                self.rotation @ other.rotation,
                self.rotation @ other.translation + self.translation,
            )
        other = np.asarray(other)
        return other @ self.rotation.T + self.translation

    def apply(self, points: np.ndarray) -> np.ndarray:
        return np.asarray(points) @ self.rotation.T + self.translation

    def copy(self) -> "Pose":
        return Pose(self.rotation.copy(), self.translation.copy())

    def __repr__(self):
        q = self.quaternion()
        return f"Pose(t={self.translation.tolist()}, q_wxyz={q.tolist()})"


class Pose2:
    """SE(2) pose. Mirrors Eigen::Isometry2d (reference: types.h:31)."""

    __slots__ = ("rotation", "translation")

    def __init__(self, rotation=None, translation=None):
        self.rotation = (
            np.eye(2) if rotation is None else np.asarray(rotation, dtype=np.float64)
        )
        self.translation = (
            np.zeros(2)
            if translation is None
            else np.asarray(translation, dtype=np.float64)
        )

    @staticmethod
    def from_theta_trans(theta: float, t) -> "Pose2":
        c, s = np.cos(theta), np.sin(theta)
        return Pose2(np.array([[c, -s], [s, c]]), t)

    @property
    def theta(self) -> float:
        return float(np.arctan2(self.rotation[1, 0], self.rotation[0, 0]))

    def inverse(self) -> "Pose2":
        Rt = self.rotation.T
        return Pose2(Rt, -Rt @ self.translation)

    def __mul__(self, other):
        if isinstance(other, Pose2):
            return Pose2(
                self.rotation @ other.rotation,
                self.rotation @ other.translation + self.translation,
            )
        other = np.asarray(other)
        return other @ self.rotation.T + self.translation

    def copy(self) -> "Pose2":
        return Pose2(self.rotation.copy(), self.translation.copy())
