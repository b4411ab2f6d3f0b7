"""Host-side pose types.

Lightweight numpy stand-ins for the Eigen ``Isometry3d`` / ``Isometry2d``
aliases the reference API passes around (reference: types.h:30-33). Device
code never touches these classes — solvers operate on raw ``(t, q)`` arrays;
these exist so that user-facing APIs read like the reference's.
"""

from __future__ import annotations

import numpy as np

from . import lie


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
        return Pose(np.asarray(lie.quat_to_rotmat(q)), t)

    @staticmethod
    def from_axis_angle(angle: float, axis, translation=None) -> "Pose":
        axis = np.asarray(axis, dtype=np.float64)
        axis = axis / np.linalg.norm(axis)
        q = np.asarray(lie.so3_exp_quaternion(angle * axis))
        return Pose(np.asarray(lie.quat_to_rotmat(q)), translation)

    def matrix(self) -> np.ndarray:
        T = np.eye(4)
        T[:3, :3] = self.rotation
        T[:3, 3] = self.translation
        return T

    def quaternion(self) -> np.ndarray:
        """Quaternion (w, x, y, z)."""
        return np.asarray(lie.rotmat_to_quat(self.rotation))

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
