"""Unit tests for core Lie/quaternion math.

Oracle: numpy reference implementations (Rodrigues formula, Hamilton
product) at float64 — playing the role the Eigen ground truth plays in the
reference's simd_helper_test.cc.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import lie


def _np_quat_to_rot(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _rodrigues(w):
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    k = w / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K


def test_skew():
    v = np.array([1.0, -2.0, 3.0])
    S = np.asarray(lie.skew(jnp.asarray(v)))
    u = np.array([0.5, 0.25, -1.0])
    np.testing.assert_allclose(S @ u, np.cross(v, u), atol=1e-12)
    # batched
    V = np.random.default_rng(0).normal(size=(7, 3))
    SB = np.asarray(lie.skew(jnp.asarray(V)))
    for i in range(7):
        np.testing.assert_allclose(SB[i], np.asarray(lie.skew(jnp.asarray(V[i]))))


@pytest.mark.parametrize("scale", [1.0, 1e-3, 1e-7, 0.0])
def test_so3_exp_quaternion_matches_rodrigues(scale):
    w = scale * np.array([0.3, -0.2, 0.9])
    q = np.asarray(lie.so3_exp_quaternion(jnp.asarray(w, jnp.float64)))
    R_q = _np_quat_to_rot(q / np.linalg.norm(q))
    np.testing.assert_allclose(R_q, _rodrigues(w), atol=1e-9)


def test_so3_exp_small_angle_branch():
    """theta < 1e-6 takes q = (1, w/2) exactly — the reference's
    ComputeQuaternion branch (mahalanobis_distance_minimizer.cc:23-27)."""
    w = np.array([1e-8, -2e-8, 5e-9])
    q = np.asarray(lie.so3_exp_quaternion(jnp.asarray(w, jnp.float64)))
    np.testing.assert_allclose(q, np.concatenate([[1.0], 0.5 * w]), rtol=0, atol=0)


def test_quat_multiply_vs_rotation_composition(rng):
    qa = lie.quat_normalize(jnp.asarray(rng.normal(size=4)))
    qb = lie.quat_normalize(jnp.asarray(rng.normal(size=4)))
    Rab = np.asarray(lie.quat_to_rotmat(lie.quat_multiply(qa, qb)))
    np.testing.assert_allclose(
        Rab,
        np.asarray(lie.quat_to_rotmat(qa)) @ np.asarray(lie.quat_to_rotmat(qb)),
        atol=1e-12,
    )


def test_quat_conjugate_inverts(rng):
    q = lie.quat_normalize(jnp.asarray(rng.normal(size=4)))
    ident = np.asarray(lie.quat_multiply(q, lie.quat_conjugate(q)))
    np.testing.assert_allclose(ident, [1, 0, 0, 0], atol=1e-12)


@pytest.mark.parametrize("angle", [0.0, 0.1, 1.5, np.pi - 1e-3, np.pi])
def test_rotmat_quat_roundtrip(angle):
    axis = np.array([0.36, -0.48, 0.8])
    R = _rodrigues(angle * axis)
    q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R)))
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
    np.testing.assert_allclose(_np_quat_to_rot(q), R, atol=1e-9)


def test_quat_rotate(rng):
    q = lie.quat_normalize(jnp.asarray(rng.normal(size=4)))
    v = rng.normal(size=(5, 3))
    out = np.asarray(lie.quat_rotate(q, jnp.asarray(v)))
    np.testing.assert_allclose(out, v @ np.asarray(lie.quat_to_rotmat(q)).T, atol=1e-12)


def test_rot2_roundtrip():
    theta = 0.7
    R2 = np.asarray(lie.rot2(jnp.asarray(theta)))
    np.testing.assert_allclose(
        R2, [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    np.testing.assert_allclose(float(lie.angle_of_rot2(jnp.asarray(R2))), theta)
