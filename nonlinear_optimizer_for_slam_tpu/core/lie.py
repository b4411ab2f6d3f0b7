"""Lie-group / quaternion math for SE(3) and SE(2) pose manipulation.

All functions are pure jnp, dtype-polymorphic, and branch-free (small-angle
branches become ``jnp.where`` masks), so they trace cleanly under ``jit``
and inside ``lax.while_loop`` bodies.

Quaternion convention: ``(w, x, y, z)`` (scalar first), matching Eigen's
``Quaterniond`` semantics used throughout the reference.

Key parity target: ``so3_exp_quaternion`` reproduces the reference's
``ComputeQuaternion`` axis-angle -> quaternion map including its
small-angle branch at theta < 1e-6
(reference: mahalanobis_distance_minimizer.cc:20-33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_SMALL_ANGLE = 1e-6


def skew(v: Array) -> Array:
    """Skew-symmetric (hat) matrix of a 3-vector; batched over leading dims.

    Reference: the inline ``skew`` lambda in
    mahalanobis_distance_minimizer_analytic.cc:170-176.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp_quaternion(w: Array) -> Array:
    """Axis-angle 3-vector -> unit quaternion (w, x, y, z).

    Small-angle branch (theta < 1e-6): q = (1, 0.5 * w), exactly as the
    reference's ComputeQuaternion (mahalanobis_distance_minimizer.cc:23-27).
    """
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    small = theta < _SMALL_ANGLE
    # Guard against 0/0 in the large-angle expression.
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    half = 0.5 * safe_theta
    sin_half_over_theta = jnp.sin(half) / safe_theta
    qw = jnp.where(small[..., 0], jnp.ones_like(theta[..., 0]), jnp.cos(half[..., 0]))
    vec = jnp.where(small, 0.5 * w, sin_half_over_theta * w)
    return jnp.concatenate([qw[..., None], vec], axis=-1)


def quat_log_vec(q: Array) -> Array:
    """Unit quaternion (w, x, y, z) -> axis-angle 3-vector (inverse of
    :func:`so3_exp_quaternion`, matching its 1e-6 small-angle branch:
    w = 2 * vec / qw). Sign-normalizes to the shortest arc first."""
    q = jnp.where(q[..., :1] < 0, -q, q)
    vec = q[..., 1:]
    vn = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True))
    small = vn < _SMALL_ANGLE
    theta = 2.0 * jnp.arctan2(vn, q[..., :1])
    safe_vn = jnp.where(small, jnp.ones_like(vn), vn)
    scale = jnp.where(small, 2.0 / jnp.maximum(q[..., :1], 1e-12), theta / safe_vn)
    return scale * vec


def so3_exp_quaternion_jacobian(w: Array) -> Array:
    """d so3_exp_quaternion / dw: (..., 4, 3), branch-for-branch the
    derivative of :func:`so3_exp_quaternion` (small-angle branch included:
    d(1, w/2)/dw = [0; I/2]). Feeds the closed-form IMU-factor Jacobians
    (ops/imu.py); verified against jacfwd in tests/test_inertial.py."""
    dtype = w.dtype
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    small = theta < _SMALL_ANGLE
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    half = 0.5 * safe_theta
    sin_half = jnp.sin(half)
    u_hat = w / safe_theta  # (..., 3)
    # d qw / dw = -0.5 sin(theta/2) u_hat^T   (0 in the small branch)
    d_qw = jnp.where(small, jnp.zeros_like(w), -0.5 * sin_half * u_hat)
    # vec = s(theta) w, s = sin(theta/2)/theta:
    # d vec / dw = s I + s'(theta) w u_hat^T
    s = sin_half / safe_theta
    s_prime = 0.5 * jnp.cos(half) / safe_theta - sin_half / (safe_theta**2)
    eye = jnp.eye(3, dtype=dtype)
    d_vec_large = s[..., None] * eye + s_prime[..., None] * (
        w[..., :, None] * u_hat[..., None, :]
    )
    d_vec = jnp.where(small[..., None], 0.5 * eye, d_vec_large)
    return jnp.concatenate([d_qw[..., None, :], d_vec], axis=-2)


def quat_log_vec_jacobian(q: Array) -> Array:
    """d quat_log_vec / dq: (..., 3, 4), branch-for-branch the derivative
    of :func:`quat_log_vec` including the shortest-arc sign flip (the flip
    chains a global factor sign(qw); its switch point qw = 0 is pi
    rotations where Log itself is discontinuous)."""
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)
    qs = sign * q
    w = qs[..., :1]
    vec = qs[..., 1:]
    vn_sq = jnp.sum(vec * vec, axis=-1, keepdims=True)
    vn = jnp.sqrt(vn_sq)
    small = vn < _SMALL_ANGLE
    safe_vn = jnp.where(small, jnp.ones_like(vn), vn)
    safe_w = jnp.maximum(w, 1e-12)
    nrm_sq = w * w + vn_sq
    theta = 2.0 * jnp.arctan2(vn, w)
    v_hat = vec / safe_vn
    eye = jnp.eye(3, dtype=q.dtype)
    # d f / d w = -2 vec / (w^2 + vn^2)      (small: -2 vec / w^2)
    d_w = jnp.where(small, -2.0 * vec / safe_w**2, -2.0 * vec / nrm_sq)
    # d f / d vec = (theta/vn)(I - vh vh^T) + (2w/(w^2+vn^2)) vh vh^T
    # (small: 2/w I — the derivative of 2 vec / w)
    vvT = v_hat[..., :, None] * v_hat[..., None, :]
    d_v_large = (theta / safe_vn)[..., None] * (eye - vvT) + (
        2.0 * w / nrm_sq
    )[..., None] * vvT
    d_v = jnp.where(small[..., None], (2.0 / safe_w)[..., None] * eye, d_v_large)
    return sign[..., None] * jnp.concatenate([d_w[..., :, None], d_v], axis=-1)


def quat_multiply(a: Array, b: Array) -> Array:
    """Hamilton product a (x) b, both (…, 4) in (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: Array) -> Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: Array) -> Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: Array) -> Array:
    """Unit quaternion (w, x, y, z) -> 3x3 rotation matrix; batched."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: Array) -> Array:
    """3x3 rotation matrix -> unit quaternion (w, x, y, z).

    Branch-free Shepperd-style selection of the numerically best of the four
    candidate extractions (needed because the naive trace formula loses
    precision near 180-degree rotations).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each scaled by 4*q_k^2 (guarded to stay positive).
    qw_sq = jnp.maximum(1.0 + tr, 0.0)
    qx_sq = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy_sq = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz_sq = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # Candidate 0 (via qw), 1 (via qx), 2 (via qy), 3 (via qz).
    sw = 2.0 * jnp.sqrt(qw_sq + 1e-30)
    sx = 2.0 * jnp.sqrt(qx_sq + 1e-30)
    sy = 2.0 * jnp.sqrt(qy_sq + 1e-30)
    sz = 2.0 * jnp.sqrt(qz_sq + 1e-30)

    cand = jnp.stack(
        [
            jnp.stack([0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], -1),
            jnp.stack([(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], -1),
            jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], -1),
            jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], -1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    scores = jnp.stack([qw_sq, qx_sq, qy_sq, qz_sq], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vector(s) v by unit quaternion q."""
    return jnp.einsum("...ij,...j->...i", quat_to_rotmat(q), v)


def se3_apply(R: Array, t: Array, points: Array) -> Array:
    """Apply (R, t) to points (..., 3): R @ p + t."""
    return points @ R.T + t


# ----------------------------------------------------------------------------
# SE(2) helpers for the 3-DoF planar solvers
# (reference: mahalanobis_distance_minimizer_analytic_3dof.cc).
# ----------------------------------------------------------------------------


def rot2(theta: Array) -> Array:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def angle_of_rot2(R2: Array) -> Array:
    return jnp.arctan2(R2[..., 1, 0], R2[..., 0, 0])
