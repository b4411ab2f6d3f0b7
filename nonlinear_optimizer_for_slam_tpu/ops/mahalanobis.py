"""Mahalanobis-distance (NDT scan-to-map) factor: residuals, Jacobians, and
fused quadratic evaluation — jnp/XLA backend.

Problem (reference: mahalanobis_distance_minimizer/*): given correspondences
{local point p_i <-> NDT voxel (mu_i, S_i = sqrt-information)}, and SE(3)
pose (R, t):

    r_i = S_i * (R p_i + t - mu_i)                          (3,)
    J_i = [ S_i | -S_i * R * skew(p_i) ]                    (3, 6)

(reference: mahalanobis_distance_minimizer_analytic.cc:159-185). The 3-DoF
planar (x, y, yaw) reduction keeps the 3-D residual but parameterizes only
(t_x, t_y, theta):

    J_i = [ S_i[:, :2] | S_i[:, :2] @ (dR/dtheta u_i) ]     (3, 3)

(reference: mahalanobis_distance_minimizer_analytic_3dof.cc:110-139).

Data is structure-of-arrays (the TPU analog of the reference SIMD
SOAContainer packing, mahalanobis_distance_minimizer_analytic_simd.cc:19-28)
with a validity mask instead of stride-tail dropping.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.losses import LossFunction
from .quadratic import highest_precision, quadratic_from_jacobians

Array = jax.Array


def unpack_maha6(packed: Array) -> "MahalanobisData":
    """Inverse of ops.pallas_kernels.pack_maha6: packed transposed rows
    ((16, N) or the (16, N // 128, 128) plane form) -> SoA
    MahalanobisData. Used by the jnp evaluation path over the same packed
    buffer the Pallas kernels consume (batched serving mode, where vmap
    over the SMEM params of a pallas_call is unsupported)."""
    if packed.ndim == 3:
        packed = packed.reshape(packed.shape[0], -1)
    return MahalanobisData(
        points=packed[0:3].T,
        means=packed[3:6].T,
        sqrt_infos=packed[6:15].T.reshape(-1, 3, 3),
        mask=packed[15],
    )


class MahalanobisData(NamedTuple):
    """SoA batch of NDT correspondences (reference: types.h:11-26)."""

    points: Array  # (N, 3) local points p_i
    means: Array  # (N, 3) NDT voxel means mu_i
    sqrt_infos: Array  # (N, 3, 3) NDT sqrt-information S_i
    mask: Array  # (N,) 1.0 = real correspondence, 0.0 = padding

    @property
    def num_factors(self) -> int:
        return self.points.shape[0]

    def pad_to(self, n: int) -> "MahalanobisData":
        cur = self.points.shape[0]
        if cur == n:
            return self
        extra = n - cur
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)], axis=0
        )
        return MahalanobisData(
            pad(self.points), pad(self.means), pad(self.sqrt_infos), pad(self.mask)
        )

    def astype(self, dtype) -> "MahalanobisData":
        return MahalanobisData(*(a.astype(dtype) for a in self))


@highest_precision
def residuals_and_jacobians(
    rotation: Array, translation: Array, data: MahalanobisData
) -> Tuple[Array, Array]:
    """Batched (r, J) for the full 6-DoF problem.

    Returns r (N, 3) and J (N, 3, 6).
    """
    R, t = rotation, translation
    p, mu, S = data.points, data.means, data.sqrt_infos

    warped = p @ R.T + t  # (N, 3)
    e = warped - mu
    r = jnp.einsum("nij,nj->ni", S, e)

    # S R skew(p): build columns directly from cross products of the columns
    # of (S R) with p — avoids materializing per-point skew matrices.
    SR = jnp.einsum("nij,jk->nik", S, R)  # (N, 3, 3)
    px, py, pz = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    # (SR @ skew(p))[:, :, c] columns:
    col0 = SR[..., 1] * pz - SR[..., 2] * py
    col1 = SR[..., 2] * px - SR[..., 0] * pz
    col2 = SR[..., 0] * py - SR[..., 1] * px
    SRskew = jnp.stack([col0, col1, col2], axis=-1)  # (N, 3, 3)

    J = jnp.concatenate([S, -SRskew], axis=-1)  # (N, 3, 6)
    return r, J


@highest_precision
def residuals(rotation: Array, translation: Array, data: MahalanobisData) -> Array:
    """Residuals only — the autodiff-oracle entry point."""
    warped = data.points @ rotation.T + translation
    e = warped - data.means
    return jnp.einsum("nij,nj->ni", data.sqrt_infos, e)


def eval_quadratic(
    rotation: Array,
    translation: Array,
    data: MahalanobisData,
    loss: Optional[LossFunction],
) -> Tuple[Array, Array, Array]:
    """Fused (H, g, cost) for the 6-DoF problem (jnp backend).

    TPU mapping of the reference hot loop
    (mahalanobis_distance_minimizer_analytic.cc:12-54): the J^T J / J^T r
    contractions become one big MXU matmul over the factor axis; loss
    weights fuse elementwise on the VPU.
    """
    r, J = residuals_and_jacobians(rotation, translation, data)
    return quadratic_from_jacobians(r, J, data.mask, loss)


# ----------------------------------------------------------------------------
# 3-DoF planar (x, y, yaw)
# ----------------------------------------------------------------------------


@highest_precision
def residuals_and_jacobians_3dof(
    rotation2: Array, translation2: Array, data: MahalanobisData
) -> Tuple[Array, Array]:
    """Batched (r, J) for the planar problem.

    rotation2 is the 2x2 rotation block, translation2 the (2,) planar
    translation. Residual stays 3-D: the z row of S still couples the voxel
    mean's z (reference: .._analytic_3dof.cc:110-139).

    Returns r (N, 3) and J (N, 3, 3) with parameter order (x, y, yaw).
    """
    R2, t2 = rotation2, translation2
    p, mu, S = data.points, data.means, data.sqrt_infos

    u = p[..., :2]  # (N, 2)
    u_warped = u @ R2.T + t2
    warped = jnp.concatenate([u_warped, p[..., 2:3]], axis=-1)
    e = warped - mu
    r = jnp.einsum("nij,nj->ni", S, e)

    # dR/dtheta @ u = R @ [-u_y, u_x]
    du = jnp.stack([-u[..., 1], u[..., 0]], axis=-1)  # (N, 2)
    r_skew_u = du @ R2.T  # (N, 2)

    S2 = S[..., :2]  # (N, 3, 2) first two columns
    J_yaw = jnp.einsum("nij,nj->ni", S2, r_skew_u)  # (N, 3)
    J = jnp.concatenate([S2, J_yaw[..., None]], axis=-1)  # (N, 3, 3)
    return r, J


@highest_precision
def residuals_3dof(rotation2: Array, translation2: Array, data: MahalanobisData) -> Array:
    u = data.points[..., :2]
    u_warped = u @ rotation2.T + translation2
    warped = jnp.concatenate([u_warped, data.points[..., 2:3]], axis=-1)
    return jnp.einsum("nij,nj->ni", data.sqrt_infos, warped - data.means)


def eval_quadratic_3dof(
    rotation2: Array,
    translation2: Array,
    data: MahalanobisData,
    loss: Optional[LossFunction],
) -> Tuple[Array, Array, Array]:
    r, J = residuals_and_jacobians_3dof(rotation2, translation2, data)
    return quadratic_from_jacobians(r, J, data.mask, loss)
