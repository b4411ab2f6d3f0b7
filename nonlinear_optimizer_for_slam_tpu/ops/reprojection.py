"""Reprojection-error (PnP-style) factor — jnp/XLA backend.

Problem (reference: reprojection_error_minimizer/*): 3-D points X_i in the
reference frame, matched pixels p_i in the query frame; minimize over SE(3)
(R, t) the robustified sum of squared normalized-image-plane errors:

    Xw_i = R X_i + t
    r_i  = [Xw_x / Xw_z - (p_x - cx) / fx,
            Xw_y / Xw_z - (p_y - cy) / fy]                   (2,)
    J_i  = dpi/dXw * [ I | -R skew(X_i) ]                    (2, 6)

with dpi/dXw the 2x3 projection derivative carrying 1/z and -x/z^2 terms
(reference: reprojection_error_minimizer_analytic.cc:107-163).

Minimum-depth gating: the reference scalar path zeroes J and r when
Xw_z < 0.03 (.._analytic.cc:111-123); its SIMD path uses a Xw_z > 0
comparison mask folded into the weight (.._analytic_simd.cc:66,92). We
follow the scalar semantics (0.03 threshold) via a multiplicative mask —
the branch-to-mask conversion is exactly the XLA-native `where` pattern.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.losses import LossFunction
from .quadratic import highest_precision, quadratic_from_jacobians

Array = jax.Array

MIN_DEPTH = 0.03  # reference: reprojection_error_minimizer_analytic.cc:111


class CameraIntrinsics(NamedTuple):
    """Pinhole intrinsics (reference: reprojection_error_minimizer/types.h:14-24)."""

    fx: Array
    fy: Array
    cx: Array
    cy: Array
    inv_fx: Array
    inv_fy: Array
    width: int = 0
    height: int = 0

    @staticmethod
    def create(fx, fy, cx, cy, width=0, height=0) -> "CameraIntrinsics":
        return CameraIntrinsics(fx, fy, cx, cy, 1.0 / fx, 1.0 / fy, width, height)


class ReprojectionData(NamedTuple):
    """SoA batch of 3D-2D correspondences
    (reference: reprojection_error_minimizer/types.h:26-29)."""

    local_points: Array  # (N, 3) X_i in reference frame
    matched_pixels: Array  # (N, 2) p_i in query frame
    mask: Array  # (N,)

    @property
    def num_factors(self) -> int:
        return self.local_points.shape[0]

    def pad_to(self, n: int) -> "ReprojectionData":
        cur = self.local_points.shape[0]
        if cur == n:
            return self
        extra = n - cur
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)], axis=0
        )
        return ReprojectionData(
            pad(self.local_points), pad(self.matched_pixels), pad(self.mask)
        )

    def astype(self, dtype) -> "ReprojectionData":
        return ReprojectionData(*(a.astype(dtype) for a in self))


@highest_precision
def residuals_and_jacobians(
    rotation: Array,
    translation: Array,
    data: ReprojectionData,
    intrinsics: CameraIntrinsics,
) -> Tuple[Array, Array]:
    """Batched (r (N,2), J (N,2,6)) with depth gating folded in as masks."""
    R, t = rotation, translation
    X, p = data.local_points, data.matched_pixels

    Xw = X @ R.T + t  # (N, 3)
    zw = Xw[..., 2]
    valid = (zw >= MIN_DEPTH).astype(Xw.dtype)  # (N,)
    safe_z = jnp.where(zw >= MIN_DEPTH, zw, jnp.ones_like(zw))
    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z

    proj = Xw[..., :2] * inv_z[..., None]  # (N, 2)
    matched = jnp.stack(
        [
            intrinsics.inv_fx * (p[..., 0] - intrinsics.cx),
            intrinsics.inv_fy * (p[..., 1] - intrinsics.cy),
        ],
        axis=-1,
    )
    r = (proj - matched) * valid[..., None]

    # dpi/dXw (N, 2, 3)
    zero = jnp.zeros_like(inv_z)
    dK = jnp.stack(
        [
            jnp.stack([inv_z, zero, -Xw[..., 0] * inv_z2], axis=-1),
            jnp.stack([zero, inv_z, -Xw[..., 1] * inv_z2], axis=-1),
        ],
        axis=-2,
    )

    # R skew(X) columns via cross products with X.
    x, y, z = X[..., 0:1], X[..., 1:2], X[..., 2:3]
    col0 = R[:, 1] * z - R[:, 2] * y  # (N, 3)
    col1 = R[:, 2] * x - R[:, 0] * z
    col2 = R[:, 0] * y - R[:, 1] * x
    Rskew = jnp.stack([col0, col1, col2], axis=-1)  # (N, 3, 3)

    J_rot = -jnp.einsum("ndk,nkc->ndc", dK, Rskew)  # (N, 2, 3)
    J = jnp.concatenate([dK, J_rot], axis=-1) * valid[..., None, None]  # (N, 2, 6)
    return r, J


def residuals(
    rotation: Array,
    translation: Array,
    data: ReprojectionData,
    intrinsics: CameraIntrinsics,
) -> Array:
    r, _ = residuals_and_jacobians(rotation, translation, data, intrinsics)
    return r


def eval_quadratic(
    rotation: Array,
    translation: Array,
    data: ReprojectionData,
    intrinsics: CameraIntrinsics,
    loss: Optional[LossFunction],
) -> Tuple[Array, Array, Array]:
    """Fused (H, g, cost) for the reprojection problem (jnp backend)."""
    r, J = residuals_and_jacobians(rotation, translation, data, intrinsics)
    return quadratic_from_jacobians(r, J, data.mask, loss)


def project_to_pixels(points: Array, intrinsics: CameraIntrinsics) -> Array:
    """Pinhole projection of camera-frame points to pixels
    (reference: reproj tests/simple_optimization_test.cc:144-158)."""
    inv_z = 1.0 / points[..., 2]
    return jnp.stack(
        [
            intrinsics.fx * points[..., 0] * inv_z + intrinsics.cx,
            intrinsics.fy * points[..., 1] * inv_z + intrinsics.cy,
        ],
        axis=-1,
    )
