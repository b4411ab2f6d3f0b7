"""Point-to-plane ICP factor — jnp/XLA backend.

The reference declares point-to-plane as "TBD" in its README; the only
implementation lives in the unbuilt generic module
(reference: pose_optimizer/cost_functors.h:106-157):

    r_i = n_i . (R p_i + t - mu_i)                 (1,)
    J_i = [ n_i^T | -n_i^T R skew(p_i) ]           (1, 6)

Here it is a first-class batched factor.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.losses import LossFunction
from .quadratic import highest_precision, quadratic_from_jacobians

Array = jax.Array


def unpack_p2p(packed: Array) -> "PointToPlaneData":
    """Inverse of ops.pallas_kernels.pack_p2p: packed transposed rows
    ((16, N) or the (16, N // 128, 128) plane form) -> SoA
    PointToPlaneData (rows 10..15 are padding). The jnp evaluation path
    over the same packed buffer the Pallas kernel consumes."""
    if packed.ndim == 3:
        packed = packed.reshape(packed.shape[0], -1)
    return PointToPlaneData(
        points=packed[0:3].T,
        means=packed[3:6].T,
        normals=packed[6:9].T,
        mask=packed[9],
    )


class PointToPlaneData(NamedTuple):
    points: Array  # (N, 3) local points p_i
    means: Array  # (N, 3) plane anchor points mu_i
    normals: Array  # (N, 3) plane normals n_i
    mask: Array  # (N,)

    @property
    def num_factors(self) -> int:
        return self.points.shape[0]

    def pad_to(self, n: int) -> "PointToPlaneData":
        cur = self.points.shape[0]
        if cur == n:
            return self
        extra = n - cur
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)], axis=0
        )
        return PointToPlaneData(
            pad(self.points), pad(self.means), pad(self.normals), pad(self.mask)
        )

    def astype(self, dtype) -> "PointToPlaneData":
        return PointToPlaneData(*(a.astype(dtype) for a in self))


@highest_precision
def residuals_and_jacobians(
    rotation: Array, translation: Array, data: PointToPlaneData
) -> Tuple[Array, Array]:
    """Batched (r (N,1), J (N,1,6))."""
    R, t = rotation, translation
    p, mu, n = data.points, data.means, data.normals

    warped = p @ R.T + t
    e = warped - mu
    r = jnp.sum(n * e, axis=-1, keepdims=True)  # (N, 1)

    # n^T R skew(p): columns of R skew(p) dotted with n.
    x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    col0 = R[:, 1] * z - R[:, 2] * y
    col1 = R[:, 2] * x - R[:, 0] * z
    col2 = R[:, 0] * y - R[:, 1] * x
    nRskew = jnp.stack(
        [jnp.sum(n * col0, -1), jnp.sum(n * col1, -1), jnp.sum(n * col2, -1)],
        axis=-1,
    )  # (N, 3)
    J = jnp.concatenate([n, -nRskew], axis=-1)[:, None, :]  # (N, 1, 6)
    return r, J


@highest_precision
def residuals(rotation: Array, translation: Array, data: PointToPlaneData) -> Array:
    warped = data.points @ rotation.T + translation
    return jnp.sum(data.normals * (warped - data.means), axis=-1, keepdims=True)


def eval_quadratic(
    rotation: Array,
    translation: Array,
    data: PointToPlaneData,
    loss: Optional[LossFunction],
) -> Tuple[Array, Array, Array]:
    r, J = residuals_and_jacobians(rotation, translation, data)
    return quadratic_from_jacobians(r, J, data.mask, loss)
