"""Correspondence search: local points -> nearby NDT voxels.

The reference builds a FLANN kd-tree over valid NDT means each outer-ICP
iteration and does a radius search (r = 1.0, up to 2 neighbors) per warped
point (mahalanobis tests/simple_optimization_test.cc:296-342).

On TPU the map is tiny (tens to thousands of voxels) while the point set is
large, so the TPU-native formulation is a dense (N, M) distance computation
— one matmul that rides the MXU — followed by ``lax.top_k``: brute force
beats tree traversal by orders of magnitude at these shapes and keeps the
whole matching step on-device with static shapes (no host round-trip
between matching and solving). The returned batch has N*k rows with a
validity mask instead of a ragged correspondence list.

FLANN's radius search returns the (up to) k nearest neighbors within the
radius; dense top-k + radius mask selects exactly the same set.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.mahalanobis import MahalanobisData
from ..ops.point_to_plane import PointToPlaneData

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("num_neighbors",))
def match_point_cloud(
    ndt_means: Array,  # (M, 3) valid-voxel means
    ndt_sqrt_infos: Array,  # (M, 3, 3)
    local_points: Array,  # (N, 3)
    points_mask: Array,  # (N,) 1.0 = real point (padding support)
    rotation: Array,  # (3, 3) current pose estimate
    translation: Array,  # (3,)
    search_radius: float = 1.0,
    num_neighbors: int = 2,
    map_mask: Array | None = None,  # (M,) 1.0 = real voxel (map padding)
) -> MahalanobisData:
    """Warp points by the current pose and match each to its nearest
    ``num_neighbors`` NDT voxels within ``search_radius``.

    Returns a MahalanobisData of N * num_neighbors correspondences whose
    mask zeroes out-of-radius / padded entries. Correspondences carry the
    LOCAL (unwarped) point, as in the reference (:321-324). ``map_mask``
    excludes padding voxels (bucket-padded maps keep one compiled program
    across per-scan voxel counts) from the neighbor ranking entirely.
    """
    warped = local_points @ rotation.T + translation  # (N, 3)

    # Squared distances via the expanded form: one (N, 3) x (3, M) matmul.
    # Both sets are centered on the map centroid first: the expanded form
    # cancels catastrophically when |coords| >> |pairwise distances| (for a
    # map 300 m from the origin the f32 error reaches ~0.05 m^2 — enough to
    # flip the radius test and neighbor ranking near ties vs the
    # reference's double-precision FLANN search); centering restores the
    # precision for one cheap subtraction.
    centroid = jnp.mean(ndt_means, axis=0)
    wc = warped - centroid
    mc = ndt_means - centroid
    d2 = (
        jnp.sum(wc * wc, axis=1, keepdims=True)
        - 2.0 * wc @ mc.T
        + jnp.sum(mc * mc, axis=1)[None, :]
    )  # (N, M)
    if map_mask is not None:
        d2 = jnp.where(map_mask[None, :] > 0.0, d2, jnp.inf)

    neg_d2, idx = jax.lax.top_k(-d2, num_neighbors)  # (N, k)
    within = (-neg_d2) <= search_radius * search_radius
    mask = within.astype(local_points.dtype) * points_mask[:, None]

    n, k = idx.shape
    flat_idx = idx.reshape(n * k)
    return MahalanobisData(
        points=jnp.repeat(local_points, k, axis=0),
        means=ndt_means[flat_idx],
        sqrt_infos=ndt_sqrt_infos[flat_idx],
        mask=mask.reshape(n * k),
    )


@functools.partial(jax.jit, static_argnames=("num_neighbors",))
def match_point_to_plane(
    ndt_means: Array,  # (M, 3) valid-voxel means
    ndt_normals: Array,  # (M, 3) unit plane normals (ndt.voxel_normals)
    voxel_weights: Array,  # (M,) 1.0 = usable plane (e.g. flatness gate)
    local_points: Array,  # (N, 3)
    points_mask: Array,  # (N,) 1.0 = real point (padding support)
    rotation: Array,  # (3, 3) current pose estimate
    translation: Array,  # (3,)
    search_radius: float = 1.0,
    num_neighbors: int = 4,
    trim_distance: float = 0.3,
    map_mask: Array | None = None,  # (M,) 1.0 = real voxel (map padding)
) -> PointToPlaneData:
    """Point-to-plane correspondence search.

    Same dense top-k candidate search as :func:`match_point_cloud`, but
    each point keeps ONE plane: of its ``num_neighbors``
    Euclidean-nearest in-radius voxels, the one whose plane the warped
    point is closest to PERPENDICULARLY. Nearest-mean association alone
    is wrong for planes — near a room corner a floor point can sit closer
    to the wall voxel's mean than to its own floor voxel's, and matching
    it to the wall plane pulls the optimum millimeters-to-centimeters off
    truth (the mahalanobis factor is immune because its sqrt-information
    carries the full anisotropy; a bare plane does not). Min point-plane
    distance among the Euclidean candidates makes the true pose a fixed
    point: there, every point lies ON its own voxel's plane.

    Matches farther than ``trim_distance`` from every candidate plane are
    masked out (trimmed-ICP outlier rejection). ``voxel_weights``
    multiplies into the candidate mask, so non-planar voxels (see
    ``ndt.voxel_normals`` flatness) are excluded without changing the
    static map shape. Correspondences carry the LOCAL (unwarped) point,
    like the mahalanobis matcher; returns N rows (one per point).
    """
    warped = local_points @ rotation.T + translation  # (N, 3)

    centroid = jnp.mean(ndt_means, axis=0)
    wc = warped - centroid
    mc = ndt_means - centroid
    d2 = (
        jnp.sum(wc * wc, axis=1, keepdims=True)
        - 2.0 * wc @ mc.T
        + jnp.sum(mc * mc, axis=1)[None, :]
    )  # (N, M)
    if map_mask is not None:
        d2 = jnp.where(map_mask[None, :] > 0.0, d2, jnp.inf)

    neg_d2, idx = jax.lax.top_k(-d2, num_neighbors)  # (N, k)
    within = (-neg_d2) <= search_radius * search_radius
    cand_ok = within & (voxel_weights[idx] > 0.0)  # (N, k)

    # Perpendicular distance of each warped point to each candidate plane.
    cand_means = ndt_means[idx]  # (N, k, 3)
    cand_normals = ndt_normals[idx]  # (N, k, 3)
    plane_d = jnp.abs(
        jnp.sum(cand_normals * (warped[:, None, :] - cand_means), axis=-1)
    )  # (N, k)
    plane_d = jnp.where(cand_ok, plane_d, jnp.inf)
    best = jnp.argmin(plane_d, axis=1)  # (N,)
    rows = jnp.arange(idx.shape[0])
    best_d = plane_d[rows, best]

    mask = (
        (best_d <= trim_distance).astype(local_points.dtype)
        * points_mask
    )
    return PointToPlaneData(
        points=local_points,
        means=cand_means[rows, best],
        normals=cand_normals[rows, best],
        mask=mask,
    )


def match_counts(data: MahalanobisData) -> Array:
    """Number of real correspondences in a matched batch."""
    return jnp.sum(data.mask)
