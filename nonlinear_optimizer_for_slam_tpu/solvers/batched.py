"""Batched multi-problem solving (serving mode).

The reference solves one problem per call (one `Solve` per scan/frame,
mahalanobis_distance_minimizer.h:39, reprojection_error_minimizer.h:20); a
TPU serves hundreds of independent pose problems at once by vmapping the
WHOLE LM while_loop — one program, one dispatch, B solves. Each instance
keeps its own lambda / convergence state: `jax.vmap` of `lax.while_loop`
runs until every instance is done and masks updates for finished ones, so
per-instance trajectories are bit-identical to individual solves (asserted
in tests/test_batched.py).

Why this is the serving fast path here: every blocking dispatch on this
runtime pays a fixed completion-poll quantum (~30 ms measured, CLAUDE.md),
so B solves in one dispatch amortize it to 30/B ms plus true device time.
Ragged problem sizes are handled the XLA-native way: pad every instance to
a common factor count with mask=0 rows (the same masked-padding scheme the
single-problem solvers use instead of the reference's SIMD stride-tail
handling).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.losses import LossFunction
from ..core.options import Options
from ..core.pose import Pose, np_quat_to_rotmat
from ..ops import mahalanobis, point_to_plane, reprojection
from ..ops.reprojection import CameraIntrinsics
from . import lm
from .manifolds import SE3Params, se3_retract

Array = jax.Array


def _stack_initial(initial_poses: Sequence[Pose], B: int, dtype):
    if len(initial_poses) != B:
        raise ValueError(f"{len(initial_poses)} poses for batch of {B}")
    t0s = jnp.asarray(np.stack([p.translation for p in initial_poses]), dtype)
    q0s = jnp.asarray(np.stack([p.quaternion() for p in initial_poses]), dtype)
    return t0s, q0s


def _poses_from_device(ts, qs) -> List[Pose]:
    poses = []
    for t, q in zip(ts, qs):
        q = np.array(q, np.float64)
        q /= np.linalg.norm(q)
        poses.append(Pose(np_quat_to_rotmat(q), np.asarray(t, np.float64)))
    return poses


def _solve_one(quad, t0, q0, options):
    params, summary = lm.solve(quad, se3_retract, SE3Params(t0, q0), options)
    return (
        params.translation,
        params.quaternion,
        summary.iterations,
        summary.final_cost,
    )


@functools.partial(jax.jit, static_argnums=(4, 5))
def _maha6_solve_batched(t0s, q0s, data, loss, options, backend="jnp"):
    def one(t0, q0, pts, mus, infos, mask):
        shard = mahalanobis.MahalanobisData(pts, mus, infos, mask)

        if backend == "pallas":
            from ..ops import pallas_kernels as pk

            # vmap-compatible fused kernel (VMEM params variant); the
            # pack is pure jnp and batches transparently
            packed = pk.pack_maha6(shard)

            def quad(params: SE3Params):
                R = lie.quat_to_rotmat(params.quaternion)
                return pk.maha6_eval_quadratic_packed_v(
                    R, params.translation, packed, loss
                )

        else:

            def quad(params: SE3Params):
                R = lie.quat_to_rotmat(params.quaternion)
                return mahalanobis.eval_quadratic(
                    R, params.translation, shard, loss
                )

        return _solve_one(quad, t0, q0, options)

    return jax.vmap(one)(
        t0s, q0s, data.points, data.means, data.sqrt_infos, data.mask
    )


@functools.partial(jax.jit, static_argnums=(5,))
def _reproj_solve_batched(t0s, q0s, data, intrinsics, loss, options):
    def one(t0, q0, pts, pix, mask):
        shard = reprojection.ReprojectionData(pts, pix, mask)

        def quad(params: SE3Params):
            R = lie.quat_to_rotmat(params.quaternion)
            return reprojection.eval_quadratic(
                R, params.translation, shard, intrinsics, loss
            )

        return _solve_one(quad, t0, q0, options)

    return jax.vmap(one)(
        t0s, q0s, data.local_points, data.matched_pixels, data.mask
    )


@functools.partial(jax.jit, static_argnums=(4,))
def _p2p_solve_batched(t0s, q0s, data, loss, options):
    def one(t0, q0, pts, mus, normals, mask):
        shard = point_to_plane.PointToPlaneData(pts, mus, normals, mask)

        def quad(params: SE3Params):
            R = lie.quat_to_rotmat(params.quaternion)
            return point_to_plane.eval_quadratic(
                R, params.translation, shard, loss
            )

        return _solve_one(quad, t0, q0, options)

    return jax.vmap(one)(
        t0s, q0s, data.points, data.means, data.normals, data.mask
    )


def solve_mahalanobis_batch_async(
    options: Options,
    data: mahalanobis.MahalanobisData,
    initial_poses: Sequence[Pose],
    loss: Optional[LossFunction] = None,
    dtype=jnp.float32,
    backend: str = "jnp",
):
    """:func:`solve_mahalanobis_batch` WITHOUT the host sync: dispatches
    the batch program and returns device values for
    :func:`finalize_solve_batch`. The streaming form for serving
    pipelines (round 5 — the registrar's async treatment applied to the
    batched one-shot solvers): on this runtime the first blocking fetch
    flips the process into its degraded ~30 ms-per-dispatch state
    permanently (CLAUDE.md round-4 bisect), so a server should keep 2+
    batch windows in flight and finalize behind the pipeline head."""
    B = data.points.shape[0]
    t0s, q0s = _stack_initial(initial_poses, B, dtype)
    data = data.astype(dtype)
    return _maha6_solve_batched(t0s, q0s, data, loss, options, backend)


def solve_reprojection_batch_async(
    options: Options,
    data: reprojection.ReprojectionData,
    intrinsics: CameraIntrinsics,
    initial_poses: Sequence[Pose],
    loss: Optional[LossFunction] = None,
    dtype=jnp.float32,
):
    """:func:`solve_reprojection_batch` WITHOUT the host sync — see
    :func:`solve_mahalanobis_batch_async` for the streaming rationale.
    Measured (630-pt instances, two windows in flight, stream-only
    state, 2026-08-20): 0.147 ms/solve at B=256 and 0.089 at B=512 vs
    0.264 blocking at B=256; the ~40 ms window wall is a fixed
    per-dispatch streaming cost, so larger windows keep amortizing."""
    B = data.local_points.shape[0]
    t0s, q0s = _stack_initial(initial_poses, B, dtype)
    data = data.astype(dtype)
    intr = CameraIntrinsics(
        *(jnp.asarray(v, dtype) for v in intrinsics[:6]),
        intrinsics.width,
        intrinsics.height,
    )
    return _reproj_solve_batched(t0s, q0s, data, intr, loss, options)


def solve_point_to_plane_batch_async(
    options: Options,
    data: point_to_plane.PointToPlaneData,
    initial_poses: Sequence[Pose],
    loss: Optional[LossFunction] = None,
    dtype=jnp.float32,
):
    """:func:`solve_point_to_plane_batch` WITHOUT the host sync — see
    :func:`solve_mahalanobis_batch_async`."""
    B = data.points.shape[0]
    t0s, q0s = _stack_initial(initial_poses, B, dtype)
    data = data.astype(dtype)
    return _p2p_solve_batched(t0s, q0s, data, loss, options)


def finalize_solve_batch(device_out) -> Tuple[List[Pose], np.ndarray, np.ndarray]:
    """Fetch + unpack any ``solve_*_batch_async`` result — ONE blocking
    device_get for the whole batch. Returns (poses, iterations (B,),
    final_costs (B,))."""
    ts, qs, iters, costs = jax.device_get(device_out)
    return _poses_from_device(ts, qs), np.asarray(iters), np.asarray(costs)


def solve_mahalanobis_batch(
    options: Options,
    data: mahalanobis.MahalanobisData,  # leading batch dim: (B, N, ...)
    initial_poses: Sequence[Pose],
    loss: Optional[LossFunction] = None,
    dtype=jnp.float32,
    backend: str = "jnp",
) -> Tuple[List[Pose], np.ndarray, np.ndarray]:
    """Solve B independent 6-DoF NDT alignment problems in ONE program.

    Ragged correspondence counts: pad each instance to a common N and zero
    its mask tail. ``backend="pallas"`` uses the vmap-compatible fused
    kernel (f32; prefer it for large N). Returns (poses, iterations (B,),
    final_costs (B,)).
    """
    return finalize_solve_batch(
        solve_mahalanobis_batch_async(
            options, data, initial_poses, loss, dtype, backend
        )
    )


def solve_reprojection_batch(
    options: Options,
    data: reprojection.ReprojectionData,  # leading batch dim: (B, N, ...)
    intrinsics: CameraIntrinsics,
    initial_poses: Sequence[Pose],
    loss: Optional[LossFunction] = None,
    dtype=jnp.float32,
) -> Tuple[List[Pose], np.ndarray, np.ndarray]:
    """Solve B independent reprojection (PnP) problems in ONE program.

    Shared intrinsics; per-problem masks support ragged correspondence
    counts via padding. Returns (poses, iterations (B,), final_costs (B,)).
    """
    return finalize_solve_batch(
        solve_reprojection_batch_async(
            options, data, intrinsics, initial_poses, loss, dtype
        )
    )


def solve_point_to_plane_batch(
    options: Options,
    data: point_to_plane.PointToPlaneData,  # leading batch dim: (B, N, ...)
    initial_poses: Sequence[Pose],
    loss: Optional[LossFunction] = None,
    dtype=jnp.float32,
) -> Tuple[List[Pose], np.ndarray, np.ndarray]:
    """Solve B independent point-to-plane ICP problems in ONE program."""
    return finalize_solve_batch(
        solve_point_to_plane_batch_async(
            options, data, initial_poses, loss, dtype
        )
    )
