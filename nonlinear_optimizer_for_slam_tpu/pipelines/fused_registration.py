"""Device-resident NDT registration: the ENTIRE outer ICP loop (matching +
inner LM solves + outer convergence) as ONE XLA program.

The reference re-matches on the host with FLANN between inner solves
(mahalanobis tests/simple_optimization_test.cc:543-575). On TPU the map is
tiny and matching is a dense top-k, so there is no reason to surface to the
host at all: the outer loop becomes a `lax.while_loop` whose body does
{dense match -> build packed SoA -> inner LM while_loop (pallas fused
eval) -> pose-delta convergence}, and one registration costs ONE dispatch.

This matters doubly on this TPU runtime: after any long-running program
the runtime's completion wait quantizes to ~30 ms per blocking dispatch
(measured), so the host-driven loop pays ~10 round trips x 30 ms while this
fused program pays one.

Semantics match the host-driven `registration.register_ndt` exactly:
outer tolerance 1e-5 on translation delta norm AND quaternion vector norm
(reference :565-568), <= 10 outer iterations, correspondences = up to k
nearest valid voxels within the search radius.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.losses import LossFunction
from ..core.options import Options
from ..core.pose import Pose, np_quat_to_rotmat
from ..ops import pallas_kernels as pk
from ..solvers import lm
from ..solvers.manifolds import SE2Params, SE3Params, se2_retract, se3_retract
from .ndt import NdtMap
from .registration import OUTER_MAX_ITERATIONS, OUTER_TOLERANCE


@dataclasses.dataclass
class FusedRegistrationResult:
    pose: Pose
    outer_iterations: int
    final_cost: float
    inner_iterations: np.ndarray  # (max_outer,) per-outer inner LM counts
    costs: np.ndarray  # (max_outer,) final cost per outer iteration


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _fused_register_impl(
    means_T,  # (3, M) valid voxel means, transposed
    infos_T,  # (9, M) sqrt-informations row-major, transposed
    points,  # (N, 3) local scan points (per-shard when sharded)
    points_T,  # (3, N) same, transposed
    points_mask,  # (N,)
    t0,  # (3,)
    q0,  # (4,)
    loss,  # LossFunction pytree
    search_radius,
    outer_tol,
    num_neighbors: int,
    max_outer: int,
    options: Options,
    planar: bool = False,
    psum_axis=None,
):
    n = points.shape[0]
    k = num_neighbors
    lanes = _round_up(n * k, pk.LANE_BLOCK)
    dtype = points.dtype

    means_sq = jnp.sum(means_T * means_T, axis=0)  # (M,)
    # point rows of the packed buffer never change: repeat each point k
    # times along the lane axis, pad to the block multiple
    p_rows = jnp.repeat(points_T, k, axis=1)  # (3, N*k)
    p_rows = jnp.pad(p_rows, ((0, 0), (0, lanes - n * k)))

    def match(t, q):
        """Dense top-k matching -> packed (16, lanes) kernel buffer."""
        R = lie.quat_to_rotmat(q)
        warped = points @ R.T + t  # (N, 3)
        d2 = (
            jnp.sum(warped * warped, axis=1, keepdims=True)
            - 2.0 * warped @ means_T
            + means_sq[None, :]
        )  # (N, M)
        neg_d2, idx = jax.lax.top_k(-d2, k)  # (N, k)
        within = (-neg_d2) <= search_radius * search_radius
        mask = within.astype(dtype) * points_mask[:, None]  # (N, k)

        flat_idx = idx.reshape(n * k)
        mu_rows = jnp.take(means_T, flat_idx, axis=1)  # (3, N*k)
        s_rows = jnp.take(infos_T, flat_idx, axis=1)  # (9, N*k)
        mask_row = mask.reshape(1, n * k)
        packed = jnp.concatenate(
            [
                p_rows[:, : n * k],
                mu_rows,
                s_rows,
                mask_row,
            ],
            axis=0,
        ).astype(jnp.float32)
        return jnp.pad(packed, ((0, 0), (0, lanes - n * k)))

    def inner_solve(t, q, packed):
        """Full 6-DoF LM, or the planar (x, y, yaw) reduction when
        ``planar`` (reference: mahalanobis 3dof variants). The planar path
        extracts (t_xy, theta) from the SE(3) state and embeds the result
        back, keeping z/roll/pitch frozen
        (.._analytic_3dof.cc:22-25,104-105)."""
        def maybe_psum(hgc):
            if psum_axis is not None:
                return jax.lax.psum(hgc, psum_axis)
            return hgc

        if not planar:
            def quad(params: SE3Params):
                R = lie.quat_to_rotmat(params.quaternion)
                return maybe_psum(
                    pk.maha6_eval_quadratic_packed(R, params.translation, packed, loss)
                )

            return lm.solve(quad, se3_retract, SE3Params(t, q), options)

        theta0 = 2.0 * jnp.arctan2(q[3], q[0])  # yaw of a z-axis rotation

        def quad2(params: SE2Params):
            R2 = lie.rot2(params.theta)
            return maybe_psum(
                pk.maha3_eval_quadratic_packed(R2, params.translation, packed, loss)
            )

        params2, summary = lm.solve(
            quad2, se2_retract, SE2Params(t[:2], theta0), options
        )
        t_new = jnp.concatenate([params2.translation, t[2:]])
        half = 0.5 * params2.theta
        q_new = jnp.stack(
            [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)]
        )
        return SE3Params(t_new, q_new), summary

    def outer_body(carry):
        t, q, it, done, inner_its, costs, final_cost = carry
        packed = match(t, q)
        params, summary = inner_solve(t, q, packed)
        t_new, q_new = params.translation, params.quaternion

        # pose delta: diff = new^{-1} * old (reference :563-568)
        dq = lie.quat_multiply(lie.quat_conjugate(q_new), q)
        R_new_T = lie.quat_to_rotmat(q_new).T
        dt = R_new_T @ (t - t_new)
        converged = (jnp.linalg.norm(dt) < outer_tol) & (
            jnp.linalg.norm(dq[1:]) < outer_tol
        )

        inner_its = inner_its.at[it].set(summary.iterations)
        costs = costs.at[it].set(summary.final_cost)
        return (
            t_new,
            q_new,
            it + 1,
            converged,
            inner_its,
            costs,
            summary.final_cost,
        )

    def outer_cond(carry):
        _, _, it, done, *_ = carry
        return (it < max_outer) & (~done)

    init = (
        t0,
        q0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.zeros((max_outer,), jnp.int32),
        jnp.full((max_outer,), jnp.nan, dtype),
        jnp.asarray(jnp.nan, dtype),
    )
    t, q, it, done, inner_its, costs, final_cost = jax.lax.while_loop(
        outer_cond, outer_body, init
    )
    return t, q, it, inner_its, costs, final_cost


@functools.partial(
    jax.jit,
    static_argnames=("num_neighbors", "max_outer", "options", "planar"),
)
def _fused_register(
    means_T, infos_T, points, points_T, points_mask, t0, q0, loss,
    search_radius, outer_tol, num_neighbors, max_outer, options, planar=False,
):
    return _fused_register_impl(
        means_T, infos_T, points, points_T, points_mask, t0, q0, loss,
        search_radius, outer_tol, num_neighbors, max_outer, options, planar,
        psum_axis=None,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_neighbors", "max_outer", "options", "planar", "mesh"),
)
def _fused_register_sharded(
    means_T, infos_T, points, points_T, points_mask, t0, q0, loss,
    search_radius, outer_tol, num_neighbors, max_outer, options, planar, mesh,
):
    """Multi-chip fused registration: scan points shard over the mesh's
    factor axis (each device matches and evaluates its own block against
    the replicated map), the (H, g, cost) partials psum over ICI inside
    the inner LM loop, and the outer ICP control flow stays replicated —
    one XLA program across the whole slice (SURVEY section 2.8)."""
    from ..parallel.mesh import FACTOR_AXIS

    P = jax.sharding.PartitionSpec
    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def local_fn(
        means_T_, infos_T_, points_s, points_T_s, pmask_s, t0_, q0_, loss_,
        radius_, tol_,
    ):
        return _fused_register_impl(
            means_T_, infos_T_, points_s, points_T_s, pmask_s, t0_, q0_, loss_,
            radius_, tol_, num_neighbors, max_outer, options, planar,
            psum_axis=FACTOR_AXIS,
        )

    loss_specs = jax.tree_util.tree_map(lambda _: P(), loss)
    kwargs = dict(
        mesh=mesh,
        in_specs=(
            P(),                 # means_T replicated (map is tiny)
            P(),                 # infos_T replicated
            P(FACTOR_AXIS),      # points (N, 3) -> rows sharded
            P(None, FACTOR_AXIS),  # points_T (3, N) -> lanes sharded
            P(FACTOR_AXIS),      # mask
            P(), P(), loss_specs, P(), P(),
        ),
        out_specs=P(),
    )
    try:
        fn = shard_map(local_fn, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older check_rep spelling
        fn = shard_map(local_fn, check_rep=False, **kwargs)
    return fn(
        means_T, infos_T, points, points_T, points_mask, t0, q0, loss,
        search_radius, outer_tol,
    )


class NdtRegistrar:
    """Scan-to-map registrar with device-resident map state.

    The NDT map is uploaded once at construction (the analog of the
    reference's kd-tree build — which the reference actually redoes every
    outer iteration, MatchPointCloud :313-315); each `register` call
    transfers only the scan + pose and runs the single fused program.
    """

    def __init__(
        self,
        ndt_map: NdtMap,
        options: Options,
        loss: Optional[LossFunction] = None,
        search_radius: float = 1.0,
        num_neighbors: int = 2,
        max_outer_iterations: int = OUTER_MAX_ITERATIONS,
        outer_tolerance: float = OUTER_TOLERANCE,
        dtype=jnp.float32,
        planar: bool = False,
        mesh=None,
    ):
        valid = ndt_map.valid_only()
        self.dtype = dtype
        self.planar = planar
        self.mesh = mesh
        self.means_T = jnp.asarray(valid.means.T, dtype)
        self.infos_T = jnp.asarray(valid.sqrt_informations.reshape(-1, 9).T, dtype)
        self.options = options
        self.loss = loss
        self.search_radius = jnp.asarray(search_radius, dtype)
        self.outer_tolerance = jnp.asarray(outer_tolerance, dtype)
        self.num_neighbors = num_neighbors
        self.max_outer_iterations = max_outer_iterations

    def register_async(self, local_points, initial_pose: Pose):
        """Launch the fused program WITHOUT a host sync; returns device
        values. Use for pipelining many scans (throughput mode); pass the
        result to :meth:`finalize`. Latency mode = :meth:`register`."""
        return self._launch(local_points, initial_pose)

    @staticmethod
    def finalize(device_out) -> FusedRegistrationResult:
        t, q, it, inner_its, costs, final_cost = jax.device_get(device_out)
        qn = np.asarray(q, np.float64)
        qn /= np.linalg.norm(qn)
        return FusedRegistrationResult(
            pose=Pose(np_quat_to_rotmat(qn), np.asarray(t, np.float64)),
            outer_iterations=int(it),
            final_cost=float(final_cost),
            inner_iterations=np.asarray(inner_its),
            costs=np.asarray(costs),
        )

    def register(
        self, local_points, initial_pose: Pose
    ) -> FusedRegistrationResult:
        return self.finalize(self._launch(local_points, initial_pose))

    def _launch(self, local_points, initial_pose: Pose):
        dtype = self.dtype
        pts_np = np.ascontiguousarray(np.asarray(local_points))
        mask_np = np.ones(pts_np.shape[0])
        if self.mesh is not None:
            # equal shard sizes: pad the point set to a device-count
            # multiple with masked zeros
            d = self.mesh.devices.size
            n_pad = _round_up(pts_np.shape[0], d)
            extra = n_pad - pts_np.shape[0]
            if extra:
                pts_np = np.concatenate([pts_np, np.zeros((extra, 3))])
                mask_np = np.concatenate([mask_np, np.zeros(extra)])
        points = jnp.asarray(pts_np, dtype)
        points_T = jnp.asarray(pts_np.T, dtype)
        pmask = jnp.asarray(mask_np, dtype)

        args = (
            self.means_T,
            self.infos_T,
            points,
            points_T,
            pmask,
            jnp.asarray(initial_pose.translation, dtype),
            jnp.asarray(initial_pose.quaternion(), dtype),
            self.loss,
            self.search_radius,
            self.outer_tolerance,
            self.num_neighbors,
            self.max_outer_iterations,
            self.options,
            self.planar,
        )
        if self.mesh is None:
            t, q, it, inner_its, costs, final_cost = _fused_register(*args)
        else:
            t, q, it, inner_its, costs, final_cost = _fused_register_sharded(
                *args, self.mesh
            )
        return (t, q, it, inner_its, costs, final_cost)


def register_ndt_fused(
    ndt_map: NdtMap,
    local_points: np.ndarray,
    initial_pose: Pose,
    options: Options,
    loss: Optional[LossFunction] = None,
    search_radius: float = 1.0,
    num_neighbors: int = 2,
    max_outer_iterations: int = OUTER_MAX_ITERATIONS,
    outer_tolerance: float = OUTER_TOLERANCE,
    dtype=jnp.float32,
) -> FusedRegistrationResult:
    """Single-dispatch scan-to-map registration (flagship fast path)."""
    registrar = NdtRegistrar(
        ndt_map,
        options,
        loss,
        search_radius,
        num_neighbors,
        max_outer_iterations,
        outer_tolerance,
        dtype,
    )
    return registrar.register(local_points, initial_pose)
