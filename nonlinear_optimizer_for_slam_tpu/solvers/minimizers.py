"""User-facing minimizer classes.

These mirror the reference's module entry points —
``MahalanobisDistanceMinimizer*::Solve`` (6-DoF and 3-DoF planar),
``ReprojectionErrorMinimizer*::Solve`` — but instead of one class per
execution backend (scalar / SIMD / threaded: the reference's class zoo,
SURVEY section 2.3), a single class takes ``backend=`` ("jnp" | "pallas")
and an optional ``mesh=`` for multi-chip sharded evaluation. Every backend
optimizes the identical objective; parity across backends is the test
criterion, exactly like the reference's variant-parity methodology.

The full LM loop is jitted into ONE XLA program per (options, data-bucket)
combination; correspondence counts are padded to bucket multiples with
masked tails to bound recompilation across outer-ICP iterations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.losses import LossFunction
from ..core.options import Options
from ..core.pose import Pose, Pose2
from ..ops import mahalanobis, point_to_plane, reprojection
from ..ops.reprojection import CameraIntrinsics
from . import lm
from .manifolds import SE2Params, SE3Params, se2_retract, se3_retract

Array = jax.Array


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def _pose_from_params(params: "SE3Params") -> Pose:
    """Device SE3Params -> host Pose with ONE batched device_get and
    pure-numpy quaternion math. Two separate np.asarray fetches cost 2x
    the runtime's completion-poll quantum (~30 ms each in degraded mode);
    one batched get pays it once. Eager jnp lie calls here would cost
    ~50 ms/solve in tiny dispatches — see core/pose.py note."""
    from ..core.pose import np_quat_to_rotmat

    t, q = jax.device_get((params.translation, params.quaternion))
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q)
    return Pose(np_quat_to_rotmat(q), np.asarray(t, np.float64))


class SE3Priors(NamedTuple):
    """Pose prior folded into the damped-GN system as extra quadratic
    terms: weight * ||t - t_prior||^2 and weight * ||log(q_prior^-1 q)||^2.

    Completes the reference's declared-but-never-wired prior fields
    (mahalanobis_distance_minimizer.h:38-39
    ``translation_prior_constraint_`` / ``rotation_prior_constraint_``) —
    and actually applies them. Weights of 0 disable a term."""

    translation: Array  # (3,)
    quaternion: Array  # (4,) wxyz
    translation_weight: Array  # scalar
    rotation_weight: Array  # scalar


class _MinimizerBase:
    """Shared plumbing: loss, backend, dtype, padding, jit cache."""

    def __init__(
        self,
        backend: str = "jnp",
        dtype=jnp.float32,
        pad_multiple: int = 1024,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        if backend not in ("jnp", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.dtype = dtype
        self.pad_multiple = pad_multiple
        self.mesh = mesh
        self.loss_function: Optional[LossFunction] = None
        self.priors: Optional[SE3Priors] = None

    def set_loss_function(self, loss: Optional[LossFunction]):
        """Reference: MahalanobisDistanceMinimizer::SetLossFunction
        (mahalanobis_distance_minimizer.cc:15-18)."""
        self.loss_function = loss
        return self

    def set_prior_constraints(
        self,
        translation=None,
        rotation=None,
        translation_weight: float = 1.0,
        rotation_weight: float = 1.0,
    ):
        """Attach translation and/or rotation priors (see
        :class:`SE3Priors`). ``rotation`` is a Pose, a (3, 3) rotation
        matrix, or a (4,) wxyz quaternion. Pass both as None to clear."""
        if translation is None and rotation is None:
            self.priors = None
            return self
        from ..core.pose import np_rotmat_to_quat

        t = np.zeros(3) if translation is None else np.asarray(translation, float)
        wt = 0.0 if translation is None else float(translation_weight)
        if rotation is None:
            q, wr = np.array([1.0, 0.0, 0.0, 0.0]), 0.0
        else:
            if isinstance(rotation, Pose):
                q = rotation.quaternion()
            else:
                rotation = np.asarray(rotation, float)
                q = (
                    np_rotmat_to_quat(rotation)
                    if rotation.shape == (3, 3)
                    else rotation / np.linalg.norm(rotation)
                )
            wr = float(rotation_weight)
        self.priors = SE3Priors(
            jnp.asarray(t, self.dtype),
            jnp.asarray(q, self.dtype),
            jnp.asarray(wt, self.dtype),
            jnp.asarray(wr, self.dtype),
        )
        return self

    def _pad(self, n: int) -> int:
        m = self.pad_multiple
        if self.mesh is not None:
            m *= self.mesh.devices.size
        return _round_up(max(n, 1), m)


class MahalanobisDistanceMinimizer(_MinimizerBase):
    """6-DoF NDT scan-to-map alignment
    (reference: mahalanobis_distance_minimizer_analytic{,_simd}.cc)."""

    def solve(
        self,
        options: Options,
        data: mahalanobis.MahalanobisData,
        pose: Pose,
    ) -> Tuple[Pose, lm.Summary]:
        t0 = jnp.asarray(pose.translation, self.dtype)
        q0 = jnp.asarray(pose.quaternion(), self.dtype)
        # bucket BEFORE the main solve so its jit key is the bucket shape,
        # not the raw factor count (see _prepare)
        data = _prepare(data, self._pad(data.num_factors), _dtype_name(self.dtype))
        params, summary = _maha6_solve(
            t0,
            q0,
            data,
            self.loss_function,
            self.priors,
            options,
            self.backend,
            self.mesh,
            self._pad(data.num_factors),
            _dtype_name(self.dtype),
        )
        out = _pose_from_params(params)
        return out, summary

    def information(
        self, data: mahalanobis.MahalanobisData, pose: Pose
    ) -> np.ndarray:
        """Gauss-Newton information J^T W J (6, 6) of the objective at
        ``pose``, in the right-retraction tangent [dt, dtheta].

        This is the registration-result uncertainty a pose-graph backend
        wants: ``sqrt_info = cholesky(information)`` whitens a
        relative-pose edge produced by this solve (the edge residual's
        rotation part 2*vec(q_err) matches dtheta to first order). The
        reference has no uncertainty output anywhere; see
        pipelines/loop_closure.py for the consumer."""
        return _information_impl(self, data, pose, "maha6")


class MahalanobisDistanceMinimizer3DOF(_MinimizerBase):
    """3-DoF planar (x, y, yaw) NDT alignment
    (reference: mahalanobis_distance_minimizer_analytic_3dof{,_simd}.cc).

    Like the reference, takes/returns a full SE(3) pose: the planar pose is
    extracted from the top-left block and embedded back at the end
    (.._analytic_3dof.cc:22-25,104-105)."""

    def solve(
        self,
        options: Options,
        data: mahalanobis.MahalanobisData,
        pose: Pose,
    ) -> Tuple[Pose, lm.Summary]:
        t0 = jnp.asarray(pose.translation[:2], self.dtype)
        theta0 = jnp.asarray(
            np.arctan2(pose.rotation[1, 0], pose.rotation[0, 0]), self.dtype
        )
        planar_priors = None
        if self.priors is not None:
            # project the SE(3) prior onto the planar manifold: (x, y) and
            # the yaw of the prior quaternion (the 3-DoF solver's pose
            # embedding, .._analytic_3dof.cc:22-25)
            pq = np.asarray(self.priors.quaternion, np.float64)
            planar_priors = (
                self.priors.translation[:2],
                jnp.asarray(2.0 * np.arctan2(pq[3], pq[0]), self.dtype),
                self.priors.translation_weight,
                self.priors.rotation_weight,
            )
        data = _prepare(data, self._pad(data.num_factors), _dtype_name(self.dtype))
        params, summary = _maha3_solve(
            t0,
            theta0,
            data,
            self.loss_function,
            planar_priors,
            options,
            self.backend,
            self.mesh,
            self._pad(data.num_factors),
            _dtype_name(self.dtype),
        )
        out = pose.copy()
        out.translation = out.translation.copy()
        out.rotation = out.rotation.copy()
        t2, theta = jax.device_get((params.translation, params.theta))
        out.translation[:2] = np.asarray(t2, np.float64)
        theta = float(theta)
        c, s = np.cos(theta), np.sin(theta)
        out.rotation[:2, :2] = np.array([[c, -s], [s, c]])
        return out, summary


class ReprojectionErrorMinimizer(_MinimizerBase):
    """6-DoF pose from 3D-2D correspondences
    (reference: reprojection_error_minimizer_analytic{,_simd}.cc)."""

    def solve(
        self,
        options: Options,
        data: reprojection.ReprojectionData,
        intrinsics: CameraIntrinsics,
        pose: Pose,
    ) -> Tuple[Pose, lm.Summary]:
        intr = CameraIntrinsics(
            *(jnp.asarray(v, self.dtype) for v in intrinsics[:6]),
            intrinsics.width,
            intrinsics.height,
        )
        t0 = jnp.asarray(pose.translation, self.dtype)
        q0 = jnp.asarray(pose.quaternion(), self.dtype)
        data = _prepare(data, self._pad(data.num_factors), _dtype_name(self.dtype))
        params, summary = _reproj_solve(
            t0,
            q0,
            data,
            intr,
            self.loss_function,
            self.priors,
            options,
            self.backend,
            self.mesh,
            self._pad(data.num_factors),
            _dtype_name(self.dtype),
        )
        out = _pose_from_params(params)
        return out, summary

    def information(
        self,
        data: reprojection.ReprojectionData,
        intrinsics: CameraIntrinsics,
        pose: Pose,
    ) -> np.ndarray:
        """Gauss-Newton information of the reprojection objective at
        ``pose`` (PnP uncertainty) — see
        MahalanobisDistanceMinimizer.information."""
        intr = CameraIntrinsics(
            *(jnp.asarray(v, self.dtype) for v in intrinsics[:6]),
            intrinsics.width,
            intrinsics.height,
        )
        return _information_impl(self, data, pose, "reproj", intr)


class PointToPlaneMinimizer(_MinimizerBase):
    """6-DoF point-to-plane ICP (the reference's TBD module, implemented;
    factor math from pose_optimizer/cost_functors.h:106-157)."""

    def solve(
        self,
        options: Options,
        data: point_to_plane.PointToPlaneData,
        pose: Pose,
    ) -> Tuple[Pose, lm.Summary]:
        t0 = jnp.asarray(pose.translation, self.dtype)
        q0 = jnp.asarray(pose.quaternion(), self.dtype)
        data = _prepare(data, self._pad(data.num_factors), _dtype_name(self.dtype))
        params, summary = _p2p_solve(
            t0,
            q0,
            data,
            self.loss_function,
            self.priors,
            options,
            self.backend,
            self.mesh,
            self._pad(data.num_factors),
            _dtype_name(self.dtype),
        )
        out = _pose_from_params(params)
        return out, summary

    def information(
        self, data: point_to_plane.PointToPlaneData, pose: Pose
    ) -> np.ndarray:
        """Gauss-Newton information of the point-to-plane objective at
        ``pose`` — see MahalanobisDistanceMinimizer.information."""
        return _information_impl(self, data, pose, "p2p")


# ----------------------------------------------------------------------------
# Jitted solve cores. Static args: options, backend, mesh, pad target n,
# dtype name (loss is a pytree whose scalar leaves are traced). The dtype
# cast and the mask-padded resize happen INSIDE the jitted program so the
# host never pays eager-dispatch latency for them.
# ----------------------------------------------------------------------------


def _dtype_name(dtype) -> str:
    return jnp.dtype(dtype).name


@functools.partial(jax.jit, static_argnums=(1, 2))
def _prepare(data, pad_n: int, dtype_name: str):
    """Cast + pad to the bucket size as its OWN tiny jitted program.

    This runs SEPARATELY from (and before) the main LM solve program, so
    the expensive solve compiles once per BUCKET — if padding happened
    inside the solve, the raw factor count would be part of its jit cache
    key and every distinct correspondence count would trigger a fresh
    26-500 s compile (serving workloads see a different N per scan).
    The pad program itself is shape-keyed too, but it is a trivial
    concat/cast that compiles in well under a second."""
    dtype = jnp.dtype(dtype_name)
    return data.astype(dtype).pad_to(pad_n)


def _maybe_shard(solve_fn, mesh, data, *prefix_args):
    """Run ``solve_fn(data, *prefix_args)`` either directly or as a
    shard_map over the factor axis of ``data`` with replicated params.
    Inside the shard the per-device partial (H, g, cost) is psummed, so
    the LM control flow stays replicated and bitwise-identical across
    devices (the TPU analog of the reference's future-sum reduction,
    mahalanobis_distance_minimizer_analytic.cc:114-119)."""
    from ..parallel.sharded import shard_solve

    if mesh is None:
        return solve_fn(data, *prefix_args, psum_axis=None)
    return shard_solve(solve_fn, mesh, data, *prefix_args)


def _add_se3_priors(H, g, c, params: SE3Params, priors: Optional[SE3Priors]):
    """Fold pose priors into (H, g, cost) as Gauss-Newton quadratic terms.

    Translation: residual t - t_prior, Jacobian [I 0].
    Rotation: residual log(q_prior^-1 q) in the right-retraction tangent
    (J ~= I near the prior — the standard small-residual GN block). Applied
    AFTER the factor psum so the prior counts exactly once under sharding."""
    if priors is None:
        return H, g, c
    wt, wr = priors.translation_weight, priors.rotation_weight
    rt = params.translation - priors.translation
    q = lie.quat_normalize(params.quaternion)
    rw = lie.quat_log_vec(
        lie.quat_multiply(lie.quat_conjugate(priors.quaternion), q)
    )
    eye3 = jnp.eye(3, dtype=H.dtype)
    H = H.at[:3, :3].add(wt * eye3).at[3:, 3:].add(wr * eye3)
    g = g.at[:3].add(wt * rt).at[3:].add(wr * rw)
    c = c + wt * jnp.dot(rt, rt) + wr * jnp.dot(rw, rw)
    return H, g, c


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _maha6_solve(
    t0, q0, data, loss, priors, options, backend, mesh, pad_n, dtype_name
):
    data = _prepare(data, pad_n, dtype_name)  # cache-hit: already bucketed

    def solve_fn(data_shard, *, psum_axis):
        if backend == "pallas":
            from ..ops import pallas_kernels

            # pack ONCE per solve (outside the LM while_loop)
            packed = pallas_kernels.pack_maha6(data_shard)
            eval_fn = lambda R, t: pallas_kernels.maha6_eval_quadratic_packed(
                R, t, packed, loss
            )
        else:
            eval_fn = lambda R, t: mahalanobis.eval_quadratic(
                R, t, data_shard, loss
            )

        def quad(params: SE3Params):
            R = lie.quat_to_rotmat(params.quaternion)
            H, g, c = eval_fn(R, params.translation)
            if psum_axis is not None:
                H, g, c = jax.lax.psum((H, g, c), psum_axis)
            return _add_se3_priors(H, g, c, params, priors)

        return lm.solve(quad, se3_retract, SE3Params(t0, q0), options)

    return _maybe_shard(solve_fn, mesh, data)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _maha3_solve(
    t0, theta0, data, loss, priors, options, backend, mesh, pad_n, dtype_name
):
    data = _prepare(data, pad_n, dtype_name)

    def solve_fn(data_shard, *, psum_axis):
        if backend == "pallas":
            from ..ops import pallas_kernels

            # compact 10-row Gram packing: 37.5% less DMA per iteration
            # than the shared 16-row maha6 layout (which the fused
            # registration pipeline still uses because it shares one
            # packed buffer between the 6-DoF and planar modes)
            packed = pallas_kernels.pack_maha3_compact(data_shard)
            eval_fn = lambda R2, t2: pallas_kernels.maha3_eval_quadratic_compact(
                R2, t2, packed, loss
            )
        else:
            eval_fn = lambda R2, t2: mahalanobis.eval_quadratic_3dof(
                R2, t2, data_shard, loss
            )

        def quad(params: SE2Params):
            R2 = lie.rot2(params.theta)
            H, g, c = eval_fn(R2, params.translation)
            if psum_axis is not None:
                H, g, c = jax.lax.psum((H, g, c), psum_axis)
            if priors is not None:
                t2p, thp, wt, wr = priors
                rt = params.translation - t2p
                # wrap the yaw residual to (-pi, pi]
                rth = params.theta - thp
                rth = jnp.arctan2(jnp.sin(rth), jnp.cos(rth))
                eye2 = jnp.eye(2, dtype=H.dtype)
                H = H.at[:2, :2].add(wt * eye2).at[2, 2].add(wr)
                g = g.at[:2].add(wt * rt).at[2].add(wr * rth)
                c = c + wt * jnp.dot(rt, rt) + wr * rth * rth
            return H, g, c

        return lm.solve(quad, se2_retract, SE2Params(t0, theta0), options)

    return _maybe_shard(solve_fn, mesh, data)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _reproj_solve(
    t0, q0, data, intrinsics, loss, priors, options, backend, mesh, pad_n,
    dtype_name,
):
    data = _prepare(data, pad_n, dtype_name)

    def solve_fn(data_shard, intr, *, psum_axis):
        if backend == "pallas":
            from ..ops import pallas_kernels

            packed = pallas_kernels.pack_reproj(data_shard)
            eval_fn = lambda R, t: pallas_kernels.reproj_eval_quadratic_packed(
                R, t, packed, intr, loss
            )
        else:
            eval_fn = lambda R, t: reprojection.eval_quadratic(
                R, t, data_shard, intr, loss
            )

        def quad(params: SE3Params):
            R = lie.quat_to_rotmat(params.quaternion)
            H, g, c = eval_fn(R, params.translation)
            if psum_axis is not None:
                H, g, c = jax.lax.psum((H, g, c), psum_axis)
            return _add_se3_priors(H, g, c, params, priors)

        return lm.solve(quad, se3_retract, SE3Params(t0, q0), options)

    return _maybe_shard(solve_fn, mesh, data, intrinsics)


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _p2p_solve(
    t0, q0, data, loss, priors, options, backend, mesh, pad_n, dtype_name
):
    data = _prepare(data, pad_n, dtype_name)

    def solve_fn(data_shard, *, psum_axis):
        if backend == "pallas":
            from ..ops import pallas_kernels

            packed = pallas_kernels.pack_p2p(data_shard)
            eval_fn = lambda R, t: pallas_kernels.p2p_eval_quadratic_packed(
                R, t, packed, loss
            )
        else:
            eval_fn = lambda R, t: point_to_plane.eval_quadratic(
                R, t, data_shard, loss
            )

        def quad(params: SE3Params):
            R = lie.quat_to_rotmat(params.quaternion)
            H, g, c = eval_fn(R, params.translation)
            if psum_axis is not None:
                H, g, c = jax.lax.psum((H, g, c), psum_axis)
            return _add_se3_priors(H, g, c, params, priors)

        return lm.solve(quad, se3_retract, SE3Params(t0, q0), options)

    return _maybe_shard(solve_fn, mesh, data)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _se3_information(t0, q0, data, loss, intrinsics, factor_kind, pad_n, dtype_name):
    data = _prepare(data, pad_n, dtype_name)
    R = lie.quat_to_rotmat(lie.quat_normalize(q0))
    if factor_kind == "maha6":
        H, _, _ = mahalanobis.eval_quadratic(R, t0, data, loss)
    elif factor_kind == "p2p":
        H, _, _ = point_to_plane.eval_quadratic(R, t0, data, loss)
    elif factor_kind == "reproj":
        H, _, _ = reprojection.eval_quadratic(R, t0, data, intrinsics, loss)
    else:
        raise ValueError(factor_kind)
    return H


def _information_impl(minimizer, data, pose: Pose, factor_kind: str, intrinsics=None):
    t0 = jnp.asarray(pose.translation, minimizer.dtype)
    q0 = jnp.asarray(pose.quaternion(), minimizer.dtype)
    H = _se3_information(
        t0,
        q0,
        data,
        minimizer.loss_function,
        intrinsics,
        factor_kind,
        minimizer._pad(data.num_factors),
        _dtype_name(minimizer.dtype),
    )
    return np.asarray(jax.device_get(H), np.float64)


# Batched multi-problem solving (serving mode) lives in solvers/batched.py;
# re-exported here for API continuity.
from .batched import (  # noqa: E402  (re-export)
    solve_mahalanobis_batch,
    solve_point_to_plane_batch,
    solve_reprojection_batch,
)
