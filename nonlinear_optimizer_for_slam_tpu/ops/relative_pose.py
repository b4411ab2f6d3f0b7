"""SE(3) relative-pose (pose-graph edge) factor — jnp/XLA backend.

Residual per constraint (reference:
pose_graph_optimizer/ceres_cost_functor.h:44-52), with poses parameterized
in ambient coordinates (position p (3,), unit quaternion q (4,) wxyz) like
the reference's Ceres formulation (which sets NO quaternion manifold —
quaternions drift off the unit sphere during the solve and are renormalized
on write-back, pose_graph_optimizer.h:89-101):

    r_t = (p_q - p_r) - R(q_r) t_rel                (3,)
    r_q = 2 * vec(q_q^* (x) q_r (x) q_rel)          (3,)

Switchable-constraint variant for loop closures (ceres_cost_functor.h:83-97):
the 6-D residual is scaled by the switch variable s and a penalty row
(1 - s) * 1e-9 is appended (residual dim 7).

These functions are written to be `vmap`-batched over edges and
autodiff-differentiated (jacfwd) — the Jacobian blocks feed the batched
block-sparse Gauss-Newton assembly in solvers/pose_graph.py, implementing
what the reference's analytic pose-graph path left as a TODO stub
(pose_graph_optimizer_analytic.cc:12-51).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core import lie

Array = jax.Array

SWITCH_PENALTY_SCALE = 1e-9  # reference: ceres_cost_functor.h:97


class PoseGraphEdges(NamedTuple):
    """SoA batch of constraints (reference: pose_graph_optimizer/types.h:11-19)."""

    reference_indices: Array  # (E,) int32
    query_indices: Array  # (E,) int32
    relative_translations: Array  # (E, 3) t_rel
    relative_quaternions: Array  # (E, 4) q_rel (w, x, y, z)
    is_loop: Array  # (E,) 1.0 for loop (switchable) constraints
    mask: Array  # (E,)

    @property
    def num_edges(self) -> int:
        return self.reference_indices.shape[0]


def relative_pose_residual(
    p_ref: Array,
    q_ref: Array,
    p_query: Array,
    q_query: Array,
    t_rel: Array,
    q_rel: Array,
) -> Array:
    """6-D residual of one edge, quaternions normalized before use.

    DELIBERATE deviation from the reference functor (which feeds raw
    ambient quaternions to Eigen ops, ceres_cost_functor.h:44-52): without
    normalization the quaternion SCALE couples into the translation
    residual through the non-orthogonal R(q), and a damped-GN solver that
    exploits it reaches zero cost at poses that stop satisfying the
    constraints once the quaternions are renormalized on write-back. The
    reference only works because Ceres' trust region happens to keep
    ``|q|`` near 1. Normalizing here makes quaternion scale an EXACT gauge
    direction (handled by the solver's Tikhonov floor) and makes the
    renormalize-on-writeback step residual-preserving."""
    q_ref = lie.quat_normalize(q_ref)
    q_query = lie.quat_normalize(q_query)
    r_t = (p_query - p_ref) - lie.quat_rotate(q_ref, t_rel)
    err_q = lie.quat_multiply(lie.quat_multiply(lie.quat_conjugate(q_query), q_ref), q_rel)
    r_q = 2.0 * err_q[..., 1:]
    return jnp.concatenate([r_t, r_q], axis=-1)


def switchable_residual(
    p_ref: Array,
    q_ref: Array,
    p_query: Array,
    q_query: Array,
    t_rel: Array,
    q_rel: Array,
    switch: Array,
    penalty_scale: float = SWITCH_PENALTY_SCALE,
) -> Array:
    """7-D switchable-constraint residual (reference: ceres_cost_functor.h:83-97).

    ``penalty_scale`` defaults to the reference's 1e-9 — which is too weak
    to keep INLIER loop switches at 1 (the reference's own comment admits
    this: "Scaling is necessary to avoid the switch parameter to be too
    small"); pass ~1.0 for a discriminating Suenderhauf-style prior."""
    r6 = relative_pose_residual(p_ref, q_ref, p_query, q_query, t_rel, q_rel) * switch
    penalty = (1.0 - switch) * penalty_scale
    return jnp.concatenate([r6, penalty[None]], axis=-1)


def edge_residuals(
    positions: Array,  # (N, 3)
    quaternions: Array,  # (N, 4)
    switches: Array,  # (E,)
    edges: PoseGraphEdges,
    penalty_scale: float = SWITCH_PENALTY_SCALE,
) -> Array:
    """Batched per-edge residuals (E, 7).

    Odometry edges use the plain 6-D residual with a zero seventh row;
    loop edges use the switchable form. The is_loop flag selects between
    them elementwise, keeping shapes static.
    """
    p_ref = positions[edges.reference_indices]
    q_ref = quaternions[edges.reference_indices]
    p_query = positions[edges.query_indices]
    q_query = quaternions[edges.query_indices]

    r6 = relative_pose_residual(
        p_ref, q_ref, p_query, q_query,
        edges.relative_translations, edges.relative_quaternions,
    )  # (E, 6)
    s = switches[..., None]
    loop = edges.is_loop[..., None]
    scaled = jnp.where(loop > 0, r6 * s, r6)
    penalty = jnp.where(
        edges.is_loop > 0, (1.0 - switches) * penalty_scale, jnp.zeros_like(switches)
    )
    r = jnp.concatenate([scaled, penalty[..., None]], axis=-1)
    return r * edges.mask[..., None]


def edge_residuals_and_jacobians(
    positions: Array,
    quaternions: Array,
    switches: Array,
    edges: PoseGraphEdges,
    penalty_scale: float = SWITCH_PENALTY_SCALE,
) -> Tuple[Array, Array, Array, Array]:
    """Per-edge residuals and Jacobian blocks via forward-mode autodiff.

    Returns:
      r       (E, 7)
      J_ref   (E, 7, 7)  w.r.t. (p_ref, q_ref)
      J_query (E, 7, 7)  w.r.t. (p_query, q_query)
      J_s     (E, 7)     w.r.t. the switch variable
    """

    def one_edge(p_r, q_r, p_q, q_q, t_rel, q_rel, s, loop, m):
        def res(p_r_, q_r_, p_q_, q_q_, s_):
            r6 = relative_pose_residual(p_r_, q_r_, p_q_, q_q_, t_rel, q_rel)
            scaled = jnp.where(loop > 0, r6 * s_, r6)
            penalty = jnp.where(loop > 0, (1.0 - s_) * penalty_scale, 0.0)
            return jnp.concatenate([scaled, penalty[None]]) * m

        r = res(p_r, q_r, p_q, q_q, s)
        jp_r, jq_r, jp_q, jq_q, js = jax.jacfwd(res, argnums=(0, 1, 2, 3, 4))(
            p_r, q_r, p_q, q_q, s
        )
        j_ref = jnp.concatenate([jp_r, jq_r], axis=-1)  # (7, 7)
        j_query = jnp.concatenate([jp_q, jq_q], axis=-1)
        return r, j_ref, j_query, js

    p_ref = positions[edges.reference_indices]
    q_ref = quaternions[edges.reference_indices]
    p_query = positions[edges.query_indices]
    q_query = quaternions[edges.query_indices]

    return jax.vmap(one_edge)(
        p_ref,
        q_ref,
        p_query,
        q_query,
        edges.relative_translations,
        edges.relative_quaternions,
        switches,
        edges.is_loop,
        edges.mask,
    )
