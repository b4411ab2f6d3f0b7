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

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    # optional sqrt-information S with S^T S = Omega, whitening the 6-D
    # residual r -> S r. Either (E, 6) DIAGONAL rows (rows 0-2 whiten the
    # translation residual 1/sigma_t, rows 3-5 the rotation residual
    # 1/sigma_theta; the residual 2 vec(q_err) IS the rotation angle to
    # first order) or (E, 6, 6) FULL matrices (dataset information
    # matrices, e.g. g2o EDGE_SE3:QUAT — see io/g2o.py for the
    # convention conversion). None = unit information (the reference's
    # behavior — its Ceres functors never weight, ceres_cost_functor.h).
    # The switch penalty row is NOT whitened (a prior on s, not a
    # measurement).
    sqrt_info: Optional[Array] = None

    @property
    def num_edges(self) -> int:
        return self.reference_indices.shape[0]


def apply_sqrt_info(w, r, *jacobians):
    """Whiten a residual batch and its Jacobian blocks.

    ``w`` is a batched sqrt-information: (E, d) diagonal rows or
    (E, d, d) full matrices; ``r`` is (E, d); each Jacobian is
    (E, d, n). Works for numpy and jnp inputs alike (pure ufuncs /
    einsum). Returns (r', jac0', jac1', ...)."""
    if w.ndim == 2:
        out = [r * w]
        out += [J * w[:, :, None] for J in jacobians]
    else:
        einsum = jnp.einsum if isinstance(r, jax.Array) else np.einsum
        out = [einsum("eij,ej->ei", w, r)]
        out += [einsum("eij,ejn->ein", w, J) for J in jacobians]
    return out[0] if not jacobians else tuple(out)


def stack_sqrt_info(entries, dim: int):
    """Stack per-edge sqrt-info specs (each None | (dim,) diagonal |
    (dim, dim) matrix) into the batched form consumed by the edge
    structs: None if all None, (E, dim) if all diagonal, else
    (E, dim, dim) with diagonal entries promoted to matrices."""
    if all(e is None for e in entries):
        return None
    if all(e is None or np.asarray(e).ndim == 1 for e in entries):
        return np.stack(
            [np.ones(dim) if e is None else np.asarray(e, np.float64) for e in entries]
        )
    out = np.zeros((len(entries), dim, dim))
    for k, e in enumerate(entries):
        if e is None:
            out[k] = np.eye(dim)
        else:
            a = np.asarray(e, np.float64)
            out[k] = np.diag(a) if a.ndim == 1 else a
    return out


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
    if edges.sqrt_info is not None:
        r6 = apply_sqrt_info(edges.sqrt_info, r6)
    s = switches[..., None]
    loop = edges.is_loop[..., None]
    scaled = jnp.where(loop > 0, r6 * s, r6)
    penalty = jnp.where(
        edges.is_loop > 0, (1.0 - switches) * penalty_scale, jnp.zeros_like(switches)
    )
    r = jnp.concatenate([scaled, penalty[..., None]], axis=-1)
    return r * edges.mask[..., None]


def _quat_left_matrix(a: Array) -> Array:
    """L(a) with a (x) b = L(a) @ b, batched over leading dims; wxyz."""
    w, x, y, z = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    rows = [
        jnp.stack([w, -x, -y, -z], axis=-1),
        jnp.stack([x, w, -z, y], axis=-1),
        jnp.stack([y, z, w, -x], axis=-1),
        jnp.stack([z, -y, x, w], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _quat_right_matrix(b: Array) -> Array:
    """R(b) with a (x) b = R(b) @ a, batched over leading dims; wxyz."""
    w, x, y, z = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    rows = [
        jnp.stack([w, -x, -y, -z], axis=-1),
        jnp.stack([x, w, z, -y], axis=-1),
        jnp.stack([y, -z, w, x], axis=-1),
        jnp.stack([z, y, -x, w], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _normalize_jacobian(q: Array) -> Array:
    """d(q/|q|)/dq = (I - n n^T) / |q|, batched: (..., 4, 4)."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    n = q / norm
    eye = jnp.eye(4, dtype=q.dtype)
    return (eye - n[..., :, None] * n[..., None, :]) / norm[..., None]


def _skew_batch(v: Array) -> Array:
    """[v]_x batched: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _rotate_jacobian_wrt_quat(n: Array, v: Array) -> Array:
    """d(R(n) v)/dn for UNIT quaternion n (..., 4) and vector v (..., 3):
    returns (..., 3, 4). From R(n)v = v + 2w (u x v) + 2 u x (u x v):
    d/dw = 2 (u x v); d/du = -2w [v]_x - 2[u x v]_x - 2[u]_x [v]_x."""
    w = n[..., 0]
    u = n[..., 1:]
    uxv = jnp.cross(u, v)
    d_dw = 2.0 * uxv  # (..., 3)
    d_du = (
        -2.0 * w[..., None, None] * _skew_batch(v)
        - 2.0 * _skew_batch(uxv)
        - 2.0 * _skew_batch(u) @ _skew_batch(v)
    )  # (..., 3, 3)
    return jnp.concatenate([d_dw[..., :, None], d_du], axis=-1)


def edge_residuals_and_jacobians(
    positions: Array,
    quaternions: Array,
    switches: Array,
    edges: PoseGraphEdges,
    penalty_scale: float = SWITCH_PENALTY_SCALE,
) -> Tuple[Array, Array, Array, Array]:
    """Per-edge residuals and CLOSED-FORM Jacobian blocks.

    The residual is bilinear in the quaternions (products are linear maps
    L(a)/R(b); the only nonlinearities are the normalization, whose
    Jacobian is (I - n n^T)/|q|, and R(q) t_rel, whose quaternion
    derivative has the classic 3x4 closed form) — so the blocks are a page
    of algebra instead of per-edge jacfwd. Verified against the autodiff
    oracle (:func:`edge_residuals_and_jacobians_ad`) in
    tests/test_pose_graph.py.

    Returns:
      r       (E, 7)
      J_ref   (E, 7, 7)  w.r.t. (p_ref, q_ref)
      J_query (E, 7, 7)  w.r.t. (p_query, q_query)
      J_s     (E, 7)     w.r.t. the switch variable
    """
    dtype = positions.dtype
    E = edges.num_edges
    p_ref = positions[edges.reference_indices]
    q_ref = quaternions[edges.reference_indices]
    p_query = positions[edges.query_indices]
    q_query = quaternions[edges.query_indices]
    t_rel = edges.relative_translations
    q_rel = edges.relative_quaternions

    n_ref = lie.quat_normalize(q_ref)
    n_query = lie.quat_normalize(q_query)
    Dn_ref = _normalize_jacobian(q_ref)  # (E, 4, 4)
    Dn_query = _normalize_jacobian(q_query)

    # residual pieces
    r_t = (p_query - p_ref) - lie.quat_rotate(n_ref, t_rel)  # (E, 3)
    B = lie.quat_multiply(n_ref, q_rel)  # (E, 4)
    err_q = lie.quat_multiply(lie.quat_conjugate(n_query), B)
    r_q = 2.0 * err_q[..., 1:]  # (E, 3)
    r6 = jnp.concatenate([r_t, r_q], axis=-1)

    # d r_t / d n_ref, then chain through normalization
    dRt_dn = _rotate_jacobian_wrt_quat(n_ref, t_rel)  # (E, 3, 4)
    drt_dqref = -(dRt_dn @ Dn_ref)  # (E, 3, 4)

    # d r_q / d n_ref = 2 V L(conj(n_query)) R(q_rel); V selects vec rows
    Lcq = _quat_left_matrix(lie.quat_conjugate(n_query))  # (E, 4, 4)
    Rrel = _quat_right_matrix(q_rel)
    drq_dqref = 2.0 * (Lcq @ Rrel)[..., 1:, :] @ Dn_ref  # (E, 3, 4)

    # d r_q / d n_query = 2 V R(B) C with C = conjugation sign flip
    RB = _quat_right_matrix(B)  # (E, 4, 4)
    conj_sign = jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype)
    drq_dqquery = 2.0 * (RB[..., 1:, :] * conj_sign) @ Dn_query  # (E, 3, 4)

    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (E, 3, 3))
    zero33 = jnp.zeros((E, 3, 3), dtype)
    zero34 = jnp.zeros((E, 3, 4), dtype)
    J6_ref = jnp.concatenate(
        [
            jnp.concatenate([-eye3, drt_dqref], axis=-1),
            jnp.concatenate([zero33, drq_dqref], axis=-1),
        ],
        axis=-2,
    )  # (E, 6, 7)
    J6_query = jnp.concatenate(
        [
            jnp.concatenate([eye3, zero34], axis=-1),
            jnp.concatenate([zero33, drq_dqquery], axis=-1),
        ],
        axis=-2,
    )  # (E, 6, 7)

    if edges.sqrt_info is not None:
        # whitening of the 6 measurement rows: (E, 6) diagonal or
        # (E, 6, 6) full matrices (see PoseGraphEdges)
        r6, J6_ref, J6_query = apply_sqrt_info(
            edges.sqrt_info, r6, J6_ref, J6_query
        )

    # switchable scaling: loop rows 0-5 are s * r6 (d/dpose = s * J6,
    # d/ds = r6); the penalty row (1 - s) * scale has d/ds = -scale
    loop = edges.is_loop > 0
    s = jnp.where(loop, switches, jnp.ones((E,), dtype))
    m = edges.mask
    r_pose = r6 * s[:, None]
    penalty = jnp.where(loop, (1.0 - switches) * penalty_scale, 0.0)
    r = jnp.concatenate([r_pose, penalty[:, None]], axis=-1) * m[:, None]

    sm = (s * m)[:, None, None]
    zero17 = jnp.zeros((E, 1, 7), dtype)
    J_ref = jnp.concatenate([J6_ref * sm, zero17], axis=-2)
    J_query = jnp.concatenate([J6_query * sm, zero17], axis=-2)
    J_s = (
        jnp.concatenate(
            [
                jnp.where(loop[:, None], r6, 0.0),
                jnp.where(loop, -penalty_scale, 0.0)[:, None],
            ],
            axis=-1,
        )
        * m[:, None]
    )  # (E, 7)
    return r, J_ref, J_query, J_s


def edge_residuals_and_jacobians_ad(
    positions: Array,
    quaternions: Array,
    switches: Array,
    edges: PoseGraphEdges,
    penalty_scale: float = SWITCH_PENALTY_SCALE,
) -> Tuple[Array, Array, Array, Array]:
    """Autodiff oracle for :func:`edge_residuals_and_jacobians` (per-edge
    jacfwd; kept for tests — the closed form is what production uses).

    Returns:
      r       (E, 7)
      J_ref   (E, 7, 7)  w.r.t. (p_ref, q_ref)
      J_query (E, 7, 7)  w.r.t. (p_query, q_query)
      J_s     (E, 7)     w.r.t. the switch variable
    """

    def one_edge(p_r, q_r, p_q, q_q, t_rel, q_rel, s, loop, m, w6):
        def res(p_r_, q_r_, p_q_, q_q_, s_):
            r6 = relative_pose_residual(p_r_, q_r_, p_q_, q_q_, t_rel, q_rel)
            r6 = r6 * w6 if w6.ndim == 1 else w6 @ r6
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

    w6 = (
        edges.sqrt_info
        if edges.sqrt_info is not None
        else jnp.ones_like(edges.relative_translations[:, :1]).repeat(6, axis=1)
    )
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
        w6,
    )


# ----------------------------------------------------------------------------
# Pure-numpy twin for HOST-side linearization (the fixed-lag smoother's
# marginalization runs once per update over a handful of edges — eager jnp
# dispatches through this runtime's relay cost ~30 ms EACH, so host paths
# use numpy twins, same policy as core/pose.py).
# ----------------------------------------------------------------------------


def np_edge_residuals_and_jacobians(
    positions,  # (P, 3) float64
    quaternions,  # (P, 4)
    switches,  # (E,)
    ref_idx,  # (E,) int
    qry_idx,  # (E,) int
    rel_t,  # (E, 3)
    rel_q,  # (E, 4)
    is_loop,  # (E,) float
    penalty_scale: float = SWITCH_PENALTY_SCALE,
    sqrt_info=None,  # optional (E, 6) diag or (E, 6, 6) whitening (see PoseGraphEdges)
):
    """Numpy twin of :func:`edge_residuals_and_jacobians` (same math, same
    conventions, unmasked). Verified against the jnp closed form in
    tests/test_fixed_lag.py."""
    import numpy as np

    E = len(ref_idx)
    q_ref = quaternions[ref_idx]
    q_qry = quaternions[qry_idx]
    p_ref = positions[ref_idx]
    p_qry = positions[qry_idx]

    def normalize(q):
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    def conj(q):
        return q * np.array([1.0, -1.0, -1.0, -1.0])

    def left(a):
        w, x, y, z = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        return np.stack(
            [
                np.stack([w, -x, -y, -z], -1),
                np.stack([x, w, -z, y], -1),
                np.stack([y, z, w, -x], -1),
                np.stack([z, -y, x, w], -1),
            ],
            -2,
        )

    def right(b):
        w, x, y, z = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        return np.stack(
            [
                np.stack([w, -x, -y, -z], -1),
                np.stack([x, w, z, -y], -1),
                np.stack([y, -z, w, x], -1),
                np.stack([z, y, -x, w], -1),
            ],
            -2,
        )

    def qmul(a, b):
        return np.einsum("...ij,...j->...i", left(a), b)

    def qrot(n, v):
        w = n[..., :1]
        u = n[..., 1:]
        uxv = np.cross(u, v)
        return v + 2.0 * w * uxv + 2.0 * np.cross(u, uxv)

    def skew(v):
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        o = np.zeros_like(x)
        return np.stack(
            [
                np.stack([o, -z, y], -1),
                np.stack([z, o, -x], -1),
                np.stack([-y, x, o], -1),
            ],
            -2,
        )

    def dnorm(q):
        norm = np.linalg.norm(q, axis=-1, keepdims=True)
        n = q / norm
        return (np.eye(4) - n[..., :, None] * n[..., None, :]) / norm[..., None]

    def drot_dn(n, v):
        w = n[..., 0]
        u = n[..., 1:]
        uxv = np.cross(u, v)
        d_dw = 2.0 * uxv
        d_du = (
            -2.0 * w[..., None, None] * skew(v)
            - 2.0 * skew(uxv)
            - 2.0 * skew(u) @ skew(v)
        )
        return np.concatenate([d_dw[..., :, None], d_du], axis=-1)

    n_ref = normalize(q_ref)
    n_qry = normalize(q_qry)
    Dn_ref = dnorm(q_ref)
    Dn_qry = dnorm(q_qry)

    r_t = (p_qry - p_ref) - qrot(n_ref, rel_t)
    B = qmul(n_ref, rel_q)
    err_q = qmul(conj(n_qry), B)
    r_q = 2.0 * err_q[..., 1:]
    r6 = np.concatenate([r_t, r_q], axis=-1)

    drt_dqref = -(drot_dn(n_ref, rel_t) @ Dn_ref)
    drq_dqref = 2.0 * (left(conj(n_qry)) @ right(rel_q))[..., 1:, :] @ Dn_ref
    conj_sign = np.array([1.0, -1.0, -1.0, -1.0])
    drq_dqqry = 2.0 * (right(B)[..., 1:, :] * conj_sign) @ Dn_qry

    eye3 = np.broadcast_to(np.eye(3), (E, 3, 3))
    z33 = np.zeros((E, 3, 3))
    z34 = np.zeros((E, 3, 4))
    J6_ref = np.concatenate(
        [
            np.concatenate([-eye3, drt_dqref], axis=-1),
            np.concatenate([z33, drq_dqref], axis=-1),
        ],
        axis=-2,
    )
    J6_qry = np.concatenate(
        [
            np.concatenate([eye3, z34], axis=-1),
            np.concatenate([z33, drq_dqqry], axis=-1),
        ],
        axis=-2,
    )

    if sqrt_info is not None:
        r6, J6_ref, J6_qry = apply_sqrt_info(sqrt_info, r6, J6_ref, J6_qry)

    loop = is_loop > 0
    s = np.where(loop, switches, 1.0)
    r_pose = r6 * s[:, None]
    penalty = np.where(loop, (1.0 - switches) * penalty_scale, 0.0)
    r = np.concatenate([r_pose, penalty[:, None]], axis=-1)

    z17 = np.zeros((E, 1, 7))
    J_ref = np.concatenate([J6_ref * s[:, None, None], z17], axis=-2)
    J_qry = np.concatenate([J6_qry * s[:, None, None], z17], axis=-2)
    J_s = np.concatenate(
        [
            np.where(loop[:, None], r6, 0.0),
            np.where(loop, -penalty_scale, 0.0)[:, None],
        ],
        axis=-1,
    )
    return r, J_ref, J_qry, J_s


def np_quat_left_matrix(a):
    """Numpy twin of :func:`_quat_left_matrix`: L(a) b = a (x) b (wxyz)."""
    w, x, y, z = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    return np.stack(
        [
            np.stack([w, -x, -y, -z], -1),
            np.stack([x, w, -z, y], -1),
            np.stack([y, z, w, -x], -1),
            np.stack([z, -y, x, w], -1),
        ],
        -2,
    )


def np_quat_conjugate(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def np_quat_multiply(a, b):
    return np.einsum("...ij,...j->...i", np_quat_left_matrix(a), b)
