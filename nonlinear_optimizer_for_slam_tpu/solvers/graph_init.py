"""Pose-graph initialization: spanning-tree composition and chordal
(rotation-averaging) relaxation.

LM on a pose graph only converges to the global basin it starts in; the
classic initializers (g2o's spanning tree, GTSAM's
``InitializePose3``/chordal, Martinec & Pajdla CVPR'07, Carlone et al.
ICRA'15) are the difference between solving sphere-scale graphs and
stalling in a fold. The reference has no initializer (its fixture starts
from hand-noised ground truth); this module provides both, TPU-shaped:

- ``spanning_tree_init``: BFS from the anchor composing measured relative
  poses along tree edges. Host-side graph walk (irregular), vectorized
  composition per BFS level.
- ``chordal_init``: two matrix-free linear least squares solved by CG
  with Jacobi (degree) preconditioning — entirely ``segment_sum`` /
  gather shaped, so the same program runs on CPU for tests and on a TPU
  mesh for 50k-pose graphs:
    1. rotations: min sum_e ||X_q - X_i R_e||_F^2 over UNCONSTRAINED
       3x3 matrices (the chordal relaxation), anchored at the fixed
       poses, then projected to SO(3) by SVD;
    2. translations: min sum_e ||t_q - t_i - R_i t_e||^2 with the
       projected rotations fixed (a graph-Laplacian solve, 3 RHS).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pose import (
    np_quat_to_rotmat,
    np_quat_to_rotmat_batch,
    np_rotmat_to_quat,
    np_rotmat_to_quat_batch,
)

Array = jax.Array


def spanning_tree_init(
    ref_idx: np.ndarray,  # (E,) int
    query_idx: np.ndarray,  # (E,) int
    rel_q: np.ndarray,  # (E, 4) wxyz, T_ref<-query rotation
    rel_t: np.ndarray,  # (E, 3)
    num_poses: int,
    anchors: Dict[int, Tuple[np.ndarray, np.ndarray]],  # i -> (R (3,3), t)
    edge_priority: Optional[np.ndarray] = None,  # lower = preferred
) -> Tuple[np.ndarray, np.ndarray]:
    """Compose measured relative poses along a BFS spanning tree from the
    anchor(s). Returns ``(positions (P, 3), quaternions (P, 4))``.

    ``edge_priority`` orders each node's adjacency (e.g. odometry edges
    first so the tree follows the trajectory chain and loops only bridge
    components). Unreachable poses keep identity."""
    E = len(ref_idx)
    order = np.argsort(edge_priority, kind="stable") if edge_priority is not None else np.arange(E)
    adj: Dict[int, list] = {}
    for e in order:
        i, j = int(ref_idx[e]), int(query_idx[e])
        adj.setdefault(i, []).append((j, e, +1))
        adj.setdefault(j, []).append((i, e, -1))

    R = np.tile(np.eye(3), (num_poses, 1, 1))
    t = np.zeros((num_poses, 3))
    seen = np.zeros(num_poses, bool)
    frontier = []
    for a, (Ra, ta) in anchors.items():
        R[a], t[a] = Ra, ta
        seen[a] = True
        frontier.append(a)

    Re = np.stack([np_quat_to_rotmat(q) for q in rel_q]) if E else np.zeros((0, 3, 3))
    while frontier:
        nxt = []
        for i in frontier:
            for j, e, sgn in adj.get(i, ()):  # T_ref<-query
                if seen[j]:
                    continue
                if sgn > 0:  # i = ref, j = query: X_j = X_i * T_e
                    R[j] = R[i] @ Re[e]
                    t[j] = t[i] + R[i] @ rel_t[e]
                else:  # i = query, j = ref: X_j = X_i * T_e^-1
                    R[j] = R[i] @ Re[e].T
                    t[j] = t[i] - R[j] @ rel_t[e]
                seen[j] = True
                nxt.append(j)
        frontier = nxt
    quats = np.stack([np_rotmat_to_quat(r) for r in R])
    return t, quats


def _project_so3(X: Array) -> Array:
    """Closest rotations (Frobenius) to a batch of 3x3 matrices."""
    U, _, Vt = jnp.linalg.svd(X)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )
    return (U * D[:, None, :]) @ Vt


def _cg_graph_solve(op, b, diag, iters: int, tol: float):
    """Jacobi-preconditioned CG; ``diag`` broadcasts against b."""
    inv_diag = 1.0 / jnp.maximum(diag, 1.0)
    x, _ = jax.scipy.sparse.linalg.cg(
        op, b, M=lambda v: v * inv_diag, tol=tol, maxiter=iters
    )
    return x


def chordal_init(
    ref_idx: np.ndarray,
    query_idx: np.ndarray,
    rel_q: np.ndarray,
    rel_t: np.ndarray,
    num_poses: int,
    anchors: Dict[int, Tuple[np.ndarray, np.ndarray]],
    cg_iterations: int = 300,
    cg_tol: float = 1e-8,
    dtype=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Chordal initialization. Returns ``(positions (P, 3), quaternions
    (P, 4))``; anchored poses are returned exactly as given.

    ``dtype``: compute precision for the two CG solves. This is an
    INITIALIZER — f32 residual-floor error (decimeters at sphere scale)
    is far inside LM's convergence basin, and f32 CG runs several times
    faster than the TPU's emulated f64 (measured: the f64 init cost more
    than the banded LM solve it was feeding). Defaults to the incoming
    array dtype."""
    P, E = num_poses, len(ref_idx)
    ri = jnp.asarray(ref_idx, jnp.int32)
    qi = jnp.asarray(query_idx, jnp.int32)
    Re = jnp.asarray(
        np_quat_to_rotmat_batch(rel_q) if E else np.zeros((0, 3, 3)),
        dtype,
    )
    te = jnp.asarray(rel_t, dtype)

    free = np.ones(P)
    Xa = np.zeros((P, 3, 3))
    ta_np = np.zeros((P, 3))
    for a, (Ra, ta) in anchors.items():
        free[a] = 0.0
        Xa[a] = Ra
        ta_np[a] = ta
    m = jnp.asarray(free, dtype)[:, None, None]
    Xa = jnp.asarray(Xa, dtype)
    ta = jnp.asarray(ta_np, dtype)

    # degree of each pose = diagonal of both normal operators
    deg = np.zeros(P)
    np.add.at(deg, ref_idx, 1.0)
    np.add.at(deg, query_idx, 1.0)
    deg = jnp.asarray(deg, dtype)

    # ONE jitted program for both CG stages (round 5: run eagerly this
    # was ~700 ms of per-primitive dispatch/fetch on a 10k-pose graph;
    # fused it is one dispatch + one fetch)
    R, t = _chordal_core_3d(
        ri, qi, Re, te, m, Xa, ta, deg, cg_tol,
        num_poses=P, cg_iterations=cg_iterations,
    )
    t_np = np.asarray(jax.device_get(t), np.float64)
    R_np = np.asarray(jax.device_get(R), np.float64)
    quats = np_rotmat_to_quat_batch(R_np)
    return t_np, quats


@functools.partial(
    jax.jit, static_argnames=("num_poses", "cg_iterations")
)
def _chordal_core_3d(
    ri, qi, Re, te, m, Xa, ta, deg, cg_tol, *, num_poses, cg_iterations
):
    P = num_poses

    def rot_normal_op(V):
        V = V * m
        d = V[qi] - jnp.einsum("emk,ekn->emn", V[ri], Re)
        out = jax.ops.segment_sum(d, qi, num_segments=P)
        out = out - jax.ops.segment_sum(
            jnp.einsum("emk,enk->emn", d, Re), ri, num_segments=P
        )
        return out * m

    # RHS: -A^T r(Xa) restricted to free slots
    d0 = Xa[qi] - jnp.einsum("emk,ekn->emn", Xa[ri], Re)
    b = -(
        jax.ops.segment_sum(d0, qi, num_segments=P)
        - jax.ops.segment_sum(
            jnp.einsum("emk,enk->emn", d0, Re), ri, num_segments=P
        )
    ) * m

    Xf = _cg_graph_solve(
        rot_normal_op, b, deg[:, None, None], cg_iterations, cg_tol
    )
    R = _project_so3(Xf * m + Xa)
    # anchors exactly (projection of an exact rotation is itself, but keep
    # them bit-identical to the caller's values)
    R = R * m + Xa

    # translations with rotations fixed
    mt = m[:, :, 0]
    c = jnp.einsum("emk,ek->em", R[ri], te)  # R_i t_e

    def tr_normal_op(v):
        v = v * mt
        d = v[qi] - v[ri]
        out = jax.ops.segment_sum(d, qi, num_segments=P)
        out = out - jax.ops.segment_sum(d, ri, num_segments=P)
        return out * mt

    d0t = ta[qi] - ta[ri] - c
    bt = -(
        jax.ops.segment_sum(d0t, qi, num_segments=P)
        - jax.ops.segment_sum(d0t, ri, num_segments=P)
    ) * mt
    tf = _cg_graph_solve(tr_normal_op, bt, deg[:, None], cg_iterations, cg_tol)
    t = tf * mt + ta
    return R, t


# ---------------------------------------------------------------------------
# SE(2)
# ---------------------------------------------------------------------------


def _rot2(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


def spanning_tree_init_2d(
    ref_idx: np.ndarray,
    query_idx: np.ndarray,
    rel_xyt: np.ndarray,  # (E, 3) (dx, dy, dtheta), T_ref<-query
    num_poses: int,
    anchors: Dict[int, np.ndarray],  # i -> (x, y, theta)
    edge_priority: Optional[np.ndarray] = None,
) -> np.ndarray:
    """BFS spanning-tree composition for SE(2); returns xyt (P, 3)."""
    E = len(ref_idx)
    order = np.argsort(edge_priority, kind="stable") if edge_priority is not None else np.arange(E)
    adj: Dict[int, list] = {}
    for e in order:
        i, j = int(ref_idx[e]), int(query_idx[e])
        adj.setdefault(i, []).append((j, e, +1))
        adj.setdefault(j, []).append((i, e, -1))

    xyt = np.zeros((num_poses, 3))
    seen = np.zeros(num_poses, bool)
    frontier = []
    for a, v in anchors.items():
        xyt[a] = v
        seen[a] = True
        frontier.append(a)
    while frontier:
        nxt = []
        for i in frontier:
            for j, e, sgn in adj.get(i, ()):
                if seen[j]:
                    continue
                dx, dy, dth = rel_xyt[e]
                if sgn > 0:
                    xyt[j, :2] = xyt[i, :2] + _rot2(xyt[i, 2]) @ (dx, dy)
                    xyt[j, 2] = xyt[i, 2] + dth
                else:
                    xyt[j, 2] = xyt[i, 2] - dth
                    xyt[j, :2] = xyt[i, :2] - _rot2(xyt[j, 2]) @ (dx, dy)
                seen[j] = True
                nxt.append(j)
        frontier = nxt
    xyt[:, 2] = np.arctan2(np.sin(xyt[:, 2]), np.cos(xyt[:, 2]))
    return xyt


def chordal_init_2d(
    ref_idx: np.ndarray,
    query_idx: np.ndarray,
    rel_xyt: np.ndarray,
    num_poses: int,
    anchors: Dict[int, np.ndarray],
    cg_iterations: int = 300,
    cg_tol: float = 1e-8,
) -> np.ndarray:
    """SE(2) chordal initialization; returns xyt (P, 3).

    Rotations as unit vectors v_i = (cos th, sin th): the relaxation
    min sum_e ||v_q - R(dth_e) v_i||^2 is linear (complex rotation
    averaging in real form), then normalized back to the circle; the
    translation Laplacian follows with rotations fixed."""
    P, E = num_poses, len(ref_idx)
    ri = jnp.asarray(ref_idx, jnp.int32)
    qi = jnp.asarray(query_idx, jnp.int32)
    if E:
        th = rel_xyt[:, 2]
        c_, s_ = np.cos(th), np.sin(th)
        Re_np = np.empty((E, 2, 2))
        Re_np[:, 0, 0] = c_
        Re_np[:, 0, 1] = -s_
        Re_np[:, 1, 0] = s_
        Re_np[:, 1, 1] = c_
    else:
        Re_np = np.zeros((0, 2, 2))
    Re = jnp.asarray(Re_np)
    te = jnp.asarray(rel_xyt[:, :2] if E else np.zeros((0, 2)))

    free = np.ones(P)
    va_np = np.zeros((P, 2))
    ta_np = np.zeros((P, 2))
    for a, v in anchors.items():
        free[a] = 0.0
        va_np[a] = (np.cos(v[2]), np.sin(v[2]))
        ta_np[a] = v[:2]
    m = jnp.asarray(free)[:, None]
    va = jnp.asarray(va_np)
    ta = jnp.asarray(ta_np)

    deg = np.zeros(P)
    np.add.at(deg, ref_idx, 1.0)
    np.add.at(deg, query_idx, 1.0)
    deg = jnp.asarray(deg)[:, None]

    # one jitted program (see _chordal_core_3d)
    v_out, t_out = _chordal_core_2d(
        ri, qi, Re, te, m, va, ta, deg, cg_tol,
        num_poses=P, cg_iterations=cg_iterations,
    )
    v_np = np.asarray(jax.device_get(v_out), np.float64)
    t_np = np.asarray(jax.device_get(t_out), np.float64)
    theta = np.arctan2(v_np[:, 1], v_np[:, 0])
    return np.concatenate([t_np, theta[:, None]], axis=1)


@functools.partial(
    jax.jit, static_argnames=("num_poses", "cg_iterations")
)
def _chordal_core_2d(
    ri, qi, Re, te, m, va, ta, deg, cg_tol, *, num_poses, cg_iterations
):
    P = num_poses

    def rot_op(v):
        v = v * m
        d = v[qi] - jnp.einsum("emk,ek->em", Re, v[ri])
        out = jax.ops.segment_sum(d, qi, num_segments=P)
        out = out - jax.ops.segment_sum(
            jnp.einsum("ekm,ek->em", Re, d), ri, num_segments=P
        )
        return out * m

    d0 = va[qi] - jnp.einsum("emk,ek->em", Re, va[ri])
    b = -(
        jax.ops.segment_sum(d0, qi, num_segments=P)
        - jax.ops.segment_sum(
            jnp.einsum("ekm,ek->em", Re, d0), ri, num_segments=P
        )
    ) * m
    vf = _cg_graph_solve(rot_op, b, deg, cg_iterations, cg_tol)
    v = vf * m + va
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    v = v * m + va

    # translations: t_q - t_i - R_i t_e with R_i from the unit vectors
    Ri = jnp.stack(
        [
            jnp.stack([v[:, 0], -v[:, 1]], axis=1),
            jnp.stack([v[:, 1], v[:, 0]], axis=1),
        ],
        axis=1,
    )  # (P, 2, 2)
    c = jnp.einsum("emk,ek->em", Ri[ri], te)

    def tr_op(w):
        w = w * m
        d = w[qi] - w[ri]
        out = jax.ops.segment_sum(d, qi, num_segments=P)
        out = out - jax.ops.segment_sum(d, ri, num_segments=P)
        return out * m

    d0t = ta[qi] - ta[ri] - c
    bt = -(
        jax.ops.segment_sum(d0t, qi, num_segments=P)
        - jax.ops.segment_sum(d0t, ri, num_segments=P)
    ) * m
    tf = _cg_graph_solve(tr_op, bt, deg, cg_iterations, cg_tol)
    t = tf * m + ta
    return v, t
