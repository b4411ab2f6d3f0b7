"""Fixed-lag smoother: ONLINE sliding-window SE(3) pose-graph optimization
with Gaussian marginalization.

New capability — the reference is batch-only (its pose-graph module
re-solves the whole history, pose_graph_optimizer.h:21-108). A fixed-lag
smoother keeps compute and memory bounded for online SLAM: only the most
recent ``lag`` poses stay active; older poses are marginalized into a
dense Gaussian prior over the poses they were connected to, so their
information is kept (unlike plain windowing) while the per-update solve
stays a constant-size problem.

Division of labor (the same host/device split as the rest of the
framework):

- the WINDOW optimization is the dense pose-graph solve
  (`solvers.pose_graph._pose_graph_solve`) — one XLA program per update,
  with the marginal prior folded in as an extra quadratic factor
  (`prior_sqrt/prior_mean/prior_sel`);
- MARGINALIZATION runs on host in f64 numpy (a handful of edges once per
  update; eager jnp dispatches cost ~30 ms each through this runtime's
  relay, so host paths use the pure-numpy linearization twin
  `ops.relative_pose.np_edge_residuals_and_jacobians`).

Marginalization is the standard Schur complement on the Gauss-Newton
information of every factor touching a leaving pose, linearized at the
current (post-optimization) estimate:

    Lambda_b = H_bb - H_bm (H_mm + eps I)^{-1} H_mb
    g_b'     = g_b  - H_bm (H_mm + eps I)^{-1} g_m

assembled on the 6-DoF TANGENT chart at the current estimate (per pose
dphi = [dp ; dtheta] with x(dphi) = [p + dp ; n(q) (x) (1, dtheta/2)])
and stored in AFFINE RESIDUAL form

    r_p(x) = S dphi(x) + c,   S = w^{1/2} V^T,   c = w^{-1/2} V^T g_b'

(Lambda = V diag(w) V^T with eigenvalue clipping). Two hard-won design
choices, both load-bearing for convergence on realistic noise:

- TANGENT, not raw-ambient 7-dim coordinates: a raw quadratic in q has
  exact quaternion-scale null directions plus curvature from the
  normalization nonlinearity; the accumulated marginal then gave LM a
  steep curved valley it wandered along (finite steps, no cost change,
  no convergence) and the window random-walked away — worse than dead
  reckoning on a 72-pose circle fixture.
- AFFINE OFFSET c, not the textbook mean x_bar = x_lin - Lambda^+ g_b':
  the offset is bounded by the absorbed residual norm
  (|v^T J^T r| <= sqrt(w)|r| componentwise, Cauchy-Schwarz), whereas
  the pseudo-inverse mean amplifies g components along near-null
  eigendirections by 1/w — observed catapulting the prior minimum
  1-3 m from the estimate.

Switch variables of absorbed loop closures are marginalized with their
edges.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.options import Options
from ..core.pose import Pose, np_quat_to_rotmat
from ..ops.relative_pose import (
    SWITCH_PENALTY_SCALE,
    PoseGraphEdges,
    np_edge_residuals_and_jacobians,
    np_quat_conjugate as _np_quat_conj,
    np_quat_left_matrix as _np_quat_left,
    np_quat_multiply as _np_quat_mul,
)
from . import lm
from ..ops.relative_pose import stack_sqrt_info
from .pose_graph import _expand_sqrt_info, _pose_graph_solve


def _pack(pose: Pose) -> np.ndarray:
    return np.concatenate([pose.translation, pose.quaternion()])


def _edge_w6(edges_all) -> Optional[np.ndarray]:
    """(E, 6) or (E, 6, 6) whitening stack from 7-tuples (w6 last),
    or None if unset."""
    return stack_sqrt_info([e[6] for e in edges_all], 6)


class FixedLagSmoother:
    """Sliding-window smoother over consecutively-indexed poses.

    Usage (one odometry step per frame, loops optional):

        sm = FixedLagSmoother(lag=15, switch_penalty=0.03)
        sm.add_pose(0, first_pose)
        for k in odometry_stream:
            sm.add_pose(k, prediction)
            sm.add_odometry(k - 1, k, rel_pose)
            if loop_found:
                sm.add_loop(i, k, rel_pose)
            summary = sm.update()

    ``get_pose(i)`` returns the current window estimate, or the final
    (frozen) estimate for already-marginalized poses.

    ``edge_loss`` is not supported: a robust loss has no consistent
    quadratic marginal (its curvature depends on the residual it is
    evaluated at), so mixing it with marginalization silently changes the
    objective — use switchable loop constraints (supported) instead.
    """

    def __init__(
        self,
        lag: int,
        dtype=None,
        switch_penalty: Optional[float] = None,
        max_iterations: int = 50,
        marginalize_every: int = 1,
    ):
        """``marginalize_every`` (round 5): flush cadence of the
        update_async streaming mode. 1 (default) = the blocking
        semantics exactly — every async update is fetched and
        marginalized before the next frame's registry calls, results
        bit-identical to update(). N > 1 = AMORTIZED streaming: async
        window solves dispatch every frame (each solves the FULL
        current window MAP, superseding the previous dispatch), but
        the fetch + write-back + marginalization run every N frames, so
        the per-frame blocking round-trip — one ~30 ms dispatch
        quantum on this relay runtime, 3-4x the actual window solve —
        is paid once per N. The window grows to lag+N-1 between
        flushes and the absorbed factors are linearized at the flush
        state (a deferred-marginalization smoother — slightly
        different, documented semantics; estimates read between
        flushes force one). Reads (get_pose/window/loop_switches/
        covariance) always flush first, so published state is always a
        window MAP."""
        if lag < 2:
            raise ValueError("lag must be >= 2")
        if marginalize_every < 1:
            raise ValueError("marginalize_every must be >= 1")
        self.lag = lag
        self.marginalize_every = marginalize_every
        self._pending_age = 0
        if dtype is None:
            # f64 when available (CPU / x64 runs); silently-truncated f64
            # on TPU would just spam warnings — f32 converges fine there
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype
        self.switch_penalty = (
            SWITCH_PENALTY_SCALE if switch_penalty is None else switch_penalty
        )
        self.max_iterations = max_iterations
        self._window: List[int] = []  # consecutive pose ids, oldest first
        self._est: Dict[int, np.ndarray] = {}  # id -> packed (7,) [p, q]
        self._history: Dict[int, np.ndarray] = {}  # marginalized finals
        # odometry: (ref, qry, rel_t (3,), rel_q (4,)); loops add a switch
        self._odom: List[Tuple] = []
        self._loops: List[dict] = []  # ref, qry, rel_t, rel_q, switch
        # prior: (support ids ascending, S (6B, 6B) over tangent coords,
        # x_lin (B, 7) [p, unit q], c (6B,))
        self._prior: Optional[
            Tuple[List[int], np.ndarray, np.ndarray, np.ndarray]
        ] = None
        self._gauge: Optional[int] = None  # fixed pose until a prior exists
        # async streaming state (update_async): the dispatched-but-not-
        # fetched window solve. Flushed (one batched device_get +
        # write-back + marginalization) by the next update/update_async,
        # any state read, or flush().
        self._pending: Optional[dict] = None
        self._last_summary: Optional[lm.Summary] = None

    # -- registry -----------------------------------------------------------
    def add_pose(self, index: int, pose: Pose) -> None:
        if self.marginalize_every == 1:
            self.flush()  # keep blocking-path marginalization timing
        if self._window and index != self._window[-1] + 1:
            raise ValueError(
                f"poses must be added consecutively (expected "
                f"{self._window[-1] + 1}, got {index})"
            )
        self._window.append(index)
        self._est[index] = _pack(pose)
        if self._gauge is None and self._prior is None:
            self._gauge = index

    def _check_edge(self, ref: int, qry: int) -> None:
        if self.marginalize_every == 1:
            self.flush()  # edges to pending-marginalized poses raise
        if ref not in self._est or qry not in self._est:
            raise KeyError("edge endpoints must be in the active window")
        if ref == qry:
            raise ValueError("self-edge is not allowed")

    def add_odometry(
        self,
        reference_index: int,
        query_index: int,
        relative_pose: Pose,
        sqrt_info=None,
    ) -> None:
        """``sqrt_info``: optional diagonal whitening — scalar, (2,)
        (translation, rotation) or (6,); see PoseGraphOptimizer.set_constraint."""
        self._check_edge(reference_index, query_index)
        self._odom.append(
            (
                reference_index,
                query_index,
                relative_pose.translation.copy(),
                relative_pose.quaternion(),
                _expand_sqrt_info(sqrt_info),
            )
        )

    def add_loop(
        self,
        reference_index: int,
        query_index: int,
        relative_pose: Pose,
        sqrt_info=None,
    ) -> None:
        self._check_edge(reference_index, query_index)
        self._loops.append(
            dict(
                ref=reference_index,
                qry=query_index,
                rel_t=relative_pose.translation.copy(),
                rel_q=relative_pose.quaternion(),
                switch=1.0,
                sqrt_info=_expand_sqrt_info(sqrt_info),
            )
        )

    def get_pose(self, index: int) -> Pose:
        self.flush()
        x = self._est.get(index)
        if x is None:
            x = self._history[index]
        q = x[3:] / np.linalg.norm(x[3:])
        return Pose(np_quat_to_rotmat(q), x[:3].copy())

    def loop_switches(self) -> np.ndarray:
        """Current switch values of the ACTIVE (un-marginalized) loops."""
        self.flush()
        return np.array([l["switch"] for l in self._loops])

    @property
    def window(self) -> List[int]:
        self.flush()
        return list(self._window)

    @property
    def active_ids(self) -> List[int]:
        """Window pose ids WITHOUT flushing a pending async update —
        membership bookkeeping for streaming pipelines (a per-frame
        ``window`` read would force a flush every frame and defeat
        ``marginalize_every``'s amortization). Ids only change at flush
        time; poses that the pending flush will marginalize are still
        listed, which is correct for edge-eligibility checks (their
        factors get absorbed). Use :attr:`window` when you need the
        published (flushed) state."""
        return list(self._window)

    def covariance(self, indices: Optional[List[int]] = None) -> Dict[int, np.ndarray]:
        """Marginal 6x6 TANGENT-space covariance blocks for active
        window poses, from ALL active factors (odometry, loops at their
        current switch values, the marginal prior), linearized at the
        current estimates. Host-side f64, O((6W)^3) — W is the lag, so
        this is cheap and exact for the window belief.

        The batch :class:`PoseGraphOptimizer` has the offline
        counterpart; marginalized (frozen) poses have no covariance
        anymore — query before they leave the window.

        Returns {pose_index: (6, 6) ndarray}; the gauge pose (fixed while
        no prior exists yet) gets a zero block.
        """
        self.flush()
        W = len(self._window)
        if W == 0:
            raise ValueError("covariance: no poses in the window")
        local = {pi: i for i, pi in enumerate(self._window)}
        est = np.stack([self._est[pi] for pi in self._window]).astype(np.float64)
        est[:, 3:] /= np.linalg.norm(est[:, 3:], axis=1, keepdims=True)
        Tq = 0.5 * _np_quat_left(est[:, 3:])[:, :, 1:]  # (W, 4, 3)

        L = len(self._loops)
        dim = 6 * W + L
        H = np.zeros((dim, dim))

        edges_all = [(a, b, t, q, 0.0, 1.0, w) for (a, b, t, q, w) in self._odom] + [
            (l["ref"], l["qry"], l["rel_t"], l["rel_q"], 1.0, l["switch"], l["sqrt_info"])
            for l in self._loops
        ]
        if not edges_all and self._prior is None:
            raise ValueError("covariance: no factors registered")
        if edges_all:
            ref_i = np.array([local[e[0]] for e in edges_all])
            qry_i = np.array([local[e[1]] for e in edges_all])
            r, J_ref, J_qry, J_s = np_edge_residuals_and_jacobians(
                est[:, :3], est[:, 3:],
                np.array([e[5] for e in edges_all]),
                ref_i, qry_i,
                np.stack([e[2] for e in edges_all]),
                np.stack([e[3] for e in edges_all]),
                np.array([e[4] for e in edges_all]),
                self.switch_penalty,
                sqrt_info=_edge_w6(edges_all),
            )
            J_ref = np.concatenate(
                [J_ref[:, :, :3], J_ref[:, :, 3:] @ Tq[ref_i]], axis=2
            )
            J_qry = np.concatenate(
                [J_qry[:, :, :3], J_qry[:, :, 3:] @ Tq[qry_i]], axis=2
            )
            n_odom = len(self._odom)
            for k in range(len(edges_all)):
                if self._prior is None and edges_all[k][0] == self._gauge:
                    J_ref[k] = 0.0
                if self._prior is None and edges_all[k][1] == self._gauge:
                    J_qry[k] = 0.0
                ra, rb = 6 * ref_i[k], 6 * qry_i[k]
                Ja, Jb = J_ref[k], J_qry[k]
                H[ra : ra + 6, ra : ra + 6] += Ja.T @ Ja
                H[rb : rb + 6, rb : rb + 6] += Jb.T @ Jb
                H[ra : ra + 6, rb : rb + 6] += Ja.T @ Jb
                H[rb : rb + 6, ra : ra + 6] += Jb.T @ Ja
                if k >= n_odom:
                    sc = 6 * W + (k - n_odom)
                    Js = J_s[k]
                    H[ra : ra + 6, sc] += Ja.T @ Js
                    H[sc, ra : ra + 6] += Ja.T @ Js
                    H[rb : rb + 6, sc] += Jb.T @ Js
                    H[sc, rb : rb + 6] += Jb.T @ Js
                    H[sc, sc] += Js @ Js

        if self._prior is not None:
            sup, S, lin, c = self._prior
            rows = np.concatenate(
                [np.arange(6 * local[pi], 6 * local[pi] + 6) for pi in sup]
            )
            sel = np.array([local[pi] for pi in sup])
            A = _np_quat_mul(_np_quat_conj(lin[:, 3:]), est[sel, 3:])
            G = _np_quat_left(A)[:, 1:, 1:]
            Tblk = np.zeros((len(rows), len(rows)))
            for i in range(len(sup)):
                Tblk[6 * i : 6 * i + 3, 6 * i : 6 * i + 3] = np.eye(3)
                Tblk[6 * i + 3 : 6 * i + 6, 6 * i + 3 : 6 * i + 6] = G[i]
            J_p = S @ Tblk
            H[np.ix_(rows, rows)] += J_p.T @ J_p

        # gauge pose (if any) is constant: drop its rows/cols
        keep = np.ones(dim, bool)
        if self._prior is None and self._gauge is not None:
            gi = 6 * local[self._gauge]
            keep[gi : gi + 6] = False
        try:
            Sigma_red = np.linalg.inv(H[np.ix_(keep, keep)])
        except np.linalg.LinAlgError as exc:
            raise ValueError(
                "covariance: window information is singular — the window "
                "is under-constrained"
            ) from exc
        Sigma = np.zeros((dim, dim))
        kk = np.nonzero(keep)[0]
        Sigma[np.ix_(kk, kk)] = Sigma_red

        if indices is None:
            indices = list(self._window)
        out = {}
        for pi in indices:
            if pi not in local:
                raise KeyError(
                    f"pose {pi} is not in the active window "
                    f"({self._window[0]}..{self._window[-1]})"
                )
            i = local[pi]
            out[pi] = Sigma[6 * i : 6 * i + 6, 6 * i : 6 * i + 6].copy()
        return out

    # -- update ---------------------------------------------------------------
    def update(self, options: Optional[Options] = None) -> lm.Summary:
        """Optimize the window, then marginalize poses older than the lag."""
        self.flush()
        self._pending = self._dispatch(options)
        return self.flush()

    def update_async(self, options: Optional[Options] = None) -> None:
        """Streaming update: DISPATCH the window solve and return without
        fetching. The fetch + write-back + marginalization run lazily —
        at the next ``update``/``update_async``/``add_*``/read, or an
        explicit :meth:`flush` — as ONE batched ``jax.device_get`` of a
        by-then-finished computation.

        Why (round 5, the registrar's round-4 async treatment applied
        here): the blocking ``update`` paid one dispatch quantum per
        separate fetch on this runtime (~3 of them = the measured
        95.8 ms median steady-state update, ~30x the actual solve
        compute), and its synchronous dispatch-and-fetch pattern is
        exactly what flips the process into the degraded ~30 ms-floor
        state (CLAUDE.md round-4 bisect). Dispatch-only keeps the
        stream in the clean state; by the time the next frame arrives
        the solve has long finished and the fetch is cheap.

        With the default ``marginalize_every=1`` results are
        BIT-IDENTICAL to the blocking path: the same jitted program
        runs on the same inputs — only the fetch timing moves. With
        ``marginalize_every=N`` the per-frame round-trip disappears
        entirely (amortized semantics; see __init__). The solve summary
        becomes available at the flush: ``last_summary`` holds it."""
        if self._pending is not None:
            self._pending_age += 1
            if self._pending_age >= self.marginalize_every:
                self.flush()
        self._pending = self._dispatch(options)

    @property
    def last_summary(self) -> Optional[lm.Summary]:
        """Summary of the most recently FLUSHED update (None before the
        first flush)."""
        return self._last_summary

    def flush(self) -> Optional[lm.Summary]:
        """Complete a pending :meth:`update_async`: one batched fetch,
        write-back, marginalization. No-op without a pending update.
        Returns the flushed update's summary (or the last one)."""
        pending = self._pending
        if pending is None:
            return self._last_summary
        self._pending = None
        self._pending_age = 0
        if pending["kind"] == "empty":
            # fetch the (tiny) device scalars once so later summary
            # field reads are free, same as the solve branch
            summary = jax.device_get(pending["summary"])
        else:
            # the summary rides along in the ONE batched fetch so later
            # int(summary.iterations)/float(final_cost) reads are free
            # (separate fetches each pay a dispatch quantum, CLAUDE.md)
            pos, quat, sw, summary = jax.device_get(
                (pending["pos"], pending["quat"], pending["sw"],
                 pending["summary"])
            )
            pos = np.array(pos, np.float64)
            quat = np.array(quat, np.float64)
            sw = np.array(sw, np.float64)
            # renormalize at write-back (the batch optimizer does the
            # same, pose_graph_optimizer.h:89-101): the objective —
            # edges AND the tangent-space prior — is quaternion-scale
            # invariant, so this is free, and it keeps every
            # linearization chart on the unit sphere
            quat /= np.linalg.norm(quat, axis=1, keepdims=True)
            for i, pi in enumerate(pending["window"]):
                self._est[pi] = np.concatenate([pos[i], quat[i]])
            for l, s in zip(pending["loops"], sw[: pending["L"]]):
                l["switch"] = float(s)
        self._last_summary = summary
        cutoff = pending["window"][-1] - self.lag + 1
        if cutoff > pending["window"][0]:
            self._marginalize(cutoff)
        return summary

    # -- window solve ---------------------------------------------------------
    @staticmethod
    def _bucket(n: int, m: int) -> int:
        """Round ``n`` up to a multiple of ``m`` (0 stays 0)."""
        return ((n + m - 1) // m) * m

    def _dispatch(self, options: Optional[Options]) -> dict:
        """One window solve, traced at CONSTANT shapes — DISPATCH ONLY
        (no fetch; see flush/update_async).

        Every varying extent is padded to a bucket so long runs reuse a
        handful of compiled programs instead of one per update (this
        runtime's remote compiles cost 26-500 s each; attached TPUs still
        pay ~seconds): the pose count is padded to ``lag`` (padded poses
        are gauge-fixed identities), edge rows are masked pads
        (``edges.mask`` zeroes r and every Jacobian block, so they
        contribute nothing), padded LOOP rows sit after the real ones so
        the cumsum slot assignment keeps real switches at slots 0..L-1,
        and the marginal-prior support is padded with zero sqrt-info
        rows. Steady state (full window, stable loop count) is exactly
        one program.
        """
        if options is None:
            options = Options().replace(max_iterations=self.max_iterations)
        if not self._window:
            raise ValueError(
                "update: no poses registered — add_pose() first"
            )
        W = len(self._window)
        local = {pi: i for i, pi in enumerate(self._window)}
        dtype = self.dtype

        if not self._odom and not self._loops:
            zero = jnp.zeros((), dtype)
            nan = jnp.full((options.max_iterations,), jnp.nan, dtype)
            return dict(
                kind="empty",
                window=list(self._window),
                summary=lm.Summary(
                    zero, zero, jnp.zeros((), jnp.int32), zero,
                    jnp.asarray(True),
                    lm.IterationRecord(nan, nan, nan, nan),
                ),
            )

        # padded pose count: the window holds lag+1 poses at optimize
        # time in the steady per-frame loop (update() optimizes BEFORE
        # marginalizing the newly-exceeded pose); bucket beyond that for
        # callers that batch several add_pose calls per update
        P = max(self.lag + 1, self._bucket(W, 4))
        est = np.zeros((P, 7))
        est[:, 3] = 1.0  # identity quaternions on padded slots
        est[:W] = np.stack([self._est[pi] for pi in self._window])

        E_o, L = len(self._odom), len(self._loops)
        E_op = self._bucket(E_o, 8)
        L_p = self._bucket(L, 2)
        E = E_op + L_p
        ref = np.zeros((E,), np.int32)
        qry = np.ones((E,), np.int32)  # pad rows: masked 0->1 edge
        rel_t = np.zeros((E, 3))
        rel_q = np.zeros((E, 4))
        rel_q[:, 0] = 1.0
        is_loop = np.zeros((E,))
        is_loop[E_op:] = 1.0  # including padded loop rows (slot cumsum)
        mask = np.zeros((E,))
        mask[:E_o] = 1.0
        mask[E_op : E_op + L] = 1.0
        w_entries = [None] * E
        for k, (a, b, t, q, w) in enumerate(self._odom):
            ref[k] = local[a]; qry[k] = local[b]
            rel_t[k] = t; rel_q[k] = q
            w_entries[k] = w
        sw0 = np.ones((L_p,))
        for k, l in enumerate(self._loops):
            ref[E_op + k] = local[l["ref"]]; qry[E_op + k] = local[l["qry"]]
            rel_t[E_op + k] = l["rel_t"]; rel_q[E_op + k] = l["rel_q"]
            sw0[k] = l["switch"]
            w_entries[E_op + k] = l["sqrt_info"]
        w6 = stack_sqrt_info(w_entries, 6)
        edges = PoseGraphEdges(
            reference_indices=jnp.asarray(ref),
            query_indices=jnp.asarray(qry),
            relative_translations=jnp.asarray(rel_t, dtype),
            relative_quaternions=jnp.asarray(rel_q, dtype),
            is_loop=jnp.asarray(is_loop, dtype),
            mask=jnp.asarray(mask, dtype),
            sqrt_info=None if w6 is None else jnp.asarray(w6, dtype),
        )
        free = np.zeros(P)
        free[:W] = 1.0
        if self._prior is None and self._gauge is not None:
            free[local[self._gauge]] = 0.0

        prior_sqrt = prior_mean = prior_sel = prior_offset = None
        if self._prior is not None:
            sup, S, x_lin, c = self._prior
            B, B_p = len(sup), self._bucket(len(sup), 2)
            S_pad = np.zeros((6 * B_p, 6 * B_p))
            S_pad[: 6 * B, : 6 * B] = S
            lin_pad = np.zeros((B_p, 7))
            lin_pad[:, 3] = 1.0  # identity quats on padded support slots
            lin_pad[:B] = x_lin
            c_pad = np.zeros((6 * B_p,))
            c_pad[: 6 * B] = c
            sel_pad = np.zeros((B_p,), np.int32)
            sel_pad[:B] = [local[pi] for pi in sup]
            prior_sqrt = jnp.asarray(S_pad, dtype)
            prior_mean = jnp.asarray(lin_pad, dtype)
            prior_sel = jnp.asarray(sel_pad)
            prior_offset = jnp.asarray(c_pad, dtype)

        pos, quat, sw, summary = _pose_graph_solve(
            jnp.asarray(est[:, :3], dtype),
            jnp.asarray(est[:, 3:], dtype),
            jnp.asarray(sw0, dtype),
            edges,
            jnp.asarray(free, dtype),
            jnp.asarray(self.switch_penalty, dtype),
            None,  # edge_loss unsupported (see class docstring)
            P,
            L_p,
            options,
            prior_sqrt,
            prior_mean,
            prior_sel,
            prior_offset,
        )
        return dict(
            kind="solve",
            window=list(self._window),
            loops=list(self._loops),
            L=L,
            pos=pos,
            quat=quat,
            sw=sw,
            summary=summary,
        )

    # -- marginalization --------------------------------------------------------
    def _marginalize(self, cutoff: int) -> None:
        """Schur-complement marginalization in TANGENT coordinates.

        All absorbed information is assembled on the 6-DoF local chart at
        the current (quaternion-normalized) estimate — per pose
        x(dphi) = [p + dp ; n(q) (x) (1, dtheta/2)] — NOT on the raw
        7-dim ambient coordinates: a raw-ambient marginal quadratic has
        exact quaternion-scale nulls and normalization curvature, which
        made the subsequent window solves wander (see module docstring).
        Ambient edge Jacobians chain onto the chart with
        T_i = blkdiag(I_3, 0.5 L(n(q_i))[:, 1:]) (7x6 per pose).
        """
        leaving = {pi for pi in self._window if pi < cutoff}

        absorb_odom = [e for e in self._odom if e[0] in leaving or e[1] in leaving]
        absorb_loops = [
            l for l in self._loops if l["ref"] in leaving or l["qry"] in leaving
        ]
        prior_support = list(self._prior[0]) if self._prior is not None else []

        # variable set: every pose touched by an absorbed factor/prior,
        # plus all leaving poses (isolated ones contribute nothing but
        # must still be removed from the window)
        V: List[int] = sorted(
            leaving
            | {e[0] for e in absorb_odom} | {e[1] for e in absorb_odom}
            | {l["ref"] for l in absorb_loops} | {l["qry"] for l in absorb_loops}
            | set(prior_support)
        )
        slot = {pi: i for i, pi in enumerate(V)}
        n_sw = len(absorb_loops)
        nV = len(V)
        dim = 6 * nV + n_sw

        est = np.stack([self._est[pi] for pi in V]).astype(np.float64)
        est[:, 3:] /= np.linalg.norm(est[:, 3:], axis=1, keepdims=True)
        # chart map per pose: d(ambient)/d(tangent-rotation) (4, 3)
        Tq = 0.5 * _np_quat_left(est[:, 3:])[:, :, 1:]  # (V, 4, 3)

        H = np.zeros((dim, dim))
        g = np.zeros(dim)

        edges_all = [(e[0], e[1], e[2], e[3], 0.0, 1.0, e[4]) for e in absorb_odom] + [
            (l["ref"], l["qry"], l["rel_t"], l["rel_q"], 1.0, l["switch"], l["sqrt_info"])
            for l in absorb_loops
        ]
        if edges_all:
            ref_i = np.array([slot[e[0]] for e in edges_all])
            qry_i = np.array([slot[e[1]] for e in edges_all])
            r, J_ref, J_qry, J_s = np_edge_residuals_and_jacobians(
                est[:, :3],
                est[:, 3:],
                np.array([e[5] for e in edges_all]),
                ref_i,
                qry_i,
                np.stack([e[2] for e in edges_all]),
                np.stack([e[3] for e in edges_all]),
                np.array([e[4] for e in edges_all]),
                self.switch_penalty,
                sqrt_info=_edge_w6(edges_all),
            )
            # chain ambient (E,7,7) blocks onto the local chart -> (E,7,6)
            J_ref = np.concatenate(
                [J_ref[:, :, :3], J_ref[:, :, 3:] @ Tq[ref_i]], axis=2
            )
            J_qry = np.concatenate(
                [J_qry[:, :, :3], J_qry[:, :, 3:] @ Tq[qry_i]], axis=2
            )
            # the gauge pose (fixed while no prior exists) is a constant:
            # zero its Jacobian columns so it contributes no information
            for k, (a, b, *_rest) in enumerate(edges_all):
                if self._prior is None and a == self._gauge:
                    J_ref[k] = 0.0
                if self._prior is None and b == self._gauge:
                    J_qry[k] = 0.0
            n_odom = len(absorb_odom)
            for k in range(len(edges_all)):
                ra = 6 * ref_i[k]
                rb = 6 * qry_i[k]
                Ja, Jb, rk = J_ref[k], J_qry[k], r[k]
                H[ra : ra + 6, ra : ra + 6] += Ja.T @ Ja
                H[rb : rb + 6, rb : rb + 6] += Jb.T @ Jb
                H[ra : ra + 6, rb : rb + 6] += Ja.T @ Jb
                H[rb : rb + 6, ra : ra + 6] += Jb.T @ Ja
                g[ra : ra + 6] += Ja.T @ rk
                g[rb : rb + 6] += Jb.T @ rk
                if k >= n_odom:  # loop: switch column
                    sc = 6 * nV + (k - n_odom)
                    Js = J_s[k]
                    H[ra : ra + 6, sc] += Ja.T @ Js
                    H[sc, ra : ra + 6] += Ja.T @ Js
                    H[rb : rb + 6, sc] += Jb.T @ Js
                    H[sc, rb : rb + 6] += Jb.T @ Js
                    H[sc, sc] += Js @ Js
                    g[sc] += Js @ rk

        if self._prior is not None:
            # old prior r_p = S dphi_prior(x) + c, linearized on the
            # CURRENT chart: translation block I, rotation block
            # L(A)[1:, 1:] with A = q_lin^-1 (x) n(q_est)
            sup, S, lin, c = self._prior
            rows = np.concatenate(
                [np.arange(6 * slot[pi], 6 * slot[pi] + 6) for pi in sup]
            )
            sel = np.array([slot[pi] for pi in sup])
            A = _np_quat_mul(_np_quat_conj(lin[:, 3:]), est[sel, 3:])  # (B,4)
            dphi = np.concatenate(
                [est[sel, :3] - lin[:, :3], 2.0 * A[:, 1:]], axis=1
            ).reshape(-1)
            r_p = S @ dphi + c
            G = _np_quat_left(A)[:, 1:, 1:]  # (B, 3, 3)
            Tblk = np.zeros((len(rows), len(rows)))
            for i in range(len(sup)):
                Tblk[6 * i : 6 * i + 3, 6 * i : 6 * i + 3] = np.eye(3)
                Tblk[6 * i + 3 : 6 * i + 6, 6 * i + 3 : 6 * i + 6] = G[i]
            J_p = S @ Tblk
            H[np.ix_(rows, rows)] += J_p.T @ J_p
            g[rows] += J_p.T @ r_p

        # partition: m = leaving poses + absorbed switches; b = retained
        m_rows = np.concatenate(
            [np.arange(6 * slot[pi], 6 * slot[pi] + 6) for pi in V if pi in leaving]
            + [np.arange(6 * nV, dim)]
        ).astype(int)
        retained = [pi for pi in V if pi not in leaving]
        b_rows = np.concatenate(
            [np.arange(6 * slot[pi], 6 * slot[pi] + 6) for pi in retained]
        ).astype(int) if retained else np.zeros((0,), int)

        if len(b_rows):
            H_mm = H[np.ix_(m_rows, m_rows)] + 1e-10 * np.eye(len(m_rows))
            H_bm = H[np.ix_(b_rows, m_rows)]
            sol = np.linalg.solve(H_mm, np.concatenate([H_bm.T, g[m_rows][:, None]], axis=1))
            Lam = H[np.ix_(b_rows, b_rows)] - H_bm @ sol[:, :-1]
            g_b = g[b_rows] - H_bm @ sol[:, -1]
            Lam = 0.5 * (Lam + Lam.T)
            w, Vec = np.linalg.eigh(Lam)
            w = np.clip(w, 0.0, None)
            S_new = np.sqrt(w)[:, None] * Vec.T
            # residual offset c = w^{-1/2} V^T g (0 on the null space):
            # each component is <= the absorbed residual norm, so no
            # near-null eigendirection can catapult the prior (a
            # 1/w mean form did exactly that — see module docstring)
            keep = w > 1e-12 * max(w.max(), 1.0)
            c_new = np.where(
                keep, (Vec.T @ g_b) / np.sqrt(np.maximum(w, 1e-300)), 0.0
            )
            lin_new = np.stack([est[slot[pi]] for pi in retained])
            self._prior = (retained, S_new, lin_new, c_new)
        else:
            self._prior = None

        # slide the registry
        for pi in sorted(leaving):
            self._history[pi] = self._est.pop(pi)
        self._window = [pi for pi in self._window if pi not in leaving]
        # identity-based filtering: the entries hold numpy arrays, whose
        # `==` is elementwise — membership tests would be fragile
        absorbed = {id(e) for e in absorb_odom} | {id(l) for l in absorb_loops}
        self._odom = [e for e in self._odom if id(e) not in absorbed]
        self._loops = [l for l in self._loops if id(l) not in absorbed]
        self._gauge = None  # the prior carries the gauge from here on
