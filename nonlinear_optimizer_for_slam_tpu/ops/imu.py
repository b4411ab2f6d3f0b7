"""IMU preintegration (on-manifold, Forster et al., T-RO 2016).

The classic visual/GPS-inertial building block the reference framework
does not have: raw gyro/accel samples between two keyframes are
compressed into ONE relative-motion factor (delta rotation / velocity /
position), with first-order bias-correction Jacobians and a propagated
9x9 covariance, so the optimizer never touches individual IMU samples
and re-linearization under changing bias estimates costs a matrix-vector
product instead of re-integration.

Split of responsibilities (same policy as the rest of the framework):

- :class:`ImuPreintegrator` is HOST-side numpy — integration is
  inherently sequential per sample and happens in the data frontend
  (eager per-sample jnp dispatches would be poison on this runtime,
  CLAUDE.md).
- :class:`PreintegratedImuFactor` is the device-side SoA batch; the
  residual function is pure jnp, vmap/jit/jacfwd-safe, consumed by
  solvers.inertial.

Conventions: quaternions (w, x, y, z); gravity is a world-frame vector
(default (0, 0, -9.81)); accelerometer measures SPECIFIC FORCE
a_meas = R^T (a_world - g) + b_a + noise; state per keyframe is
(p, q, v, b_g, b_a). Residual (whitened by the preintegration
sqrt-information):

    r_phi = Log( (dR Exp(J_R_bg dbg))^T R_i^T R_j )
    r_v   = R_i^T (v_j - v_i - g dt) - (dv + J_v_bg dbg + J_v_ba dba)
    r_p   = R_i^T (p_j - p_i - v_i dt - 0.5 g dt^2)
            - (dp + J_p_bg dbg + J_p_ba dba)

with dbg/dba the deviation of the STATE bias at keyframe i from the
bias the batch was integrated at.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie

Array = jax.Array

GRAVITY = np.array([0.0, 0.0, -9.81])


@dataclasses.dataclass(frozen=True)
class ImuParams:
    """Continuous-time noise densities (units per sqrt(Hz)); discrete
    per-sample covariance is density^2 / dt. The bias-walk densities
    feed :func:`bias_walk_sqrt_info` (the between-keyframe bias
    random-walk factor weight); gyro/accel densities feed the
    preintegration covariance."""

    gyro_noise: float = 1.7e-4  # rad / s / sqrt(Hz)
    accel_noise: float = 2.0e-3  # m / s^2 / sqrt(Hz)
    gyro_bias_walk: float = 2.0e-5  # rad / s^2 / sqrt(Hz)
    accel_bias_walk: float = 3.0e-3  # m / s^3 / sqrt(Hz)


def bias_walk_sqrt_info(params: ImuParams, dt: float) -> np.ndarray:
    """(6,) diagonal sqrt-information for the bias random-walk factor
    (b_j - b_i) over an interval of ``dt`` seconds: the walk variance is
    density^2 * dt, so w = 1 / (density * sqrt(dt)). Pass to
    InertialGraphOptimizer.add_bias_walk — these are exactly the
    datasheet densities in :class:`ImuParams`."""
    if dt <= 0.0:
        raise ValueError(f"dt must be positive, got {dt}")
    wg = 1.0 / (params.gyro_bias_walk * np.sqrt(dt))
    wa = 1.0 / (params.accel_bias_walk * np.sqrt(dt))
    return np.array([wg, wg, wg, wa, wa, wa])


def _skew(v):
    return np.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )


def _exp_so3(w):
    th = np.linalg.norm(w)
    K = _skew(w)
    if th < 1e-8:
        return np.eye(3) + K + 0.5 * K @ K
    return (
        np.eye(3)
        + (np.sin(th) / th) * K
        + ((1.0 - np.cos(th)) / th**2) * K @ K
    )


def _right_jacobian(w):
    """SO(3) right Jacobian J_r(w): Exp(w + dw) ~ Exp(w) Exp(J_r dw)."""
    th = np.linalg.norm(w)
    K = _skew(w)
    if th < 1e-8:
        return np.eye(3) - 0.5 * K + (1.0 / 6.0) * K @ K
    return (
        np.eye(3)
        - ((1.0 - np.cos(th)) / th**2) * K
        + ((th - np.sin(th)) / th**3) * K @ K
    )


class ImuPreintegrator:
    """Accumulates gyro/accel samples into (dR, dv, dp) with bias
    Jacobians and a propagated (phi, v, p) covariance.

    Usage::

        pre = ImuPreintegrator(ImuParams(), bg0, ba0)
        for (gyro, accel, dt) in samples:
            pre.integrate(gyro, accel, dt)
        factor_data = pre.to_factor()     # device-side arrays
    """

    def __init__(self, params: ImuParams, gyro_bias=None, accel_bias=None):
        self.params = params
        self.bg0 = np.zeros(3) if gyro_bias is None else np.asarray(gyro_bias, np.float64).copy()
        self.ba0 = np.zeros(3) if accel_bias is None else np.asarray(accel_bias, np.float64).copy()
        self.reset()

    def reset(self) -> None:
        self.dR = np.eye(3)
        self.dv = np.zeros(3)
        self.dp = np.zeros(3)
        self.dt = 0.0
        self.dR_dbg = np.zeros((3, 3))
        self.dv_dbg = np.zeros((3, 3))
        self.dv_dba = np.zeros((3, 3))
        self.dp_dbg = np.zeros((3, 3))
        self.dp_dba = np.zeros((3, 3))
        self.cov = np.zeros((9, 9))  # over (phi, v, p)
        self.num_samples = 0

    def integrate(self, gyro, accel, dt: float) -> None:
        if dt <= 0.0:
            raise ValueError(f"dt must be positive, got {dt}")
        w = np.asarray(gyro, np.float64) - self.bg0
        a = np.asarray(accel, np.float64) - self.ba0
        wdt = w * dt
        dRk = _exp_so3(wdt)
        Jr = _right_jacobian(wdt)
        Ra = self.dR @ a
        Rax = self.dR @ _skew(a)

        # covariance propagation (Forster eq. (63)-style, state (phi,v,p))
        A = np.eye(9)
        A[0:3, 0:3] = dRk.T
        A[3:6, 0:3] = -Rax * dt
        A[6:9, 0:3] = -0.5 * Rax * dt * dt
        A[6:9, 3:6] = np.eye(3) * dt
        B = np.zeros((9, 6))
        B[0:3, 0:3] = Jr * dt
        B[3:6, 3:6] = self.dR * dt
        B[6:9, 3:6] = 0.5 * self.dR * dt * dt
        sg2 = self.params.gyro_noise**2 / dt
        sa2 = self.params.accel_noise**2 / dt
        N = np.diag([sg2] * 3 + [sa2] * 3)
        self.cov = A @ self.cov @ A.T + B @ N @ B.T

        # bias Jacobians (use PRE-update dR / dv jacobians)
        self.dp_dbg += self.dv_dbg * dt - 0.5 * Rax @ self.dR_dbg * dt * dt
        self.dp_dba += self.dv_dba * dt - 0.5 * self.dR * dt * dt
        self.dv_dbg += -Rax @ self.dR_dbg * dt
        self.dv_dba += -self.dR * dt
        self.dR_dbg = dRk.T @ self.dR_dbg - Jr * dt

        # deltas
        self.dp += self.dv * dt + 0.5 * Ra * dt * dt
        self.dv += Ra * dt
        self.dR = self.dR @ dRk
        self.dt += dt
        self.num_samples += 1

    def corrected(self, gyro_bias, accel_bias) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """First-order bias-corrected (dR, dv, dp) at a new bias estimate."""
        dbg = np.asarray(gyro_bias, np.float64) - self.bg0
        dba = np.asarray(accel_bias, np.float64) - self.ba0
        dR = self.dR @ _exp_so3(self.dR_dbg @ dbg)
        dv = self.dv + self.dv_dbg @ dbg + self.dv_dba @ dba
        dp = self.dp + self.dp_dbg @ dbg + self.dp_dba @ dba
        return dR, dv, dp

    def sqrt_information(self) -> np.ndarray:
        """Whitening S (9, 9) with S^T S = cov^-1 (tiny floor keeps a
        zero-sample or exactly-deterministic batch factorizable)."""
        cov = self.cov + 1e-16 * np.eye(9)
        L = np.linalg.cholesky(cov)
        # S = inv(L) gives S^T S = inv(L)^T inv(L) = inv(L L^T) = inv(cov)
        return np.linalg.inv(L)

    def to_factor_arrays(self) -> dict:
        """Flat dict of arrays for PreintegratedImuFactor stacking."""
        from ..core.pose import np_rotmat_to_quat

        if self.num_samples == 0:
            raise ValueError(
                "preintegrator holds no samples — an empty factor would "
                "whiten against the 1e-16 covariance floor and rigidly "
                "weld its two states together"
            )

        return dict(
            delta_q=np_rotmat_to_quat(self.dR),
            delta_v=self.dv.copy(),
            delta_p=self.dp.copy(),
            dt=float(self.dt),
            dR_dbg=self.dR_dbg.copy(),
            dv_dbg=self.dv_dbg.copy(),
            dv_dba=self.dv_dba.copy(),
            dp_dbg=self.dp_dbg.copy(),
            dp_dba=self.dp_dba.copy(),
            sqrt_info=self.sqrt_information(),
            bias0=np.concatenate([self.bg0, self.ba0]),
        )


class PreintegratedImuFactor(NamedTuple):
    """SoA batch of F preintegrated IMU factors (device-side)."""

    i: Array  # (F,) int32 state index of frame i
    j: Array  # (F,) int32 state index of frame j
    delta_q: Array  # (F, 4)
    delta_v: Array  # (F, 3)
    delta_p: Array  # (F, 3)
    dt: Array  # (F,)
    dR_dbg: Array  # (F, 3, 3)
    dv_dbg: Array  # (F, 3, 3)
    dv_dba: Array  # (F, 3, 3)
    dp_dbg: Array  # (F, 3, 3)
    dp_dba: Array  # (F, 3, 3)
    sqrt_info: Array  # (F, 9, 9)
    bias0: Array  # (F, 6) integration-time (bg, ba)


def imu_residuals(
    positions: Array,  # (N, 3)
    quaternions: Array,  # (N, 4) ambient
    velocities: Array,  # (N, 3)
    biases: Array,  # (N, 6) (bg, ba)
    factors: PreintegratedImuFactor,
    gravity: Array,  # (3,)
) -> Array:
    """Whitened 9-D preintegration residuals, batched over factors.

    Pure jnp: vmap/jacfwd-safe (solvers.inertial differentiates through
    this for the Gauss-Newton model)."""
    pi = positions[factors.i]
    pj = positions[factors.j]
    qi = lie.quat_normalize(quaternions[factors.i])
    qj = lie.quat_normalize(quaternions[factors.j])
    vi = velocities[factors.i]
    vj = velocities[factors.j]
    bi = biases[factors.i]
    dbg = bi[:, :3] - factors.bias0[:, :3]
    dba = bi[:, 3:] - factors.bias0[:, 3:]
    dt = factors.dt[:, None]

    # corrected deltas
    q_corr = lie.quat_multiply(
        factors.delta_q,
        lie.so3_exp_quaternion(jnp.einsum("fab,fb->fa", factors.dR_dbg, dbg)),
    )
    dv_corr = (
        factors.delta_v
        + jnp.einsum("fab,fb->fa", factors.dv_dbg, dbg)
        + jnp.einsum("fab,fb->fa", factors.dv_dba, dba)
    )
    dp_corr = (
        factors.delta_p
        + jnp.einsum("fab,fb->fa", factors.dp_dbg, dbg)
        + jnp.einsum("fab,fb->fa", factors.dp_dba, dba)
    )

    qi_inv = lie.quat_conjugate(qi)
    r_phi = lie.quat_log_vec(
        lie.quat_multiply(
            lie.quat_conjugate(q_corr), lie.quat_multiply(qi_inv, qj)
        )
    )
    r_v = (
        lie.quat_rotate(qi_inv, vj - vi - gravity[None, :] * dt) - dv_corr
    )
    r_p = (
        lie.quat_rotate(
            qi_inv, pj - pi - vi * dt - 0.5 * gravity[None, :] * dt * dt
        )
        - dp_corr
    )
    r = jnp.concatenate([r_phi, r_v, r_p], axis=1)  # (F, 9)
    return jnp.einsum("fab,fb->fa", factors.sqrt_info, r)


def imu_residuals_and_jacobians(
    positions: Array,  # (N, 3)
    quaternions: Array,  # (N, 4) ambient
    velocities: Array,  # (N, 3)
    biases: Array,  # (N, 6)
    factors: PreintegratedImuFactor,
    gravity: Array,  # (3,)
) -> Tuple[Array, Array, Array]:
    """Whitened residuals and CLOSED-FORM Jacobian blocks per factor.

    Returns ``(r (F, 9), J_i (F, 9, 16), J_j (F, 9, 16))`` over the packed
    state layout [p (3), q (4, ambient), v (3), b_g (3), b_a (3)]. The
    residual only touches x_j's pose/velocity, so J_j's bias columns are
    zero.

    Same algebra style as the pose-graph edge closed form
    (relative_pose.edge_residuals_and_jacobians): quaternion products are
    the linear maps L(a)/R(b), normalization contributes (I - nn^T)/|q|,
    and the two genuinely nonlinear maps — Exp (bias correction) and Log
    (rotation residual) — carry branch-exact Jacobians from core/lie.py.
    Production path of solvers/inertial.py; the full-stack jacfwd is kept
    there as the test oracle (tests/test_inertial.py asserts parity).
    """
    from .relative_pose import (
        _normalize_jacobian,
        _quat_left_matrix,
        _quat_right_matrix,
        _rotate_jacobian_wrt_quat,
    )

    F = factors.dt.shape[0]
    dtype = positions.dtype
    conj_sign = jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype)

    pi = positions[factors.i]
    pj = positions[factors.j]
    qi = quaternions[factors.i]
    qj = quaternions[factors.j]
    vi = velocities[factors.i]
    vj = velocities[factors.j]
    bi = biases[factors.i]
    dbg = bi[:, :3] - factors.bias0[:, :3]
    dba = bi[:, 3:] - factors.bias0[:, 3:]
    dt = factors.dt[:, None]

    n_i = lie.quat_normalize(qi)
    n_j = lie.quat_normalize(qj)
    Dn_i = _normalize_jacobian(qi)  # (F, 4, 4)
    Dn_j = _normalize_jacobian(qj)
    c_i = lie.quat_conjugate(n_i)

    # ---- corrected deltas and the rotation-residual chain ------------
    u = jnp.einsum("fab,fb->fa", factors.dR_dbg, dbg)  # (F, 3)
    q_exp = lie.so3_exp_quaternion(u)
    q_corr = lie.quat_multiply(factors.delta_q, q_exp)
    m = lie.quat_multiply(c_i, n_j)
    e = lie.quat_multiply(lie.quat_conjugate(q_corr), m)
    r_phi = lie.quat_log_vec(e)
    dLog = lie.quat_log_vec_jacobian(e)  # (F, 3, 4)

    # e = L(conj(q_corr) (x) c_i) n_j
    A = lie.quat_multiply(lie.quat_conjugate(q_corr), c_i)
    de_dqj = _quat_left_matrix(A) @ Dn_j  # (F, 4, 4)
    # e = L(conj(q_corr)) R(n_j) conj(n_i): conj is the column sign flip
    de_dqi = (
        _quat_left_matrix(lie.quat_conjugate(q_corr)) @ _quat_right_matrix(n_j)
    ) * conj_sign[None, None, :] @ Dn_i
    # e = R(conj(delta_q) (x) m) conj(Exp(u)), u = dR_dbg dbg
    w2 = lie.quat_multiply(lie.quat_conjugate(factors.delta_q), m)
    Dexp = lie.so3_exp_quaternion_jacobian(u)  # (F, 4, 3)
    de_dbg = (
        (_quat_right_matrix(w2) * conj_sign[None, None, :]) @ Dexp
    ) @ factors.dR_dbg  # (F, 4, 3)

    dphi_dqi = dLog @ de_dqi  # (F, 3, 4)
    dphi_dqj = dLog @ de_dqj
    dphi_dbg = dLog @ de_dbg  # (F, 3, 3)

    # ---- velocity / position rows ------------------------------------
    dv_corr = (
        factors.delta_v
        + jnp.einsum("fab,fb->fa", factors.dv_dbg, dbg)
        + jnp.einsum("fab,fb->fa", factors.dv_dba, dba)
    )
    dp_corr = (
        factors.delta_p
        + jnp.einsum("fab,fb->fa", factors.dp_dbg, dbg)
        + jnp.einsum("fab,fb->fa", factors.dp_dba, dba)
    )
    w_v = vj - vi - gravity[None, :] * dt
    w_p = pj - pi - vi * dt - 0.5 * gravity[None, :] * dt * dt
    RiT = lie.quat_to_rotmat(c_i)  # R(n_i)^T as a matrix (F, 3, 3)
    r_v = jnp.einsum("fab,fb->fa", RiT, w_v) - dv_corr
    r_p = jnp.einsum("fab,fb->fa", RiT, w_p) - dp_corr

    # d(R(n_i)^T x)/dq_i = drot(c_i, x) * conj_sign, chained through Dn_i
    drv_dqi = (_rotate_jacobian_wrt_quat(c_i, w_v) * conj_sign[None, None, :]) @ Dn_i
    drp_dqi = (_rotate_jacobian_wrt_quat(c_i, w_p) * conj_sign[None, None, :]) @ Dn_i

    z33 = jnp.zeros((F, 3, 3), dtype)
    z34 = jnp.zeros((F, 3, 4), dtype)
    # rows: (phi, v, p) x cols: (p 0:3 | q 3:7 | v 7:10 | bg 10:13 | ba 13:16)
    J_i = jnp.concatenate(
        [
            jnp.concatenate([z33, dphi_dqi, z33, dphi_dbg, z33], axis=-1),
            jnp.concatenate([z33, drv_dqi, -RiT, -factors.dv_dbg, -factors.dv_dba], axis=-1),
            jnp.concatenate([-RiT, drp_dqi, -RiT * dt[..., None], -factors.dp_dbg, -factors.dp_dba], axis=-1),
        ],
        axis=-2,
    )  # (F, 9, 16)
    J_j = jnp.concatenate(
        [
            jnp.concatenate([z33, dphi_dqj, z33, z33, z33], axis=-1),
            jnp.concatenate([z33, z34, RiT, z33, z33], axis=-1),
            jnp.concatenate([RiT, z34, z33, z33, z33], axis=-1),
        ],
        axis=-2,
    )

    r = jnp.concatenate([r_phi, r_v, r_p], axis=1)  # (F, 9)
    S = factors.sqrt_info
    return (
        jnp.einsum("fab,fb->fa", S, r),
        jnp.einsum("fab,fbn->fan", S, J_i),
        jnp.einsum("fab,fbn->fan", S, J_j),
    )


def imu_residuals_and_jacobians_ad(
    positions, quaternions, velocities, biases,
    factors: PreintegratedImuFactor, gravity,
) -> Tuple[Array, Array, Array]:
    """Autodiff oracle for :func:`imu_residuals_and_jacobians` (per-factor
    jacfwd over the two touched packed states; tests only)."""

    def one(xi, xj, f_k):
        # a 2-state micro-problem holding just this factor
        f01 = jax.tree.map(lambda a: a[None], f_k)._replace(
            i=jnp.zeros((1,), jnp.int32), j=jnp.ones((1,), jnp.int32)
        )

        def res(xi_, xj_):
            x = jnp.stack([xi_, xj_])
            return imu_residuals(
                x[:, :3], x[:, 3:7], x[:, 7:10], x[:, 10:16], f01, gravity
            )[0]

        r = res(xi, xj)
        Ji, Jj = jax.jacfwd(res, argnums=(0, 1))(xi, xj)
        return r, Ji, Jj

    x = jnp.concatenate([positions, quaternions, velocities, biases], axis=1)
    return jax.vmap(one)(x[factors.i], x[factors.j], factors)


def np_imu_residual(xi, xj, arr: dict, gravity=GRAVITY) -> np.ndarray:
    """Numpy twin of :func:`imu_residuals` for ONE factor between packed
    states xi, xj ((16,) = [p, q(wxyz), v, b_g, b_a]); ``arr`` is an
    ImuPreintegrator.to_factor_arrays() dict. Host-side use only
    (fixed-lag marginalization linearizes this by finite differences —
    eager jnp on that path would pay the dispatch floor)."""
    from ..core.pose import np_quat_to_rotmat
    from .relative_pose import (
        np_quat_conjugate as qconj,
        np_quat_multiply as qmul,
    )

    def qexp(w):
        th = np.linalg.norm(w)
        if th < 1e-12:
            return np.concatenate([[1.0], 0.5 * w])
        return np.concatenate(
            [[np.cos(0.5 * th)], np.sin(0.5 * th) * w / th]
        )

    def qlog(q):
        if q[0] < 0:
            q = -q
        vn = np.linalg.norm(q[1:])
        if vn < 1e-12:
            return 2.0 * q[1:] / max(q[0], 1e-12)
        return 2.0 * np.arctan2(vn, q[0]) * q[1:] / vn

    pi, qi, vi, bi = xi[:3], xi[3:7], xi[7:10], xi[10:16]
    pj, qj, vj = xj[:3], xj[3:7], xj[7:10]
    qi = qi / np.linalg.norm(qi)
    qj = qj / np.linalg.norm(qj)
    dbg = bi[:3] - arr["bias0"][:3]
    dba = bi[3:] - arr["bias0"][3:]
    dt = float(arr["dt"])
    g = np.asarray(gravity, np.float64)

    q_corr = qmul(arr["delta_q"], qexp(arr["dR_dbg"] @ dbg))
    dv_corr = arr["delta_v"] + arr["dv_dbg"] @ dbg + arr["dv_dba"] @ dba
    dp_corr = arr["delta_p"] + arr["dp_dbg"] @ dbg + arr["dp_dba"] @ dba

    Ri_T = np_quat_to_rotmat(qi).T
    r_phi = qlog(qmul(qconj(q_corr), qmul(qconj(qi), qj)))
    r_v = Ri_T @ (vj - vi - g * dt) - dv_corr
    r_p = Ri_T @ (pj - pi - vi * dt - 0.5 * g * dt * dt) - dp_corr
    return arr["sqrt_info"] @ np.concatenate([r_phi, r_v, r_p])
