"""IMU preintegration tests.

Anchors: corrected deltas against closed-form relative motion of an
analytic trajectory (midpoint-sampled measurements => O(dt^2) global
error), first-order bias correction against reintegration at the true
bias, covariance PSD/monotonicity, and the jnp residual zeroing on
consistent states."""

import numpy as np
import jax.numpy as jnp
import pytest

from nonlinear_optimizer_for_slam_tpu.ops.imu import (
    GRAVITY,
    ImuParams,
    ImuPreintegrator,
    PreintegratedImuFactor,
    imu_residuals,
)


def _rotz(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


class Circle:
    """Analytic circular trajectory; yaw = heading + optional sinusoid
    (yaw_amp > 0 varies the yaw RATE, breaking the constant-rate
    degeneracy between gyro-z bias and the rotating accel bias that
    otherwise makes those axes unidentifiable from position fixes)."""

    def __init__(self, rho=2.0, omega=0.9, yaw_amp=0.0, yaw_freq=1.3):
        self.rho, self.omega = rho, omega
        self.yaw_amp, self.yaw_freq = yaw_amp, yaw_freq

    def pos(self, t):
        return self.rho * np.array([np.cos(self.omega * t), np.sin(self.omega * t), 0.0])

    def vel(self, t):
        return self.rho * self.omega * np.array(
            [-np.sin(self.omega * t), np.cos(self.omega * t), 0.0]
        )

    def acc(self, t):
        return -self.rho * self.omega**2 * np.array(
            [np.cos(self.omega * t), np.sin(self.omega * t), 0.0]
        )

    def rot(self, t):
        return _rotz(
            self.omega * t + np.pi / 2
            + self.yaw_amp * np.sin(self.yaw_freq * t)
        )

    def gyro(self, t):
        return np.array([
            0.0, 0.0,
            self.omega
            + self.yaw_amp * self.yaw_freq * np.cos(self.yaw_freq * t),
        ])

    def accel_meas(self, t, bias=np.zeros(3)):
        return self.rot(t).T @ (self.acc(t) - GRAVITY) + bias


def _integrate(traj, T, dt, bg=np.zeros(3), ba=np.zeros(3), seed=None, ng=0.0, na=0.0):
    """Feed midpoint-sampled measurements (+ optional bias / noise) to a
    fresh zero-bias preintegrator."""
    pre = ImuPreintegrator(ImuParams())
    rng = np.random.default_rng(seed) if seed is not None else None
    t = 0.0
    while t < T - 1e-12:
        tm = t + 0.5 * dt  # midpoint sampling: O(dt^2) global error
        g = traj.gyro(tm) + bg
        a = traj.accel_meas(tm, ba)
        if rng is not None:
            g = g + rng.normal(0, ng, 3)
            a = a + rng.normal(0, na, 3)
        pre.integrate(g, a, dt)
        t += dt
    return pre


def _true_deltas(traj, T):
    R0 = traj.rot(0.0)
    dR = R0.T @ traj.rot(T)
    dv = R0.T @ (traj.vel(T) - traj.vel(0.0) - GRAVITY * T)
    dp = R0.T @ (
        traj.pos(T) - traj.pos(0.0) - traj.vel(0.0) * T - 0.5 * GRAVITY * T**2
    )
    return dR, dv, dp


def test_preintegration_matches_analytic_trajectory():
    traj = Circle()
    T, dt = 2.0, 5e-5
    pre = _integrate(traj, T, dt)
    dR, dv, dp = pre.corrected(np.zeros(3), np.zeros(3))
    dR_t, dv_t, dp_t = _true_deltas(traj, T)
    # the v/p updates use the interval-START rotation (the standard
    # discrete preintegration, same as GTSAM) -> O(omega*a*T*dt) error
    np.testing.assert_allclose(dR, dR_t, atol=1e-7)
    np.testing.assert_allclose(dv, dv_t, atol=1e-4)
    np.testing.assert_allclose(dp, dp_t, atol=1e-4)
    assert pre.num_samples == int(round(T / dt))
    np.testing.assert_allclose(pre.dt, T, atol=1e-9)


def test_bias_correction_first_order():
    """Preintegrate BIASED measurements at bias0 = 0; the first-order
    correction evaluated at the true bias must match reintegration AT
    the true bias to O(|b|^2)."""
    traj = Circle()
    T, dt = 1.5, 5e-4
    bg = np.array([2e-3, -1e-3, 3e-3])
    ba = np.array([-4e-3, 2e-3, 1e-3])
    pre0 = _integrate(traj, T, dt, bg=bg, ba=ba)  # integrated at b0 = 0
    dR_c, dv_c, dp_c = pre0.corrected(bg, ba)
    pre_true = ImuPreintegrator(ImuParams(), gyro_bias=bg, accel_bias=ba)
    t = 0.0
    while t < T - 1e-12:
        tm = t + 0.5 * dt
        pre_true.integrate(traj.gyro(tm) + bg, traj.accel_meas(tm, ba), dt)
        t += dt
    np.testing.assert_allclose(dR_c, pre_true.dR, atol=5e-5)
    np.testing.assert_allclose(dv_c, pre_true.dv, atol=5e-5)
    np.testing.assert_allclose(dp_c, pre_true.dp, atol=5e-5)


def test_covariance_psd_and_growth():
    traj = Circle()
    pre = ImuPreintegrator(ImuParams())
    traces = []
    t = 0.0
    dt = 1e-3
    for k in range(3000):
        pre.integrate(traj.gyro(t), traj.accel_meas(t), dt)
        t += dt
        if (k + 1) % 1000 == 0:
            ev = np.linalg.eigvalsh(pre.cov)
            assert ev.min() > -1e-18
            traces.append(np.trace(pre.cov))
    assert traces[0] < traces[1] < traces[2]
    # whitening really is a sqrt of the information
    S = pre.sqrt_information()
    np.testing.assert_allclose(
        S.T @ S @ pre.cov, np.eye(9), atol=1e-6
    )


def test_residual_zero_on_consistent_states():
    """States generated by the true trajectory + deltas from (noise-free)
    preintegration => whitened residual ~ 0; perturbations show up in
    the right block."""
    traj = Circle()
    T, dt = 1.0, 2e-4
    pre = _integrate(traj, T, dt)
    arr = pre.to_factor_arrays()

    def pack(t):
        from nonlinear_optimizer_for_slam_tpu.core.pose import np_rotmat_to_quat

        return (
            traj.pos(t),
            np_rotmat_to_quat(traj.rot(t)),
            traj.vel(t),
            np.zeros(6),
        )

    p0, q0, v0, b0 = pack(0.0)
    p1, q1, v1, b1 = pack(T)
    factors = PreintegratedImuFactor(
        jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
        jnp.asarray(arr["delta_q"])[None], jnp.asarray(arr["delta_v"])[None],
        jnp.asarray(arr["delta_p"])[None], jnp.asarray([arr["dt"]]),
        jnp.asarray(arr["dR_dbg"])[None], jnp.asarray(arr["dv_dbg"])[None],
        jnp.asarray(arr["dv_dba"])[None], jnp.asarray(arr["dp_dbg"])[None],
        jnp.asarray(arr["dp_dba"])[None], jnp.asarray(arr["sqrt_info"])[None],
        jnp.asarray(arr["bias0"])[None],
    )

    def res(p1_, v1_):
        return imu_residuals(
            jnp.asarray(np.stack([p0, p1_])),
            jnp.asarray(np.stack([q0, q1])),
            jnp.asarray(np.stack([v0, v1_])),
            jnp.asarray(np.stack([b0, b1])),
            factors,
            jnp.asarray(GRAVITY),
        )

    r0 = np.asarray(res(p1, v1))[0]
    # whitened by a very confident sqrt-info (tiny noise params), so
    # compare the UNWHITENED residual instead
    S = arr["sqrt_info"]
    unwhite = np.linalg.solve(S, r0)
    np.testing.assert_allclose(unwhite, 0.0, atol=1e-3)  # discretization

    r_dp = np.linalg.solve(S, np.asarray(res(p1 + [0.01, 0, 0], v1))[0])
    assert np.abs(r_dp[6:9]).max() > 1e-3  # position block moves
    np.testing.assert_allclose(r_dp[0:6], unwhite[0:6], atol=1e-8)


def test_inertial_graph_gps_ins_smoothing():
    """Full GPS-INS smoothing: noisy+biased IMU at 200 Hz between
    keyframes, GPS position priors, unknown constant bias. The smoother
    must beat dead reckoning by a large factor AND estimate the bias."""
    from nonlinear_optimizer_for_slam_tpu.core import Options
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose, np_rotmat_to_quat
    from nonlinear_optimizer_for_slam_tpu.solvers.inertial import (
        InertialGraphOptimizer,
    )

    traj = Circle(rho=3.0, omega=0.6, yaw_amp=0.7)
    # 1 kHz IMU: at coarser rates the PREINTEGRATION DISCRETIZATION
    # error is systematic and the MAP absorbs it into the bias states
    # (measured: bg_z off by 10x at 200 Hz, exact at 1 kHz) — a real
    # effect worth knowing about, not a solver artifact
    T_total, kf_dt, imu_dt = 8.0, 0.5, 0.001
    n_kf = int(T_total / kf_dt) + 1
    bg_true = np.array([2e-3, -1e-3, 3e-3])
    ba_true = np.array([3e-2, -2e-2, 1e-2])
    params = ImuParams(gyro_noise=1e-4, accel_noise=1e-3)
    rng = np.random.default_rng(0)
    sg = params.gyro_noise / np.sqrt(imu_dt)
    sa = params.accel_noise / np.sqrt(imu_dt)

    # preintegrate each keyframe interval at bias0 = 0 (bias unknown)
    pres = []
    for k in range(n_kf - 1):
        pre = ImuPreintegrator(params)
        t = k * kf_dt
        while t < (k + 1) * kf_dt - 1e-9:
            tm = t + 0.5 * imu_dt
            pre.integrate(
                traj.gyro(tm) + bg_true + rng.normal(0, sg, 3),
                traj.accel_meas(tm, ba_true) + rng.normal(0, sa, 3),
                imu_dt,
            )
            t += imu_dt
        pres.append(pre)

    # dead-reckoned initialization from the true initial state
    opt = InertialGraphOptimizer()
    R = traj.rot(0.0)
    p = traj.pos(0.0)
    v = traj.vel(0.0)
    opt.add_state(0, Pose(R, p), velocity=v)
    dead_err = []
    for k, pre in enumerate(pres):
        dR, dv, dp = pre.corrected(np.zeros(3), np.zeros(3))
        p = p + v * pre.dt + 0.5 * GRAVITY * pre.dt**2 + R @ dp
        v = v + GRAVITY * pre.dt + R @ dv
        R = R @ dR
        opt.add_state(k + 1, Pose(R, p), velocity=v)
        dead_err.append(np.linalg.norm(p - traj.pos((k + 1) * kf_dt)))
    dead_final = dead_err[-1]

    opt.set_state_constant(0)  # pose only: bias/velocity stay FREE
    gps_sigma = 0.05
    for k in range(n_kf):
        z = traj.pos(k * kf_dt) + rng.normal(0, gps_sigma, 3)
        opt.add_position_prior(k, z, sqrt_info=1.0 / gps_sigma)
    for k, pre in enumerate(pres):
        opt.add_imu_factor(k, k + 1, pre)
        opt.add_bias_walk(k, k + 1, sqrt_info=(1e4, 1e3))  # near-constant bias
    opt.add_bias_prior(0, np.zeros(6), sqrt_info=(10.0))  # weak zero prior

    summary = opt.solve(Options().replace(max_iterations=100))
    assert bool(summary.converged) or int(summary.iterations) > 10

    errs = [
        np.linalg.norm(opt.get_pose(k).translation - traj.pos(k * kf_dt))
        for k in range(n_kf)
    ]
    # dead reckoning with the biased IMU drifts far; smoothing pins it
    assert dead_final > 1.0, dead_final
    assert max(errs) < 0.1, (max(errs), dead_final)

    # bias recovered (tolerances cover the GPS noise draw + residual
    # discretization; the yaw_amp excitation makes these identifiable)
    _, v_est, b_est = opt.get_state(n_kf // 2)
    np.testing.assert_allclose(b_est[:3], bg_true, atol=2e-3)
    np.testing.assert_allclose(b_est[3:], ba_true, atol=1.5e-2)
    np.testing.assert_allclose(
        v_est, traj.vel((n_kf // 2) * kf_dt), atol=0.05
    )


def test_bias_walk_sqrt_info_and_empty_factor_guard():
    from nonlinear_optimizer_for_slam_tpu.ops.imu import bias_walk_sqrt_info

    params = ImuParams(gyro_bias_walk=1e-4, accel_bias_walk=1e-2)
    w = bias_walk_sqrt_info(params, dt=0.25)
    np.testing.assert_allclose(w[:3], 1.0 / (1e-4 * 0.5))
    np.testing.assert_allclose(w[3:], 1.0 / (1e-2 * 0.5))
    with pytest.raises(ValueError, match="positive"):
        bias_walk_sqrt_info(params, 0.0)
    # empty preintegrator cannot become a factor (it would rigid-weld
    # its two states against the covariance floor)
    with pytest.raises(ValueError, match="no samples"):
        ImuPreintegrator(ImuParams()).to_factor_arrays()


def test_gravity_parameter():
    """NED gravity: same straight-line problem as the ENU drive but with
    g = (0, 0, +9.81) and specific force flipped; the solve must land on
    the same trajectory (a hardcoded-gravity bug would send z flying)."""
    from nonlinear_optimizer_for_slam_tpu.core import Options
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
    from nonlinear_optimizer_for_slam_tpu.solvers.inertial import (
        InertialGraphOptimizer,
    )

    g_ned = np.array([0.0, 0.0, 9.81])
    opt = InertialGraphOptimizer(gravity=g_ned)
    v = np.array([1.0, 0.0, 0.0])
    for k in range(3):
        opt.add_state(k, Pose(np.eye(3), v * 0.5 * k), velocity=v)
    for k in range(2):
        pre = ImuPreintegrator(ImuParams())
        for _ in range(100):
            pre.integrate(np.zeros(3), -g_ned, 0.005)
        opt.add_imu_factor(k, k + 1, pre)
        opt.add_bias_walk(k, k + 1, 1e3)
    opt.set_state_constant(0)
    opt.add_position_prior(2, np.array([1.0, 0.0, 0.0]), 100.0)
    s = opt.solve(Options().replace(max_iterations=50))
    assert bool(s.converged)
    np.testing.assert_allclose(
        opt.get_pose(2).translation, [1.0, 0.0, 0.0], atol=1e-3
    )


def _gps_ins_problem(rng_seed=0):
    """Shared GPS-INS fixture for the batch-vs-fixed-lag tests."""
    traj = Circle(rho=3.0, omega=0.6, yaw_amp=0.7)
    T_total, kf_dt, imu_dt = 6.0, 0.5, 0.002
    n_kf = int(T_total / kf_dt) + 1
    bg_true = np.array([2e-3, -1e-3, 3e-3])
    ba_true = np.array([2e-2, -1e-2, 1e-2])
    params = ImuParams(gyro_noise=1e-4, accel_noise=1e-3)
    rng = np.random.default_rng(rng_seed)
    sg = params.gyro_noise / np.sqrt(imu_dt)
    sa = params.accel_noise / np.sqrt(imu_dt)
    pres, gps = [], []
    for k in range(n_kf - 1):
        pre = ImuPreintegrator(params)
        t = k * kf_dt
        while t < (k + 1) * kf_dt - 1e-9:
            tm = t + 0.5 * imu_dt
            pre.integrate(
                traj.gyro(tm) + bg_true + rng.normal(0, sg, 3),
                traj.accel_meas(tm, ba_true) + rng.normal(0, sa, 3),
                imu_dt,
            )
            t += imu_dt
        pres.append(pre)
    for k in range(n_kf):
        gps.append(traj.pos(k * kf_dt) + rng.normal(0, 0.05, 3))
    return traj, kf_dt, n_kf, pres, gps


def _feed_smoother(sm, traj, kf_dt, n_kf, pres, gps):
    from nonlinear_optimizer_for_slam_tpu.core import Options
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose

    deep = Options().replace(max_iterations=200)
    R, p, v = traj.rot(0.0), traj.pos(0.0), traj.vel(0.0)
    sm.add_state(0, Pose(R, p), velocity=v)
    sm.add_position_prior(0, gps[0], 20.0)
    sm.add_bias_prior(0, np.zeros(6), 10.0)
    sm.update(deep)
    for k, pre in enumerate(pres):
        dR, dv, dp = pre.corrected(np.zeros(3), np.zeros(3))
        p = p + v * pre.dt + 0.5 * GRAVITY * pre.dt**2 + R @ dp
        v = v + GRAVITY * pre.dt + R @ dv
        R = R @ dR
        sm.add_state(k + 1, Pose(R, p), velocity=v)
        sm.add_imu_factor(k, k + 1, pre)
        sm.add_bias_walk(k, k + 1, (1e4, 1e3))
        sm.add_position_prior(k + 1, gps[k + 1], 20.0)
        s = sm.update(deep)
        # feed-forward: next prediction starts from the smoothed state
        pose_k, v, _ = sm.get_state(k + 1)
        R, p = pose_k.rotation, pose_k.translation
    return s


def test_fixed_lag_inertial_no_marginalization_matches_batch():
    """lag >= N: the smoother's last update IS the batch problem — the
    optima must agree tightly."""
    from nonlinear_optimizer_for_slam_tpu.core import Options
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
    from nonlinear_optimizer_for_slam_tpu.solvers.inertial import (
        FixedLagInertialSmoother,
        InertialGraphOptimizer,
    )

    traj, kf_dt, n_kf, pres, gps = _gps_ins_problem()
    sm = FixedLagInertialSmoother(lag=100)
    _feed_smoother(sm, traj, kf_dt, n_kf, pres, gps)
    assert sm.window == list(range(n_kf))

    batch = InertialGraphOptimizer()
    R, p, v = traj.rot(0.0), traj.pos(0.0), traj.vel(0.0)
    batch.add_state(0, Pose(R, p), velocity=v)
    for k, pre in enumerate(pres):
        dR, dv, dp = pre.corrected(np.zeros(3), np.zeros(3))
        p = p + v * pre.dt + 0.5 * GRAVITY * pre.dt**2 + R @ dp
        v = v + GRAVITY * pre.dt + R @ dv
        R = R @ dR
        batch.add_state(k + 1, Pose(R, p), velocity=v)
        batch.add_imu_factor(k, k + 1, pre)
        batch.add_bias_walk(k, k + 1, (1e4, 1e3))
    batch.set_state_constant(0)
    for k in range(n_kf):
        batch.add_position_prior(k, gps[k], 20.0)
    batch.add_bias_prior(0, np.zeros(6), 10.0)
    batch.solve(Options().replace(max_iterations=200))

    # NOTE the smoother's gauge is its first update's state-0 pose
    # (identical to the batch gauge: same init, frozen before moving)
    for k in range(n_kf):
        np.testing.assert_allclose(
            sm.get_pose(k).translation, batch.get_pose(k).translation,
            atol=2e-4,
        )
        np.testing.assert_allclose(
            sm.get_state(k)[1], batch.get_state(k)[1], atol=5e-3
        )


def test_fixed_lag_inertial_marginalization_tracks_batch():
    """Finite lag: marginalization only adds linearization error — the
    online estimates must stay close to the full batch MAP, old states
    freeze, and the window stays bounded."""
    from nonlinear_optimizer_for_slam_tpu.core import Options
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
    from nonlinear_optimizer_for_slam_tpu.solvers.inertial import (
        FixedLagInertialSmoother,
        InertialGraphOptimizer,
    )

    traj, kf_dt, n_kf, pres, gps = _gps_ins_problem()
    sm = FixedLagInertialSmoother(lag=5)
    _feed_smoother(sm, traj, kf_dt, n_kf, pres, gps)
    assert len(sm.window) == 5
    frozen = sm.get_pose(2).translation.copy()

    batch = InertialGraphOptimizer()
    R, p, v = traj.rot(0.0), traj.pos(0.0), traj.vel(0.0)
    batch.add_state(0, Pose(R, p), velocity=v)
    for k, pre in enumerate(pres):
        dR, dv, dp = pre.corrected(np.zeros(3), np.zeros(3))
        p = p + v * pre.dt + 0.5 * GRAVITY * pre.dt**2 + R @ dp
        v = v + GRAVITY * pre.dt + R @ dv
        R = R @ dR
        batch.add_state(k + 1, Pose(R, p), velocity=v)
        batch.add_imu_factor(k, k + 1, pre)
        batch.add_bias_walk(k, k + 1, (1e4, 1e3))
    batch.set_state_constant(0)
    for k in range(n_kf):
        batch.add_position_prior(k, gps[k], 20.0)
    batch.add_bias_prior(0, np.zeros(6), 10.0)
    batch.solve(Options().replace(max_iterations=200))

    # window states close to the batch MAP
    for k in sm.window:
        d = np.linalg.norm(
            sm.get_pose(k).translation - batch.get_pose(k).translation
        )
        assert d < 0.02, (k, d)
    # bias tracked through marginalization too
    np.testing.assert_allclose(
        sm.get_state(sm.window[-1])[2], batch.get_state(n_kf - 1)[2],
        atol=5e-3,
    )
    # marginalized states are frozen
    np.testing.assert_array_equal(sm.get_pose(2).translation, frozen)
    # and the trajectory is good in absolute terms
    errs = [
        np.linalg.norm(sm.get_pose(k).translation - traj.pos(k * kf_dt))
        for k in range(n_kf)
    ]
    assert max(errs) < 0.12, max(errs)


def test_inertial_graph_pose_edges_fuse_with_imu():
    """Vision/lidar odometry edges (set_constraint) sharpen the IMU-only
    solution: with a few noisy GPS fixes plus exact relative-pose edges,
    the fused trajectory beats the no-edge solve."""
    from nonlinear_optimizer_for_slam_tpu.core import Options
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
    from nonlinear_optimizer_for_slam_tpu.solvers.inertial import (
        InertialGraphOptimizer,
    )

    traj = Circle(rho=3.0, omega=0.6, yaw_amp=0.5)
    kf_dt, imu_dt, n_kf = 0.5, 0.002, 9
    params = ImuParams(gyro_noise=1e-4, accel_noise=1e-3)
    rng = np.random.default_rng(4)
    sg = params.gyro_noise / np.sqrt(imu_dt)
    sa = params.accel_noise / np.sqrt(imu_dt)

    def kf_pose(t):
        return Pose(traj.rot(t), traj.pos(t))

    def build(with_edges):
        opt = InertialGraphOptimizer()
        r = np.random.default_rng(4)
        for k in range(n_kf):
            t = k * kf_dt
            opt.add_state(
                k,
                Pose(traj.rot(t), traj.pos(t) + (r.normal(0, 0.1, 3) if k else 0.0)),
                velocity=traj.vel(t),
            )
        opt.set_state_constant(0)
        for k in range(n_kf - 1):
            pre = ImuPreintegrator(params)
            t = k * kf_dt
            while t < (k + 1) * kf_dt - 1e-9:
                tm = t + 0.5 * imu_dt
                pre.integrate(
                    traj.gyro(tm) + r.normal(0, sg, 3),
                    traj.accel_meas(tm) + r.normal(0, sa, 3),
                    imu_dt,
                )
                t += imu_dt
            opt.add_imu_factor(k, k + 1, pre)
            opt.add_bias_walk(k, k + 1, 1e4)
            if with_edges:
                rel = kf_pose(k * kf_dt).inverse() * kf_pose((k + 1) * kf_dt)
                opt.set_constraint(k, k + 1, rel, sqrt_info=(100.0, 100.0))
        # sparse, noisy GPS (every 4th keyframe)
        for k in range(0, n_kf, 4):
            opt.add_position_prior(k, traj.pos(k * kf_dt) + r.normal(0, 0.2, 3), 5.0)
        opt.add_bias_prior(0, np.zeros(6), 10.0)
        opt.solve(Options().replace(max_iterations=150))
        return max(
            np.linalg.norm(opt.get_pose(k).translation - traj.pos(k * kf_dt))
            for k in range(n_kf)
        )

    err_no = build(False)
    err_with = build(True)
    assert err_with < 0.03, err_with  # exact strong edges pin the chain
    assert err_with < 0.5 * err_no, (err_with, err_no)
