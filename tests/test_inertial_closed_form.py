"""Closed-form IMU-factor Jacobians and the block-assembled inertial
solve vs their autodiff oracles.

Round 2 built the inertial stack on ONE jacfwd over the flattened
(N, 16) window state (16N JVP columns of the whole residual stack);
round 3 moves production to closed-form per-factor Jacobians
(ops/imu.py imu_residuals_and_jacobians, the same optimization the pose
graph got) with scatter-assembled normal equations. These tests pin the
two formulations to each other:

- the closed-form (r, J_i, J_j) against per-factor jacfwd
  (imu_residuals_and_jacobians_ad), on deliberately NON-unit ambient
  quaternions (the solver's parametrization drifts off the sphere);
- a full solve through every factor family (IMU + bias walks + odometry
  edges + GPS/vel/bias priors) against the retained full-stack jacfwd
  solver (_inertial_solve_ad);
- a fixed-lag smoother run (exercising the marginal-prior closed form)
  against the same oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.ops import imu as imu_mod
from nonlinear_optimizer_for_slam_tpu.ops.imu import (
    GRAVITY,
    ImuParams,
    ImuPreintegrator,
)
from nonlinear_optimizer_for_slam_tpu.solvers import inertial as inertial_mod
from nonlinear_optimizer_for_slam_tpu.solvers.inertial import (
    FixedLagInertialSmoother,
    InertialGraphOptimizer,
    _pack_imu_factors,
)


def _random_factors(rng, n_states):
    params = ImuParams()
    factors = []
    for k in range(n_states - 1):
        pre = ImuPreintegrator(
            params, 0.01 * rng.normal(size=3), 0.05 * rng.normal(size=3)
        )
        for _ in range(20):
            pre.integrate(
                0.3 * rng.normal(size=3),
                np.array([0.0, 0.0, 9.81]) + 0.5 * rng.normal(size=3),
                0.005,
            )
        factors.append(dict(i=k, j=k + 1, **pre.to_factor_arrays()))
    return factors


def test_imu_jacobians_match_autodiff():
    rng = np.random.default_rng(1)
    N = 6
    fac = _pack_imu_factors(
        _random_factors(rng, N), {k: k for k in range(N)}, jnp.float64
    )
    p = jnp.asarray(rng.normal(size=(N, 3)))
    q = jnp.asarray(rng.normal(size=(N, 4)))  # non-unit ambient
    v = jnp.asarray(0.3 * rng.normal(size=(N, 3)))
    b = jnp.asarray(0.02 * rng.normal(size=(N, 6)))
    g = jnp.asarray(GRAVITY)

    r_cf, Ji_cf, Jj_cf = imu_mod.imu_residuals_and_jacobians(p, q, v, b, fac, g)
    r_ad, Ji_ad, Jj_ad = imu_mod.imu_residuals_and_jacobians_ad(p, q, v, b, fac, g)
    r_ref = imu_mod.imu_residuals(p, q, v, b, fac, g)
    np.testing.assert_allclose(np.asarray(r_cf), np.asarray(r_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_cf), np.asarray(r_ad), atol=1e-12)
    # whitened rows reach ~1e3 magnitude (tight preintegration sigmas);
    # 1e-9 absolute is ~1e-12 relative
    np.testing.assert_allclose(np.asarray(Ji_cf), np.asarray(Ji_ad), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Jj_cf), np.asarray(Jj_ad), atol=1e-8)
    # x_j's bias never enters the residual
    assert np.abs(np.asarray(Jj_cf)[:, :, 10:]).max() == 0.0


def test_imu_jacobians_small_angle_branch():
    """Identity-adjacent states + zero bias deviation push the Exp/Log
    chains through their 1e-6 small-angle branches."""
    rng = np.random.default_rng(3)
    N = 3
    facs = _random_factors(rng, N)
    fac = _pack_imu_factors(facs, {k: k for k in range(N)}, jnp.float64)
    # states placed exactly at the preintegrated prediction from
    # identity: rotation error ~ 0 -> Log near the small branch; bias at
    # bias0 -> Exp(0) exactly on the small branch
    p = jnp.zeros((N, 3), jnp.float64)
    q = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N, 1))
    v = jnp.zeros((N, 3), jnp.float64)
    b = jnp.asarray(np.stack([f["bias0"] for f in facs] + [facs[-1]["bias0"]]))
    g = jnp.asarray(GRAVITY)
    r_cf, Ji_cf, Jj_cf = imu_mod.imu_residuals_and_jacobians(p, q, v, b, fac, g)
    r_ad, Ji_ad, Jj_ad = imu_mod.imu_residuals_and_jacobians_ad(p, q, v, b, fac, g)
    np.testing.assert_allclose(np.asarray(Ji_cf), np.asarray(Ji_ad), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Jj_cf), np.asarray(Jj_ad), atol=1e-8)


def _gps_ins_fixture(rng, n_kf=8):
    """Small GPS-INS graph exercising IMU + walk + edge + all priors."""
    opt = InertialGraphOptimizer()
    params = ImuParams(gyro_noise=1e-4, accel_noise=1e-3)
    vel = np.array([1.0, 0.2, 0.0])
    for k in range(n_kf):
        p = vel * 0.5 * k + 0.02 * rng.normal(size=3)
        opt.add_state(k, Pose(np.eye(3), p), velocity=vel + 0.05 * rng.normal(size=3))
    opt.set_state_constant(0)
    for k in range(n_kf - 1):
        pre = ImuPreintegrator(params)
        for _ in range(100):
            pre.integrate(
                1e-4 * rng.normal(size=3),
                -GRAVITY + 1e-3 * rng.normal(size=3),
                0.005,
            )
        opt.add_imu_factor(k, k + 1, pre)
        opt.add_bias_walk(k, k + 1, (1e4, 1e3))
        opt.set_constraint(
            k, k + 1, Pose(np.eye(3), vel * 0.5), sqrt_info=np.full(6, 10.0)
        )
    for k in range(n_kf):
        opt.add_position_prior(k, vel * 0.5 * k, sqrt_info=20.0)
    opt.add_velocity_prior(0, vel, sqrt_info=10.0)
    opt.add_bias_prior(0, np.zeros(6), sqrt_info=10.0)
    return opt


def test_inertial_solve_matches_ad_oracle(monkeypatch):
    rng = np.random.default_rng(7)
    opts = Options().replace(max_iterations=60)

    opt_cf = _gps_ins_fixture(np.random.default_rng(7))
    s_cf = opt_cf.solve(opts)

    monkeypatch.setattr(inertial_mod, "_inertial_solve",
                        inertial_mod._inertial_solve_ad)
    opt_ad = _gps_ins_fixture(np.random.default_rng(7))
    s_ad = opt_ad.solve(opts)

    np.testing.assert_allclose(
        float(s_cf.final_cost), float(s_ad.final_cost), rtol=1e-9, atol=1e-12
    )
    for k in range(opt_cf.num_states):
        p_cf, v_cf, b_cf = opt_cf.get_state(k)
        p_ad, v_ad, b_ad = opt_ad.get_state(k)
        np.testing.assert_allclose(p_cf.translation, p_ad.translation, atol=1e-8)
        np.testing.assert_allclose(p_cf.rotation, p_ad.rotation, atol=1e-8)
        np.testing.assert_allclose(v_cf, v_ad, atol=1e-8)
        np.testing.assert_allclose(b_cf, b_ad, atol=1e-8)


def _run_smoother(lag=4, n_kf=9):
    rng = np.random.default_rng(11)
    params = ImuParams(gyro_noise=1e-4, accel_noise=1e-3)
    sm = FixedLagInertialSmoother(lag=lag)
    vel = np.array([1.0, 0.0, 0.1])
    sm.add_state(0, Pose(np.eye(3), np.zeros(3)), velocity=vel)
    sm.add_position_prior(0, np.zeros(3), 20.0)
    for k in range(1, n_kf):
        pre = ImuPreintegrator(params)
        for _ in range(100):
            pre.integrate(
                1e-4 * rng.normal(size=3),
                -GRAVITY + 1e-3 * rng.normal(size=3),
                0.005,
            )
        sm.add_state(
            k, Pose(np.eye(3), vel * 0.5 * k + 0.01 * rng.normal(size=3)),
            velocity=vel,
        )
        sm.add_imu_factor(k - 1, k, pre)
        sm.add_bias_walk(k - 1, k, (1e4, 1e3))
        sm.add_position_prior(k, vel * 0.5 * k, 20.0)
        sm.update()
    return sm


def test_fixed_lag_smoother_matches_ad_oracle(monkeypatch):
    """Marginal-prior (mprior) closed form: run the whole sliding-window
    sequence under both solvers and compare the final window states."""
    sm_cf = _run_smoother()
    monkeypatch.setattr(inertial_mod, "_inertial_solve",
                        inertial_mod._inertial_solve_ad)
    sm_ad = _run_smoother()
    assert sm_cf.window == sm_ad.window
    # tolerances reflect ACCUMULATION: each update's solve differs by
    # float reassociation, and the next marginalization linearizes at
    # the slightly different point — measured drift ~1e-6 after 5
    # marginalizations, far below the prior's own linearization error
    for k in sm_cf.window:
        p_cf, v_cf, b_cf = sm_cf.get_state(k)
        p_ad, v_ad, b_ad = sm_ad.get_state(k)
        np.testing.assert_allclose(p_cf.translation, p_ad.translation, atol=1e-5)
        np.testing.assert_allclose(v_cf, v_ad, atol=1e-5)
        np.testing.assert_allclose(b_cf, b_ad, atol=1e-5)


def test_inertial_update_async_matches_blocking():
    """Round-5 async streaming on the inertial smoother: with the
    default marginalize_every=1 the same jitted program runs on the
    same inputs, so the streamed states must equal the blocking
    stream's bit-for-bit; amortized mode (N=3) must track closely."""

    def run(me, use_async):
        rng = np.random.default_rng(11)
        params = ImuParams(gyro_noise=1e-4, accel_noise=1e-3)
        sm = FixedLagInertialSmoother(lag=4, marginalize_every=me)
        vel = np.array([1.0, 0.0, 0.1])
        sm.add_state(0, Pose(np.eye(3), np.zeros(3)), velocity=vel)
        sm.add_position_prior(0, np.zeros(3), 20.0)
        for k in range(1, 9):
            pre = ImuPreintegrator(params)
            for _ in range(100):
                pre.integrate(
                    1e-4 * rng.normal(size=3),
                    -GRAVITY + 1e-3 * rng.normal(size=3),
                    0.005,
                )
            sm.add_state(
                k, Pose(np.eye(3), vel * 0.5 * k + 0.01 * rng.normal(size=3)),
                velocity=vel,
            )
            sm.add_imu_factor(k - 1, k, pre)
            sm.add_bias_walk(k - 1, k, (1e4, 1e3))
            sm.add_position_prior(k, vel * 0.5 * k, 20.0)
            if use_async:
                sm.update_async()
            else:
                sm.update()
        sm.flush()
        return sm

    blocking = run(1, False)
    streamed = run(1, True)
    assert streamed.window == blocking.window
    for k in streamed.window:
        p_b, v_b, b_b = blocking.get_state(k)
        p_s, v_s, b_s = streamed.get_state(k)
        np.testing.assert_array_equal(p_s.translation, p_b.translation)
        np.testing.assert_array_equal(v_s, v_b)
        np.testing.assert_array_equal(b_s, b_b)
    amortized = run(3, True)
    for k in amortized.window:
        p_b, _, _ = blocking.get_state(k)
        p_a, _, _ = amortized.get_state(k)
        np.testing.assert_allclose(p_a.translation, p_b.translation, atol=1e-3)
