"""Native (C++) host-runtime parity tests vs the numpy oracle.

Parity caveat, inherited from the reference: sqrt_information is the
quirky row-scaled S = D^{-1/2} V (simple_optimization_test.cc:275), which
makes S^T S depend on the arbitrary eigenbasis whenever the covariance
spectrum is degenerate (every flat wall/floor voxel has a repeated
in-plane eigenvalue). Exact matrix parity is therefore only required on
voxels with well-separated eigenvalues; on all voxels the invariants
(means, counts, validity, information eigenvalues = floored 1/lambda)
must agree, and end-to-end registration must land on the same pose.
"""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu import native
from nonlinear_optimizer_for_slam_tpu.pipelines import ndt
from nonlinear_optimizer_for_slam_tpu.utils import testing

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _match_order(m_a, m_b, resolution=1.0):
    ka = [tuple(np.floor(mu / resolution).astype(int)) for mu in m_a.means]
    kb = [tuple(np.floor(mu / resolution).astype(int)) for mu in m_b.means]
    assert set(ka) == set(kb)
    bi = {k: i for i, k in enumerate(kb)}
    order = np.array([bi[k] for k in ka])
    return order


def test_filter_points_exact(rng):
    pts = rng.uniform(-5, 5, size=(20000, 3))
    f_np = ndt.filter_points(pts, 0.3)
    f_nat = native.filter_points(pts, 0.3)
    np.testing.assert_allclose(f_nat, f_np)


def test_ndt_map_invariants_random_cloud(rng):
    pts = rng.uniform(-4, 4, size=(50000, 3))
    m_np = ndt.build_ndt_map(pts, 1.0)
    m_nat = native.build_ndt_map(pts, 1.0)
    order = _match_order(m_np, m_nat)
    np.testing.assert_allclose(m_nat.means[order], m_np.means, atol=1e-10)
    np.testing.assert_array_equal(m_nat.counts[order], m_np.counts)
    np.testing.assert_array_equal(m_nat.valid[order], m_np.valid)
    # information eigenvalues are the floored 1/lambda — basis-invariant
    e_np = np.sort(np.linalg.eigvalsh(m_np.informations), axis=1)
    e_nat = np.sort(np.linalg.eigvalsh(m_nat.informations[order]), axis=1)
    np.testing.assert_allclose(e_nat, e_np, rtol=1e-8)


def test_ndt_map_exact_on_nondegenerate_voxels(rng):
    # anisotropic cloud -> well-separated eigenvalues in every voxel
    base = rng.normal(size=(40000, 3)) * np.array([0.45, 0.25, 0.1])
    offsets = rng.integers(-3, 3, size=(40000, 3)).astype(float)
    pts = base + offsets + 0.5
    m_np = ndt.build_ndt_map(pts, 1.0)
    m_nat = native.build_ndt_map(pts, 1.0)
    order = _match_order(m_np, m_nat)

    covs_sep = []
    for i in range(m_np.num_voxels):
        ev = np.linalg.eigvalsh(np.linalg.inv(m_np.informations[i]))
        gaps = np.diff(np.sort(ev))
        covs_sep.append(np.min(gaps / np.max(ev)) > 1e-3)
    covs_sep = np.array(covs_sep)
    assert covs_sep.sum() > 0
    np.testing.assert_allclose(
        m_nat.informations[order][covs_sep],
        m_np.informations[covs_sep],
        rtol=1e-6,
        atol=1e-8,
    )


def test_room_world_registration_with_native_map():
    """End-to-end: the native-built map drives registration to the same
    pose as the numpy-built map (the degenerate-basis freedom does not
    change the optimum meaningfully)."""
    import jax.numpy as jnp

    import nonlinear_optimizer_for_slam_tpu as nls
    from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
    from nonlinear_optimizer_for_slam_tpu.pipelines import registration

    pts = testing.generate_room_points(point_step=0.02)
    true_pose = testing.maha_true_pose()
    local = native.filter_points(pts, 0.1)
    local = true_pose.inverse().apply(local)

    m_nat = native.build_ndt_map(pts, 1.0)
    minimizer = nls.MahalanobisDistanceMinimizer().set_loss_function(
        ExponentialLoss()
    )
    res = registration.register_ndt(
        m_nat, local, nls.Pose.identity(), minimizer, Options()
    )
    t_err = np.linalg.norm(res.pose.translation - true_pose.translation)
    assert t_err < 0.03, t_err


def test_native_speedup():
    """The native builder must beat numpy substantially (it is the
    reference's performance-motivated C++ component)."""
    import time

    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, size=(500000, 3))
    t0 = time.perf_counter()
    ndt.build_ndt_map(pts, 1.0)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    native.build_ndt_map(pts, 1.0)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_np, (t_nat, t_np)


def test_match_and_pack_parity_with_device_matching(rng):
    """Native matcher output == on-device matching + packing, on active
    (unmasked) lanes; masks identical."""
    import jax.numpy as jnp

    from nonlinear_optimizer_for_slam_tpu.ops import pallas_kernels as pk
    from nonlinear_optimizer_for_slam_tpu.pipelines import matching

    M, N = 96, 1000
    means = rng.uniform(-4, 4, (M, 3))
    S = rng.normal(size=(M, 3, 3))
    pts = rng.uniform(-4, 4, (N, 3))
    R = np.eye(3)
    t = np.array([0.1, -0.2, 0.3])
    packed_nat = native.match_and_pack(pts, R, t, means, S, 1.5, 2, 4096)
    data = matching.match_point_cloud(
        jnp.asarray(means, jnp.float32),
        jnp.asarray(S, jnp.float32),
        jnp.asarray(pts, jnp.float32),
        jnp.ones(N, jnp.float32),
        jnp.asarray(R, jnp.float32),
        jnp.asarray(t, jnp.float32),
        search_radius=1.5,
        num_neighbors=2,
    )
    # pack_maha6 returns the (16, lanes // 128, 128) plane form; flatten
    # back to (16, lanes) rows for comparison with the native buffer
    packed_dev = np.asarray(pk.pack_maha6(data)).reshape(16, -1)
    np.testing.assert_array_equal(packed_nat[15], packed_dev[15])
    both = packed_nat[15] > 0
    np.testing.assert_allclose(
        packed_nat[:, both], packed_dev[:, both], atol=1e-6
    )


def test_hybrid_registrar_matches_fused():
    """Host-matching hybrid pipeline lands on the same pose as the fully
    fused device pipeline."""
    import jax.numpy as jnp

    import nonlinear_optimizer_for_slam_tpu as nls
    from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
    from nonlinear_optimizer_for_slam_tpu.pipelines import fused_registration

    pts = testing.generate_room_points(point_step=0.02)
    ndt_map = native.build_ndt_map(pts, 1.0)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(native.filter_points(pts, 0.1))
    opts = Options()
    loss = ExponentialLoss()

    fused = fused_registration.NdtRegistrar(ndt_map, opts, loss).register(
        local, nls.Pose.identity()
    )
    hybrid = fused_registration.HybridRegistrar(ndt_map, opts, loss).register(
        local, nls.Pose.identity()
    )
    np.testing.assert_allclose(
        hybrid.pose.translation, fused.pose.translation, atol=1e-4
    )
    np.testing.assert_allclose(hybrid.pose.rotation, fused.pose.rotation, atol=1e-4)
    t_err = np.linalg.norm(hybrid.pose.translation - true_pose.translation)
    assert t_err < 0.03, t_err


def test_ndt_map_identity_moment_flag(rng):
    """identity_moment=False (unbiased build for p2p/D2D plane extraction)
    is BIT-exact with the numpy twin in serial mode, and the two modes
    differ by exactly the reference's +I/count covariance offset."""
    pts = rng.uniform(-4, 4, size=(30000, 3))
    m_np = ndt.build_ndt_map(pts, 1.0, identity_moment=False)
    m_nat = native.build_ndt_map(pts, 1.0, identity_moment=False, num_threads=1)
    order = _match_order(m_np, m_nat)
    np.testing.assert_allclose(m_nat.means[order], m_np.means, rtol=0, atol=0)
    np.testing.assert_array_equal(m_nat.counts[order], m_np.counts)
    np.testing.assert_allclose(
        m_nat.sqrt_informations[order], m_np.sqrt_informations, rtol=0, atol=0
    )

    # quirked minus unquirked covariance == I / count, per voxel
    m_q = ndt.build_ndt_map(pts, 1.0, identity_moment=True)
    cov_q = ndt.voxel_covariances(m_q)
    cov_u = ndt.voxel_covariances(m_np)
    # compare on voxels whose eigenvalues are unfloored in both builds
    # (flooring breaks the clean +I/count relation)
    well = (m_np.counts >= 30) & m_np.valid
    sep = []
    for i in np.where(well)[0][:20]:
        d = cov_q[i] - cov_u[i]
        sep.append(np.allclose(d, np.eye(3) / m_np.counts[i], atol=1e-9))
    assert sep and all(sep)


def test_ndt_map_threaded_merge_keeps_quirk(rng):
    """Thread-partial merge must keep exactly ONE +I moment offset per
    voxel in the quirked build — including voxels absent from thread 0's
    partial (regression: emplace-vs-merge in nls_build_ndt_map)."""
    # two spatially separated clusters ordered so threads see disjoint
    # voxel sets
    a = rng.uniform(0.0, 2.0, size=(6000, 3))
    b = rng.uniform(10.0, 12.0, size=(6000, 3))
    pts = np.concatenate([a, b])  # thread chunks correlate with position
    m1 = native.build_ndt_map(pts, 1.0, num_threads=1)
    m4 = native.build_ndt_map(pts, 1.0, num_threads=4)
    order = _match_order(m1, m4)
    np.testing.assert_array_equal(m4.counts[order], m1.counts)
    # covariances agree to summation-reassociation tolerance; a lost +I
    # offset would show up as ~1/count ~ 1e-2
    c1 = ndt.voxel_covariances(m1)
    c4 = ndt.voxel_covariances(m4)[order]
    np.testing.assert_allclose(c4, c1, atol=1e-9)
