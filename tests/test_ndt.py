"""NDT map construction semantics (reference:
mahalanobis tests/simple_optimization_test.cc:236-294)."""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.pipelines import ndt


def test_voxel_partition_and_counts(rng):
    pts = np.concatenate(
        [
            rng.uniform(0.0, 0.99, size=(10, 3)),  # voxel (0,0,0)
            rng.uniform(1.01, 1.99, size=(7, 3)),  # voxel (1,1,1)
            np.array([[5.5, 5.5, 5.5]]),  # lone point, count 1
        ]
    )
    m = ndt.build_ndt_map(pts, 1.0)
    assert m.num_voxels == 3
    assert sorted(m.counts.tolist()) == [1, 7, 10]
    # count < 5 -> invalid (reference :250)
    lone = np.argmin(m.counts)
    assert not m.valid[lone]


def test_mean_and_validity():
    rng = np.random.default_rng(7)
    # a well-spread cluster inside one voxel (eigenvalues >= 0.01 after scaling)
    pts = 0.5 + 0.45 * rng.uniform(-1, 1, size=(500, 3))
    m = ndt.build_ndt_map(pts, 1.0)
    assert m.num_voxels == 1 and m.valid[0]
    np.testing.assert_allclose(m.means[0], pts.mean(axis=0), atol=1e-12)
    # sqrt_information^T sqrt_information == information
    S = m.sqrt_informations[0]
    np.testing.assert_allclose(S.T @ S, m.informations[0].T, atol=1e-9)


def test_eigenvalue_flooring_on_planar_voxel():
    """A planar cloud's smallest eigenvalue floors at 1% of the largest
    (reference :270-276), bounding the information anisotropy at 100x."""
    rng = np.random.default_rng(3)
    # 2000 points so the reference's +I/count moment-init offset
    # (types.h:14, reproduced in build_ndt_map) stays below the 1% floor:
    # the planar eigenvalue is 1/2000 = 5e-4 < 0.01 * lambda_max.
    xy = 0.45 * rng.uniform(-1, 1, size=(2000, 2))
    pts = np.concatenate([0.5 + xy, np.full((2000, 1), 0.5)], axis=1)
    m = ndt.build_ndt_map(pts, 1.0)
    assert m.valid[0]
    info_eigs = np.linalg.eigvalsh(m.informations[0])
    ratio = info_eigs.max() / info_eigs.min()
    np.testing.assert_allclose(ratio, 100.0, rtol=1e-6)


def test_small_max_eigenvalue_invalid():
    """lambda_max < 0.01 -> invalid voxel (reference :265)."""
    rng = np.random.default_rng(5)
    # 1000 points: the +I/count moment-init offset adds 1e-3 to every
    # eigenvalue (with 100 it would add exactly 0.01 and flip validity).
    pts = 0.5 + 0.01 * rng.uniform(-1, 1, size=(1000, 3))
    m = ndt.build_ndt_map(pts, 1.0)
    assert not m.valid[0]


def test_cantor_keys_match_integer_triples(rng):
    pts = rng.uniform(-10, 10, size=(1000, 3))
    keys = ndt.compute_voxel_keys(pts, 2.0)
    ijk = np.floor(pts * 2.0).astype(np.int64)
    # same-key iff same integer triple
    _, inv_k = np.unique(keys, return_inverse=True)
    _, inv_t = np.unique(ijk, axis=0, return_inverse=True)
    # partitions are identical up to relabeling
    mapping = {}
    for a, b in zip(inv_k.tolist(), inv_t.tolist()):
        assert mapping.setdefault(a, b) == b


def test_filter_points_keeps_first_per_voxel():
    pts = np.array(
        [
            [0.01, 0.01, 0.01],
            [0.02, 0.02, 0.02],  # same voxel as above -> dropped
            [0.95, 0.01, 0.01],  # different voxel at 0.5 res? no: key floor(p/0.5)
            [0.45, 0.45, 0.45],
        ]
    )
    out = ndt.filter_points(pts, 0.5)
    # voxel keys at res 0.5: (0,0,0), (0,0,0), (1,0,0), (0,0,0)
    np.testing.assert_allclose(out, pts[[0, 2]])


def test_accumulator_single_call_bit_exact():
    """One add_points over everything == the one-shot builder, bitwise
    (both quirk modes), including voxel row order."""
    from nonlinear_optimizer_for_slam_tpu.utils import testing

    pts = testing.generate_room_points(point_step=0.1)
    for quirk in (True, False):
        acc = ndt.NdtMapAccumulator(1.0, identity_moment=quirk)
        acc.add_points(pts)
        a = acc.to_map()
        b = ndt.build_ndt_map(pts, 1.0, identity_moment=quirk)
        np.testing.assert_array_equal(a.counts, b.counts)
        np.testing.assert_allclose(a.means, b.means, rtol=0, atol=0)
        np.testing.assert_allclose(
            a.sqrt_informations, b.sqrt_informations, rtol=0, atol=0
        )
        np.testing.assert_array_equal(a.valid, b.valid)


def test_accumulator_chunked_matches_one_shot():
    """Chunked scans agree with the one-shot build to float
    reassociation tolerance; the voxel partition exactly."""
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
    from nonlinear_optimizer_for_slam_tpu.utils import testing

    pts = testing.generate_room_points(point_step=0.1)
    acc = ndt.NdtMapAccumulator(1.0)
    third = len(pts) // 3
    acc.add_points(pts[:third])
    acc.add_points(pts[third : 2 * third])
    # feed the last chunk through the scan API (identity pose: the room
    # fixture's points sit exactly ON voxel boundaries, so a non-trivial
    # pose round-trip would legitimately re-bin them)
    acc.add_scan(pts[2 * third :], Pose.identity())
    a = acc.to_map()
    b = ndt.build_ndt_map(pts, 1.0)
    np.testing.assert_array_equal(a.counts, b.counts)
    np.testing.assert_allclose(a.means, b.means, atol=1e-9)
    # covariances (basis-invariant) agree; sqrt_informations may rotate
    # their eigenbasis on degenerate voxels under reassociation
    np.testing.assert_allclose(
        ndt.voxel_covariances(a), ndt.voxel_covariances(b), atol=1e-7
    )
    np.testing.assert_array_equal(a.valid, b.valid)

    # incremental growth: more scans -> counts only grow, finalize again
    n0 = a.counts.sum()
    acc.add_points(pts[:third])
    a2 = acc.to_map()
    assert a2.counts.sum() == n0 + third


def test_accumulator_empty_raises():
    with pytest.raises(ValueError, match="no points"):
        ndt.NdtMapAccumulator(1.0).to_map()
