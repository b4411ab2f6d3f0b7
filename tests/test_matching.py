"""Brute-force on-device matching vs a naive numpy kNN oracle
(the FLANN radius-search analog, mahalanobis tests :296-342)."""

import jax.numpy as jnp
import numpy as np

from nonlinear_optimizer_for_slam_tpu.pipelines import matching


def test_match_against_naive_knn(rng):
    M, N, k = 50, 200, 2
    means = rng.uniform(-5, 5, size=(M, 3))
    sqrt_infos = rng.normal(size=(M, 3, 3))
    points = rng.uniform(-5, 5, size=(N, 3))
    R = np.eye(3)
    t = np.array([0.1, -0.2, 0.3])
    radius = 1.5

    data = matching.match_point_cloud(
        jnp.asarray(means),
        jnp.asarray(sqrt_infos),
        jnp.asarray(points),
        jnp.ones(N),
        jnp.asarray(R),
        jnp.asarray(t),
        search_radius=radius,
        num_neighbors=k,
    )

    warped = points @ R.T + t
    got_pairs = set()
    arr_pts = np.asarray(data.points).reshape(N, k, 3)
    arr_means = np.asarray(data.means).reshape(N, k, 3)
    arr_mask = np.asarray(data.mask).reshape(N, k)
    for i in range(N):
        d2 = np.sum((warped[i] - means) ** 2, axis=1)
        expected = set(np.argsort(d2)[:k][d2[np.argsort(d2)[:k]] <= radius**2].tolist())
        got = set()
        for j in range(k):
            if arr_mask[i, j] > 0:
                # correspondence carries the LOCAL point (reference :321-324)
                np.testing.assert_allclose(arr_pts[i, j], points[i], atol=1e-6)
                voxel = np.argmin(np.sum((arr_means[i, j] - means) ** 2, axis=1))
                got.add(int(voxel))
        assert got == expected, f"point {i}: {got} != {expected}"
        got_pairs |= {(i, v) for v in got}
    assert len(got_pairs) > 0


def test_points_mask_respected(rng):
    M, N = 10, 20
    means = rng.uniform(-2, 2, size=(M, 3))
    points = rng.uniform(-2, 2, size=(N, 3))
    pmask = np.ones(N)
    pmask[10:] = 0.0
    data = matching.match_point_cloud(
        jnp.asarray(means),
        jnp.asarray(rng.normal(size=(M, 3, 3))),
        jnp.asarray(points),
        jnp.asarray(pmask),
        jnp.eye(3),
        jnp.zeros(3),
        search_radius=100.0,
        num_neighbors=1,
    )
    m = np.asarray(data.mask)
    assert np.all(m[10:] == 0.0) and np.all(m[:10] == 1.0)
