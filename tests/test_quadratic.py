"""Quadratic assembly: masking, padding invariance, packing helpers."""

import jax.numpy as jnp
import numpy as np

from nonlinear_optimizer_for_slam_tpu.core.losses import ExponentialLoss
from nonlinear_optimizer_for_slam_tpu.ops import quadratic


def test_quadratic_matches_naive(rng):
    n, d, p = 40, 3, 6
    r = jnp.asarray(rng.normal(size=(n, d)), jnp.float64)
    J = jnp.asarray(rng.normal(size=(n, d, p)), jnp.float64)
    loss = ExponentialLoss(c1=1.3, c2=0.6)
    H, g, cost = quadratic.quadratic_from_jacobians(r, J, None, loss)

    sq = np.sum(np.asarray(r) ** 2, axis=1)
    rho, w, _ = (np.asarray(x) for x in loss.evaluate(jnp.asarray(sq)))
    H_ref = np.einsum("n,ndi,ndj->ij", w, np.asarray(J), np.asarray(J))
    g_ref = np.einsum("n,ndi,nd->i", w, np.asarray(J), np.asarray(r))
    np.testing.assert_allclose(np.asarray(H), H_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-10)
    np.testing.assert_allclose(float(cost), rho.sum(), rtol=1e-10)
    # weight multiplies H and g; cost uses rho — the reference's exact
    # weight placement (mahalanobis_distance_minimizer_analytic.cc:36-48)
    assert not np.allclose(float(cost), np.sum(w * sq))


def test_padding_invariance(rng):
    """Masked padded rows change nothing — the deliberate improvement over
    the reference's stride-tail dropping (.._analytic_simd.cc:47)."""
    n, d, p = 13, 2, 6
    r = rng.normal(size=(n, d))
    J = rng.normal(size=(n, d, p))
    mask = np.ones(n)
    loss = ExponentialLoss()

    H1, g1, c1 = quadratic.quadratic_from_jacobians(
        jnp.asarray(r), jnp.asarray(J), jnp.asarray(mask), loss
    )
    # pad with garbage rows under zero mask
    pad = 7
    r2 = np.concatenate([r, 99.0 * rng.normal(size=(pad, d))])
    J2 = np.concatenate([J, 99.0 * rng.normal(size=(pad, d, p))])
    m2 = np.concatenate([mask, np.zeros(pad)])
    H2, g2, c2 = quadratic.quadratic_from_jacobians(
        jnp.asarray(r2), jnp.asarray(J2), jnp.asarray(m2), loss
    )
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-12)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-12)


def test_pack_unpack_roundtrip(rng):
    A = rng.normal(size=(6, 6))
    H = jnp.asarray(A + A.T)
    packed = quadratic.pack_upper(H)
    assert packed.shape == (21,)
    H2 = quadratic.unpack_symmetric(packed, 6)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H))
