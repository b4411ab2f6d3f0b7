"""Robust-loss unit tests: closed forms vs finite differences.

The reference only exercises its losses implicitly through solves; here
rho' and rho'' are checked directly (SURVEY section 4's "what the TPU build
should add").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core.losses import (
    CauchyLoss,
    DCSLoss,
    ExponentialLoss,
    GemanMcClureLoss,
    HuberLoss,
    TrivialLoss,
    TukeyLoss,
)

DIFFERENTIABLE_LOSSES = [
    TrivialLoss(),
    HuberLoss(threshold=1.0),
    CauchyLoss(scale=0.7),
    TukeyLoss(threshold=1.3),
    GemanMcClureLoss(scale=0.8),
    DCSLoss(phi=1.1),
]


@pytest.mark.parametrize(
    "loss", DIFFERENTIABLE_LOSSES, ids=lambda l: type(l).__name__
)
def test_rho_double_prime_is_derivative(loss):
    """rho''(s) == d rho'(s)/ds for the standard-convention losses.

    ExponentialLoss is excluded: the reference defines its rho' with a
    deliberate factor-2 and rho'' = -2*c2*rho' (loss_function.h:30-34) —
    NOT the calculus derivative — and we reproduce that verbatim; it has
    its own formula test below."""
    s = jnp.linspace(0.01, 4.0, 41, dtype=jnp.float64)
    _, d_rho, dd_rho = loss.evaluate(s)
    dd_fd = jax.vmap(jax.grad(lambda x: loss.evaluate(x)[1]))(s)
    np.testing.assert_allclose(np.asarray(dd_rho), np.asarray(dd_fd), rtol=1e-6)


def test_exponential_reference_formula():
    """rho = c1(1 - e^{-c2 s}), rho' = 2 c1 c2 e^{-c2 s}
    (reference loss_function.h:20-47, incl. the two_c1c2_ factor)."""
    c1, c2 = 1.7, 0.4
    loss = ExponentialLoss(c1=c1, c2=c2)
    s = jnp.asarray([0.0, 0.5, 2.0], jnp.float64)
    rho, d, dd = loss.evaluate(s)
    np.testing.assert_allclose(np.asarray(rho), c1 * (1 - np.exp(-c2 * np.asarray(s))))
    np.testing.assert_allclose(np.asarray(d), 2 * c1 * c2 * np.exp(-c2 * np.asarray(s)))
    np.testing.assert_allclose(np.asarray(dd), -2 * c2 * np.asarray(d))


def test_huber_branches():
    loss = HuberLoss(threshold=1.5)
    s = jnp.asarray([0.5, 2.25, 9.0], jnp.float64)
    rho, d, _ = loss.evaluate(s)
    # inlier: identity
    assert float(rho[0]) == 0.5 and float(d[0]) == 1.0
    # outlier: 2*delta*sqrt(s) - delta^2, delta/sqrt(s)
    np.testing.assert_allclose(float(rho[2]), 2 * 1.5 * 3.0 - 1.5**2)
    np.testing.assert_allclose(float(d[2]), 1.5 / 3.0)
    # continuity at the boundary s = delta^2
    np.testing.assert_allclose(float(rho[1]), 2.25, rtol=1e-12)


def test_huber_nan_free_gradient_at_zero():
    loss = HuberLoss(threshold=1.0)
    g = jax.grad(lambda s: loss.evaluate(s)[0])(jnp.asarray(0.0, jnp.float64))
    assert np.isfinite(float(g))


def test_losses_are_pytrees():
    """Losses must traverse jit boundaries as pytrees of traced leaves."""
    loss = ExponentialLoss(c1=1.0, c2=2.0)
    leaves, treedef = jax.tree_util.tree_flatten(loss)
    assert len(leaves) == 2
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt == loss

    @jax.jit
    def f(l, s):
        return l.evaluate(s)[0]

    out = f(loss, jnp.asarray(1.0))
    np.testing.assert_allclose(float(out), 1.0 - np.exp(-2.0), rtol=1e-6)


def test_tukey_saturates():
    """Tukey: quadratic-ish core, total saturation past b^2 (zero weight,
    constant rho = b^2/3) — the redescending property."""
    b = 1.5
    loss = TukeyLoss(threshold=b)
    rho_in, w_in, _ = loss.evaluate(jnp.asarray(0.01))
    np.testing.assert_allclose(float(w_in), (1 - 0.01 / b**2) ** 2, rtol=1e-12)
    for s in (b**2, 2 * b**2, 100.0):
        rho, w, dd = loss.evaluate(jnp.asarray(s))
        np.testing.assert_allclose(float(rho), b**2 / 3.0, rtol=1e-12)
        assert float(w) == 0.0 and float(dd) == 0.0


def test_geman_mcclure_is_unclamped_dcs():
    """GM(c^2=Phi) == analytic DCS: min_s [s^2 chi2 + Phi(s-1)^2] =
    Phi chi2 / (Phi + chi2) (Agarwal et al. 2013) — verified against a
    numerical inner minimization."""
    phi = 1.7
    loss = GemanMcClureLoss(scale=np.sqrt(phi))
    for chi2 in (0.1, 1.0, 5.0, 40.0):
        svals = np.linspace(0, 1.5, 20001)
        inner = svals**2 * chi2 + phi * (svals - 1.0) ** 2
        rho, _, _ = loss.evaluate(jnp.asarray(chi2))
        np.testing.assert_allclose(float(rho), inner.min(), rtol=1e-6)


def test_dcs_truncated_quadratic():
    """Clamped DCS: identical to the quadratic for chi2 <= Phi, constant
    Phi beyond (the s = min(1, .) clamp makes the combined objective
    saturate exactly); rho continuous at the knee."""
    phi = 2.0
    loss = DCSLoss(phi=phi)
    rho, w, _ = loss.evaluate(jnp.asarray(0.5))
    assert float(rho) == 0.5 and float(w) == 1.0
    rho_knee, _, _ = loss.evaluate(jnp.asarray(phi))
    rho_out, w_out, _ = loss.evaluate(jnp.asarray(50.0))
    np.testing.assert_allclose(float(rho_knee), phi)
    np.testing.assert_allclose(float(rho_out), phi)
    assert float(w_out) == 0.0
