"""Shared Gauss-Newton quadratic assembly.

Given per-factor residuals r_i (D,), Jacobians J_i (D, P), a validity mask,
and a robust loss, assemble the normal-equation quadratic

    H = sum_i w_i * J_i^T J_i      (P, P)
    g = sum_i w_i * J_i^T r_i      (P,)
    cost = sum_i rho_i

with w_i = rho'(||r_i||^2) * mask_i and rho_i = rho(||r_i||^2) * mask_i.

The reference accumulates the upper triangle only and reflects at the end
(mahalanobis_distance_minimizer_analytic.cc:187-218) — a scalar-CPU FLOP
optimization. On TPU the full contraction is a single (P, D*N) x (D*N, P)
matmul that maps onto the MXU, so we compute the full symmetric H directly;
the result is identical by symmetry.

Padding semantics: the reference's SIMD paths silently DROP the
``size % stride`` tail points (mahalanobis_distance_minimizer_analytic_simd.cc:47,
.._3dof.cc:34-37). Here padded entries are masked to zero weight instead, so
padded and unpadded evaluations agree exactly — a deliberate, documented
improvement over the reference semantics.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.losses import LossFunction

Array = jax.Array


def highest_precision(fn):
    """Trace ``fn`` with true-f32 matmul precision.

    On TPU the default f32 dot lowers to single-pass bf16 MXU multiplies,
    which costs ~7% relative error in the assembled gradient — enough to
    stall LM convergence. Factor evaluation therefore forces
    ``Precision.HIGHEST`` (multi-pass bf16) on every contraction; the
    bandwidth-bound evaluation kernels do not pay a meaningful FLOP
    penalty for it.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


@highest_precision
def quadratic_from_jacobians(
    residuals: Array,  # (N, D)
    jacobians: Array,  # (N, D, P)
    mask: Optional[Array],  # (N,) or None
    loss: Optional[LossFunction],
) -> Tuple[Array, Array, Array]:
    """Assemble (H, g, cost) from per-factor residuals and Jacobians.

    With ``loss=None`` mirrors the reference's no-loss branch: unit weights
    and cost = sum of squared residuals
    (mahalanobis_distance_minimizer_analytic.cc:44-47).
    """
    sq = jnp.sum(residuals * residuals, axis=-1)  # (N,)
    if loss is None:
        rho = sq
        w = jnp.ones_like(sq)
    else:
        rho, w, _ = loss.evaluate(sq)
    if mask is not None:
        m = mask.astype(residuals.dtype)
        w = w * m
        rho = rho * m
    cost = jnp.sum(rho)
    jw = jacobians * w[:, None, None]
    # (N*D, P)^T @ (N*D, P) contraction -> MXU.
    hessian = jnp.einsum(
        "ndi,ndj->ij", jw, jacobians, preferred_element_type=residuals.dtype
    )
    gradient = jnp.einsum("ndi,nd->i", jw, residuals)
    return hessian, gradient, cost


def upper_triangle_indices(dim: int):
    """Row/col index arrays of the packed upper triangle, row-major order
    ((0,0),(0,1),...,(0,dim-1),(1,1),...), matching the reference's
    accumulation order."""
    rows, cols = [], []
    for r in range(dim):
        for c in range(r, dim):
            rows.append(r)
            cols.append(c)
    return tuple(rows), tuple(cols)


def pack_upper(H: Array) -> Array:
    dim = H.shape[-1]
    rows, cols = upper_triangle_indices(dim)
    return H[..., jnp.array(rows), jnp.array(cols)]


def unpack_symmetric(packed: Array, dim: int) -> Array:
    """Inverse of pack_upper; reflects the upper triangle into a full
    symmetric matrix (the ReflectHessian analog,
    mahalanobis_distance_minimizer_analytic.cc:220-228)."""
    rows, cols = upper_triangle_indices(dim)
    H = jnp.zeros(packed.shape[:-1] + (dim, dim), dtype=packed.dtype)
    H = H.at[..., jnp.array(rows), jnp.array(cols)].set(packed)
    diag = H * jnp.eye(dim, dtype=packed.dtype)
    return H + jnp.swapaxes(H, -1, -2) - diag
