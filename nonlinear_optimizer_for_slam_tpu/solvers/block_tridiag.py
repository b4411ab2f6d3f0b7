"""Batched block-tridiagonal direct solver: cyclic reduction + dense tail.

SLAM pose graphs are odometry chains plus a sparse set of loop closures:
the damped Gauss-Newton system is block-tridiagonal (7x7 pose blocks
coupling consecutive poses) up to a low-rank correction. The classic CPU
answer is sparse Cholesky (the reference's pose-graph TODO stub names
Eigen's SimplicialLLT, pose_graph_optimizer_analytic.cc:12-51); a
sequential factorization is the WRONG shape for a TPU. Cyclic reduction
is the right one: eliminate all odd-indexed block rows simultaneously
(batched 7x7 inverses + batched block products on the VPU), halving the
system each level — log-depth data-parallel levels instead of P
sequential pivots, and an EXACT solve where truncated CG is not.

Two hardware findings shape the implementation (measured on v5e):

- every reduction level costs a near-constant ~0.5-1 ms in kernel-launch
  overhead regardless of size (the blocks are far below the bandwidth
  roofline), so running reduction all the way down to n=1 pays ~2 log2(P)
  level overheads for vanishing amounts of work. Instead reduction stops
  at ``dense_cutoff`` and the remaining small system is assembled dense
  and solved by one MXU Cholesky — levels only run while they are
  actually cheaper than the dense tail they avoid;
- all block products are broadcast-mul-sum (VPU FMA) forms, not
  einsum/matmul: contraction-7 dot_generals lower to tile-padded MXU
  calls that waste >90% of each tile (see bundle_adjustment._outer2).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

Array = jax.Array


# Block-size dispatch: 7x7 pose blocks contract on the VPU (a
# contraction-7 dot_general pads to a full MXU tile and wastes >90% of
# it), but the banded path's SUPERBLOCKS (bandwidth * 7, hundreds wide)
# are exactly MXU shape — and the VPU broadcast form would materialize a
# (n, k, k, k) intermediate, hopeless at k in the hundreds.
_MXU_BLOCK_MIN = 32


def _bmm(A: Array, B: Array) -> Array:
    """Batched (..., k, k) @ (..., k, k)."""
    if A.shape[-1] >= _MXU_BLOCK_MIN:
        with jax.default_matmul_precision("highest"):
            return A @ B
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _bmv(A: Array, x: Array) -> Array:
    """Batched (..., k, k) @ (..., k, m)."""
    if A.shape[-1] >= _MXU_BLOCK_MIN:
        with jax.default_matmul_precision("highest"):
            return A @ x
    return jnp.sum(A[..., :, :, None] * x[..., None, :, :], axis=-2)


def _binv_spd(A: Array) -> Array:
    """Batched inverse of SPD blocks (every block cyclic reduction
    inverts is a Schur complement of the damped SPD system, so SPD).
    Large blocks go through Cholesky + triangular solve — the TPU's
    LuDecomposition custom call behind jnp.linalg.inv is f32-only and
    MXU-hostile at these shapes; small 7x7 blocks keep the LU path
    (parity with the established tridiag behavior)."""
    if A.shape[-1] >= _MXU_BLOCK_MIN:
        L = jnp.linalg.cholesky(A)
        eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
        Linv = jsl.solve_triangular(L, eye, lower=True)
        with jax.default_matmul_precision("highest"):
            return jnp.swapaxes(Linv, -1, -2) @ Linv
    return jnp.linalg.inv(A)


def factor(D: Array, O: Array, dense_cutoff: int = 256):
    """Precompute the cyclic-reduction elimination matrices of T.

    The reduction levels depend only on (D, O), not on the right-hand
    side, so when several RHS batches are solved against the SAME system
    (the chunked Woodbury correction: one batch per chunk of loop
    columns plus two single-RHS solves) factoring once saves the
    dominant per-level work — batched 7x7 inverses and six block
    products per level — for every extra :func:`solve_factored` call.

    Returns an opaque factor object for :func:`solve_factored`.
    """
    P = D.shape[0]
    k = D.shape[-1]
    if O.shape[0] == P - 1:
        O = jnp.concatenate([O, jnp.zeros((1, k, k), O.dtype)], axis=0)

    # L[i] couples row i to i-1 (= O[i-1]^T), U[i] couples to i+1 (= O[i])
    L = jnp.concatenate(
        [jnp.zeros((1, k, k), O.dtype), jnp.swapaxes(O[:-1], -1, -2)], axis=0
    )
    U = O.at[P - 1].set(0.0)

    n = P
    eye = jnp.eye(k, dtype=D.dtype)
    levels: List[Tuple[bool, Array, Array, Array, Array, Array]] = []
    while n > max(dense_cutoff, 1):
        padded = n % 2 == 1
        if padded:
            # one decoupled identity row keeps the halving exact
            D = jnp.concatenate([D, eye[None]], axis=0)
            zk = jnp.zeros((1, k, k), D.dtype)
            L = jnp.concatenate([L, zk], axis=0)
            U = U.at[n - 1].set(0.0)
            U = jnp.concatenate([U, zk], axis=0)
            n += 1

        D_odd, L_odd, U_odd = D[1::2], L[1::2], U[1::2]
        D_ev, L_ev, U_ev = D[0::2], L[0::2], U[0::2]
        Dinv_odd = _binv_spd(D_odd)

        # even row 2m couples left to odd 2m-1 (odd slot m-1; absent for
        # m=0 — guaranteed zero via L_ev[0] = 0) and right to odd 2m+1
        # (odd slot m; always present, n even)
        zero = jnp.zeros((1, k, k), D.dtype)
        Dinv_l = jnp.concatenate([zero, Dinv_odd[:-1]], axis=0)
        L_l = jnp.concatenate([zero, L_odd[:-1]], axis=0)
        U_l = jnp.concatenate([zero, U_odd[:-1]], axis=0)
        LD_l = _bmm(L_ev, Dinv_l)  # L_i D_{i-1}^{-1}
        UD_r = _bmm(U_ev, Dinv_odd)  # U_i D_{i+1}^{-1}
        levels.append((padded, Dinv_odd, L_odd, U_odd, LD_l, UD_r))
        D = D_ev - _bmm(LD_l, U_l) - _bmm(UD_r, L_odd)
        L = -_bmm(LD_l, L_l)
        U = -_bmm(UD_r, U_odd)
        n = n // 2

    if n > 1:
        # dense tail: assemble once, Cholesky-factor once
        idx = jnp.arange(n)
        M = jnp.zeros((n, k, n, k), D.dtype)
        M = M.at[idx, :, idx, :].set(D)
        M = M.at[idx[:-1], :, idx[1:], :].set(U[: n - 1])
        M = M.at[idx[1:], :, idx[:-1], :].set(jnp.swapaxes(U[: n - 1], -1, -2))
        tail = ("cho", jsl.cho_factor(M.reshape(n * k, n * k), lower=True), n)
    else:
        tail = ("inv", _binv_spd(D), 1)
    return (k, levels, tail)


def solve_factored(fact, B: Array) -> Array:
    """Solve T x = B using a precomputed :func:`factor` of T."""
    k, levels, tail = fact
    squeeze = B.ndim == 2
    if squeeze:
        B = B[..., None]
    m = B.shape[-1]

    saved: List[Array] = []
    for padded, Dinv_odd, L_odd, U_odd, LD_l, UD_r in levels:
        if padded:
            B = jnp.concatenate([B, jnp.zeros((1, k, m), B.dtype)], axis=0)
        B_odd, B_ev = B[1::2], B[0::2]
        B_l = jnp.concatenate(
            [jnp.zeros((1, k, m), B.dtype), B_odd[:-1]], axis=0
        )
        saved.append(B_odd)
        B = B_ev - _bmv(LD_l, B_l) - _bmv(UD_r, B_odd)

    kind, data, n_tail = tail
    if kind == "cho":
        x = jsl.cho_solve(data, B.reshape(n_tail * k, m)).reshape(n_tail, k, m)
    else:
        x = _bmv(data, B)

    # back-substitution, finest level last
    for (padded, Dinv_odd, L_odd, U_odd, _, _), B_odd in zip(
        reversed(levels), reversed(saved)
    ):
        half = x.shape[0]
        # x_{2m+1} = Dinv (B_{2m+1} - L_{2m+1} x_{2m} - U_{2m+1} x_{2m+2})
        x_right = jnp.concatenate(
            [x[1:], jnp.zeros((1, k, m), x.dtype)], axis=0
        )
        x_odd = _bmv(Dinv_odd, B_odd - _bmv(L_odd, x) - _bmv(U_odd, x_right))
        x = jnp.stack([x, x_odd], axis=1).reshape(2 * half, k, m)
        if padded:
            x = x[:-1]

    if squeeze:
        x = x[..., 0]
    return x


def solve(D: Array, O: Array, B: Array, dense_cutoff: int = 256) -> Array:
    """Solve the SPD block-tridiagonal system T x = B.

    T has diagonal blocks ``D[i]`` (P, k, k) and off-diagonal blocks
    ``O[i]`` coupling row i to row i+1 (P-1 or P entries; a trailing
    entry is ignored), i.e. row i reads
    ``O[i-1]^T x[i-1] + D[i] x[i] + O[i] x[i+1] = B[i]``.

    ``B`` is (P, k, m) — m right-hand sides solved together (the Woodbury
    correction for loop closures needs T^{-1} against several columns;
    batching them costs one pass). A (P, k) B is accepted and returned
    squeezed.

    Shapes are static; the level loop unrolls at trace time. Each level
    halves the system (odd rows eliminated in parallel); an odd-length
    level is padded with one decoupled identity row. Reduction stops at
    ``dense_cutoff`` rows; the tail is assembled dense and solved by
    one MXU Cholesky (factored once in :func:`factor`).
    For several RHS batches against one T, use :func:`factor` +
    :func:`solve_factored`.
    """
    return solve_factored(factor(D, O, dense_cutoff), B)
