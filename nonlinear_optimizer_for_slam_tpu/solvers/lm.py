"""Generic damped Gauss-Newton / Levenberg-Marquardt driver.

One whole ``solve`` is a single XLA program: the iteration loop is a
``lax.while_loop`` whose body evaluates the fused factor quadratic
(H, g, cost), damps, solves the normal equations, retracts the parameters
on their manifold, and adapts lambda — the data never leaves the device.

The control policy reproduces the reference loop EXACTLY
(reference: mahalanobis_distance_minimizer_analytic.cc:84-152):

  1. (H, g, cost) <- evaluate at current params
  2. H[k,k] *= (1 + lambda)
  3. delta = solve(H, -g)
  4. params <- retract(params, delta)        # update happens BEFORE checks
  5. break if ||delta|| < parameter_tolerance
  6. break if ||g|| < gradient_tolerance
  7. lambda *= (cost > previous_cost ? 2.0 : 0.6), clamped to
     [min_lambda, max_lambda]; previous_cost <- cost

Note the quirks kept for trace parity: convergence is checked AFTER the
update; ``previous_cost`` starts at dtype-max (so the first adaptation
always shrinks lambda); a converging iteration leaves lambda and
previous_cost untouched; ``function_tolerance`` exists in Options but is
never read by the reference loop — same here.

Beyond the reference: ``relative_function_tolerance`` (default 0.0 = off,
so parity-traced paths are untouched) adds an opt-in relative cost-
plateau stop for large problems where the reference's ABSOLUTE step /
gradient tolerances can mathematically never fire (see ConvergenceHandle).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.options import MinimizerType, Options
from .linear import damp_hessian, solve_normal_equations

Array = jax.Array
Params = any  # pytree


class IterationRecord(NamedTuple):
    """Per-iteration observability record (the reference only ever printed
    the final 'COST: <c>, iter: <n>' line; SURVEY section 5 asks for
    structured per-iteration records)."""

    cost: Array  # (max_iterations,)
    lam: Array
    gradient_norm: Array
    step_norm: Array


class Summary(NamedTuple):
    """Solve summary (the reference declares an empty Summary struct,
    pose_optimizer/pose_optimizer.h:63 — this is the real one)."""

    final_cost: Array  # cost evaluated in the last executed iteration
    reported_cost: Array  # the reference's "COST:" print = previous_cost,
    # which lags final_cost by one iteration (and is the dtype-max sentinel
    # if the solve converges in its very first iteration — the reference
    # would print the same, .._analytic.cc:150)
    iterations: Array  # number of iterations executed
    final_lambda: Array
    converged: Array  # True if a tolerance fired before max_iterations
    records: IterationRecord


class _State(NamedTuple):
    params: Params
    lam: Array
    previous_cost: Array
    last_cost: Array
    iteration: Array
    done: Array
    # plateau-stop state (only advanced when relative_function_tolerance
    # is set; dead weight otherwise)
    best_cost: Array
    stall: Array
    records: IterationRecord


def _tree_norm(x) -> Array:
    """L2 norm over every leaf of a pytree (plain array included)."""
    leaves = jax.tree_util.tree_leaves(x)
    return jnp.sqrt(sum(jnp.sum(l * l) for l in leaves))


def solve(
    eval_quadratic: Callable[[Params], Tuple[Array, Array, Array]],
    retract: Callable[[Params, Array], Params],
    params0: Params,
    options: Options,
    solve_linear: Optional[Callable] = None,
) -> Tuple[Params, Summary]:
    """Run the solver. ``eval_quadratic(params) -> (H, g, cost)``;
    ``retract(params, delta) -> params`` applies a local step on the
    parameter manifold. Jit-safe; call under ``jax.jit`` for one fused
    device program.

    ``solve_linear(H, g, lam) -> delta`` overrides the damped-normal-
    equations step. ``H`` is then whatever ``eval_quadratic`` returned in
    the first slot — it can be any pytree of operator parts (e.g. the
    per-edge Jacobian blocks of a matrix-free pose-graph CG solve), and
    ``g``/``delta`` may be pytrees too. The LM *policy* (damping schedule,
    convergence checks, records) stays this one canonical loop."""
    oh = options.optimization_handle
    ch = options.convergence_handle
    max_it = options.max_iterations

    leaves = jax.tree_util.tree_leaves(params0)
    dtype = leaves[0].dtype

    def records_init():
        nan = jnp.full((max_it,), jnp.nan, dtype=dtype)
        return IterationRecord(nan, nan, nan, nan)

    gd_step = jnp.asarray(oh.gradient_descent_step, dtype)

    def body(state: _State) -> _State:
        hessian, gradient, cost = eval_quadratic(state.params)

        if options.minimizer_type == MinimizerType.GRADIENT_DESCENT:
            delta = jax.tree_util.tree_map(lambda g: -gd_step * g, gradient)
        elif solve_linear is not None:
            delta = solve_linear(hessian, gradient, state.lam)
        else:
            damped = damp_hessian(hessian, state.lam)
            delta = solve_normal_equations(
                damped, -gradient, options.linear_solver_type
            )

        # Degenerate-system guard: a singular damped H (e.g. zero factors
        # after masking) yields a non-finite step; treat it as a zero step
        # so the solve converges in place instead of exploding. (The
        # reference has no such guard — its behavior there is UB garbage.)
        finite = jnp.asarray(True)
        for leaf in jax.tree_util.tree_leaves(delta):
            finite = finite & jnp.all(jnp.isfinite(leaf))
        delta = jax.tree_util.tree_map(
            lambda d: jnp.where(finite, d, jnp.zeros_like(d)), delta
        )

        new_params = retract(state.params, delta)

        step_norm = _tree_norm(delta)
        grad_norm = _tree_norm(gradient)
        converged = (step_norm < ch.parameter_tolerance) | (
            grad_norm < ch.gradient_tolerance
        )
        if ch.relative_function_tolerance > 0.0:
            # opt-in relative plateau stop (see ConvergenceHandle): an
            # iteration "improves" when it beats the BEST cost seen so
            # far by the relative tolerance; three consecutive
            # non-improving iterations end the solve. Comparing against
            # the monotone best (not the previous cost) makes the check
            # robust both to slow creep (every iteration improves a
            # little but under tolerance -> each counts as a stall) and
            # to roundoff oscillation around a converged cost (f32
            # zero-residual solves fluctuate ~1% per iteration — a
            # previous-cost delta never looks small, the best-cost delta
            # does). best starts at dtype-max, so early iterations
            # always count as improving.
            # (best - cost) > rtol*best, NOT cost < best*(1-rtol): at f32
            # the multiplier (1 - 1e-8) rounds to exactly 1.0 and the
            # check degrades to an exact-improvement test
            improved = (state.best_cost - cost) > (
                ch.relative_function_tolerance * state.best_cost
            )
            new_stall = jnp.where(improved, 0, state.stall + 1)
            converged = converged | (new_stall >= 3)
        else:
            new_stall = state.stall
        new_best = jnp.minimum(state.best_cost, cost)

        increase = cost > state.previous_cost
        adapted = jnp.where(
            increase,
            state.lam * oh.lambda_increase_factor,
            state.lam * oh.lambda_decrease_factor,
        )
        adapted = jnp.clip(adapted, oh.min_lambda, oh.max_lambda)
        # A converging iteration breaks before the lambda/previous_cost
        # update (reference: .._analytic.cc:138-148).
        new_lam = jnp.where(converged, state.lam, adapted)
        new_prev = jnp.where(converged, state.previous_cost, cost)

        it = state.iteration
        rec = IterationRecord(
            state.records.cost.at[it].set(cost),
            state.records.lam.at[it].set(state.lam),
            state.records.gradient_norm.at[it].set(grad_norm),
            state.records.step_norm.at[it].set(step_norm),
        )
        return _State(
            new_params, new_lam, new_prev, cost, it + 1, converged,
            new_best, new_stall, rec,
        )

    def cond(state: _State) -> Array:
        return (state.iteration < max_it) & (~state.done)

    init = _State(
        params=params0,
        lam=jnp.asarray(oh.initial_lambda, dtype),
        previous_cost=jnp.asarray(jnp.finfo(dtype).max, dtype),
        last_cost=jnp.asarray(jnp.finfo(dtype).max, dtype),
        iteration=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        best_cost=jnp.asarray(jnp.finfo(dtype).max, dtype),
        stall=jnp.asarray(0, jnp.int32),
        records=records_init(),
    )
    final = jax.lax.while_loop(cond, body, init)

    # Reference reports previous_cost and the iteration counter at exit
    # (.._analytic.cc:150-151). On a tolerance break the counter is the
    # 0-based index of the breaking iteration — i.e. iteration - 1 here,
    # because our counter increments before exiting the body.
    iterations = jnp.where(final.done, final.iteration - 1, final.iteration)
    summary = Summary(
        final_cost=final.last_cost,
        reported_cost=final.previous_cost,
        iterations=iterations,
        final_lambda=final.lam,
        converged=final.done,
        records=final.records,
    )
    return final.params, summary
