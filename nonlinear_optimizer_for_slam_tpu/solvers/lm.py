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
When the plateau stop is enabled the loop also carries the monotone-best
(cost, params) pair and a plateau exit returns THAT state, not the last
step: LM is not a descent method under the reference's lambda<=1e-2 clamp
(a warm restart was observed to blow up 30x and then plateau at the
blown-up point), so certifying the exit state requires returning the best
evaluated one. ``Summary.plateau_stop`` tells the two exit kinds apart.
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

    final_cost: Array  # cost evaluated in the last executed iteration;
    # when the plateau stop fires (plateau_stop=True) this is instead the
    # monotone best evaluated cost, matching the returned (best) params
    reported_cost: Array  # the reference's "COST:" print = previous_cost,
    # which lags final_cost by one iteration (and is the dtype-max sentinel
    # if the solve converges in its very first iteration — the reference
    # would print the same, .._analytic.cc:150)
    iterations: Array  # number of iterations executed
    final_lambda: Array
    converged: Array  # True if a tolerance fired before max_iterations
    records: IterationRecord
    # --- beyond-reference observability (defaults keep old call sites
    # working; only meaningful when relative_function_tolerance > 0) ---
    plateau_stop: Optional[Array] = None  # True iff the opt-in relative
    # plateau stall (NOT the reference step/gradient tolerances) ended the
    # solve; in that case the returned params are the best-seen state
    best_cost: Optional[Array] = None  # monotone best evaluated cost


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
    # monotone-safeguard state, carried only when the plateau stop is
    # enabled (None — an empty pytree node — otherwise, so parity paths
    # pay nothing): the params at which best_cost was evaluated, and
    # whether the stall (not a reference tolerance) fired the exit.
    best_params: Params
    plateau: Array


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
    # Python-level (trace-time) gate: with the plateau stop off the loop
    # state carries no best-params copy and the program is bit-identical
    # to the parity-traced reference loop.
    track_best = ch.relative_function_tolerance > 0.0

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
        ref_converged = (step_norm < ch.parameter_tolerance) | (
            grad_norm < ch.gradient_tolerance
        )
        converged = ref_converged
        if track_best:
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
        if track_best:
            # ``cost`` was evaluated at state.params (the PRE-step point),
            # so that is the state the monotone best certifies. The
            # plateau flag records that the stall — not a reference
            # tolerance — ended the solve; on such an exit ``solve``
            # returns best_params instead of the (possibly post-blow-up)
            # final step. Reference-tolerance exits keep the post-step
            # params for trace parity.
            better = cost < state.best_cost
            new_best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(better, p, b),
                state.best_params,
                state.params,
            )
            new_plateau = converged & (~ref_converged)
        else:
            new_best_params = None
            new_plateau = state.plateau

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
            new_best, new_stall, rec, new_best_params, new_plateau,
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
        best_params=params0 if track_best else None,
        plateau=jnp.asarray(False),
    )
    final = jax.lax.while_loop(cond, body, init)

    # Reference reports previous_cost and the iteration counter at exit
    # (.._analytic.cc:150-151). On a tolerance break the counter is the
    # 0-based index of the breaking iteration — i.e. iteration - 1 here,
    # because our counter increments before exiting the body.
    iterations = jnp.where(final.done, final.iteration - 1, final.iteration)

    params_out = final.params
    final_cost = final.last_cost
    if track_best:
        # Monotone safeguard: a plateau stop fires after >=3 non-improving
        # iterations, so the final (post-step) params are never certified
        # better than the monotone best — return the best-seen state
        # (observed failure without this: a warm restart at 5,000x15,000
        # blew up 30x under the reference lambda<=1e-2 clamp and the
        # plateau stop certified the blown-up state; see
        # tests/test_monotone_safeguard.py). Reference-tolerance exits and
        # max-iteration exits keep the last params: the former for trace
        # parity, the latter because a still-improving run's final step is
        # better than the one-behind best.
        params_out = jax.tree_util.tree_map(
            lambda b, p: jnp.where(final.plateau, b, p),
            final.best_params,
            final.params,
        )
        final_cost = jnp.where(final.plateau, final.best_cost, final.last_cost)
    summary = Summary(
        final_cost=final_cost,
        reported_cost=final.previous_cost,
        iterations=iterations,
        final_lambda=final.lam,
        converged=final.done,
        records=final.records,
        plateau_stop=final.plateau if track_best else None,
        best_cost=final.best_cost if track_best else None,
    )
    return params_out, summary
