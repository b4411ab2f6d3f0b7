"""shard_map-based sharded solving.

Strategy (SURVEY section 2.8): factors are data-parallel — each device
evaluates the fused quadratic on its shard of the correspondence batch and
the (H, g, cost) partials (~180 floats for 6-DoF) are reduced with
``jax.lax.psum`` over ICI. The ENTIRE LM while_loop runs inside the
shard_map: after the psum every device holds identical (H, g, cost), so
lambda adaptation, convergence flags, and the parameter state remain
bitwise-replicated across devices and the whole multi-device solve is one
XLA program with no per-iteration host sync.

This replaces the reference's thread fan-out + future-sum reduction
(mahalanobis_distance_minimizer_analytic.cc:97-120).
"""

from __future__ import annotations

import jax

from .mesh import FACTOR_AXIS

P = jax.sharding.PartitionSpec

try:  # JAX >= 0.6 exposes shard_map at top level
    _shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_solve(solve_fn, mesh: jax.sharding.Mesh, data, *args):
    """Run ``solve_fn(data_shard, *args, psum_axis=FACTOR_AXIS)`` under
    shard_map: ``data`` is split along axis 0 over the mesh, ``args`` are
    replicated, outputs are replicated.

    ``solve_fn`` must psum its evaluation results over ``psum_axis`` so its
    outputs are device-invariant.
    """
    data_specs = jax.tree_util.tree_map(lambda _: P(FACTOR_AXIS), data)
    arg_specs = jax.tree_util.tree_map(lambda _: P(), args)

    def wrapped(data_shard, args_shard):
        return solve_fn(data_shard, *args_shard, psum_axis=FACTOR_AXIS)

    try:
        fn = _shard_map(
            wrapped,
            mesh=mesh,
            in_specs=(data_specs, arg_specs),
            out_specs=P(),
            check_vma=False,
        )
    except TypeError:  # older check_rep spelling
        fn = _shard_map(
            wrapped,
            mesh=mesh,
            in_specs=(data_specs, arg_specs),
            out_specs=P(),
            check_rep=False,
        )
    return fn(data, args)


def sharded_quadratic(eval_fn, mesh: jax.sharding.Mesh):
    """Wrap a local eval_quadratic into a sharded one (eval-only fan-out;
    used when the caller wants to keep the LM loop unsharded)."""

    def wrapped_local(data_shard, *args):
        H, g, c = eval_fn(data_shard, *args)
        return jax.lax.psum((H, g, c), FACTOR_AXIS)

    def call(data, *args):
        data_specs = jax.tree_util.tree_map(lambda _: P(FACTOR_AXIS), data)
        arg_specs = tuple(jax.tree_util.tree_map(lambda _: P(), a) for a in args)
        try:
            fn = _shard_map(
                wrapped_local,
                mesh=mesh,
                in_specs=(data_specs,) + arg_specs,
                out_specs=P(),
                check_vma=False,
            )
        except TypeError:  # pragma: no cover
            fn = _shard_map(
                wrapped_local,
                mesh=mesh,
                in_specs=(data_specs,) + arg_specs,
                out_specs=P(),
                check_rep=False,
            )
        return fn(data, *args)

    return call
