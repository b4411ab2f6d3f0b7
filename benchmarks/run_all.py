"""Benchmark suite mirroring the reference's test executables and
results/ captures (SURVEY sections 2.7 and 6).

Four benchmarks, each printing a reference-style table and writing it to
results/:

  maha_simple     — full 6-DoF NDT registration, variant zoo
                    (reference: simple_optimization_test.cc ->
                     results/maha_amd64_simple.txt; best variant 58.9 ms)
  maha_3dof_6dof  — 3-DoF planar vs 6-DoF on a planar true pose
                    (reference: 3dof_6dof_comparison_test.cc ->
                     results/maha_3_vs_6_amd64.txt; best 43.7 ms)
  backend_ablation— evaluation-backend head-to-head on one solve, the
                    analog of the reference's 8-way SIMD ablation
                    (simd_implementation_comparison_test.cc ->
                     results/maha_amd64.txt; best 194.5 ms at 0.05 m)
  reproj          — 630-point reprojection solve
                    (reference: reproj tests -> results/reproj_amd64.txt;
                     best 0.40 ms)

Variant-parity (same final cost/pose across variants) is the correctness
criterion, exactly like the reference's methodology.

Run: python benchmarks/run_all.py [--runs N] [--out results/]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options, lie
from nonlinear_optimizer_for_slam_tpu.ops import mahalanobis, reprojection
from nonlinear_optimizer_for_slam_tpu.pipelines import (
    fused_registration,
    matching,
    ndt,
    registration,
)
from nonlinear_optimizer_for_slam_tpu.solvers import autodiff, lm
from nonlinear_optimizer_for_slam_tpu.solvers.manifolds import SE3Params, se3_retract
from nonlinear_optimizer_for_slam_tpu.utils import testing


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, runs):
    fn()  # warm-up / compile
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times)), out


def build_world(point_step=0.01, filter_size=0.1):
    pts = testing.generate_room_points(point_step=point_step)
    try:
        from nonlinear_optimizer_for_slam_tpu import native

        ndt_map = native.build_ndt_map(pts, 1.0)
        scan = native.filter_points(pts, filter_size)
    except Exception:
        ndt_map = ndt.build_ndt_map(pts, 1.0)
        scan = ndt.filter_points(pts, filter_size)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)
    return ndt_map, local, true_pose


def table(title, rows, headers):
    lines = [title, "-" * len(title)]
    fmt = "".join(f"{{:<{w}}}" for w in [34, 14, 18, 40])
    lines.append(fmt.format(*headers))
    for r in rows:
        lines.append(fmt.format(*r))
    return "\n".join(lines) + "\n"


# ----------------------------------------------------------------------------
# registration variants
# ----------------------------------------------------------------------------


class AutodiffMahalanobisMinimizer(nls.MahalanobisDistanceMinimizer):
    """The in-repo 'Ceres': jacfwd Jacobians through the same retraction,
    same LM driver (the oracle pattern, SURVEY section 4)."""

    def solve(self, options, data, pose):
        data = data.astype(self.dtype).pad_to(self._pad(data.num_factors))
        t0 = jnp.asarray(pose.translation, self.dtype)
        q0 = jnp.asarray(pose.quaternion(), self.dtype)
        params, summary = _autodiff_solve_core(
            t0, q0, data, self.loss_function, options
        )
        from nonlinear_optimizer_for_slam_tpu.solvers.minimizers import (
            _pose_from_params,
        )

        return _pose_from_params(params), summary


@functools.partial(jax.jit, static_argnums=(4,))
def _autodiff_solve_core(t0, q0, data, loss, options):
    def residual_fn(params):
        R = lie.quat_to_rotmat(params.quaternion)
        return mahalanobis.residuals(R, params.translation, data) * data.mask[:, None]

    return autodiff.solve(
        residual_fn,
        se3_retract,
        SE3Params(t0, q0),
        6,
        options,
        loss=loss,
        mask=data.mask,
    )


def bench_maha_simple(runs):
    ndt_map, local, true_pose = build_world()
    options = Options()
    loss = ExponentialLoss()
    rows = []

    def run_host(minimizer):
        return registration.register_ndt(
            ndt_map, local, nls.Pose.identity(), minimizer, options
        )

    variants = [
        ("autodiff oracle (Ceres analog)", AutodiffMahalanobisMinimizer().set_loss_function(loss)),
        ("analytic jnp/XLA", nls.MahalanobisDistanceMinimizer().set_loss_function(loss)),
        ("analytic pallas", nls.MahalanobisDistanceMinimizer(backend="pallas").set_loss_function(loss)),
    ]
    for name, minimizer in variants:
        ms, res = timed(lambda m=minimizer: run_host(m), runs)
        err = np.linalg.norm(res.pose.translation - true_pose.translation)
        rows.append(
            (name, f"{ms:.2f} ms", f"{float(res.summaries[-1].final_cost):.1f}",
             f"t_err={err * 1e3:.2f}mm outer={res.outer_iterations}")
        )
        log(f"  {name}: {ms:.2f} ms")

    registrar = fused_registration.NdtRegistrar(ndt_map, options, loss)
    ms, res = timed(lambda: registrar.register(local, nls.Pose.identity()), runs)
    err = np.linalg.norm(res.pose.translation - true_pose.translation)
    rows.append(
        ("fused device-resident ICP", f"{ms:.2f} ms", f"{res.final_cost:.1f}",
         f"t_err={err * 1e3:.2f}mm outer={res.outer_iterations}")
    )
    log(f"  fused: {ms:.2f} ms")
    return table(
        "maha simple: 6-DoF NDT registration (reference best: 58.9 ms AVX2)",
        rows,
        ("variant", "total", "final cost", "accuracy"),
    )


def bench_maha_3dof_6dof(runs):
    ndt_map, local, true_pose = build_world()
    options = Options()
    loss = ExponentialLoss()
    rows = []
    for name, planar in (("6-DoF fused", False), ("3-DoF planar fused", True)):
        registrar = fused_registration.NdtRegistrar(
            ndt_map, options, loss, planar=planar
        )
        ms, res = timed(lambda r=registrar: r.register(local, nls.Pose.identity()), runs)
        err = np.linalg.norm(res.pose.translation[:2] - true_pose.translation[:2])
        rows.append(
            (name, f"{ms:.2f} ms", f"{res.final_cost:.1f}",
             f"xy_err={err * 1e3:.2f}mm outer={res.outer_iterations}")
        )
        log(f"  {name}: {ms:.2f} ms")
    return table(
        "maha 3-DoF vs 6-DoF (reference best: 43.7 ms 3-DoF SIMD)",
        rows,
        ("variant", "total", "final cost", "accuracy"),
    )


def bench_backend_ablation(runs):
    """Single inner LM solve on identical correspondences per backend —
    the analog of the reference's SIMD-variant ablation (0.05 m filter)."""
    ndt_map, local, true_pose = build_world(filter_size=0.05)
    valid = ndt_map.valid_only()
    data = matching.match_point_cloud(
        jnp.asarray(valid.means, jnp.float32),
        jnp.asarray(valid.sqrt_informations, jnp.float32),
        jnp.asarray(local, jnp.float32),
        jnp.ones(local.shape[0], jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32),
    )
    jax.block_until_ready(data)
    log(f"  ablation correspondences: {data.num_factors}")
    options = Options()
    loss = ExponentialLoss()
    rows = []
    variants = [
        ("autodiff f32", AutodiffMahalanobisMinimizer().set_loss_function(loss)),
        ("jnp f32", nls.MahalanobisDistanceMinimizer().set_loss_function(loss)),
        ("pallas f32", nls.MahalanobisDistanceMinimizer(backend="pallas").set_loss_function(loss)),
    ]
    pose0 = nls.Pose.identity()
    for name, minimizer in variants:
        ms, (pose, summary) = timed(
            lambda m=minimizer: m.solve(options, data, pose0), runs
        )
        rows.append(
            (name, f"{ms:.2f} ms", f"{float(summary.final_cost):.1f}",
             f"iters={int(summary.iterations)} t={np.round(pose.translation, 6)}")
        )
        log(f"  {name}: {ms:.2f} ms")
    return table(
        "backend ablation: one 40-iter LM solve, 0.05 m filter "
        "(reference best: 194.5 ms raw AVX2)",
        rows,
        ("variant", "solve", "final cost", "result"),
    )


def bench_reproj(runs):
    points, pixels, intrinsics, true_pose = testing.generate_reprojection_fixture()
    data = reprojection.ReprojectionData(
        jnp.asarray(points, jnp.float32),
        jnp.asarray(pixels, jnp.float32),
        jnp.ones(points.shape[0], jnp.float32),
    )
    options = Options()
    loss = ExponentialLoss()
    rows = []
    for name, backend in (("jnp f32", "jnp"), ("pallas f32", "pallas")):
        minimizer = nls.ReprojectionErrorMinimizer(backend=backend)
        minimizer.set_loss_function(loss)
        ms, (pose, summary) = timed(
            lambda m=minimizer: m.solve(options, data, intrinsics, nls.Pose.identity()),
            runs,
        )
        expected = true_pose.inverse()
        err = np.linalg.norm(pose.translation - expected.translation)
        rows.append(
            (name, f"{ms:.2f} ms", f"{float(summary.final_cost):.2e}",
             f"iters={int(summary.iterations)} t_err={err:.2e}")
        )
        log(f"  {name}: {ms:.2f} ms")
    return table(
        "reprojection: 630-pt pose solve (reference best: 0.40 ms SIMD)",
        rows,
        ("variant", "solve", "final cost", "result"),
    )


BENCHES = {
    "maha_simple": bench_maha_simple,
    "maha_3dof_6dof": bench_maha_3dof_6dof,
    "backend_ablation": bench_backend_ablation,
    "reproj": bench_reproj,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "results"))
    ap.add_argument("--only", choices=sorted(BENCHES), default=None)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    log(f"devices: {jax.devices()}")
    selected = [args.only] if args.only else list(BENCHES)
    for name in selected:
        log(f"[{name}]")
        t0 = time.perf_counter()
        text = BENCHES[name](args.runs)
        log(f"[{name}] done in {time.perf_counter() - t0:.1f}s")
        print(text)
        with open(os.path.join(args.out, f"{name}_tpu.txt"), "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
