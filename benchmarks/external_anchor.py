"""Headline-scale external-anchor run (VERDICT r2 item 4).

Runs the same independent cross-checks as tests/test_external_anchor.py
at the scales the perf tables headline, and writes
results/external_anchor.md:

1. **BAL bundle adjustment at problem-49-7776 shape** (49 cameras,
   7,776 points, ~31k observations — the Ceres tutorial problem's
   dimensions): our Schur/LM solver vs scipy.optimize.least_squares
   (trust-region reflective, LSMR, finite-difference sparse Jacobians)
   on the identical Snavely objective, with the per-iteration cost
   trace published.
2. **sphere2500** (2,500 poses, 4,899 edges, dead-reckoned drifted
   init): our chordal-init + banded-direct production path vs scipy TRF,
   final chi^2 evaluated by the INDEPENDENT numpy implementation
   (utils/anchor_np.py) for both.

This is the reference's Ceres-anchor pattern
(pose_graph_optimizer_ceres.cc:15-69) applied to the beyond-reference
solvers; no Ceres/g2o binaries or published datasets are reachable in
this offline environment, so scipy is the independent optimizer.

Anchors are float64 CORRECTNESS artifacts, so this script forces the
CPU backend (the TPU chip has no f64; timing here is not a perf claim —
the perf tables are benchmarks/run_all.py's job). Runtime is dominated
by the scipy solves (several minutes at these scales).

Usage: python benchmarks/external_anchor.py [--quick] [--out results/]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize overrides the env var
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np

from nonlinear_optimizer_for_slam_tpu.core.options import Options
from nonlinear_optimizer_for_slam_tpu.io import bal as bal_io
from nonlinear_optimizer_for_slam_tpu.io import g2o as g2o_io
from nonlinear_optimizer_for_slam_tpu.solvers import bal as bal_solver
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    sqrt_info_from_information,
)
from nonlinear_optimizer_for_slam_tpu.utils import anchor_np, testing


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def anchor_bal(quick: bool):
    """BAL at problem-49-7776 shape; returns markdown lines."""
    C, P = (12, 500) if quick else (49, 7776)
    log(f"[bal] generating {C} cams x {P} pts ...")
    noisy, truth = bal_io.synthetic_bal_problem(
        num_cameras=C, num_points=P, observations_per_point=4, seed=49
    )
    O = noisy.num_observations
    init_cost = bal_solver.bal_cost(noisy)

    log(f"[bal] ours (Schur/LM, f64) on {O} observations ...")
    t0 = time.perf_counter()
    solved, summary = bal_solver.solve_bal(
        noisy, Options().replace(max_iterations=60)
    )
    t_ours = time.perf_counter() - t0
    ours = bal_solver.bal_cost(solved)
    n_it = int(summary.iterations)
    trace = np.asarray(summary.records.cost)
    trace = trace[np.isfinite(trace)]

    log("[bal] scipy TRF (independent optimizer, FD Jacobians) ...")
    t0 = time.perf_counter()
    sp = anchor_np.scipy_solve_bal(noisy, max_nfev=60 if quick else 200)
    t_scipy = time.perf_counter() - t0
    theirs = float(sp.cost)

    rel = abs(ours - theirs) / max(ours, theirs)
    ok = rel < 1e-3 and ours < 0.05 * init_cost
    lines = [
        f"## BAL bundle adjustment — problem-{C}-{P} shape "
        f"({O} observations)",
        "",
        "Snavely 9-parameter model, cost = 0.5 Σ|r|² (Ceres convention).",
        "",
        "| quantity | value |",
        "|---|---|",
        f"| initial cost | {init_cost:.4f} |",
        f"| **ours** (Schur/LM, f64) | **{ours:.4f}** ({n_it} iterations, "
        f"{t_ours:.1f} s CPU) |",
        f"| scipy least_squares (TRF/LSMR/FD) | {theirs:.4f} "
        f"({sp.nfev} nfev, {t_scipy:.1f} s CPU) |",
        f"| relative difference | {rel:.2e} |",
        f"| anchor | {'**PASS** (rel < 1e-3)' if ok else '**FAIL**'} |",
        "",
        "Per-iteration cost trace (ours):",
        "",
        "```",
    ]
    for i, c in enumerate(trace):
        lines.append(f"iter {i:2d}: {c:.6f}")
    lines += ["```", ""]
    return lines, ok


def anchor_sphere(quick: bool):
    """sphere2500 chi² cross-check; returns markdown lines."""
    if quick:
        g, gt_pos = testing.generate_sphere_g2o(n_rings=6, per_ring=40)
    else:
        g, gt_pos = testing.generate_sphere_g2o()  # 2500 poses, 4899 edges
    N, E = len(g.vertices), len(g.edges)
    log(f"[sphere] {N} poses, {E} edges")

    edges_ij = np.array([[e.i, e.j] for e in g.edges])
    t_rel = np.stack([e.measurement[:3] for e in g.edges])
    q_rel = np.stack([e.measurement[3:] for e in g.edges])
    sqrt_infos = np.stack(
        [sqrt_info_from_information(e.information) for e in g.edges]
    )
    pos0 = np.stack([g.vertices[k][:3] for k in range(N)])
    q0 = np.stack([g.vertices[k][3:] for k in range(N)])
    chi2_init = anchor_np.sphere_chi2(
        pos0, q0, edges_ij, t_rel, q_rel, sqrt_infos
    )

    with tempfile.NamedTemporaryFile(suffix=".g2o", delete=False) as tf:
        path = tf.name
    g2o_io.write_g2o(path, g)

    log("[sphere] ours (chordal init + banded direct, f64) ...")
    import jax.numpy as jnp

    opt = g2o_io.load_pose_graph(path, dtype=jnp.float64, solver="banded")
    t0 = time.perf_counter()
    opt.initialize(method="chordal")
    summary, _ = opt.solve(Options().replace(max_iterations=150))
    t_ours = time.perf_counter() - t0
    ours_pos = np.stack([opt.get_pose(k).translation for k in range(N)])
    ours_q = np.stack([opt.get_pose(k).quaternion() for k in range(N)])
    chi2_ours = anchor_np.sphere_chi2(
        ours_pos, ours_q, edges_ij, t_rel, q_rel, sqrt_infos
    )
    os.unlink(path)

    log("[sphere] scipy TRF (independent optimizer, FD Jacobians) ...")
    t0 = time.perf_counter()
    sp_pos, sp_q = anchor_np.scipy_solve_sphere(
        edges_ij, t_rel, q_rel, sqrt_infos, pos0, q0,
        max_nfev=80 if quick else 200, verbose=0,
    )
    t_scipy = time.perf_counter() - t0
    chi2_scipy = anchor_np.sphere_chi2(
        sp_pos, sp_q, edges_ij, t_rel, q_rel, sqrt_infos
    )

    rel = abs(chi2_ours - chi2_scipy) / max(chi2_ours, chi2_scipy)
    ok = chi2_ours < 1e-2 * chi2_init and rel < 2e-2
    err = max(
        np.linalg.norm(ours_pos[k] - gt_pos[k]) for k in range(len(gt_pos))
    )
    lines = [
        f"## sphere2500 pose graph ({N} poses, {E} edges)",
        "",
        "chi² = Σ|S·r|² evaluated by the independent numpy twin "
        "(utils/anchor_np.py) on BOTH solutions.",
        "",
        "| quantity | value |",
        "|---|---|",
        f"| initial chi² (dead-reckoned drift) | {chi2_init:.4e} |",
        f"| **ours** (chordal + banded direct, f64) | **{chi2_ours:.6e}** "
        f"({t_ours:.1f} s CPU; max err vs ground truth {err:.2f} m) |",
        f"| scipy least_squares (TRF/LSMR/FD) | {chi2_scipy:.6e} "
        f"({t_scipy:.1f} s CPU) |",
        f"| relative difference | {rel:.2e} |",
        f"| anchor | {'**PASS** (rel < 2e-2, chi² < 1e-2·init)' if ok else '**FAIL**'} |",
        "",
    ]
    return lines, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced scales for a fast smoke run")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "results"),
    )
    args = ap.parse_args()

    header = [
        "# External anchors at headline scale",
        "",
        f"Generated by `python benchmarks/external_anchor.py"
        f"{' --quick' if args.quick else ''}` — the reference's"
        " Ceres-anchor pattern (pose_graph_optimizer_ceres.cc:15-69)"
        " applied to the at-scale solvers, with"
        " scipy.optimize.least_squares as the independent optimizer"
        " (separate trust-region implementation, separate linear algebra,"
        " finite-difference Jacobians) and the chi²/cost evaluated by"
        " jax-free numpy twins. Float64 on CPU: these are correctness"
        " anchors, not perf rows (see results/*_tpu.txt for perf).",
        "",
    ]

    bal_lines, bal_ok = anchor_bal(args.quick)
    sph_lines, sph_ok = anchor_sphere(args.quick)

    out_path = os.path.join(args.out, "external_anchor.md")
    with open(out_path, "w") as f:
        f.write("\n".join(header + bal_lines + sph_lines) + "\n")
    log(f"wrote {out_path}")
    print(
        f'{{"bal_anchor": "{"PASS" if bal_ok else "FAIL"}", '
        f'"sphere_anchor": "{"PASS" if sph_ok else "FAIL"}"}}'
    )
    return 0 if (bal_ok and sph_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
