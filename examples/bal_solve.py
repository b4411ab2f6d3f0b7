"""Solve a BAL (Bundle Adjustment in the Large) problem file.

    python examples/bal_solve.py problem-49-7776-pre.txt
        [--max-iterations N] [--f32] [--landmark-chunk N] [--cpu]
        [-o solved.txt]

Reads the standard BAL text format (Agarwal et al., ECCV 2010 —
https://grail.cs.washington.edu/projects/bal/; plain or .gz), solves the
Snavely 9-parameter model with the dense-Schur/LM solver
(solvers/bal.py), prints the per-iteration cost trace in the Ceres
convention (0.5 Σ|r|², directly comparable to Ceres' own
simple_bundle_adjuster logs on the same file), and optionally writes the
solved problem back in BAL format.

With no input file, generates a synthetic BAL-geometry problem at the
problem-49-7776 shape and solves that (the external-anchor construction
— scipy cross-check in results/external_anchor.md).

``--f32`` runs single precision (the TPU's native arithmetic; the f64
default requires --cpu or an x64-enabled process).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
if "--cpu" in sys.argv:  # run off-TPU (this runtime ignores JAX_PLATFORMS)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.io import bal as bal_io
from nonlinear_optimizer_for_slam_tpu.solvers import bal as bal_solver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=None,
                    help="BAL problem file (.txt or .txt.gz)")
    ap.add_argument("-o", "--output", default=None,
                    help="write the solved problem back in BAL format")
    ap.add_argument("--max-iterations", type=int, default=50)
    ap.add_argument("--f32", action="store_true",
                    help="solve in float32 (TPU-native)")
    ap.add_argument("--landmark-chunk", type=int, default=None,
                    help="chunked Schur cross-term (memory O(chunk*C*27))")
    args = ap.parse_args()

    if args.input:
        problem = bal_io.read_bal(args.input)
        print(f"loaded {args.input}: {problem.num_cameras} cameras, "
              f"{problem.num_points} points, "
              f"{problem.num_observations} observations")
    else:
        print("no input file — generating a synthetic problem at the "
              "problem-49-7776 shape")
        problem, _ = bal_io.synthetic_bal_problem(
            num_cameras=49, num_points=7776, observations_per_point=4,
            seed=49,
        )

    dtype = jnp.float32 if args.f32 else jnp.float64
    opts = Options().replace(max_iterations=args.max_iterations)

    t0 = time.perf_counter()
    solved, summary = bal_solver.solve_bal(
        problem, opts, dtype=dtype, landmark_chunk=args.landmark_chunk
    )
    wall = time.perf_counter() - t0

    trace = np.asarray(summary.records.cost)
    trace = trace[np.isfinite(trace)]
    for i, c in enumerate(trace):
        print(f"  iter {i:3d}: cost {c:.6e}")
    print(f"final cost {bal_solver.bal_cost(solved, dtype=dtype):.6e} "
          f"(0.5*sum|r|^2, Ceres convention) in {int(summary.iterations)} "
          f"iterations, {wall:.1f}s wall "
          f"(converged={bool(summary.converged)})")

    if args.output:
        bal_io.write_bal(args.output, solved)
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
