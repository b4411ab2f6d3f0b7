"""Example: 6-DoF NDT scan-to-map registration (the flagship pipeline).

Builds the reference benchmark world, registers a simulated scan with the
single-dispatch fused ICP, and prints the trajectory of inner LM counts
and costs. With --objective p2p or --objective d2d the same world runs
through the point-to-plane or distribution-to-distribution (GICP-style)
pipeline instead — both beyond the reference, which is point-to-NDT only.

Run: python examples/ndt_registration.py [--cpu] [--objective maha|p2p|d2d]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if "--cpu" in sys.argv:  # run off-TPU (this runtime ignores JAX_PLATFORMS)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
from nonlinear_optimizer_for_slam_tpu.pipelines import (
    fused_registration,
    ndt,
    registration,
)
from nonlinear_optimizer_for_slam_tpu.utils import testing


def main():
    objective = "maha"
    if "--objective" in sys.argv:
        i = sys.argv.index("--objective")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--objective needs a value (maha|p2p|d2d)")
        objective = sys.argv[i + 1]
        del sys.argv[i : i + 2]
    if objective not in ("maha", "p2p", "d2d"):
        raise SystemExit(f"unknown --objective {objective!r} (maha|p2p|d2d)")

    print("building world...")
    points = testing.generate_room_points(point_step=0.02)
    # p2p/d2d plane extraction wants the unbiased (identity_moment=False)
    # build; the mahalanobis path keeps the reference-parity default.
    quirk = objective == "maha"
    try:
        from nonlinear_optimizer_for_slam_tpu import native

        ndt_map = native.build_ndt_map(points, 1.0, identity_moment=quirk)
        scan = native.filter_points(points, 0.1)
    except Exception:
        ndt_map = ndt.build_ndt_map(points, 1.0, identity_moment=quirk)
        scan = ndt.filter_points(points, 0.1)

    true_pose = testing.maha_true_pose()
    local_scan = true_pose.inverse().apply(scan)
    print(f"{points.shape[0]} map points -> {int(ndt_map.valid.sum())} NDT voxels; "
          f"scan has {local_scan.shape[0]} points")

    if objective == "maha":
        registrar = fused_registration.NdtRegistrar(
            ndt_map, Options(), ExponentialLoss(c1=1.0, c2=1.0)
        )
        run = lambda: registrar.register(local_scan, nls.Pose.identity())
    elif objective == "p2p":
        minimizer = nls.PointToPlaneMinimizer().set_loss_function(
            ExponentialLoss(c1=1.0, c2=1.0)
        )
        run = lambda: registration.register_point_to_plane(
            ndt_map, local_scan, nls.Pose.identity(), minimizer, Options(),
            max_thickness=0.05,
        )
    else:  # d2d
        minimizer = nls.MahalanobisDistanceMinimizer()
        run = lambda: registration.register_d2d_ndt(
            ndt_map, local_scan, nls.Pose.identity(), minimizer, Options()
        )

    t0 = time.perf_counter()
    result = run()
    print(f"first registration (incl. compile): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    result = run()
    print(f"warm registration: {(time.perf_counter() - t0) * 1e3:.1f} ms")

    err = np.linalg.norm(result.pose.translation - true_pose.translation)
    print(f"estimated pose: {result.pose}")
    print(f"true pose:      {true_pose}")
    print(f"translation error: {err * 1e3:.2f} mm")
    if objective == "maha":
        print(f"outer iterations: {result.outer_iterations}, "
              f"inner LM iterations per outer: {result.inner_iterations.tolist()}")
        print(f"costs per outer iteration: {np.round(result.costs, 1).tolist()}")
    else:
        print(f"outer iterations: {result.outer_iterations}, "
              f"final cost: {float(result.summaries[-1].final_cost):.6f}")


if __name__ == "__main__":
    main()
