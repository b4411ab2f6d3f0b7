"""Example: 6-DoF NDT scan-to-map registration (the flagship pipeline).

Builds the reference benchmark world, registers a simulated scan with the
single-dispatch fused ICP, and prints the trajectory of inner LM counts
and costs.

Run: python examples/ndt_registration.py
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
from nonlinear_optimizer_for_slam_tpu.pipelines import fused_registration, ndt
from nonlinear_optimizer_for_slam_tpu.utils import testing


def main():
    print("building world...")
    points = testing.generate_room_points(point_step=0.02)
    try:
        from nonlinear_optimizer_for_slam_tpu import native

        ndt_map = native.build_ndt_map(points, 1.0)
        scan = native.filter_points(points, 0.1)
    except Exception:
        ndt_map = ndt.build_ndt_map(points, 1.0)
        scan = ndt.filter_points(points, 0.1)

    true_pose = testing.maha_true_pose()
    local_scan = true_pose.inverse().apply(scan)
    print(f"{points.shape[0]} map points -> {int(ndt_map.valid.sum())} NDT voxels; "
          f"scan has {local_scan.shape[0]} points")

    registrar = fused_registration.NdtRegistrar(
        ndt_map, Options(), ExponentialLoss(c1=1.0, c2=1.0)
    )
    t0 = time.perf_counter()
    result = registrar.register(local_scan, nls.Pose.identity())
    print(f"first registration (incl. compile): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    result = registrar.register(local_scan, nls.Pose.identity())
    print(f"warm registration: {(time.perf_counter() - t0) * 1e3:.1f} ms")

    err = np.linalg.norm(result.pose.translation - true_pose.translation)
    print(f"estimated pose: {result.pose}")
    print(f"true pose:      {true_pose}")
    print(f"translation error: {err * 1e3:.2f} mm")
    print(f"outer iterations: {result.outer_iterations}, "
          f"inner LM iterations per outer: {result.inner_iterations.tolist()}")
    print(f"costs per outer iteration: {np.round(result.costs, 1).tolist()}")


if __name__ == "__main__":
    main()
