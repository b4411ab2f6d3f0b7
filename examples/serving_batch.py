"""Example: serving-mode batched solving.

The reference solves one problem per `Solve` call; on a TPU the serving
fast path is B independent problems vmapped into ONE device program
(solvers/batched.py). This example:

1. solves a batch of 64 PnP (reprojection) problems with ragged
   correspondence counts in one dispatch, and
2. registers a batch of 8 LiDAR scans against one NDT map — full
   matching + inner LM + outer ICP per scan — in one dispatch
   (NdtRegistrar.register_batch).

Run: python examples/serving_batch.py          (TPU or CPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import jax

if "--cpu" in sys.argv:  # run off-TPU (this runtime ignores JAX_PLATFORMS)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
from nonlinear_optimizer_for_slam_tpu.ops import reprojection
from nonlinear_optimizer_for_slam_tpu.ops.reprojection import CameraIntrinsics
from nonlinear_optimizer_for_slam_tpu.pipelines import fused_registration, ndt
from nonlinear_optimizer_for_slam_tpu.solvers import solve_reprojection_batch
from nonlinear_optimizer_for_slam_tpu.utils import testing


def batched_pnp():
    rng = np.random.default_rng(0)
    B, n_pad = 64, 256
    intr = CameraIntrinsics.create(525.0, 525.0, 320.0, 240.0, 640, 480)
    loss = ExponentialLoss()

    pts_b = np.zeros((B, n_pad, 3))
    pix_b = np.zeros((B, n_pad, 2))
    mask_b = np.zeros((B, n_pad))
    true_poses = []
    for b in range(B):
        n = int(rng.integers(120, n_pad))  # ragged problem sizes
        pts = np.stack(
            [
                rng.uniform(-1.5, 1.5, n),
                rng.uniform(-1.0, 1.0, n),
                rng.uniform(2.5, 4.0, n),
            ],
            axis=1,
        )
        tp = nls.Pose.from_axis_angle(
            0.05 * rng.normal(), rng.normal(size=3), 0.1 * rng.normal(size=3)
        )
        q = tp.apply(pts)
        pts_b[b, :n] = pts
        pix_b[b, :n, 0] = 525 * q[:, 0] / q[:, 2] + 320
        pix_b[b, :n, 1] = 525 * q[:, 1] / q[:, 2] + 240
        mask_b[b, :n] = 1.0
        true_poses.append(tp)

    data = reprojection.ReprojectionData(
        jnp.asarray(pts_b), jnp.asarray(pix_b), jnp.asarray(mask_b)
    )
    t0 = time.perf_counter()
    poses, iters, costs = solve_reprojection_batch(
        Options(), data, intr, [nls.Pose.identity()] * B, loss=loss
    )
    wall = (time.perf_counter() - t0) * 1e3
    err = max(
        np.linalg.norm(p.translation - tp.translation)
        for p, tp in zip(poses, true_poses)
    )
    print(
        f"batched PnP: {B} ragged problems in one dispatch "
        f"(incl. compile on first run): {wall:.1f} ms total = "
        f"{wall / B:.3f} ms/solve, max t_err {err:.2e}, "
        f"iters {int(iters.min())}-{int(iters.max())}"
    )


def batched_registration():
    # 2 cm grid: a 5 cm room is too coarse for NDT voxel statistics —
    # its saturated exponential loss stalls registration at ~0.2 m
    # (same finding as tests/test_minimizers.py small_world)
    pts = testing.generate_room_points(point_step=0.02)
    ndt_map = ndt.build_ndt_map(pts, 1.0)
    scan = ndt.filter_points(pts, 0.1)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    registrar = fused_registration.NdtRegistrar(
        ndt_map, Options(), ExponentialLoss()
    )
    B = 8
    # ragged scan sizes: random subsamples keep the room geometry intact
    # (truncating the tail would drop whole walls and un-constrain axes)
    rng = np.random.default_rng(1)
    scans = [
        local[np.sort(rng.choice(len(local), len(local) - 800 * b, replace=False))]
        for b in range(B)
    ]
    t0 = time.perf_counter()
    results = registrar.register_batch(scans, [nls.Pose.identity()] * B)
    wall = (time.perf_counter() - t0) * 1e3
    err = max(
        np.linalg.norm(r.pose.translation - true_pose.translation)
        for r in results
    )
    print(
        f"batched registration: {B} scans x full ICP in one dispatch "
        f"(incl. compile on first run): {wall:.1f} ms total = "
        f"{wall / B:.2f} ms/scan, max t_err {err:.2e}"
    )


def main():
    batched_pnp()
    batched_registration()


if __name__ == "__main__":
    main()
