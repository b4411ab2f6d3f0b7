"""Headline benchmark: full 6-DoF NDT scan-to-map registration on the
reference workload (the "maha simple" benchmark).

Workload (identical to reference mahalanobis tests/simple_optimization_test.cc):
  ~954,605-point synthetic room -> 96-voxel NDT map (1.0 m), scan = 0.1 m
  voxel filter warped by the true pose, outer ICP loop (re-matching) with
  inner LM solves (40 iters max, exponential loss).

Baseline to beat: 58.9 ms total solve wall time — the reference's AVX2
analytic-SIMD variant on an i7-10700 (results/maha_amd64_simple.txt,
BASELINE.md). vs_baseline is the speedup ratio (baseline_ms / ours_ms).

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_MS = 58.9  # reference analytic SIMD, maha simple (BASELINE.md)
NUM_TIMED_RUNS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os
    import threading

    # Fail FAST if the TPU relay is unreachable: jax.devices() hangs
    # indefinitely when the axon tunnel is down (observed multi-hour
    # outages) and a silently hung benchmark is worse than an explicit
    # failure. The watchdog is disarmed as soon as devices enumerate.
    armed = threading.Event()
    armed.set()

    def watchdog():
        if not armed.wait(timeout=0.0):  # pragma: no cover
            return
        import time as _t

        deadline = _t.time() + 420.0
        while _t.time() < deadline:
            if not armed.is_set():
                return
            _t.sleep(5.0)
        if armed.is_set():
            log("FATAL: TPU device enumeration exceeded 420 s — the relay "
                "tunnel is likely down; aborting instead of hanging")
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    # Whole-run watchdog: the relay has a second failure mode (observed
    # 2026-08-20) where enumeration and small dispatches work but a
    # larger program wedges mid-solve indefinitely. A hung benchmark
    # blocks the driver; die loudly instead.
    done_flag = threading.Event()

    def run_watchdog():
        # budget: worst honest case is ~3 cold compiles on a slow
        # compile-service day (~10 min each was measured) + the run
        if not done_flag.wait(timeout=2100.0):  # pragma: no cover
            log("FATAL: benchmark exceeded 2100 s wall — the relay is "
                "likely wedged mid-dispatch (known degraded mode; see "
                "CLAUDE.md); aborting instead of hanging the driver")
            os._exit(4)

    threading.Thread(target=run_watchdog, daemon=True).start()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import nonlinear_optimizer_for_slam_tpu as nls
    from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
    from nonlinear_optimizer_for_slam_tpu.pipelines import fused_registration, ndt
    from nonlinear_optimizer_for_slam_tpu.utils import testing

    log(f"devices: {jax.devices()}")
    armed.clear()  # devices enumerated; disarm the watchdog

    t0 = time.perf_counter()
    points = testing.generate_room_points()  # ~954,605 pts (reference world)
    try:  # native C++ pipeline (~300x faster); numpy fallback
        from nonlinear_optimizer_for_slam_tpu import native

        ndt_map = native.build_ndt_map(points, 1.0)
        scan = native.filter_points(points, 0.1)
    except Exception as e:  # pragma: no cover
        log(f"native pipeline unavailable ({e}); numpy fallback")
        ndt_map = ndt.build_ndt_map(points, 1.0)
        scan = ndt.filter_points(points, 0.1)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)
    log(
        f"fixture: {points.shape[0]} raw pts, {int(ndt_map.valid.sum())} valid "
        f"voxels, {local.shape[0]} scan pts ({time.perf_counter() - t0:.1f}s host build)"
    )

    # ---- pure LM iteration rate, measured FIRST in the clean runtime
    # state (the single-while+pallas program runs at true device speed
    # only before any gather/top_k/cond program executes — CLAUDE.md).
    # Correspondences come from the native matcher so no device gathers
    # run yet. BENCH_SKIP_PROBE=1 skips it (used to isolate its effect
    # on the later throughput windows — see the methodology note there).
    try:
        if os.environ.get("BENCH_SKIP_PROBE"):
            raise RuntimeError("probe disabled via BENCH_SKIP_PROBE")
        from nonlinear_optimizer_for_slam_tpu import native as native_mod
        from nonlinear_optimizer_for_slam_tpu.ops import pallas_kernels as pk
        from nonlinear_optimizer_for_slam_tpu.pipelines.fused_registration import (
            _packed_lm_solve,
        )

        valid = ndt_map.valid_only()
        lanes = ((local.shape[0] * 2 + pk.LANE_BLOCK - 1) // pk.LANE_BLOCK) * pk.LANE_BLOCK
        packed_np = native_mod.match_and_pack(
            local, np.eye(3), np.zeros(3), valid.means, valid.sqrt_informations,
            1.0, 2, lanes,
        )
        import jax as _jax
        import jax.numpy as _jnp

        # force the full 40 iterations (no tolerance break) for a clean rate
        from nonlinear_optimizer_for_slam_tpu.core.options import ConvergenceHandle

        rate_opts = Options().replace(
            convergence_handle=ConvergenceHandle(0.0, 0.0, 0.0)
        )
        packed_dev = _jnp.asarray(packed_np)
        t0j = _jnp.zeros(3, _jnp.float32)
        q0j = _jnp.asarray([1.0, 0, 0, 0], _jnp.float32)
        loss_obj = ExponentialLoss(c1=1.0, c2=1.0)
        out = _packed_lm_solve(t0j, q0j, packed_dev, loss_obj, rate_opts, False)
        _jax.block_until_ready(out)
        reps = 10
        # distinct initial poses per rep: the relay caches identical
        # (executable, args) dispatches (CLAUDE.md), which would make
        # this measure cache lookups instead of solves
        t0s = [t0j.at[0].add(1e-6 * (r + 1)) for r in range(reps)]
        _jax.block_until_ready(t0s)
        t0 = time.perf_counter()
        for r in range(reps):
            _jax.block_until_ready(
                _packed_lm_solve(t0s[r], q0j, packed_dev, loss_obj, rate_opts, False)
            )
        per_solve = (time.perf_counter() - t0) / reps
        log(
            f"pure LM iteration rate (clean state, {lanes} lanes, 40 iters/solve): "
            f"{per_solve * 1e3:.3f} ms/solve = {40 / per_solve:.0f} iterations/s "
            f"(AVX baseline ~2,700/s -> {40 / per_solve / 2700:.0f}x)"
        )
    except Exception as e:  # pragma: no cover
        log(f"iteration-rate probe skipped: {e}")

    registrar = fused_registration.NdtRegistrar(
        ndt_map, Options(), ExponentialLoss(c1=1.0, c2=1.0)
    )

    def perturbed_pose(i: int) -> "nls.Pose":
        """Distinct-per-run initial pose (sub-mm; does not change the
        converged result) — defeats the relay's identical-dispatch cache
        so every timed run is a real solve."""
        p = nls.Pose.identity()
        p.translation = p.translation + 1e-5 * (i + 1)
        return p

    def run(i: int = 0):
        return registrar.register(local, perturbed_pose(i))

    # throughput mode FIRST — BEFORE any blocking register() call.
    # METHODOLOGY (round-3 verdict: this number and run_all.py's serving
    # row disagreed 8x — 9.62 vs 1.22 ms/scan). Root cause, bisected on
    # hardware (2026-08-20, /tmp/pipe_bisect.py): the FIRST blocking
    # (synchronous) registration permanently flips this runtime into its
    # degraded dispatch mode — async-warmed windows measure 14 ms before
    # one register() call and 98 ms after it, in the same process. A
    # production stream that never blocks serially sustains the clean
    # number, so the pipelined figure is measured first, from an
    # async-only warm-up, with run_all.py's policy (median of 3 warmed
    # depth-10 windows); the serial latency loop follows and its
    # post-degradation window is reported for the bridge.
    import jax as _jax

    depth = 10

    def _window(base):
        t0 = time.perf_counter()
        outs = [
            registrar.register_async(local, perturbed_pose(base + i))
            for i in range(depth)
        ]
        _jax.block_until_ready(outs)
        return (time.perf_counter() - t0) * 1000.0

    warm_t0 = time.perf_counter()
    _window(100)  # async warm-up window (compiles the fused program)
    warm_s = time.perf_counter() - warm_t0
    walls = [_window(120 + 20 * w) for w in range(3)]
    thr = float(np.median(walls)) / depth
    log(f"pipelined throughput (stream-only state): {thr:.2f} "
        f"ms/registration ({1000.0 / thr:.0f} scans/s; vs_baseline "
        f"{BASELINE_MS / thr:.1f}x; median-of-3 warmed windows, walls "
        f"{[round(w, 1) for w in walls]} ms; async warm-up "
        f"{warm_s:.2f}s incl. compile)")

    # batched streaming, still in the clean state: windows of 2 async
    # lockstep batches of 16 in flight, one block per window — the
    # highest-throughput serving shape (batch amortizes per-dispatch
    # cost, the async pipeline hides the fetch)
    Bst = 16

    def _batch_window(base):
        t0 = time.perf_counter()
        outs = [
            registrar.register_batch_async(
                [local] * Bst,
                [perturbed_pose(base + w * Bst + i) for i in range(Bst)],
            )
            for w in range(2)
        ]
        _jax.block_until_ready(outs)
        return (time.perf_counter() - t0) * 1000.0

    _batch_window(1000)  # warm-up (compile the lockstep program)
    bwalls = [_batch_window(1100 + 100 * w) for w in range(3)]
    stream = float(np.median(bwalls)) / (2 * Bst)
    log(f"async batched streaming (2x B={Bst} in flight, stream-only "
        f"state): {stream:.2f} ms/scan ({1000.0 / stream:.0f} scans/s; "
        f"vs_baseline {BASELINE_MS / stream:.1f}x)")

    # serial latency mode: the FIRST run() below is also the correctness
    # check (and flips the runtime into its degraded dispatch state —
    # see the methodology note above)
    res = run()
    t_err = np.linalg.norm(res.pose.translation - true_pose.translation)
    total_inner = int(res.inner_iterations.sum()) + res.outer_iterations
    log(
        f"correctness: outer={res.outer_iterations}, "
        f"inner LM iters={total_inner}, t_err={t_err * 1000:.2f} mm, "
        f"final cost={res.final_cost:.1f}"
    )
    assert t_err < 0.05, f"registration diverged: {t_err}"

    times = []
    for i in range(NUM_TIMED_RUNS):
        t0 = time.perf_counter()
        run(i + 1)
        times.append((time.perf_counter() - t0) * 1000.0)
    times = np.asarray(times)
    best, median = float(times.min()), float(np.median(times))
    log(f"total solve wall ms over {NUM_TIMED_RUNS} runs: best={best:.2f} "
        f"median={median:.2f} mean={times.mean():.2f}")
    log(f"inner LM iterations/s (median run): {total_inner / (median / 1000.0):.0f}")

    walls_post = [_window(200 + 20 * w) for w in range(3)]
    thr_post = float(np.median(walls_post)) / depth
    log(f"pipelined throughput after the serial phase: {thr_post:.2f} "
        f"ms/registration (degraded dispatch state after blocking "
        f"register() calls; the gap vs {thr:.2f} is the runtime floor, "
        f"not the program)")

    # serving mode: B scans in ONE lockstep-outer program (per-lane
    # trajectories identical to serial — tests/test_batched.py); the
    # dispatch quantum amortizes to quantum/B
    Bsv = 16
    registrar.register_batch(  # warm-up compile
        [local] * Bsv, [perturbed_pose(200 + i) for i in range(Bsv)]
    )
    t0 = time.perf_counter()
    registrar.register_batch(
        [local] * Bsv, [perturbed_pose(300 + i) for i in range(Bsv)]
    )
    lockstep = (time.perf_counter() - t0) / Bsv * 1000.0
    log(f"lockstep batched serving: {lockstep:.2f} ms/scan at B={Bsv} "
        f"(vs_baseline {BASELINE_MS / lockstep:.1f}x)")

    # One JSON line. The primary value is the serial wall-clock median —
    # bounded below by this runtime's ~30 ms relay dispatch quantum
    # (CLAUDE.md), which is why the pipelined number (scans in flight,
    # dispatch latency amortized) is reported alongside: it is the
    # architectural per-scan time a production stream actually pays.
    done_flag.set()
    print(
        json.dumps(
            {
                "metric": "maha6_ndt_registration_total_solve",
                "value": round(median, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / median, 3),
                "pipelined_ms": round(thr, 3),
                "pipelined_vs_baseline": round(BASELINE_MS / thr, 3),
                "lockstep_b16_ms_per_scan": round(lockstep, 3),
                "lockstep_vs_baseline": round(BASELINE_MS / lockstep, 3),
                "batched_stream_ms_per_scan": round(stream, 3),
                "batched_stream_vs_baseline": round(BASELINE_MS / stream, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
