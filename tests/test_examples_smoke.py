"""Smoke tests for the CLI examples (subprocess, --cpu, tiny demo
inputs): the examples are the framework's user-facing surface and their
argument plumbing (solver='auto' defaults, --rtol plateau stop, demo
generators) is otherwise untested. Heavier end-to-end example coverage
lives in tests/test_full_slam.py (full_slam driven as a library)."""

import os
import subprocess
import sys

import pytest

_EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run(name, *args, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    p = subprocess.run(
        [sys.executable, os.path.join(_EXAMPLES, name), "--cpu", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    assert p.returncode == 0, (
        f"{name} rc={p.returncode}\nstdout:\n{p.stdout[-2000:]}\n"
        f"stderr:\n{p.stderr[-2000:]}"
    )
    return p.stdout


def test_g2o_solve_demo(tmp_path):
    """No-input mode: writes a 64-pose loop demo, solves with
    solver='auto' + the --rtol plateau stop, reports the picked solver."""
    out = _run(
        "g2o_solve.py", "-o", str(tmp_path / "solved.g2o"),
        "--max-iterations", "60",
    )
    assert "solved in" in out
    assert "solver=" in out  # auto reports its pick
    assert (tmp_path / "solved.g2o").exists()


def test_bal_solve_demo(tmp_path):
    """No-input mode generates the problem-49-7776-shape synthetic and
    solves it (f32, few iterations for speed)."""
    out = _run(
        "bal_solve.py", "--f32", "--max-iterations", "5",
        "-o", str(tmp_path / "out.txt"),
    )
    assert "cost" in out.lower()
    assert (tmp_path / "out.txt").exists()
