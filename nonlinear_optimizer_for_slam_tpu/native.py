"""ctypes bindings for the native host-runtime components (native/).

The C++ library provides the multithreaded NDT map builder and voxel
filter (native/ndt_builder.cc) — the host data pipeline feeding the
device solvers, playing the role of the reference's C++ map construction
and MultiThreadExecutor fan-out. The numpy implementations in
pipelines/ndt.py remain the portable fallback and correctness oracle.

Build: ``make -C native/`` (or ``ensure_built()``); g++ only, no Eigen.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .pipelines.ndt import (
    MIN_EIGENVALUE,
    MIN_EIGENVALUE_RATIO,
    MIN_POINTS_PER_VOXEL,
    NdtMap,
)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libnls_native.so")

_lib: Optional[ctypes.CDLL] = None


def ensure_built(force: bool = False) -> str:
    """Build the native library if missing; returns the .so path."""
    if force or not os.path.exists(_SO_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _SO_PATH


_ABI_VERSION = 2  # must match nls_abi_version() in ndt_builder.cc


def load(build_if_missing: bool = True) -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if build_if_missing:
        ensure_built()
    lib = ctypes.CDLL(_SO_PATH)

    # Refuse stale binaries: an old .so would silently ignore newer
    # trailing arguments (x86-64 calling convention) and return wrong
    # results (e.g. identity_moment=False handing back the quirked map).
    # Rebuild once if the sources are present, then re-check.
    def _abi(l):
        try:
            l.nls_abi_version.restype = ctypes.c_int64
            return int(l.nls_abi_version())
        except AttributeError:
            return 0

    if _abi(lib) != _ABI_VERSION:
        if not build_if_missing:
            raise OSError(
                f"{_SO_PATH}: native ABI {_abi(lib)} != expected "
                f"{_ABI_VERSION}; rebuild with `make -C native/`"
            )
        del lib
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-B"], check=True, capture_output=True
        )
        lib = ctypes.CDLL(_SO_PATH)
        if _abi(lib) != _ABI_VERSION:
            raise OSError(
                f"{_SO_PATH}: native ABI {_abi(lib)} != expected "
                f"{_ABI_VERSION} even after rebuild"
            )

    lib.nls_build_ndt_map.restype = ctypes.c_int64
    lib.nls_build_ndt_map.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # points
        ctypes.c_int64,  # n
        ctypes.c_double,  # resolution
        ctypes.c_int64,  # min_points
        ctypes.c_double,  # min_eigenvalue
        ctypes.c_double,  # eigenvalue_ratio
        ctypes.c_int64,  # max_voxels
        ctypes.POINTER(ctypes.c_double),  # means
        ctypes.POINTER(ctypes.c_double),  # sqrt_infos
        ctypes.POINTER(ctypes.c_double),  # infos
        ctypes.POINTER(ctypes.c_int64),  # counts
        ctypes.POINTER(ctypes.c_uint8),  # valid
        ctypes.c_int,  # num_threads
        ctypes.c_int,  # identity_moment
    ]
    lib.nls_voxel_filter.restype = ctypes.c_int64
    lib.nls_voxel_filter.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def build_ndt_map(
    points: np.ndarray,
    voxel_resolution: float,
    num_threads: int = 1,
    max_voxels: int = 1 << 20,
    identity_moment: bool = True,
) -> NdtMap:
    """Native equivalent of pipelines.ndt.build_ndt_map.

    ``num_threads=1`` (default) accumulates moments serially in input
    order — BIT-IDENTICAL to the numpy builder and to the reference's
    serial loop (tests/simple_optimization_test.cc:241-249). This matters:
    the row-scaled sqrt-information of near-degenerate (flat wall/floor)
    voxels is ulp-sensitive to the covariance, so threaded partial-sum
    merging would rotate their eigenbasis and shift the optimization cost
    trace. ``num_threads=0`` uses the host CPU count (the
    MultiThreadExecutor analog; each thread accumulates a voxel-map
    partial, merged at the end) when raw throughput matters more than
    bit-determinism. ``identity_moment`` mirrors the numpy builder's
    flag: True (default) keeps the reference's moment-init quirk for
    trace parity; False gives unbiased covariances for point-to-plane /
    D2D plane extraction."""
    lib = load()
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = pts.shape[0]
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1

    means = np.empty((max_voxels, 3))
    sqrt_infos = np.empty((max_voxels, 3, 3))
    infos = np.empty((max_voxels, 3, 3))
    counts = np.empty(max_voxels, dtype=np.int64)
    valid = np.empty(max_voxels, dtype=np.uint8)

    m = lib.nls_build_ndt_map(
        _ptr(pts, ctypes.c_double),
        n,
        voxel_resolution,
        MIN_POINTS_PER_VOXEL,
        MIN_EIGENVALUE,
        MIN_EIGENVALUE_RATIO,
        max_voxels,
        _ptr(means, ctypes.c_double),
        _ptr(sqrt_infos, ctypes.c_double),
        _ptr(infos, ctypes.c_double),
        _ptr(counts, ctypes.c_int64),
        _ptr(valid, ctypes.c_uint8),
        num_threads,
        1 if identity_moment else 0,
    )
    if m == -2:
        raise ValueError(
            "native build_ndt_map: voxel index outside the +/-2^20 "
            "packed-key range (points beyond ~1e6 voxels from the origin); "
            "use pipelines.ndt.build_ndt_map (exact integer-triple keys)"
        )
    if m < 0:
        raise RuntimeError(f"more than {max_voxels} voxels; raise max_voxels")
    return NdtMap(
        means=means[:m].copy(),
        sqrt_informations=sqrt_infos[:m].copy(),
        informations=infos[:m].copy(),
        counts=counts[:m].copy(),
        valid=valid[:m].astype(bool),
    )


def filter_points(points: np.ndarray, filter_voxel_size: float) -> np.ndarray:
    """Native equivalent of pipelines.ndt.filter_points (first point per
    voxel, input order)."""
    lib = load()
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = pts.shape[0]
    keep = np.empty(n, dtype=np.int64)
    kept = lib.nls_voxel_filter(
        _ptr(pts, ctypes.c_double), n, filter_voxel_size, _ptr(keep, ctypes.c_int64)
    )
    if kept == -2:
        raise ValueError(
            "native filter_points: voxel index outside the +/-2^20 "
            "packed-key range; use pipelines.ndt.filter_points"
        )
    return pts[keep[:kept]]


def _bind_match(lib):
    if getattr(lib, "_match_bound", False):
        return
    lib.nls_match_and_pack.restype = ctypes.c_int64
    lib.nls_match_and_pack.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # points
        ctypes.c_int64,  # n
        ctypes.POINTER(ctypes.c_double),  # R (3x3)
        ctypes.POINTER(ctypes.c_double),  # t (3)
        ctypes.POINTER(ctypes.c_double),  # means
        ctypes.POINTER(ctypes.c_double),  # sqrt_infos
        ctypes.c_int64,  # m
        ctypes.c_double,  # radius
        ctypes.c_int,  # k
        ctypes.c_int64,  # lanes
        ctypes.POINTER(ctypes.c_float),  # packed_out
        ctypes.c_int,  # num_threads
    ]
    lib._match_bound = True


def match_and_pack(
    points: np.ndarray,
    rotation: np.ndarray,
    translation: np.ndarray,
    means: np.ndarray,
    sqrt_infos: np.ndarray,
    radius: float,
    num_neighbors: int,
    lanes: int,
    out: np.ndarray = None,
    num_threads: int = 0,
) -> np.ndarray:
    """Correspondence search + packed (16, lanes) float32 kernel buffer
    (the FLANN analog, reference simple_optimization_test.cc:296-342;
    layout documented in ops/pallas_kernels.py). ``out`` may be a reusable
    preallocated (16, lanes) float32 array."""
    lib = load()
    _bind_match(lib)
    pts = np.ascontiguousarray(points, np.float64)
    R = np.ascontiguousarray(rotation, np.float64)
    t = np.ascontiguousarray(translation, np.float64)
    mu = np.ascontiguousarray(means, np.float64)
    S = np.ascontiguousarray(sqrt_infos.reshape(means.shape[0], 9), np.float64)
    if out is None:
        out = np.empty((16, lanes), np.float32)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    res = lib.nls_match_and_pack(
        _ptr(pts, ctypes.c_double),
        pts.shape[0],
        _ptr(R, ctypes.c_double),
        _ptr(t, ctypes.c_double),
        _ptr(mu, ctypes.c_double),
        _ptr(S, ctypes.c_double),
        mu.shape[0],
        radius,
        num_neighbors,
        lanes,
        _ptr(out, ctypes.c_float),
        num_threads,
    )
    if res < 0:
        raise ValueError("nls_match_and_pack: bad k or insufficient lanes")
    return out
