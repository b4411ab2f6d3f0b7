"""NDT map construction: voxelize -> moments -> eigendecomposition ->
eigenvalue flooring -> sqrt-information.

Host-side fixture/data pipeline, vectorized numpy (the reference's is a
hash-map accumulation loop, mahalanobis tests/simple_optimization_test.cc:
236-294). A C++ native builder with identical semantics lives in
``native/`` for large streaming workloads; this numpy path is the portable
fallback and the correctness oracle for it.

Semantics reproduced exactly:
- voxel key = floor(p / res) per axis (Cantor pairing only matters for the
  hash map — set membership is identical with integer-triple keys);
- validity: count >= 5 AND largest eigenvalue >= 0.01;
- flooring: lambda_0,1 = max(lambda_0,1, 0.01 * lambda_2);
- sqrt_information = diag(1/sqrt(lambda)) @ V  with V columns = eigenvectors
  (reference: tests/simple_optimization_test.cc:275 — note this is
  D^{-1/2} V, NOT D^{-1/2} V^T; information = S^T S = V^T D^{-1} V is then
  NOT exactly cov^{-1}, but it is what the reference optimizes, so parity
  requires reproducing it verbatim);
- the reference's early ``return`` on eigensolver failure (:266-268) is a
  bug (it aborts processing of all remaining voxels); we use ``continue``
  semantics (mark voxel invalid, keep going).
"""

from __future__ import annotations

import dataclasses

import numpy as np

MIN_POINTS_PER_VOXEL = 5  # reference: tests/simple_optimization_test.cc:250
MIN_EIGENVALUE = 0.01  # :265
MIN_EIGENVALUE_RATIO = 0.01  # :270


@dataclasses.dataclass
class NdtMap:
    """SoA NDT map (reference NDT struct: mahalanobis .../types.h:11-23)."""

    means: np.ndarray  # (M, 3)
    sqrt_informations: np.ndarray  # (M, 3, 3)
    informations: np.ndarray  # (M, 3, 3)
    counts: np.ndarray  # (M,)
    valid: np.ndarray  # (M,) bool

    @property
    def num_voxels(self) -> int:
        return self.means.shape[0]

    def valid_only(self) -> "NdtMap":
        m = self.valid
        return NdtMap(
            self.means[m],
            self.sqrt_informations[m],
            self.informations[m],
            self.counts[m],
            np.ones(int(m.sum()), dtype=bool),
        )


def compute_voxel_keys(points: np.ndarray, inv_resolution: float) -> np.ndarray:
    """Cantor-paired uint64 voxel keys
    (reference: tests/simple_optimization_test.cc:282-294). Kept for parity
    testing against the native C++ builder; the numpy build below uses
    integer-triple keys which induce the same voxel partition."""
    ijk = np.floor(np.asarray(points) * inv_resolution).astype(np.int64)
    folded = np.where(ijk >= 0, 2 * ijk, -2 * ijk - 1).astype(np.uint64)
    x, y, z = folded[:, 0], folded[:, 1], folded[:, 2]
    xy = (x + y) * (x + y + 1) // 2 + y
    return (xy + z) * (xy + z + 1) // 2 + z


def build_ndt_map(points: np.ndarray, voxel_resolution: float) -> NdtMap:
    """Vectorized equivalent of UpdateNdtMap
    (reference: tests/simple_optimization_test.cc:236-280)."""
    points = np.asarray(points, dtype=np.float64)
    inv_res = 1.0 / voxel_resolution
    ijk = np.floor(points * inv_res).astype(np.int64)

    _, inverse, counts = np.unique(
        ijk, axis=0, return_inverse=True, return_counts=True
    )
    inverse = inverse.reshape(-1)
    num_voxels = counts.shape[0]

    sums = np.zeros((num_voxels, 3))
    np.add.at(sums, inverse, points)
    moments = np.zeros((num_voxels, 3, 3))
    np.add.at(moments, inverse, points[:, :, None] * points[:, None, :])

    means = sums / counts[:, None]
    covs = moments / counts[:, None, None] - means[:, :, None] * means[:, None, :]

    eigvals, eigvecs = np.linalg.eigh(covs)  # ascending, columns = vectors

    # Canonicalize eigenvector signs (largest-|entry| component positive).
    # The reference's row-scaled S = D^{-1/2} V makes S^T S SIGN-dependent
    # (flipping an eigenvector column conjugates the information matrix by
    # diag(+-1)), so a deterministic convention is required for parity
    # between this numpy oracle, the native C++ builder, and across LAPACK
    # versions.
    argmax = np.argmax(np.abs(eigvecs), axis=1)  # (M, 3) row index per col
    signs = np.sign(
        np.take_along_axis(eigvecs, argmax[:, None, :], axis=1)[:, 0, :]
    )
    signs = np.where(signs == 0, 1.0, signs)
    eigvecs = eigvecs * signs[:, None, :]

    valid = (counts >= MIN_POINTS_PER_VOXEL) & (eigvals[:, 2] >= MIN_EIGENVALUE)

    floored = eigvals.copy()
    floor = MIN_EIGENVALUE_RATIO * eigvals[:, 2:3]
    floored[:, :2] = np.maximum(floored[:, :2], floor)
    floored = np.maximum(floored, 1e-12)  # keep sqrt finite on invalid voxels

    inv_sqrt = 1.0 / np.sqrt(floored)
    # D^{-1/2} @ V: scale the ROWS of V (see module docstring).
    sqrt_informations = inv_sqrt[:, :, None] * eigvecs
    informations = np.einsum("mki,mkj->mij", sqrt_informations, sqrt_informations)

    return NdtMap(
        means=means,
        sqrt_informations=sqrt_informations,
        informations=informations,
        counts=counts,
        valid=valid,
    )


def filter_points(points: np.ndarray, filter_voxel_size: float) -> np.ndarray:
    """Voxel-grid downsample keeping the FIRST point that lands in each
    voxel, in input order (reference: tests/simple_optimization_test.cc:
    206-224)."""
    points = np.asarray(points)
    ijk = np.floor(points * (1.0 / filter_voxel_size)).astype(np.int64)
    _, first_index = np.unique(ijk, axis=0, return_index=True)
    return points[np.sort(first_index)]
