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
from typing import Tuple

import numpy as np

MIN_POINTS_PER_VOXEL = 5  # reference: tests/simple_optimization_test.cc:250
MIN_EIGENVALUE = 0.01  # :265
MIN_EIGENVALUE_RATIO = 0.01  # :270

_DBL_MIN = np.finfo(np.float64).tiny
_DBL_EPS = np.finfo(np.float64).eps


def _givens(p: float, q: float):
    """Eigen JacobiRotation::makeGivens for real scalars (Jacobi.h:207-234):
    returns (c, s) with G = [[c, s], [-s, c]] such that G^T [p, q]^T = [r, 0]."""
    if q == 0.0:
        return (-1.0 if p < 0.0 else 1.0), 0.0
    if p == 0.0:
        return 0.0, (1.0 if q < 0.0 else -1.0)
    if abs(p) > abs(q):
        t = q / p
        u = np.sqrt(1.0 + t * t)
        if p < 0.0:
            u = -u
        c = 1.0 / u
        return c, -t * c
    t = p / q
    u = np.sqrt(1.0 + t * t)
    if q < 0.0:
        u = -u
    s = -1.0 / u
    return -t * s, s


def _eigen_hypot(x: float, y: float) -> float:
    """Eigen numext::hypot (MathFunctionsImpl.h positive_real_hypot) —
    NOT std/np.hypot; the formula differs at the ulp level and ulps decide
    degenerate-basis branches."""
    x, y = abs(x), abs(y)
    p = max(x, y)
    if p == 0.0:
        return 0.0
    qp = min(x, y) / p
    return p * np.sqrt(1.0 + qp * qp)


def eigen_eigh3(A: np.ndarray):
    """Symmetric 3x3 eigendecomposition reproducing Eigen's
    ``SelfAdjointEigenSolver<Matrix3d>::compute()`` step for step
    (SelfAdjointEigenSolver.h:425-470 iterative path: max-abs scaling,
    3x3 Householder tridiagonalization [Tridiagonalization.h:445-477],
    implicit-Wilkinson-shift QR with Givens rotations [:804-861], ascending
    selection-sort with column swaps [:556-566]).

    Why not np.linalg.eigh: the reference's row-scaled sqrt-information
    S = D^{-1/2} V makes the OBJECTIVE depend on the eigenvector basis —
    signs and, for degenerate (flat wall/floor) voxels, the rotation within
    the eigen-subspace. LAPACK picks a different basis than Eigen, which
    shifted every cost trace ~0.2-0.4% from the reference captures
    (round-1 finding). Reproducing Eigen's arithmetic reproduces its basis
    and collapses the gap (tests/test_trace_parity.py).

    Returns (eigvals ascending (3,), eigvecs (3, 3) columns).
    """
    A = np.asarray(A, np.float64)
    # Eigen maps the LOWER triangle to [-1, 1]; upper never read.
    m00, m10, m20 = A[0, 0], A[1, 0], A[2, 0]
    m11, m21, m22 = A[1, 1], A[2, 1], A[2, 2]
    scale = max(abs(m00), abs(m10), abs(m20), abs(m11), abs(m21), abs(m22))
    if scale == 0.0:
        scale = 1.0
    m00, m10, m20 = m00 / scale, m10 / scale, m20 / scale
    m11, m21, m22 = m11 / scale, m21 / scale, m22 / scale

    # --- tridiagonalization (3x3 specialization) ---
    diag = np.empty(3)
    sub = np.empty(2)
    diag[0] = m00
    v1norm2 = m20 * m20
    if v1norm2 <= _DBL_MIN:
        diag[1], diag[2] = m11, m22
        sub[0], sub[1] = m10, m21
        Q = np.eye(3)
    else:
        beta = np.sqrt(m10 * m10 + v1norm2)
        inv_beta = 1.0 / beta
        h01 = m10 * inv_beta
        h02 = m20 * inv_beta
        w = 2.0 * h01 * m21 + h02 * (m22 - m11)
        diag[1] = m11 + h02 * w
        diag[2] = m22 - h02 * w
        sub[0] = beta
        sub[1] = m21 - h01 * w
        Q = np.array([[1.0, 0.0, 0.0], [0.0, h01, h02], [0.0, h02, -h01]])

    # --- implicit-shift QR on the tridiagonal ---
    end, start, it = 2, 0, 0
    precision_inv = 1.0 / _DBL_EPS
    while end > 0:
        for i in range(start, end):
            if abs(sub[i]) < _DBL_MIN:
                sub[i] = 0.0
            else:
                scaled = precision_inv * sub[i]
                if scaled * scaled <= abs(diag[i]) + abs(diag[i + 1]):
                    sub[i] = 0.0
        while end > 0 and sub[end - 1] == 0.0:
            end -= 1
        if end <= 0:
            break
        it += 1
        if it > 30 * 3:  # m_maxIterations * n
            break
        start = end - 1
        while start > 0 and sub[start - 1] != 0.0:
            start -= 1

        # one QR step with Wilkinson shift
        td = (diag[end - 1] - diag[end]) * 0.5
        e = sub[end - 1]
        mu = diag[end]
        if td == 0.0:
            mu -= abs(e)
        elif e != 0.0:
            e2 = e * e
            h = _eigen_hypot(td, e)
            if e2 == 0.0:
                mu -= e / ((td + (h if td > 0.0 else -h)) / e)
            else:
                mu -= e2 / (td + (h if td > 0.0 else -h))
        x = diag[start] - mu
        z = sub[start]
        for k in range(start, end):
            if z == 0.0:
                break
            c, s = _givens(x, z)
            # T = G^T T G
            sdk = s * diag[k] + c * sub[k]
            dkp1 = s * sub[k] + c * diag[k + 1]
            diag[k] = c * (c * diag[k] - s * sub[k]) - s * (
                c * sub[k] - s * diag[k + 1]
            )
            diag[k + 1] = s * sdk + c * dkp1
            sub[k] = c * sdk - s * dkp1
            if k > start:
                sub[k - 1] = c * sub[k - 1] - s * z
            x = sub[k]
            if k < end - 1:
                z = -s * sub[k + 1]
                sub[k + 1] = c * sub[k + 1]
            # Q = Q * G (applyOnTheRight with the transposed rotation)
            for i in range(3):
                xi, yi = Q[i, k], Q[i, k + 1]
                Q[i, k] = c * xi - s * yi
                Q[i, k + 1] = s * xi + c * yi

    # --- ascending selection sort with column swaps, then unscale ---
    for i in range(2):
        k = int(np.argmin(diag[i:])) + i
        if k > i:
            diag[i], diag[k] = diag[k], diag[i]
            Q[:, [i, k]] = Q[:, [k, i]]
    return diag * scale, Q


def eigen_eigh3_batch(covs: np.ndarray):
    """eigen_eigh3 over a (M, 3, 3) stack (host-side, M is small)."""
    M = covs.shape[0]
    eigvals = np.empty((M, 3))
    eigvecs = np.empty((M, 3, 3))
    for m in range(M):
        eigvals[m], eigvecs[m] = eigen_eigh3(covs[m])
    return eigvals, eigvecs


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


def build_ndt_map(
    points: np.ndarray, voxel_resolution: float, identity_moment: bool = True
) -> NdtMap:
    """Vectorized equivalent of UpdateNdtMap
    (reference: tests/simple_optimization_test.cc:236-280).

    ``identity_moment=False`` drops the reference's moment-accumulator
    initialization quirk (see below), giving UNBIASED covariances: a
    perfectly planar voxel then has a near-zero smallest eigenvalue
    instead of +1/count. Mahalanobis registration and every parity
    fixture keep the default; point-to-plane wants the unbiased build so
    plane thickness stays measurable (see ``voxel_normals``)."""
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
    # The reference's NDT struct initializes the second-moment accumulator
    # to IDENTITY, not zero (types.h:14 `Mat3x3 moment{Mat3x3::Identity()}`),
    # so every covariance carries a +I/count offset. Almost certainly an
    # accident, but it shifts every recorded cost trace (it inflates the
    # small eigenvalues of near-degenerate wall/floor voxels), so parity
    # requires reproducing it — including the summation ORDER: I first,
    # then points in input order (np.add.at accumulates in input order,
    # matching the reference's serial loop bit-for-bit).
    if identity_moment:
        moments = np.tile(np.eye(3), (num_voxels, 1, 1))
    else:
        moments = np.zeros((num_voxels, 3, 3))
    np.add.at(moments, inverse, points[:, :, None] * points[:, None, :])

    return _finalize_ndt(counts, sums, moments)


def _finalize_ndt(
    counts: np.ndarray, sums: np.ndarray, moments: np.ndarray
) -> NdtMap:
    """Voxel statistics -> NdtMap (mean/cov/eigendecomp/flooring/
    sqrt-information — reference simple_optimization_test.cc:258-276)."""
    means = sums / counts[:, None]
    covs = moments / counts[:, None, None] - means[:, :, None] * means[:, None, :]

    # Eigen-convention eigendecomposition: the reference's row-scaled
    # S = D^{-1/2} V makes the objective depend on the eigenvector BASIS
    # (signs AND degenerate-subspace rotations), so parity with the
    # reference's recorded cost traces requires Eigen's exact basis, not
    # LAPACK's (see eigen_eigh3 docstring). The native C++ builder
    # implements the identical arithmetic.
    eigvals, eigvecs = eigen_eigh3_batch(covs)

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


class NdtMapAccumulator:
    """Incremental NDT mapping: accumulate voxel statistics scan by scan
    and finalize on demand — the map-UPDATE semantics of the reference's
    ``UpdateNdtMap`` (it accumulates into a caller-held voxel hash,
    tests/simple_optimization_test.cc:236-280; the in-repo one-shot
    builders cover only its single-call use). The SLAM mapping side:
    register a scan, accumulate it at its estimated pose, repeat.

    Accumulation is the builders' arithmetic (identity-moment quirk
    seeded once per voxel on first touch, per-call partials formed with
    the same ``np.add.at`` order). A single ``add_points`` call over all
    points is BIT-identical to the one-shot ``build_ndt_map``; chunked
    feeding reassociates the float sums at chunk boundaries (same caveat
    as the native builder's threaded mode) — statistics agree to
    reassociation tolerance, the voxel partition exactly.
    """

    def __init__(self, voxel_resolution: float, identity_moment: bool = True):
        self.inv_res = 1.0 / voxel_resolution
        self.identity_moment = identity_moment
        self._stats: dict = {}  # (i, j, k) -> [count, sum (3,), moment (3,3)]

    @property
    def num_voxels(self) -> int:
        return len(self._stats)

    def add_points(self, points: np.ndarray) -> None:
        """Accumulate world-frame points."""
        pts = np.asarray(points, np.float64)
        ijk = np.floor(pts * self.inv_res).astype(np.int64)
        keys, inverse, cnts = np.unique(
            ijk, axis=0, return_inverse=True, return_counts=True
        )
        inverse = inverse.reshape(-1)
        tkeys = [tuple(k) for k in keys]
        # per-call partials with the one-shot builder's np.add.at order.
        # First-touch voxels are seeded with the quirk identity BEFORE the
        # point accumulation (I + p1 + p2 + ... in that exact order — the
        # same first-touch seeding the native builder uses; adding I
        # afterward would round differently).
        psums = np.zeros((len(keys), 3))
        np.add.at(psums, inverse, pts)
        pmoms = np.zeros((len(keys), 3, 3))
        if self.identity_moment:
            for v, key in enumerate(tkeys):
                if key not in self._stats:
                    pmoms[v] = np.eye(3)
        np.add.at(pmoms, inverse, pts[:, :, None] * pts[:, None, :])
        for v, key in enumerate(tkeys):
            st = self._stats.get(key)
            if st is None:
                self._stats[key] = [
                    int(cnts[v]),
                    psums[v].copy(),
                    pmoms[v].copy(),  # break the view: a view pins the
                    # whole per-call (K, 3, 3) array in memory
                ]
            else:
                st[0] += int(cnts[v])
                st[1] = st[1] + psums[v]
                st[2] = st[2] + pmoms[v]

    def add_scan(self, local_points: np.ndarray, pose) -> None:
        """Accumulate a sensor-frame scan observed from ``pose``."""
        self.add_points(pose.apply(np.asarray(local_points, np.float64)))

    def to_map(self) -> NdtMap:
        """Finalize the current statistics (the accumulator keeps going —
        call again after more scans)."""
        if not self._stats:
            raise ValueError("NdtMapAccumulator: no points accumulated")
        keys = sorted(self._stats)  # deterministic voxel order
        counts = np.array([self._stats[k][0] for k in keys], np.int64)
        sums = np.stack([self._stats[k][1] for k in keys])
        moments = np.stack([self._stats[k][2] for k in keys])
        return _finalize_ndt(counts, sums, moments)


def voxel_normals(
    ndt_map: NdtMap,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-voxel plane normals, flatness, and thickness, derived from the
    stored sqrt-information (no extra map state).

    ``sqrt_information`` is the reference-quirk S = D^{-1/2} V where V has
    eigenvectors as COLUMNS and D^{-1/2} scales ROWS (the reference's own
    construction, simple_optimization_test.cc:275-276 — mathematically a
    row-scaled eigvec matrix, not a true matrix square root). Rows of V
    are unit-norm, so the floored eigenvalues are recoverable as
    1 / ||S row k||^2, V as S with rows re-normalized, and the plane
    normal — the eigenvector of the SMALLEST eigenvalue — as V's column 0
    (NOT row 0 of S: rows of V are not eigenvectors, and reading row 0
    gives wildly tilted normals on exactly-planar voxels whose top
    eigenvalues are degenerate).

    Returns ``(normals (M, 3) unit, flatness (M,), thickness (M,))``:
    flatness is lambda_0 / lambda_2 in [MIN_EIGENVALUE_RATIO, 1] and
    thickness is sqrt(lambda_0) — the stddev of the voxel's points along
    the normal, in meters. Thickness is the discriminating plane test: a
    boundary voxel that swallows two walls keeps decimeter thickness,
    while a single-plane voxel bottoms out at the eigenvalue floor — but
    ONLY on a map built with ``identity_moment=False``; the reference's
    moment quirk pads every voxel by 1/count of isotropic variance, which
    at typical counts exceeds a true plane's thickness.

    The reference declares an ``is_planar`` flag on its NDT struct
    (mahalanobis .../types.h:20) but never computes or reads it — this is
    the realization that its point-to-plane TBD would have needed.
    """
    S = np.asarray(ndt_map.sqrt_informations, np.float64)
    row_norms = np.linalg.norm(S, axis=2)  # (M, 3), 1/sqrt(lambda_k)
    safe = np.maximum(row_norms, 1e-30)
    V = S / safe[:, :, None]  # eigenvectors as columns, rows unit-norm
    normals = V[:, :, 0]  # column 0 = smallest-eigenvalue eigenvector
    lambdas = 1.0 / (safe * safe)  # floored eigenvalues, ascending
    flatness = lambdas[:, 0] / np.maximum(lambdas[:, 2], 1e-30)
    thickness = np.sqrt(lambdas[:, 0])
    return normals, flatness, thickness


def voxel_covariances(ndt_map: NdtMap) -> np.ndarray:
    """Reconstruct per-voxel (floored) covariances V diag(lambda) V^T from
    the stored sqrt-information (see ``voxel_normals`` for the S = D^{-1/2} V
    row/column conventions).

    These are the eigenvalue-floored covariances — exactly the
    plane-regularized covariances GICP-style distribution-to-distribution
    matching wants (Segal et al. RSS'09 regularize theirs to (eps, 1, 1);
    the NDT builder's 1%-of-lambda-max floor plays the same role). Use a
    map built with ``identity_moment=False`` to avoid the reference's
    +I/count moment-quirk inflation.
    """
    S = np.asarray(ndt_map.sqrt_informations, np.float64)
    row_norms = np.linalg.norm(S, axis=2)
    safe = np.maximum(row_norms, 1e-30)
    V = S / safe[:, :, None]  # eigenvectors as columns of V
    lambdas = 1.0 / (safe * safe)  # floored eigenvalues, ascending
    return np.einsum("mik,mk,mjk->mij", V, lambdas, V)


def filter_points(points: np.ndarray, filter_voxel_size: float) -> np.ndarray:
    """Voxel-grid downsample keeping the FIRST point that lands in each
    voxel, in input order (reference: tests/simple_optimization_test.cc:
    206-224)."""
    points = np.asarray(points)
    ijk = np.floor(points * (1.0 / filter_voxel_size)).astype(np.int64)
    _, first_index = np.unique(ijk, axis=0, return_index=True)
    return points[np.sort(first_index)]
