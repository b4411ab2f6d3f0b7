// Symmetric 3x3 eigendecomposition reproducing Eigen's basis convention.
//
// This translation unit is compiled with -O3 -ffp-contract=off and NO
// -march=native (see Makefile): the goal is bit-identical results to the
// pure-numpy twin pipelines/ndt.py::eigen_eigh3 on every input, and the
// wider vector ISA shifts roundings by 1 ulp — enough to rotate the
// eigenbasis of degenerate (flat wall/floor) NDT voxels, which the
// reference's row-scaled sqrt-information turns into an objective change.

#include <algorithm>
#include <cmath>
#include <limits>

namespace {

// Symmetric 3x3 eigendecomposition reproducing Eigen's
// SelfAdjointEigenSolver<Matrix3d>::compute() iterative path arithmetic
// step for step (max-abs scaling -> 3x3 Householder tridiagonalization ->
// implicit-Wilkinson-shift QR with Givens rotations -> ascending
// selection-sort). The reference's row-scaled sqrt-information makes the
// optimization OBJECTIVE depend on the eigenvector basis (signs and
// degenerate-subspace rotations), so trace parity with the reference's
// recorded captures requires Eigen's exact basis convention. Must stay
// bit-identical to pipelines/ndt.py::eigen_eigh3 (same operation order;
// build with -ffp-contract=off so the compiler cannot fuse the chains).
// On return: eval ascending, evec[,col] the matching eigenvectors.

void givens_rot(double p, double q, double* c_out, double* s_out) {
  // Eigen JacobiRotation::makeGivens (Jacobi.h:207-234), real path.
  if (q == 0.0) {
    *c_out = p < 0.0 ? -1.0 : 1.0;
    *s_out = 0.0;
  } else if (p == 0.0) {
    *c_out = 0.0;
    *s_out = q < 0.0 ? 1.0 : -1.0;
  } else if (std::fabs(p) > std::fabs(q)) {
    const double t = q / p;
    double u = std::sqrt(1.0 + t * t);
    if (p < 0.0) u = -u;
    *c_out = 1.0 / u;
    *s_out = -t * (*c_out);
  } else {
    const double t = p / q;
    double u = std::sqrt(1.0 + t * t);
    if (q < 0.0) u = -u;
    *s_out = -1.0 / u;
    *c_out = -t * (*s_out);
  }
}

double eigen_hypot(double x, double y) {
  // Eigen positive_real_hypot (MathFunctionsImpl.h:151-162), not
  // std::hypot — ulp differences decide degenerate-basis branches.
  x = std::fabs(x);
  y = std::fabs(y);
  const double p = x > y ? x : y;
  if (p == 0.0) return 0.0;
  const double qp = (x < y ? x : y) / p;
  return p * std::sqrt(1.0 + qp * qp);
}

}  // namespace

void eigh3(const double A_in[9], double eval_out[3], double evec_out[9]) {
  constexpr double kDblMin = std::numeric_limits<double>::min();
  constexpr double kDblEps = std::numeric_limits<double>::epsilon();

  // Lower triangle only, scaled to [-1, 1] by the max |entry|.
  double m00 = A_in[0], m10 = A_in[3], m20 = A_in[6];
  double m11 = A_in[4], m21 = A_in[7], m22 = A_in[8];
  double scale = std::fabs(m00);
  scale = std::max(scale, std::fabs(m10));
  scale = std::max(scale, std::fabs(m20));
  scale = std::max(scale, std::fabs(m11));
  scale = std::max(scale, std::fabs(m21));
  scale = std::max(scale, std::fabs(m22));
  if (scale == 0.0) scale = 1.0;
  m00 /= scale;
  m10 /= scale;
  m20 /= scale;
  m11 /= scale;
  m21 /= scale;
  m22 /= scale;

  // Householder tridiagonalization (Tridiagonalization.h:445-477).
  double diag[3], sub[2];
  double Q[3][3];
  diag[0] = m00;
  const double v1norm2 = m20 * m20;
  if (v1norm2 <= kDblMin) {
    diag[1] = m11;
    diag[2] = m22;
    sub[0] = m10;
    sub[1] = m21;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) Q[i][j] = (i == j) ? 1.0 : 0.0;
  } else {
    const double beta = std::sqrt(m10 * m10 + v1norm2);
    const double inv_beta = 1.0 / beta;
    const double h01 = m10 * inv_beta;
    const double h02 = m20 * inv_beta;
    const double w = 2.0 * h01 * m21 + h02 * (m22 - m11);
    diag[1] = m11 + h02 * w;
    diag[2] = m22 - h02 * w;
    sub[0] = beta;
    sub[1] = m21 - h01 * w;
    Q[0][0] = 1.0; Q[0][1] = 0.0; Q[0][2] = 0.0;
    Q[1][0] = 0.0; Q[1][1] = h01; Q[1][2] = h02;
    Q[2][0] = 0.0; Q[2][1] = h02; Q[2][2] = -h01;
  }

  // Implicit-shift QR (SelfAdjointEigenSolver.h:501-547 + :804-861).
  int end = 2, start = 0, iter = 0;
  const double precision_inv = 1.0 / kDblEps;
  while (end > 0) {
    for (int i = start; i < end; ++i) {
      if (std::fabs(sub[i]) < kDblMin) {
        sub[i] = 0.0;
      } else {
        const double scaled = precision_inv * sub[i];
        if (scaled * scaled <= std::fabs(diag[i]) + std::fabs(diag[i + 1]))
          sub[i] = 0.0;
      }
    }
    while (end > 0 && sub[end - 1] == 0.0) --end;
    if (end <= 0) break;
    ++iter;
    if (iter > 30 * 3) break;
    start = end - 1;
    while (start > 0 && sub[start - 1] != 0.0) --start;

    // Wilkinson shift.
    const double td = (diag[end - 1] - diag[end]) * 0.5;
    const double e = sub[end - 1];
    double mu = diag[end];
    if (td == 0.0) {
      mu -= std::fabs(e);
    } else if (e != 0.0) {
      const double e2 = e * e;
      const double h = eigen_hypot(td, e);
      if (e2 == 0.0)
        mu -= e / ((td + (td > 0.0 ? h : -h)) / e);
      else
        mu -= e2 / (td + (td > 0.0 ? h : -h));
    }
    double x = diag[start] - mu;
    double z = sub[start];
    for (int k = start; k < end && z != 0.0; ++k) {
      double c, s;
      givens_rot(x, z, &c, &s);
      const double sdk = s * diag[k] + c * sub[k];
      const double dkp1 = s * sub[k] + c * diag[k + 1];
      diag[k] =
          c * (c * diag[k] - s * sub[k]) - s * (c * sub[k] - s * diag[k + 1]);
      diag[k + 1] = s * sdk + c * dkp1;
      sub[k] = c * sdk - s * dkp1;
      if (k > start) sub[k - 1] = c * sub[k - 1] - s * z;
      x = sub[k];
      if (k < end - 1) {
        z = -s * sub[k + 1];
        sub[k + 1] = c * sub[k + 1];
      }
      // Q = Q * G (applyOnTheRight with the transposed rotation).
      for (int i = 0; i < 3; ++i) {
        const double xi = Q[i][k], yi = Q[i][k + 1];
        Q[i][k] = c * xi - s * yi;
        Q[i][k + 1] = s * xi + c * yi;
      }
    }
  }

  // Ascending selection sort with column swaps, then unscale.
  for (int i = 0; i < 2; ++i) {
    int k = i;
    for (int j = i + 1; j < 3; ++j)
      if (diag[j] < diag[k]) k = j;
    if (k > i) {
      std::swap(diag[i], diag[k]);
      for (int r = 0; r < 3; ++r) std::swap(Q[r][i], Q[r][k]);
    }
  }
  for (int i = 0; i < 3; ++i) {
    eval_out[i] = diag[i] * scale;
    for (int r = 0; r < 3; ++r) evec_out[3 * r + i] = Q[r][i];
  }
}


extern "C" {
// Direct eigensolver entry for parity testing: the Python test suite
// asserts this is bit-identical to pipelines/ndt.py::eigen_eigh3.
void nls_eigh3(const double* a, double* eval_out, double* evec_out) {
  eigh3(a, eval_out, evec_out);
}
}  // extern "C"
