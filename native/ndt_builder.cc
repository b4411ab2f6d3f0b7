// Native host-side NDT map builder + voxel-grid filter.
//
// TPU-native framework's C++ runtime piece: the host data pipeline that
// feeds the device solvers. Plays the role of the reference's in-test map
// construction (reference: mahalanobis_distance_minimizer/tests/
// simple_optimization_test.cc:206-294) and of its MultiThreadExecutor
// (multi_thread_executor.h): points are partitioned across worker threads,
// each accumulates voxel statistics into a thread-local open-address hash
// map, and the partials merge into the global map — the same
// chunk/partial/reduce shape the device solvers use with shard_map/psum.
//
// Semantics match pipelines/ndt.py (the numpy oracle) exactly:
//   key          = floor(p / resolution) per axis
//   valid        = count >= min_points && lambda_max >= min_eigenvalue
//   flooring     = lambda_{0,1} = max(lambda_{0,1}, ratio * lambda_2),
//                  then a 1e-12 floor keeps sqrt finite on invalid voxels
//   sqrt_info    = D^{-1/2} V   (the reference's quirky row scaling —
//                  simple_optimization_test.cc:275 — reproduced verbatim)
//   information  = S^T S with S = D^{-1/2} V  (matches the numpy
//                  einsum("mki,mkj->mij", S, S))
//
// Eigendecomposition: Eigen-convention implicit-shift QR (eigh3.cc),
// bit-identical to the numpy twin AND to Eigen's SelfAdjointEigenSolver —
// the row-scaled sqrt_info makes the optimization objective depend on the
// eigenvector basis, so basis parity is cost-trace parity.
//
// No Eigen/FLANN dependency: the framework's correspondence search lives
// on-device (pipelines/matching.py); this file only needs the hash
// accumulation and the tiny eigensolver.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <unordered_map>
#include <vector>

// Eigen-convention symmetric 3x3 eigensolver; lives in eigh3.cc, which is
// compiled WITHOUT -march=native: the wider vector ISA perturbs its
// rounding by 1 ulp, and bit-parity with the numpy twin (and hence the
// reference's Eigen basis) is the whole point. eval ascending, evec
// columns.
void eigh3(const double A_in[9], double eval_out[3], double evec_out[9]);

namespace {

struct VoxelStats {
  double sum[3] = {0, 0, 0};
  // The reference's NDT struct initializes the second-moment accumulator
  // to IDENTITY (types.h:14 `Mat3x3 moment{Mat3x3::Identity()}`), giving
  // every covariance a +I/count offset. When identity_moment is
  // requested, accumulation starts from I BEFORE the first point (set in
  // accumulate_range on first touch), reproducing the reference's
  // summation order exactly — the offset shifts the recorded cost traces
  // this framework is checked against (tests/test_trace_parity.py). The
  // unbiased build starts from zero; subtracting I afterward instead
  // would perturb degenerate voxels by an ulp and rotate their
  // eigenbasis.
  double moment[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
  int64_t count = 0;

  void add(const double* p) {
    ++count;
    for (int i = 0; i < 3; ++i) sum[i] += p[i];
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) moment[3 * i + j] += p[i] * p[j];
  }
  void merge(const VoxelStats& o, bool identity_moment) {
    count += o.count;
    for (int i = 0; i < 3; ++i) sum[i] += o.sum[i];
    for (int i = 0; i < 9; ++i) moment[i] += o.moment[i];
    if (identity_moment) {
      // Each thread-partial seeded its own identity on first touch; keep
      // exactly one per voxel after the merge.
      moment[0] -= 1.0;
      moment[4] -= 1.0;
      moment[8] -= 1.0;
    }
  }
};

// Pack the integer voxel triple into one 64-bit key (21 bits per axis,
// range +/- 2^20 voxels — +/-1000 km at 1 m resolution). Indices outside
// that range would silently alias distinct voxels, so accumulation tracks
// an out-of-range flag and the entry points return -2 instead of
// corrupting the map (the numpy fallback uses exact integer triples and
// has no such limit).
constexpr int64_t kKeyRange = 1ll << 20;

inline bool key_in_range(int64_t ix, int64_t iy, int64_t iz) {
  return ix >= -kKeyRange && ix < kKeyRange && iy >= -kKeyRange &&
         iy < kKeyRange && iz >= -kKeyRange && iz < kKeyRange;
}

inline uint64_t pack_key(int64_t ix, int64_t iy, int64_t iz) {
  const uint64_t bias = 1ull << 20;
  return ((uint64_t)(ix + bias) & 0x1FFFFF) |
         (((uint64_t)(iy + bias) & 0x1FFFFF) << 21) |
         (((uint64_t)(iz + bias) & 0x1FFFFF) << 42);
}

using VoxelMap = std::unordered_map<uint64_t, VoxelStats>;

// Returns false if any voxel index falls outside the packed-key range.
bool accumulate_range(const double* points, int64_t begin, int64_t end,
                      double inv_res, bool identity_moment, VoxelMap* map) {
  map->reserve(1024);
  bool ok = true;
  for (int64_t k = begin; k < end; ++k) {
    const double* p = points + 3 * k;
    const int64_t ix = (int64_t)std::floor(p[0] * inv_res);
    const int64_t iy = (int64_t)std::floor(p[1] * inv_res);
    const int64_t iz = (int64_t)std::floor(p[2] * inv_res);
    if (!key_in_range(ix, iy, iz)) { ok = false; continue; }
    VoxelStats& st = (*map)[pack_key(ix, iy, iz)];
    if (identity_moment && st.count == 0) {
      // Seed the reference's identity quirk before the first point so the
      // accumulation order matches its serial loop bit-for-bit.
      st.moment[0] = 1.0;
      st.moment[4] = 1.0;
      st.moment[8] = 1.0;
    }
    st.add(p);
  }
  return ok;
}

}  // namespace

extern "C" {

// Bumped whenever an entry-point signature changes; the Python loader
// refuses stale .so files (a pre-existing binary would silently ignore
// a new trailing argument on x86-64 and compute the wrong thing).
int64_t nls_abi_version() { return 2; }

// Build an NDT map from n points (row-major (n, 3) float64).
// Outputs are caller-allocated with capacity max_voxels rows:
//   means (max_voxels, 3), sqrt_infos (max_voxels, 3, 3),
//   infos (max_voxels, 3, 3), counts (max_voxels), valid (max_voxels).
// Voxels are emitted in ascending packed-key order (deterministic).
// Returns the number of voxels, -1 if it would exceed max_voxels, or -2
// if any voxel index falls outside the +/-2^20 packed-key range (use the
// numpy fallback for such extents).
// identity_moment != 0 keeps the reference's moment-init quirk (the
// parity default); 0 removes the +I before forming covariances (unbiased
// build for point-to-plane / D2D, matching the numpy builder's
// identity_moment=False).
int64_t nls_build_ndt_map(const double* points, int64_t n, double resolution,
                          int64_t min_points, double min_eigenvalue,
                          double eigenvalue_ratio, int64_t max_voxels,
                          double* means, double* sqrt_infos, double* infos,
                          int64_t* counts, uint8_t* valid, int num_threads,
                          int identity_moment) {
  const double inv_res = 1.0 / resolution;
  if (num_threads < 1) num_threads = 1;
  const int64_t chunk = (n + num_threads - 1) / num_threads;

  std::vector<VoxelMap> partials((size_t)num_threads);
  bool in_range = true;
  if (num_threads == 1 || n < 4096) {
    in_range = accumulate_range(points, 0, n, inv_res,
                                identity_moment != 0, &partials[0]);
  } else {
    std::vector<std::thread> workers;
    std::vector<char> worker_ok((size_t)num_threads, 1);
    for (int t = 0; t < num_threads; ++t) {
      const int64_t b = t * chunk;
      const int64_t e = std::min(n, b + chunk);
      if (b >= e) break;
      workers.emplace_back([points, b, e, inv_res, identity_moment,
                            &partials, &worker_ok, t] {
        worker_ok[(size_t)t] = accumulate_range(
            points, b, e, inv_res, identity_moment != 0, &partials[(size_t)t]);
      });
    }
    for (auto& w : workers) w.join();
    for (char okc : worker_ok) in_range = in_range && okc;
  }
  if (!in_range) return -2;

  VoxelMap& global = partials[0];
  for (size_t t = 1; t < partials.size(); ++t) {
    for (auto& kv : partials[t]) {
      // emplace, don't operator[]+merge: a voxel absent from earlier
      // partials must keep its seeded identity — merging into a
      // default-constructed (zero-moment) entry would subtract the one
      // identity the partial carries and silently drop the quirk offset
      // for every voxel not touched by thread 0.
      auto ins = global.emplace(kv.first, kv.second);
      if (!ins.second) ins.first->second.merge(kv.second, identity_moment != 0);
    }
    partials[t].clear();
  }

  std::vector<uint64_t> keys;
  keys.reserve(global.size());
  for (auto& kv : global) keys.push_back(kv.first);
  std::sort(keys.begin(), keys.end());

  const int64_t m = (int64_t)keys.size();
  if (m > max_voxels) return -1;

  for (int64_t vi = 0; vi < m; ++vi) {
    const VoxelStats& st = global[keys[vi]];
    // Plain per-element division (NOT reciprocal multiplication): Eigen's
    // vector/scalar operator also divides, and the rounding difference
    // perturbs degenerate-voxel covariances enough to rotate their
    // eigenbasis — which the row-scaled sqrt-information turns into a
    // cost-trace shift. Keep bit-identical to the numpy builder.
    const double cnt = (double)st.count;
    double mean[3], cov[9];
    for (int i = 0; i < 3; ++i) mean[i] = st.sum[i] / cnt;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j)
        cov[3 * i + j] = st.moment[3 * i + j] / cnt - mean[i] * mean[j];

    double eval[3], evec[9];
    eigh3(cov, eval, evec);

    const bool ok =
        st.count >= min_points && eval[2] >= min_eigenvalue;

    double floored[3];
    const double floor_v = eigenvalue_ratio * eval[2];
    floored[0] = std::max(std::max(eval[0], floor_v), 1e-12);
    floored[1] = std::max(std::max(eval[1], floor_v), 1e-12);
    floored[2] = std::max(eval[2], 1e-12);

    double* S = sqrt_infos + 9 * vi;
    for (int r = 0; r < 3; ++r) {
      const double scale = 1.0 / std::sqrt(floored[r]);
      for (int c = 0; c < 3; ++c) S[3 * r + c] = scale * evec[3 * r + c];
    }
    double* I = infos + 9 * vi;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double acc = 0.0;
        for (int k = 0; k < 3; ++k) acc += S[3 * k + i] * S[3 * k + j];
        I[3 * i + j] = acc;
      }
    for (int i = 0; i < 3; ++i) means[3 * vi + i] = mean[i];
    counts[vi] = st.count;
    valid[vi] = ok ? 1 : 0;
  }
  return m;
}

// Voxel-grid downsample keeping the FIRST point landing in each voxel, in
// input order (reference: tests/simple_optimization_test.cc:206-224).
// keep_indices must have capacity n; returns number kept.
int64_t nls_voxel_filter(const double* points, int64_t n, double voxel,
                         int64_t* keep_indices) {
  const double inv = 1.0 / voxel;
  std::unordered_map<uint64_t, char> seen;
  seen.reserve((size_t)(n / 4 + 16));
  int64_t kept = 0;
  for (int64_t k = 0; k < n; ++k) {
    const double* p = points + 3 * k;
    const int64_t ix = (int64_t)std::floor(p[0] * inv);
    const int64_t iy = (int64_t)std::floor(p[1] * inv);
    const int64_t iz = (int64_t)std::floor(p[2] * inv);
    if (!key_in_range(ix, iy, iz)) return -2;  // would alias voxels
    if (seen.emplace(pack_key(ix, iy, iz), 1).second) keep_indices[kept++] = k;
  }
  return kept;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Correspondence search + kernel-buffer packing (the FLANN analog,
// reference: mahalanobis tests/simple_optimization_test.cc:296-342).
//
// For each warped local point, finds the num_neighbors nearest voxel means
// within `radius` by linear scan (the map is tiny — tens to thousands of
// voxels — so a scan beats a kd-tree and vectorizes trivially), and writes
// the packed transposed-SoA float32 buffer the Pallas kernels consume
// directly (rows: p(3) | mu(3) | S(9) | mask; see ops/pallas_kernels.py).
// Threaded over points (the MultiThreadExecutor analog).
// ---------------------------------------------------------------------------

namespace {

void match_pack_range(const double* points, int64_t begin, int64_t end,
                      const double* R, const double* t, const double* means,
                      const double* sqrt_infos, int64_t m, double radius_sq,
                      int k, int64_t lanes, float* packed) {
  for (int64_t i = begin; i < end; ++i) {
    const double* p = points + 3 * i;
    const double wx = R[0] * p[0] + R[1] * p[1] + R[2] * p[2] + t[0];
    const double wy = R[3] * p[0] + R[4] * p[1] + R[5] * p[2] + t[1];
    const double wz = R[6] * p[0] + R[7] * p[1] + R[8] * p[2] + t[2];

    // top-k (k <= 4) nearest by insertion into a tiny sorted list
    double best_d[4] = {1e300, 1e300, 1e300, 1e300};
    int64_t best_j[4] = {-1, -1, -1, -1};
    for (int64_t j = 0; j < m; ++j) {
      const double dx = wx - means[3 * j];
      const double dy = wy - means[3 * j + 1];
      const double dz = wz - means[3 * j + 2];
      const double d = dx * dx + dy * dy + dz * dz;
      if (d < best_d[k - 1]) {
        int slot = k - 1;
        while (slot > 0 && d < best_d[slot - 1]) {
          best_d[slot] = best_d[slot - 1];
          best_j[slot] = best_j[slot - 1];
          --slot;
        }
        best_d[slot] = d;
        best_j[slot] = j;
      }
    }
    for (int s = 0; s < k; ++s) {
      const int64_t lane = i * k + s;
      const int64_t j = best_j[s];
      const bool ok = j >= 0 && best_d[s] <= radius_sq;
      packed[0 * lanes + lane] = (float)p[0];
      packed[1 * lanes + lane] = (float)p[1];
      packed[2 * lanes + lane] = (float)p[2];
      if (ok) {
        packed[3 * lanes + lane] = (float)means[3 * j];
        packed[4 * lanes + lane] = (float)means[3 * j + 1];
        packed[5 * lanes + lane] = (float)means[3 * j + 2];
        const double* S = sqrt_infos + 9 * j;
        for (int r = 0; r < 9; ++r)
          packed[(6 + r) * lanes + lane] = (float)S[r];
        packed[15 * lanes + lane] = 1.0f;
      } else {
        for (int r = 3; r < 15; ++r) packed[r * lanes + lane] = 0.0f;
        packed[15 * lanes + lane] = 0.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

// packed_out must be (16, lanes) float32, lanes >= n * k; lanes beyond
// n * k are zero-filled (masked padding). Returns n * k.
int64_t nls_match_and_pack(const double* points, int64_t n, const double* R,
                           const double* t, const double* means,
                           const double* sqrt_infos, int64_t m, double radius,
                           int k, int64_t lanes, float* packed_out,
                           int num_threads) {
  if (k < 1 || k > 4 || lanes < n * k) return -1;
  const double radius_sq = radius * radius;
  // zero the tail lanes (and rows) once
  std::memset(packed_out, 0, sizeof(float) * 16 * (size_t)lanes);

  if (num_threads < 1) num_threads = 1;
  if (num_threads == 1 || n < 2048) {
    match_pack_range(points, 0, n, R, t, means, sqrt_infos, m, radius_sq, k,
                     lanes, packed_out);
  } else {
    std::vector<std::thread> workers;
    const int64_t chunk = (n + num_threads - 1) / num_threads;
    for (int w = 0; w < num_threads; ++w) {
      const int64_t b = w * chunk;
      const int64_t e = std::min(n, b + chunk);
      if (b >= e) break;
      workers.emplace_back(match_pack_range, points, b, e, R, t, means,
                           sqrt_infos, m, radius_sq, k, lanes, packed_out);
    }
    for (auto& th : workers) th.join();
  }
  return n * k;
}

}  // extern "C"
