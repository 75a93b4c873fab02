// Native setup-time kernels for dolfinx_mpc_tpu.
//
// The reference implements its whole runtime in C++ (cpp/*.h, ~7.2k LoC);
// in this rebuild the device hot path is XLA/Pallas, and the host-side
// setup hot spots — entity/sparsity dedup (np.unique's lexicographic
// argsort) and point-in-cell collision search (reference BoundingBoxTree +
// GJK, cpp/utils.h:1359-1451) — live here as a small C++ library consumed
// through ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 native.cpp -o libmpcnative.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// sort_unique_inverse: given n int64 keys, fill
//   uniq   (caller-allocated, >= n)      : sorted unique keys
//   inverse(n)                           : index of each key in uniq
//   first  (caller-allocated, >= n)      : index of first occurrence per uniq
// returns the number of unique keys.
// Radix sort (8 passes x 8 bit) on (key, original-index) pairs — O(n), beats
// np.unique's comparison argsort ~10x at the 10^8-key scale of 10M-dof
// sparsity construction.
// ---------------------------------------------------------------------------
int64_t sort_unique_inverse(const int64_t* keys, int64_t n, int64_t* uniq,
                            int64_t* inverse, int64_t* first) {
  if (n == 0) return 0;
  struct P { uint64_t k; int64_t i; };
  std::vector<P> a(n), b(n);
  // bias to unsigned to keep radix order == signed order for non-negative
  for (int64_t i = 0; i < n; ++i) a[i] = {static_cast<uint64_t>(keys[i]), i};
  size_t cnt[256];
  for (int pass = 0; pass < 8; ++pass) {
    std::memset(cnt, 0, sizeof(cnt));
    const int sh = pass * 8;
    for (int64_t i = 0; i < n; ++i) ++cnt[(a[i].k >> sh) & 0xff];
    size_t pos = 0;
    size_t start[256];
    for (int v = 0; v < 256; ++v) { start[v] = pos; pos += cnt[v]; }
    for (int64_t i = 0; i < n; ++i) b[start[(a[i].k >> sh) & 0xff]++] = a[i];
    std::swap(a, b);
  }
  int64_t nu = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || a[i].k != a[i - 1].k) {
      uniq[nu] = static_cast<int64_t>(a[i].k);
      first[nu] = a[i].i;
      ++nu;
    }
    inverse[a[i].i] = nu - 1;
  }
  return nu;
}

// ---------------------------------------------------------------------------
// locate_points: for each query point find a containing cell (affine
// simplices: exact barycentric test; bilinear/trilinear cells: Newton).
// Grid-hash over cell bounding boxes replaces the reference's BB-tree.
//   points (np, gdim), cell_verts (nc, nv) int32, coords (npts, gdim)
//   out_cells (np) int64 (-1 if none), out_X (np, tdim) reference coords
// cell_type: 0=interval 1=triangle 2=quad 3=tet 4=hex
// ---------------------------------------------------------------------------
static inline void solve3(const double A[9], const double r[3], double d[3]) {
  double det = A[0] * (A[4] * A[8] - A[5] * A[7]) - A[1] * (A[3] * A[8] - A[5] * A[6]) +
               A[2] * (A[3] * A[7] - A[4] * A[6]);
  if (std::fabs(det) < 1e-300) { d[0] = d[1] = d[2] = 0.0; return; }
  double inv[9] = {
      (A[4] * A[8] - A[5] * A[7]), (A[2] * A[7] - A[1] * A[8]), (A[1] * A[5] - A[2] * A[4]),
      (A[5] * A[6] - A[3] * A[8]), (A[0] * A[8] - A[2] * A[6]), (A[2] * A[3] - A[0] * A[5]),
      (A[3] * A[7] - A[4] * A[6]), (A[1] * A[6] - A[0] * A[7]), (A[0] * A[4] - A[1] * A[3])};
  for (int i = 0; i < 3; ++i)
    d[i] = (inv[3 * i] * r[0] + inv[3 * i + 1] * r[1] + inv[3 * i + 2] * r[2]) / det;
}

static bool pull_back_cell(int cell_type, int gdim, const double* cv,  // (nv, gdim)
                           const double* x, double* X, double tol) {
  // returns true if X inside reference cell (within tol)
  if (cell_type == 1) {  // triangle: x = v0 + [v1-v0, v2-v0] X
    double a00 = cv[2] - cv[0], a01 = cv[4] - cv[0];
    double a10 = cv[3] - cv[1], a11 = cv[5] - cv[1];
    double det = a00 * a11 - a01 * a10;
    double r0 = x[0] - cv[0], r1 = x[1] - cv[1];
    X[0] = (a11 * r0 - a01 * r1) / det;
    X[1] = (-a10 * r0 + a00 * r1) / det;
    return X[0] > -tol && X[1] > -tol && X[0] + X[1] < 1 + tol;
  }
  if (cell_type == 3) {  // tetrahedron
    double A[9] = {cv[3] - cv[0], cv[6] - cv[0], cv[9] - cv[0],
                   cv[4] - cv[1], cv[7] - cv[1], cv[10] - cv[1],
                   cv[5] - cv[2], cv[8] - cv[2], cv[11] - cv[2]};
    double r[3] = {x[0] - cv[0], x[1] - cv[1], x[2] - cv[2]};
    solve3(A, r, X);
    return X[0] > -tol && X[1] > -tol && X[2] > -tol && X[0] + X[1] + X[2] < 1 + tol;
  }
  // multilinear quad (2)/hex (4): Newton on the multilinear map
  int tdim = (cell_type == 2) ? 2 : 3;
  for (int t = 0; t < tdim; ++t) X[t] = 0.5;
  for (int it = 0; it < 25; ++it) {
    // shape functions and derivatives at X (vertex order matches cells.py:
    // quad (0,0),(1,0),(0,1),(1,1); hex lexicographic in (x,y,z))
    double N[8], dN[8][3];
    int nv = (tdim == 2) ? 4 : 8;
    for (int v = 0; v < nv; ++v) {
      double f[3] = {1, 1, 1}, df[3] = {0, 0, 0};
      for (int t = 0; t < tdim; ++t) {
        int bit = (tdim == 2) ? ((t == 0) ? (v & 1) : (v >> 1)) : ((t == 0) ? (v & 1) : (t == 1 ? ((v >> 1) & 1) : (v >> 2)));
        f[t] = bit ? X[t] : (1 - X[t]);
        df[t] = bit ? 1.0 : -1.0;
      }
      N[v] = f[0] * f[1] * (tdim == 3 ? f[2] : 1.0);
      dN[v][0] = df[0] * f[1] * (tdim == 3 ? f[2] : 1.0);
      dN[v][1] = f[0] * df[1] * (tdim == 3 ? f[2] : 1.0);
      if (tdim == 3) dN[v][2] = f[0] * f[1] * df[2];
    }
    double fx[3] = {0, 0, 0};
    double J[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};
    for (int v = 0; v < nv; ++v)
      for (int g = 0; g < gdim; ++g) {
        fx[g] += N[v] * cv[v * gdim + g];
        for (int t = 0; t < tdim; ++t) J[3 * g + t] += dN[v][t] * cv[v * gdim + g];
      }
    double r[3] = {x[0] - fx[0], (gdim > 1 ? x[1] - fx[1] : 0.0), (gdim > 2 ? x[2] - fx[2] : 0.0)};
    double nr = std::fabs(r[0]) + std::fabs(r[1]) + std::fabs(r[2]);
    if (nr < 1e-13) break;
    double d[3];
    if (tdim == 2) {
      double det = J[0] * J[4] - J[1] * J[3];
      d[0] = (J[4] * r[0] - J[1] * r[1]) / det;
      d[1] = (-J[3] * r[0] + J[0] * r[1]) / det;
      d[2] = 0;
    } else {
      solve3(J, r, d);
    }
    for (int t = 0; t < tdim; ++t) X[t] += d[t];
  }
  for (int t = 0; t < tdim; ++t)
    if (X[t] < -tol || X[t] > 1 + tol) return false;
  return true;
}

void locate_points(const double* points, int64_t npq, int gdim,
                   const int32_t* cell_verts, int64_t nc, int nv,
                   const double* vcoords, int cell_type, double tol,
                   int64_t* out_cells, double* out_X) {
  int tdim = (cell_type == 0) ? 1 : (cell_type <= 2 ? 2 : 3);
  // bounding boxes + uniform grid hash
  std::vector<double> lo(nc * 3, 1e300), hi(nc * 3, -1e300);
  double glo[3] = {1e300, 1e300, 1e300}, ghi[3] = {-1e300, -1e300, -1e300};
  for (int64_t c = 0; c < nc; ++c)
    for (int v = 0; v < nv; ++v)
      for (int g = 0; g < gdim; ++g) {
        double val = vcoords[(int64_t)cell_verts[c * nv + v] * gdim + g];
        lo[c * 3 + g] = std::min(lo[c * 3 + g], val);
        hi[c * 3 + g] = std::max(hi[c * 3 + g], val);
        glo[g] = std::min(glo[g], val);
        ghi[g] = std::max(ghi[g], val);
      }
  int nb = std::max(1, (int)std::cbrt((double)nc));
  nb = std::min(nb, 128);
  double cellw[3];
  int dims[3] = {1, 1, 1};
  for (int g = 0; g < gdim; ++g) {
    dims[g] = nb;
    cellw[g] = std::max((ghi[g] - glo[g]) / nb, 1e-300);
  }
  auto bidx = [&](double val, int g) {
    int i = (int)((val - glo[g]) / cellw[g]);
    return std::max(0, std::min(dims[g] - 1, i));
  };
  int64_t nbins = (int64_t)dims[0] * dims[1] * dims[2];
  std::vector<std::vector<int32_t>> bins(nbins);
  for (int64_t c = 0; c < nc; ++c) {
    int i0 = bidx(lo[c * 3] - tol, 0), i1 = bidx(hi[c * 3] + tol, 0);
    int j0 = gdim > 1 ? bidx(lo[c * 3 + 1] - tol, 1) : 0, j1 = gdim > 1 ? bidx(hi[c * 3 + 1] + tol, 1) : 0;
    int k0 = gdim > 2 ? bidx(lo[c * 3 + 2] - tol, 2) : 0, k1 = gdim > 2 ? bidx(hi[c * 3 + 2] + tol, 2) : 0;
    for (int i = i0; i <= i1; ++i)
      for (int j = j0; j <= j1; ++j)
        for (int k = k0; k <= k1; ++k)
          bins[((int64_t)i * dims[1] + j) * dims[2] + k].push_back((int32_t)c);
  }
  std::vector<double> cv(nv * gdim);
  for (int64_t p = 0; p < npq; ++p) {
    const double* x = points + p * gdim;
    out_cells[p] = -1;
    int bi = bidx(x[0], 0);
    int bj = gdim > 1 ? bidx(x[1], 1) : 0;
    int bk = gdim > 2 ? bidx(x[2], 2) : 0;
    const auto& bin = bins[((int64_t)bi * dims[1] + bj) * dims[2] + bk];
    for (int32_t c : bin) {
      bool in_box = true;
      for (int g = 0; g < gdim; ++g)
        if (x[g] < lo[c * 3 + g] - tol || x[g] > hi[c * 3 + g] + tol) { in_box = false; break; }
      if (!in_box) continue;
      for (int v = 0; v < nv; ++v)
        for (int g = 0; g < gdim; ++g)
          cv[v * gdim + g] = vcoords[(int64_t)cell_verts[c * nv + v] * gdim + g];
      double X[3] = {0, 0, 0};
      if (pull_back_cell(cell_type, gdim, cv.data(), x, X, tol)) {
        out_cells[p] = c;
        for (int t = 0; t < tdim; ++t) out_X[p * tdim + t] = X[t];
        break;
      }
    }
  }
}

}  // extern "C"
