// Measured CPU reference for constrained-assembly throughput.
//
// BASELINE.md demands the reference rate be *measured*, not assumed, but
// dolfinx/PETSc cannot run in this image.  This program therefore
// reimplements (from scratch — no code copied) the per-cell pipeline that
// dolfinx_mpc's C++ assembler executes for the canonical benchmark problem
// (3D periodic Poisson, P1 tetrahedra on an n^3 unit cube,
// /root/reference/python/benchmarks/bench_periodic.py):
//
//   geometry gather -> FFCx-equivalent P1 Laplacian element kernel
//   -> Dirichlet row/col zeroing -> master expansion for slave cells
//      (semantics of cpp/assemble_matrix.cpp:100-268 modify_mpc_cell)
//   -> insertion into preallocated CSR rows by sorted search
//      (what PETSc MatSetValues does on AIJ)
//
// and measures MDoF/s on this machine's cores (OpenMP over cells, atomic
// adds).  bench.py scales the measured per-core rate by 64 — i.e. it grants
// the reference *ideal linear scaling* on the 64-core node named in
// BASELINE.md, which is generous to the reference (real MPI assembly has
// ghost-exchange and memory-bandwidth losses).
//
// Build: g++ -O3 -march=native -fopenmp -std=c++17 ref_baseline.cpp -o ref_baseline
// Run:   ./ref_baseline [n=64] [reps=3]   -> one JSON line on stdout
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

using std::int32_t;
using std::int64_t;

struct Target {  // expansion of one local dof under the MPC transform
  int32_t dof;
  double coeff;
};

int main(int argc, char** argv) {
  const int n = argc > 1 ? std::atoi(argv[1]) : 64;
  const int reps = argc > 2 ? std::atoi(argv[2]) : 3;
  const int np = n + 1;
  const int64_t num_nodes = int64_t(np) * np * np;
  const int64_t num_cells = 6LL * n * n * n;

  auto node = [np](int i, int j, int k) -> int32_t {
    return (int32_t(i) * np + j) * np + k;
  };

  // --- mesh geometry (explicit coords array: the reference reads geometry
  // from a flat array through the geometry dofmap, so we do too) ---
  std::vector<double> coords(3 * num_nodes);
  for (int i = 0; i < np; ++i)
    for (int j = 0; j < np; ++j)
      for (int k = 0; k < np; ++k) {
        int32_t v = node(i, j, k);
        coords[3 * v + 0] = double(i) / n;
        coords[3 * v + 1] = double(j) / n;
        coords[3 * v + 2] = double(k) / n;
      }

  // Kuhn triangulation: 6 tets per cube, each a monotone path 000 -> 111.
  static const int paths[6][2] = {{0, 1}, {0, 2}, {1, 0}, {1, 2}, {2, 0}, {2, 1}};
  std::vector<int32_t> cells(4 * num_cells);
  {
    int64_t c = 0;
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        for (int k = 0; k < n; ++k)
          for (int t = 0; t < 6; ++t) {
            int d0 = paths[t][0], d1 = paths[t][1];
            int d2 = 3 - d0 - d1;
            int p[3] = {i, j, k};
            cells[4 * c + 0] = node(p[0], p[1], p[2]);
            p[d0]++; cells[4 * c + 1] = node(p[0], p[1], p[2]);
            p[d1]++; cells[4 * c + 2] = node(p[0], p[1], p[2]);
            p[d2]++; cells[4 * c + 3] = node(p[0], p[1], p[2]);
            ++c;
          }
  }

  // --- constraints: periodic x=1 -> x=0 (coeff 1), Dirichlet at y=0, y=1;
  // bc dofs are excluded from the slave set (reference PeriodicConstraint
  // behavior) ---
  std::vector<uint8_t> is_bc(num_nodes, 0), is_slave(num_nodes, 0);
  std::vector<int32_t> master_of(num_nodes, -1);
  for (int i = 0; i < np; ++i)
    for (int j = 0; j < np; ++j)
      for (int k = 0; k < np; ++k) {
        int32_t v = node(i, j, k);
        if (j == 0 || j == n) is_bc[v] = 1;
        else if (i == n) { is_slave[v] = 1; master_of[v] = node(0, j, k); }
      }

  // --- sparsity pattern (setup, untimed — the reference also preallocates
  // via create_sparsity_pattern before the timed assembly) ---
  // Collect (row,col) pairs after MPC target substitution, sort, unique.
  std::vector<int64_t> pairs;
  pairs.reserve(16 * num_cells + num_nodes);
  for (int64_t c = 0; c < num_cells; ++c) {
    int32_t tgt[4];
    for (int a = 0; a < 4; ++a) {
      int32_t d = cells[4 * c + a];
      tgt[a] = is_slave[d] ? master_of[d] : d;
    }
    for (int a = 0; a < 4; ++a)
      for (int b = 0; b < 4; ++b)
        pairs.push_back(int64_t(tgt[a]) * num_nodes + tgt[b]);
  }
  for (int64_t v = 0; v < num_nodes; ++v)
    pairs.push_back(v * num_nodes + v);  // bc / slave diagonals
  std::sort(pairs.begin(), pairs.end());
  pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
  std::vector<int64_t> rowptr(num_nodes + 1, 0);
  std::vector<int32_t> colidx(pairs.size());
  for (size_t e = 0; e < pairs.size(); ++e) {
    rowptr[pairs[e] / num_nodes + 1]++;
    colidx[e] = int32_t(pairs[e] % num_nodes);
  }
  for (int64_t r = 0; r < num_nodes; ++r) rowptr[r + 1] += rowptr[r];
  pairs.clear(); pairs.shrink_to_fit();
  std::vector<double> data(colidx.size());

  // MatSetValues-equivalent: sorted search within the preallocated row.
  auto insert = [&](int32_t r, int32_t cc, double v) {
    const int32_t* beg = colidx.data() + rowptr[r];
    const int32_t* end = colidx.data() + rowptr[r + 1];
    const int32_t* it = std::lower_bound(beg, end, cc);
    double& slot = data[it - colidx.data()];
#ifdef _OPENMP
#pragma omp atomic
#endif
    slot += v;
  };

  double best = 1e300;
  for (int rep = 0; rep < reps; ++rep) {
    std::fill(data.begin(), data.end(), 0.0);
    auto t0 = std::chrono::steady_clock::now();
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t c = 0; c < num_cells; ++c) {
      const int32_t* dof = &cells[4 * c];
      // geometry gather + P1 Laplacian kernel (what FFCx generates for
      // inner(grad(u),grad(v))*dx at degree-1 quadrature)
      double x0[3], J[3][3];
      for (int d = 0; d < 3; ++d) x0[d] = coords[3 * dof[0] + d];
      for (int a = 0; a < 3; ++a)
        for (int d = 0; d < 3; ++d)
          J[d][a] = coords[3 * dof[a + 1] + d] - x0[d];
      double cof[3][3];  // cofactors -> inverse transpose * det
      cof[0][0] = J[1][1] * J[2][2] - J[1][2] * J[2][1];
      cof[0][1] = J[1][2] * J[2][0] - J[1][0] * J[2][2];
      cof[0][2] = J[1][0] * J[2][1] - J[1][1] * J[2][0];
      cof[1][0] = J[0][2] * J[2][1] - J[0][1] * J[2][2];
      cof[1][1] = J[0][0] * J[2][2] - J[0][2] * J[2][0];
      cof[1][2] = J[0][1] * J[2][0] - J[0][0] * J[2][1];
      cof[2][0] = J[0][1] * J[1][2] - J[0][2] * J[1][1];
      cof[2][1] = J[0][2] * J[1][0] - J[0][0] * J[1][2];
      cof[2][2] = J[0][0] * J[1][1] - J[0][1] * J[1][0];
      double det = J[0][0] * cof[0][0] + J[0][1] * cof[0][1] + J[0][2] * cof[0][2];
      double g[4][3];  // reference-gradient pullback: g_a = cof^T gref_a / det
      for (int d = 0; d < 3; ++d) {
        g[1][d] = cof[d][0] / det;
        g[2][d] = cof[d][1] / det;
        g[3][d] = cof[d][2] / det;
        g[0][d] = -(g[1][d] + g[2][d] + g[3][d]);
      }
      double vol = std::fabs(det) / 6.0;
      double Ae[4][4];
      for (int a = 0; a < 4; ++a)
        for (int b = 0; b < 4; ++b)
          Ae[a][b] = vol * (g[a][0] * g[b][0] + g[a][1] * g[b][1] + g[a][2] * g[b][2]);

      // Dirichlet: zero bc rows and columns of the element tensor
      bool any_slave = false;
      for (int a = 0; a < 4; ++a) {
        int32_t d = dof[a];
        if (is_bc[d])
          for (int b = 0; b < 4; ++b) { Ae[a][b] = 0.0; Ae[b][a] = 0.0; }
        any_slave |= bool(is_slave[d]);
      }

      if (!any_slave) {
        for (int a = 0; a < 4; ++a)
          for (int b = 0; b < 4; ++b)
            insert(dof[a], dof[b], Ae[a][b]);
      } else {
        // modify_mpc_cell semantics: replace each slave row/col by its
        // flattened (master, coeff) expansion; slave rows/cols of the
        // eliminated tensor are zero (handled by substitution since each
        // target list fully replaces the slave).
        Target tg[4][1];
        int ntg[4];
        for (int a = 0; a < 4; ++a) {
          int32_t d = dof[a];
          if (is_slave[d]) { tg[a][0] = {master_of[d], 1.0}; ntg[a] = 1; }
          else { tg[a][0] = {d, 1.0}; ntg[a] = 1; }
        }
        for (int a = 0; a < 4; ++a)
          for (int ia = 0; ia < ntg[a]; ++ia)
            for (int b = 0; b < 4; ++b)
              for (int ib = 0; ib < ntg[b]; ++ib)
                insert(tg[a][ia].dof, tg[b][ib].dof,
                       tg[a][ia].coeff * tg[b][ib].coeff * Ae[a][b]);
      }
    }
    // diagonal values for bc and slave dofs (reference: diagval inserts
    // after the cell loop)
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t v = 0; v < num_nodes; ++v)
      if (is_bc[v] || is_slave[v]) insert(int32_t(v), int32_t(v), 1.0);
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    if (dt < best) best = dt;
  }

  // optional dump for the correctness cross-check against the jax
  // assembler (tests/test_ref_baseline.py): triplets + node coords, text
  if (argc > 3) {
    FILE* f = std::fopen(argv[3], "w");
    for (int64_t v = 0; v < num_nodes; ++v)
      std::fprintf(f, "v %.17g %.17g %.17g\n", coords[3 * v], coords[3 * v + 1],
                   coords[3 * v + 2]);
    for (int64_t r = 0; r < num_nodes; ++r)
      for (int64_t e = rowptr[r]; e < rowptr[r + 1]; ++e)
        std::fprintf(f, "e %lld %d %.17g\n", (long long)r, colidx[e], data[e]);
    std::fclose(f);
  }

  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  double mdof_s = double(num_nodes) / 1e6 / best;
  std::printf(
      "{\"n\": %d, \"dofs\": %lld, \"cells\": %lld, \"nnz\": %zu, "
      "\"threads\": %d, \"assembly_s\": %.6f, \"mdof_s\": %.3f, "
      "\"mcells_s\": %.3f}\n",
      n, (long long)num_nodes, (long long)num_cells, colidx.size(), threads,
      best, mdof_s, double(num_cells) / 1e6 / best);
  return 0;
}
