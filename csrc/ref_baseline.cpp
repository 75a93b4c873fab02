// Measured CPU reference for constrained-assembly throughput.
//
// BASELINE.md demands the reference rate be *measured*, not assumed, but
// dolfinx/PETSc cannot run in this image.  This program therefore
// reimplements (from scratch — no code copied) the per-cell pipeline that
// dolfinx_mpc's C++ assembler executes for the canonical benchmark problem
// (3D periodic Poisson, P1/P2 tetrahedra on an n^3 unit cube,
// /root/reference/python/benchmarks/bench_periodic.py; degree 2 is the
// reference Makefile's canonical config):
//
//   geometry gather -> FFCx-equivalent Laplacian element kernel (P1: 1-point
//   rule, P2: Keast 4-point rule, both exact for affine tets)
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
// Dof numbering: nodes of the degree-refined (r*n+1)^3 grid, lex order (the
// same grid-lex convention the jax package uses, so dumped matrices are
// entry-identical for the tests/test_ref_baseline.py cross-check).
//
// Block size 3 (argv[5]) assembles VECTOR P1 elasticity instead (the
// reference's bench_elasticity_edge.py problem: 2*mu*sym(grad u):sym(grad v)
// + lambda*div u*div v, mu=1, lambda=1.25) with per-node slave/bc expansion
// over all three components — the measured baseline for the bs=3 TPU path.
//
// Build: g++ -O3 -march=native -fopenmp -std=c++17 ref_baseline.cpp -o ref_baseline
// Run:   ./ref_baseline [n=64] [reps=3] [degree=1] [dumpfile|-] [bs=1]
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

int main(int argc, char** argv) {
  const int n = argc > 1 ? std::atoi(argv[1]) : 64;
  const int reps = argc > 2 ? std::atoi(argv[2]) : 3;
  const int deg = argc > 3 ? std::atoi(argv[3]) : 1;
  const int bs = argc > 5 ? std::atoi(argv[5]) : 1;  // 3 = vector elasticity
  const int r = deg;               // grid refinement = degree
  const int gp = r * n + 1;        // refined dof grid points per axis
  const int nd = deg == 1 ? 4 : 10;  // local dofs (nodes) per tet
  const int64_t num_dofs = int64_t(gp) * gp * gp;  // NODES (scalar dofs = *bs)
  const int64_t num_cells = 6LL * n * n * n;
  const double mu_ = 1.0, lam_ = 1.25;  // bs=3 Lame parameters (bench.py)

  auto gnode = [gp](int i, int j, int k) -> int32_t {
    return (int32_t(i) * gp + j) * gp + k;
  };

  // --- cell dof lists + per-cell vertex coords -------------------------
  // Kuhn triangulation: 6 tets per cube, each a monotone path 000 -> 111.
  // Local dof order: 4 vertices then 6 edges (0,1)(0,2)(0,3)(1,2)(1,3)(2,3)
  // (self-consistent with the basis tables below).
  static const int paths[6][2] = {{0, 1}, {0, 2}, {1, 0}, {1, 2}, {2, 0}, {2, 1}};
  static const int edges[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};
  const int np1 = n + 1;
  const int64_t num_verts = int64_t(np1) * np1 * np1;
  auto vnode = [np1](int i, int j, int k) -> int32_t {
    return (int32_t(i) * np1 + j) * np1 + k;
  };
  std::vector<double> vcoords(3 * num_verts);  // geometry array (x_dofmap source)
  for (int i = 0; i < np1; ++i)
    for (int j = 0; j < np1; ++j)
      for (int k = 0; k < np1; ++k) {
        int32_t v = vnode(i, j, k);
        vcoords[3 * v + 0] = double(i) / n;
        vcoords[3 * v + 1] = double(j) / n;
        vcoords[3 * v + 2] = double(k) / n;
      }
  std::vector<int32_t> cdofs(int64_t(nd) * num_cells);
  std::vector<int32_t> gverts(4 * num_cells);  // geometry dofmap (4 vertices/cell)
  {
    int64_t c = 0;
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        for (int k = 0; k < n; ++k)
          for (int t = 0; t < 6; ++t, ++c) {
            int d0 = paths[t][0], d1 = paths[t][1];
            int d2 = 3 - d0 - d1;
            int vi[4][3];
            vi[0][0] = i; vi[0][1] = j; vi[0][2] = k;
            for (int d = 0; d < 3; ++d) vi[1][d] = vi[0][d];
            vi[1][d0]++;
            for (int d = 0; d < 3; ++d) vi[2][d] = vi[1][d];
            vi[2][d1]++;
            for (int d = 0; d < 3; ++d) vi[3][d] = vi[2][d];
            vi[3][d2]++;
            for (int a = 0; a < 4; ++a) {
              cdofs[nd * c + a] = gnode(r * vi[a][0], r * vi[a][1], r * vi[a][2]);
              gverts[4 * c + a] = vnode(vi[a][0], vi[a][1], vi[a][2]);
            }
            if (deg == 2)
              for (int e = 0; e < 6; ++e) {
                const int* uv = edges[e];
                cdofs[nd * c + 4 + e] =
                    gnode(vi[uv[0]][0] + vi[uv[1]][0], vi[uv[0]][1] + vi[uv[1]][1],
                          vi[uv[0]][2] + vi[uv[1]][2]);
              }
          }
  }

  // --- constraints: periodic x=1 -> x=0 (coeff 1), Dirichlet at y=0, y=1;
  // bc dofs are excluded from the slave set (reference PeriodicConstraint
  // behavior), classified by refined-grid coordinates ---
  std::vector<uint8_t> is_bc(num_dofs, 0), is_slave(num_dofs, 0);
  std::vector<int32_t> master_of(num_dofs, -1);
  for (int i = 0; i < gp; ++i)
    for (int j = 0; j < gp; ++j)
      for (int k = 0; k < gp; ++k) {
        int32_t v = gnode(i, j, k);
        if (j == 0 || j == gp - 1) is_bc[v] = 1;
        else if (i == gp - 1) { is_slave[v] = 1; master_of[v] = gnode(0, j, k); }
      }

  // --- quadrature + reference basis gradient tables --------------------
  // grad(phi_a)(q) expressed in the lambda-gradient basis:
  // grad phi_a = sum_v C[q][a][v] grad(lambda_v); physical grad(lambda_v)
  // comes from the cofactor pullback per cell.
  int nq;
  double qw[4];
  double C[4][10][4] = {};
  if (deg == 1) {
    nq = 1;
    qw[0] = 1.0 / 6.0;
    for (int a = 0; a < 4; ++a) C[0][a][a] = 1.0;
  } else {
    nq = 4;  // Keast 4-point, degree-2 exact
    const double aa = 0.5854101966249685, bb = 0.1381966011250105;
    double lam[4][4];
    for (int q = 0; q < 4; ++q) {
      qw[q] = 1.0 / 24.0;
      double x = (q == 1) ? aa : bb, y = (q == 2) ? aa : bb, z = (q == 3) ? aa : bb;
      lam[q][0] = 1.0 - x - y - z; lam[q][1] = x; lam[q][2] = y; lam[q][3] = z;
    }
    for (int q = 0; q < 4; ++q) {
      for (int a = 0; a < 4; ++a) C[q][a][a] = 4.0 * lam[q][a] - 1.0;  // vertex
      for (int e = 0; e < 6; ++e) {  // edge (u,v): phi = 4 lu lv
        int u = edges[e][0], v = edges[e][1];
        C[q][4 + e][u] = 4.0 * lam[q][v];
        C[q][4 + e][v] = 4.0 * lam[q][u];
      }
    }
  }

  // --- sparsity pattern (setup, untimed — the reference also preallocates
  // via create_sparsity_pattern before the timed assembly) ---
  const int64_t num_sdofs = num_dofs * bs;  // scalar dof count
  std::vector<int64_t> pairs;  // NODE pairs; expanded by bs*bs into the CSR
  pairs.reserve(int64_t(nd) * nd * num_cells + num_dofs);
  for (int64_t c = 0; c < num_cells; ++c) {
    int32_t tgt[10];
    for (int a = 0; a < nd; ++a) {
      int32_t d = cdofs[nd * c + a];
      tgt[a] = is_slave[d] ? master_of[d] : d;
    }
    for (int a = 0; a < nd; ++a)
      for (int b = 0; b < nd; ++b)
        pairs.push_back(int64_t(tgt[a]) * num_dofs + tgt[b]);
  }
  for (int64_t v = 0; v < num_dofs; ++v)
    pairs.push_back(v * num_dofs + v);  // bc / slave diagonals
  std::sort(pairs.begin(), pairs.end());
  pairs.erase(std::unique(pairs.begin(), pairs.end()), pairs.end());
  std::vector<int64_t> rowptr(num_sdofs + 1, 0);
  std::vector<int32_t> colidx(pairs.size() * bs * bs);
  {
    // per-node-row entry counts -> scalar rows (each node row repeats bs
    // times, each node pair contributes bs columns per scalar row)
    for (size_t e = 0; e < pairs.size(); ++e) {
      int64_t nr = pairs[e] / num_dofs;
      for (int i = 0; i < bs; ++i) rowptr[nr * bs + i + 1] += bs;
    }
    for (int64_t rr = 0; rr < num_sdofs; ++rr) rowptr[rr + 1] += rowptr[rr];
    std::vector<int64_t> fill(rowptr.begin(), rowptr.end() - 1);
    for (size_t e = 0; e < pairs.size(); ++e) {
      int64_t nr = pairs[e] / num_dofs;
      int32_t nc = int32_t(pairs[e] % num_dofs);
      for (int i = 0; i < bs; ++i)
        for (int j = 0; j < bs; ++j)
          colidx[fill[nr * bs + i]++] = nc * bs + j;
    }
    // columns within each scalar row are already sorted (node pairs sorted,
    // bs-expansion preserves order)
  }
  pairs.clear(); pairs.shrink_to_fit();
  std::vector<double> data(colidx.size());

  // MatSetValues-equivalent: sorted search within the preallocated row.
  auto insert = [&](int32_t rr, int32_t cc, double v) {
    const int32_t* beg = colidx.data() + rowptr[rr];
    const int32_t* end = colidx.data() + rowptr[rr + 1];
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
      const int32_t* dof = &cdofs[nd * c];
      const int32_t* gv = &gverts[4 * c];
      // geometry gather through the x-dofmap + affine Jacobian (same
      // pullback FFCx generates)
      double J[3][3];
      for (int a = 0; a < 3; ++a)
        for (int d = 0; d < 3; ++d)
          J[d][a] = vcoords[3 * gv[a + 1] + d] - vcoords[3 * gv[0] + d];
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
      double gl[4][3];  // physical gradients of lambda_0..lambda_3
      for (int d = 0; d < 3; ++d) {
        gl[1][d] = cof[d][0] / det;
        gl[2][d] = cof[d][1] / det;
        gl[3][d] = cof[d][2] / det;
        gl[0][d] = -(gl[1][d] + gl[2][d] + gl[3][d]);
      }
      double absdet = std::fabs(det);
      // element tensor over SCALAR dofs: (nd*bs) x (nd*bs); bs=1 Laplacian
      // or bs=3 elasticity (mu*(d_ij g_a.g_b + g_b[i] g_a[j]) + lam*
      // g_b[j] g_a[i] — 2*mu*sym:sym + lam*div*div contracted analytically)
      double Ae[30][30] = {};
      for (int q = 0; q < nq; ++q) {
        double g[10][3];
        for (int a = 0; a < nd; ++a)
          for (int d = 0; d < 3; ++d)
            g[a][d] = C[q][a][0] * gl[0][d] + C[q][a][1] * gl[1][d] +
                      C[q][a][2] * gl[2][d] + C[q][a][3] * gl[3][d];
        double w = qw[q] * absdet;
        if (bs == 1) {
          for (int a = 0; a < nd; ++a)
            for (int b = 0; b < nd; ++b)
              Ae[a][b] +=
                  w * (g[a][0] * g[b][0] + g[a][1] * g[b][1] + g[a][2] * g[b][2]);
        } else {
          for (int a = 0; a < nd; ++a)
            for (int b = 0; b < nd; ++b) {
              double dot =
                  g[a][0] * g[b][0] + g[a][1] * g[b][1] + g[a][2] * g[b][2];
              for (int i = 0; i < bs; ++i)
                for (int j = 0; j < bs; ++j)
                  Ae[bs * a + i][bs * b + j] +=
                      w * (mu_ * ((i == j) ? dot : 0.0) +
                           mu_ * g[b][i] * g[a][j] + lam_ * g[b][j] * g[a][i]);
            }
        }
      }

      // Dirichlet: zero bc rows and columns of the element tensor (all
      // components of a bc node)
      bool any_slave = false;
      const int ndb = nd * bs;
      for (int a = 0; a < nd; ++a) {
        int32_t d = dof[a];
        if (is_bc[d])
          for (int i = 0; i < bs; ++i)
            for (int b = 0; b < ndb; ++b) {
              Ae[bs * a + i][b] = 0.0;
              Ae[b][bs * a + i] = 0.0;
            }
        any_slave |= bool(is_slave[d]);
      }

      {
        // modify_mpc_cell semantics: replace each slave row/col by its
        // flattened (master, coeff) expansion (identity when no slaves)
        int32_t tgt[10];
        for (int a = 0; a < nd; ++a) {
          int32_t d = dof[a];
          tgt[a] = (any_slave && is_slave[d]) ? master_of[d] : d;
        }
        for (int a = 0; a < nd; ++a)
          for (int b = 0; b < nd; ++b)
            for (int i = 0; i < bs; ++i)
              for (int j = 0; j < bs; ++j)
                insert(tgt[a] * bs + i, tgt[b] * bs + j,
                       Ae[bs * a + i][bs * b + j]);
      }
    }
    // diagonal values for bc and slave dofs (reference: diagval inserts
    // after the cell loop)
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t v = 0; v < num_dofs; ++v)
      if (is_bc[v] || is_slave[v])
        for (int i = 0; i < bs; ++i)
          insert(int32_t(v * bs + i), int32_t(v * bs + i), 1.0);
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    if (dt < best) best = dt;
  }

  // optional dump for the correctness cross-check against the jax
  // assembler (tests/test_ref_baseline.py): triplets + dof grid coords, text
  if (argc > 4 && argv[4][0] != '-') {
    FILE* f = std::fopen(argv[4], "w");
    for (int i = 0; i < gp; ++i)
      for (int j = 0; j < gp; ++j)
        for (int k = 0; k < gp; ++k)
          std::fprintf(f, "v %.17g %.17g %.17g\n", double(i) / (gp - 1),
                       double(j) / (gp - 1), double(k) / (gp - 1));
    for (int64_t rr = 0; rr < num_sdofs; ++rr)
      for (int64_t e = rowptr[rr]; e < rowptr[rr + 1]; ++e)
        std::fprintf(f, "e %lld %d %.17g\n", (long long)rr, colidx[e], data[e]);
    std::fclose(f);
  }

  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  double mdof_s = double(num_sdofs) / 1e6 / best;
  std::printf(
      "{\"n\": %d, \"degree\": %d, \"bs\": %d, \"dofs\": %lld, \"cells\": %lld, "
      "\"nnz\": %zu, \"threads\": %d, \"assembly_s\": %.6f, \"mdof_s\": %.3f, "
      "\"mcells_s\": %.3f}\n",
      n, deg, bs, (long long)num_sdofs, (long long)num_cells, colidx.size(),
      threads, best, mdof_s, double(num_cells) / 1e6 / best);
  return 0;
}
