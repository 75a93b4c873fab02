"""Cross-check the C++ CPU reference baseline (csrc/ref_baseline.cpp)
against the jax assembler: both must produce the SAME constrained operator
K^T A K (+ unit diagonals on bc/slave dofs) for the periodic-Poisson
benchmark problem, up to a dof renumbering.

This is what makes the measured baseline in benchmarks/ref_cpu_baseline.json
a legitimate stand-in for the dolfinx_mpc C++ assembler: same mesh family,
same constraint set, same output matrix.
"""

import shutil
import subprocess

import numpy as np
import pytest
import scipy.sparse as sp


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
@pytest.mark.parametrize("degree", [1, 2])
def test_cpp_baseline_matches_jax_assembler(tmp_path, degree):
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube

    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "ref_cpu_baseline",
        os.path.join(os.path.dirname(__file__), "..", "benchmarks", "ref_cpu_baseline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    binary = mod.build()

    n = 4
    dump = tmp_path / "mat.txt"
    subprocess.run(
        [binary, str(n), "1", str(degree), str(dump)], check=True, capture_output=True
    )

    coords, rows, cols, vals = [], [], [], []
    for line in dump.read_text().splitlines():
        parts = line.split()
        if parts[0] == "v":
            coords.append([float(p) for p in parts[1:]])
        else:
            rows.append(int(parts[1]))
            cols.append(int(parts[2]))
            vals.append(float(parts[3]))
    coords = np.asarray(coords)
    N = len(coords)
    A_cpp = sp.csr_matrix((vals, (rows, cols)), shape=(N, N))

    # same problem through the package
    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", degree))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V,
        lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]),
        [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=degree)
    A_jax = dmt.assemble_matrix(a, mpc, bcs=[bc], diagval=1.0).to_scipy().tocsr()
    assert A_jax.shape == (N, N)

    # map C++ node ids -> package dof ids via coordinates
    X = V.tabulate_dof_coordinates()
    gp = degree * n + 1
    key = lambda P: np.round(P * (gp - 1)).astype(np.int64) @ np.array(
        [gp**2, gp, 1], dtype=np.int64
    )
    k_cpp, k_jax = key(coords), key(X)
    order_cpp, order_jax = np.argsort(k_cpp), np.argsort(k_jax)
    perm = np.empty(N, dtype=np.int64)  # perm[cpp_id] = jax_id
    perm[order_cpp] = order_jax
    P = sp.csr_matrix((np.ones(N), (perm, np.arange(N))), shape=(N, N))
    A_cpp_perm = (P @ A_cpp @ P.T).tocsr()

    diff = A_cpp_perm - A_jax
    max_err = np.abs(diff.data).max() if diff.nnz else 0.0
    assert max_err < 1e-12, max_err


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_cpp_baseline_bs3_matches_jax_assembler(tmp_path):
    """bs=3 vector elasticity build of the baseline == the jax assembler
    (same mesh, periodic MPC, elasticity form) up to node renumbering —
    legitimizes the measured bs=3 rate behind BENCH_BS=3 vs_baseline."""
    import importlib.util
    import os

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube

    spec = importlib.util.spec_from_file_location(
        "ref_cpu_baseline",
        os.path.join(os.path.dirname(__file__), "..", "benchmarks", "ref_cpu_baseline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    binary = mod.build()

    n, bs = 3, 3
    dump = tmp_path / "mat3.txt"
    subprocess.run(
        [binary, str(n), "1", "1", str(dump), str(bs)], check=True, capture_output=True
    )
    coords, rows, cols, vals = [], [], [], []
    for line in dump.read_text().splitlines():
        parts = line.split()
        if parts[0] == "v":
            coords.append([float(p) for p in parts[1:]])
        else:
            rows.append(int(parts[1]))
            cols.append(int(parts[2]))
            vals.append(float(parts[3]))
    coords = np.asarray(coords)
    N = len(coords)  # nodes
    A_cpp = sp.csr_matrix((vals, (rows, cols)), shape=(N * bs, N * bs))

    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(np.zeros(3), bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V,
        lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]),
        [bc],
    )
    mpc.finalize()
    mu, lam = 1.0, 1.25
    a = dmt.BilinearForm(
        V,
        lambda u, v, c: 2 * mu * inner(sym(grad(u)), sym(grad(v)))
        + lam * div(u) * conj(div(v)),
        quad_degree=1,
    )
    A_jax = dmt.assemble_matrix(a, mpc, bcs=[bc], diagval=1.0).to_scipy().tocsr()
    assert A_jax.shape == (N * bs, N * bs)

    X = V.tabulate_dof_coordinates()
    if X.shape[0] == N * bs:  # per-component rows -> one per node
        X = X[::bs]
    gp = n + 1
    key = lambda Pc: np.round(Pc * (gp - 1)).astype(np.int64) @ np.array(
        [gp**2, gp, 1], dtype=np.int64
    )
    k_cpp, k_jax = key(coords), key(X)
    order_cpp, order_jax = np.argsort(k_cpp), np.argsort(k_jax)
    nperm = np.empty(N, dtype=np.int64)
    nperm[order_cpp] = order_jax
    # node permutation expanded over interleaved components
    sperm = (nperm[:, None] * bs + np.arange(bs)).ravel()
    P = sp.csr_matrix((np.ones(N * bs), (sperm, np.arange(N * bs))),
                      shape=(N * bs, N * bs))
    A_cpp_perm = (P @ A_cpp @ P.T).tocsr()

    diff = A_cpp_perm - A_jax
    max_err = np.abs(diff.data).max() if diff.nnz else 0.0
    assert max_err < 1e-12, max_err
