"""Smoothed-aggregation AMG: V-cycle correctness (symmetric, convergent)
and CG iteration counts vs plain Jacobi on unstructured problems — the
reference's BoomerAMG/GAMG parity story
(/root/reference/python/benchmarks/bench_periodic.py:115-133)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp


def _poisson3d(n):
    """7-point Laplacian on an n^3 grid with Dirichlet rows kept identity."""
    e = np.ones(n)
    T = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1])
    I = sp.identity(n)
    return (sp.kron(sp.kron(T, I), I) + sp.kron(sp.kron(I, T), I)
            + sp.kron(sp.kron(I, I), T)).tocsr()


def test_aggregation_covers_all_nodes():
    from dolfinx_mpc_tpu.la.amg import _aggregate, _strength

    A = _poisson3d(8)
    S = _strength(A, 0.08)
    agg, na = _aggregate(S)
    assert agg.min() >= 0 and agg.max() == na - 1
    assert 3 <= A.shape[0] / na <= 60  # meaningful coarsening
    # every aggregate non-empty and ids consecutive
    assert np.array_equal(np.unique(agg), np.arange(na))


def test_amg_poisson_iterations():
    from dolfinx_mpc_tpu.la.amg import smoothed_aggregation_amg
    from dolfinx_mpc_tpu.la.solvers import cg
    from dolfinx_mpc_tpu.la.sparse import CSRMatrix

    A = _poisson3d(14)  # 2744 dofs
    n = A.shape[0]
    M = smoothed_aggregation_amg(A, coarse_size=200, dtype=np.float64)
    b = np.random.default_rng(0).standard_normal(n)
    Ad = M.ops[0] if len(M.ops) else None
    row_ids = np.repeat(np.arange(n, dtype=np.int32), np.diff(A.indptr))
    Adev = CSRMatrix(jnp.asarray(A.data), jnp.asarray(A.indices.astype(np.int32)),
                     jnp.asarray(A.indptr), jnp.asarray(row_ids), A.shape)
    x, its, rn = cg(Adev.matvec, jnp.asarray(b), M=M, rtol=1e-8)
    assert float(jnp.linalg.norm(Adev.matvec(x) - jnp.asarray(b))) < 1e-6 * np.linalg.norm(b)
    x_j, its_j, _ = cg(Adev.matvec, jnp.asarray(b), rtol=1e-8)
    assert its < its_j / 2.5, (int(its), int(its_j))
    assert its <= 25, int(its)


def test_amg_symmetric_preconditioner():
    """M must be symmetric (SPD) for CG: check <Mu, v> == <u, Mv>."""
    from dolfinx_mpc_tpu.la.amg import smoothed_aggregation_amg

    A = _poisson3d(8)
    M = smoothed_aggregation_amg(A, coarse_size=60, dtype=np.float64)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(A.shape[0]))
    v = jnp.asarray(rng.standard_normal(A.shape[0]))
    lhs = float(jnp.vdot(M(u), v))
    rhs = float(jnp.vdot(u, M(v)))
    assert abs(lhs - rhs) < 1e-8 * max(abs(lhs), 1.0)


def test_gamg_via_linear_problem():
    """pc_type "gamg" in petsc_options reaches the AMG path and solves the
    periodic Poisson problem to the oracle answer (reference passes the
    same dict to PETSc, bench_periodic.py:115-133)."""
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_cube

    mesh = create_unit_cube(8, 8, 8)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    L = dmt.LinearForm(V, lambda v, c: 1.0 * v.value)
    pg = dmt.LinearProblem(a, L, mpc, bcs=[bc],
                           petsc_options={"ksp_type": "cg", "pc_type": "gamg",
                                          "ksp_rtol": 1e-10})
    ug = pg.solve()
    pj = dmt.LinearProblem(a, L, mpc, bcs=[bc],
                           petsc_options={"ksp_type": "cg", "ksp_rtol": 1e-10})
    uj = pj.solve()
    assert pg.its < pj.its, (pg.its, pj.its)
    nrm = np.abs(np.asarray(uj.x.array)).max()
    assert np.abs(np.asarray(ug.x.array) - np.asarray(uj.x.array)).max() < 1e-7 * nrm


def _contact_elasticity_system(nb=7, nt=6):
    """Assembled tied-contact elasticity (the bench_contact_3D problem,
    small): returns (V, A, b)."""
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
    from dolfinx_mpc_tpu.fem.mesh import Mesh, create_box, meshtags
    bot = create_box((0, 0, 0), (1, 1, 1), (nb, nb, nb))
    top = create_box((0, 0, 1), (1, 1, 2), (nt, nt, nt))
    mesh = Mesh(np.vstack([bot.points, top.points]),
                np.vstack([bot.cells, top.cells + bot.num_points]),
                bot.cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    fverts, _, f2c = mesh.facets()
    on_iface = np.isclose(mesh.points[fverts][:, :, 2], 1.0).all(axis=1)
    ext = np.isin(np.arange(fverts.shape[0]), mesh.exterior_facets())
    iface = np.flatnonzero(on_iface & ext)
    cz = mesh.points[mesh.cells[f2c[iface, 0]]].mean(axis=1)[:, 2]
    mt = meshtags(mesh, 2, iface, np.where(cz > 1.0, 1, 2))
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_contact_inelastic_condition(mt, 1, 2)
    mpc.finalize()
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
    bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
    tdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 2.0))
    bc_top = dmt.dirichletbc(np.array([0.0, 0.0, -0.05]), tdofs, V)
    a = dmt.BilinearForm(V, lambda u, v, c: 2 * inner(sym(grad(u)), sym(grad(v)))
                         + 1.25 * div(u) * conj(div(v)))
    L = dmt.LinearForm(V, lambda v, c: inner(jnp.zeros(3), v))
    A = dmt.assemble_matrix(a, mpc, bcs=[bc, bc_top])
    b = dmt.assemble_vector(L, mpc)
    b = dmt.apply_lifting(b, [a], [[bc, bc_top]], mpc)
    b = jnp.asarray(np.asarray(dmt.set_bc(b, [bc, bc_top])))
    return V, A, b


def test_amg_contact_elasticity_iterations():
    """AMG cuts CG iterations well below Jacobi — the reference solves this
    with GAMG (/root/reference/python/benchmarks/bench_contact_3D.py:186-213)."""
    from dolfinx_mpc_tpu.la.amg import smoothed_aggregation_amg
    from dolfinx_mpc_tpu.la.solvers import cg_segmented

    V, A, b = _contact_elasticity_system()
    M = smoothed_aggregation_amg(A, bs=3, coarse_size=400, dtype=np.float64)
    x, its, rn = cg_segmented(A, b, M=M, rtol=1e-6, max_it=600, seg=50)
    x_j, its_j, _ = cg_segmented(A, b, rtol=1e-6, max_it=2000, seg=200)
    # solution matches the Jacobi-CG solution
    nrm = float(jnp.linalg.norm(x_j))
    assert float(jnp.linalg.norm(x - x_j)) < 1e-4 * nrm
    assert its < its_j / 2, (int(its), int(its_j))
    assert its <= 100, int(its)


def test_fit_candidates_reproduces_nullspace():
    """The tentative prolongator must reproduce the near-nullspace exactly:
    T @ Bc == B (PyAMG fit_candidates identity) — this is what makes the
    rigid modes live in range(P), the GAMG near-nullspace contract
    (/root/reference/python/dolfinx_mpc/utils/mpc_utils.py:163-215)."""
    from dolfinx_mpc_tpu.la.amg import _aggregate, _fit_candidates, _node_graph, _strength

    rng = np.random.default_rng(3)
    n_nodes, bs, k = 400, 3, 6
    coords = rng.standard_normal((n_nodes, 3))
    # rigid modes on random coordinates
    B = np.zeros((n_nodes * bs, k))
    for c in range(3):
        B[c::bs, c] = 1.0
    B[0::bs, 3] = -coords[:, 1]; B[1::bs, 3] = coords[:, 0]
    B[0::bs, 4] = coords[:, 2];  B[2::bs, 4] = -coords[:, 0]
    B[2::bs, 5] = coords[:, 1];  B[1::bs, 5] = -coords[:, 2]
    # a random sparse SPD-ish node graph to aggregate
    A = _poisson3d(8)  # 512 > 400? no — use 8^3=512 nodes then trim
    A = A[:n_nodes, :n_nodes].tocsr()
    S = _strength(A, 0.05)
    agg, na = _aggregate(S)
    T, Bc = _fit_candidates(agg, na, B, bs)
    err = np.abs(T @ Bc - B).max()
    assert err < 1e-12, err
    # orthonormal column blocks: T^T T == I on the non-dropped columns
    G = (T.T @ T).toarray()
    d = np.diag(G)
    keep = d > 0.5
    assert np.allclose(G[np.ix_(keep, keep)], np.eye(int(keep.sum())), atol=1e-12)


def test_amg_rigid_modes_cut_elasticity_iterations():
    """Passing the 6 rigid-body modes as the AMG near-nullspace must beat
    the translations-only default on elasticity — the reference's GAMG
    near-nullspace story (demo_elasticity.py + mpc_utils.py:163-215)."""
    from dolfinx_mpc_tpu.la.amg import smoothed_aggregation_amg
    from dolfinx_mpc_tpu.la.solvers import cg_segmented
    from dolfinx_mpc_tpu.utils.mpc_utils import rigid_motions_nullspace

    V, A, b = _contact_elasticity_system()
    M0 = smoothed_aggregation_amg(A, bs=3, coarse_size=400, dtype=np.float64)
    x0, its0, _ = cg_segmented(A, b, M=M0, rtol=1e-8, max_it=600, seg=50)
    ns = rigid_motions_nullspace(V)
    M1 = smoothed_aggregation_amg(A, bs=3, coarse_size=400,
                                  dtype=np.float64, nullspace=ns)
    x1, its1, _ = cg_segmented(A, b, M=M1, rtol=1e-8, max_it=600, seg=50)
    assert its1 < its0, (int(its1), int(its0))
    nrm = float(jnp.linalg.norm(x0))
    assert float(jnp.linalg.norm(x1 - x0)) < 1e-5 * nrm


def test_gamg_elasticity_linear_problem_attaches_nullspace():
    """LinearProblem with pc_type=gamg on a vector space auto-attaches the
    rigid-modes near-nullspace (reference attaches it by hand to the GAMG
    PC in demo_elasticity.py); solve matches the Jacobi-CG answer."""
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
    from dolfinx_mpc_tpu.fem.mesh import create_box

    mesh = create_box((0, 0, 0), (1, 1, 1), (6, 6, 6))
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
    bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: 2 * inner(sym(grad(u)), sym(grad(v)))
                         + 1.25 * div(u) * conj(div(v)))
    f = np.array([0.0, 0.0, -1.0])
    L = dmt.LinearForm(V, lambda v, c: inner(f, v))
    pg = dmt.LinearProblem(a, L, mpc, bcs=[bc],
                           petsc_options={"ksp_type": "cg", "pc_type": "gamg",
                                          "ksp_rtol": 1e-9})
    ug = pg.solve()
    pj = dmt.LinearProblem(a, L, mpc, bcs=[bc],
                           petsc_options={"ksp_type": "cg", "ksp_rtol": 1e-9})
    uj = pj.solve()
    assert pg.its < pj.its / 2, (pg.its, pj.its)
    nrm = np.abs(np.asarray(uj.x.array)).max()
    assert np.abs(np.asarray(ug.x.array) - np.asarray(uj.x.array)).max() < 1e-6 * nrm


def test_amg_large_coarse_fallback_no_dense():
    """When aggregation makes no progress on a large operator (empty
    strength graph on a strongly diagonally dominant matrix), setup must
    NOT materialize a dense N^2 inverse — it terminates the V-cycle with
    Chebyshev smoothing instead, and the preconditioner still works."""
    from dolfinx_mpc_tpu.la.amg import smoothed_aggregation_amg
    from dolfinx_mpc_tpu.la.sparse import CSRMatrix

    n = 20_000  # > the 16384 dense-coarse cap
    main = 10.0 * np.ones(n)
    off = -1e-3 * np.ones(n - 1)  # far below theta*sqrt(aii*ajj)
    A = sp.diags([off, main, off], [-1, 0, 1]).tocsr()
    M = smoothed_aggregation_amg(A, coarse_size=200, dtype=np.float64)
    assert M.coarse_inv is None  # dense inverse skipped
    row_ids = np.repeat(np.arange(n, dtype=np.int32), np.diff(A.indptr))
    Adev = CSRMatrix(jnp.asarray(A.data), jnp.asarray(A.indices.astype(np.int32)),
                     jnp.asarray(A.indptr.astype(np.int32)),
                     jnp.asarray(row_ids), A.shape)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(n))
    from dolfinx_mpc_tpu.la.solvers import cg

    x, its, rn = cg(Adev.matvec, b, M=M, rtol=1e-10, max_it=200)
    r = np.asarray(b) - A @ np.asarray(x)
    assert np.linalg.norm(r) < 1e-8 * np.linalg.norm(np.asarray(b))
    assert its < 50


def test_gamg_without_operator_falls_back_to_jacobi():
    """pc_type=gamg with no assembled operator must not silently run
    unpreconditioned: it warns and uses Jacobi, or raises without diag."""
    import warnings

    from dolfinx_mpc_tpu.la.solvers import SolverOptions, solve

    n = 500
    main = 2.0 + np.arange(n) % 3
    A = sp.diags([-np.ones(n - 1), main, -np.ones(n - 1)], [-1, 0, 1]).tocsr()
    Adense = jnp.asarray(A.todense())
    Adev = lambda x: Adense @ x
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    opts = SolverOptions.from_petsc({"ksp_type": "cg", "pc_type": "gamg",
                                     "ksp_rtol": 1e-10})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        x, its, rn = solve(Adev, b, opts, diag=jnp.asarray(main))
        assert any("falling back to Jacobi" in str(wi.message) for wi in w)
    r = np.asarray(b) - A @ np.asarray(x)
    assert np.linalg.norm(r) < 1e-8 * np.linalg.norm(np.asarray(b))
    with pytest.raises(ValueError):
        solve(Adev, b, opts)
