"""Geometric multigrid: CG iteration counts must beat Jacobi substantially
and stay near-constant in mesh size (the BoomerAMG parity story,
SURVEY.md §7 hard part (e))."""

import numpy as np
import pytest

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.la.gmg import LatticeGMG, build_gmg_hierarchy
from dolfinx_mpc_tpu.la.solvers import cg, jacobi_preconditioner
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice


def _make(n):
    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=1)
    return assemble_matrix_lattice(a, mpc, bcs=[bc], side_format="cells"), V


def test_gmg_beats_jacobi_and_scales():
    import jax.numpy as jnp

    its = {}
    for n in (16, 32):
        clf, V = _make(n)
        ops, masks = build_gmg_hierarchy(lambda m: _make(m)[0], n, 4)
        A = ops[0]
        b = jnp.asarray(np.random.default_rng(0).standard_normal(V.num_dofs))
        xj, itj, _ = cg(A.matvec, b, M=jacobi_preconditioner(A.diagonal()), rtol=1e-10, max_it=3000)
        M = LatticeGMG(ops, free_masks=masks)
        xg, itg, _ = cg(A.matvec, b, M=M, rtol=1e-10, max_it=3000)
        assert np.abs(np.asarray(xj) - np.asarray(xg)).max() < 1e-6
        its[n] = (int(itj), int(itg))
    for n, (itj, itg) in its.items():
        assert itg < itj / 3, f"n={n}: GMG {itg} vs Jacobi {itj}"
    # near-mesh-independence: allow mild growth only
    assert its[32][1] <= its[16][1] * 1.8, its


def _make_deg(n, degree):
    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", degree))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=degree)
    return assemble_matrix_lattice(a, mpc, bcs=[bc], side_format="fold"), V


def test_gmg_p2_hierarchy():
    """Degree-2 hierarchy: the refined dof grids still nest (fine = 2*coarse
    - 1 per axis), so the same transfer operators apply; iteration counts
    stay bounded across n."""
    import jax.numpy as jnp

    its = {}
    for n in (8, 16):
        clf, V = _make_deg(n, 2)
        ops, masks = build_gmg_hierarchy(lambda m: _make_deg(m, 2)[0], n, 3, min_n=4)
        assert len(ops) >= 2
        A = ops[0]
        b = jnp.asarray(np.random.default_rng(1).standard_normal(V.num_dofs))
        xj, itj, _ = cg(A.matvec, b, M=jacobi_preconditioner(A.diagonal()), rtol=1e-10, max_it=5000)
        M = LatticeGMG(ops, free_masks=masks)
        xg, itg, _ = cg(A.matvec, b, M=M, rtol=1e-10, max_it=5000)
        assert np.abs(np.asarray(xj) - np.asarray(xg)).max() < 1e-6
        its[n] = (int(itj), int(itg))
    for n, (itj, itg) in its.items():
        assert itg < itj / 2, f"n={n}: GMG {itg} vs Jacobi {itj}"
    assert its[16][1] <= max(its[8][1] * 2, 40), its


def test_gmg_p2_p_coarsened_hierarchy():
    """Degree-2 p-coarsening: level 1 is the P1 operator on the SAME refined
    nodal grid (identity transfer — equal vshapes), then h-coarsened P1.
    Converges FASTER than the h-P2 hierarchy (measured 15 vs 23 its at n=8,
    20 vs 37 at n=16) while every coarse sweep rides the cheap 15/27-diagonal
    P1 SpMV instead of the 65-diagonal P2 one."""
    import jax.numpy as jnp

    def make_level(lv):
        deg, m = lv if isinstance(lv, tuple) else (2, lv)
        return _make_deg(m, deg)[0]

    for n in (8,):
        clf, V = _make_deg(n, 2)
        levels = [(2, n), (1, 2 * n)]
        m = n
        while m >= 4 and m % 2 == 0:
            levels.append((1, m))
            m //= 2
        ops, masks = build_gmg_hierarchy(make_level, n, 4, levels=levels)
        # level 1 shares the fine nodal grid: identity transfer
        assert tuple(ops[0].dia.vshape) == tuple(ops[1].dia.vshape)
        A = ops[0]
        b = jnp.asarray(np.random.default_rng(2).standard_normal(V.num_dofs))
        M = LatticeGMG(ops, free_masks=masks)
        xg, itg, _ = cg(A.matvec, b, M=M, rtol=1e-10, max_it=200)
        xj, itj, _ = cg(A.matvec, b, M=jacobi_preconditioner(A.diagonal()),
                        rtol=1e-10, max_it=5000)
        assert np.abs(np.asarray(xj) - np.asarray(xg)).max() < 1e-6
        assert itg < itj / 3, (int(itg), int(itj))
        assert itg <= 25, int(itg)


def test_gmg_chebyshev_smoother():
    """smoother="chebyshev" (GAMG/hypre default) must stay a symmetric
    preconditioner (CG converges to the same answer) and beat Jacobi
    smoothing at equal sweep counts (measured 16 -> 10 its on P1, 34 -> 18
    on bs=3 elasticity, r4)."""
    import jax.numpy as jnp

    n = 16
    clf, V = _make_deg(n, 1)
    ops, masks = build_gmg_hierarchy(lambda m: _make_deg(m, 1)[0], n, 3,
                                     min_n=4)
    A = ops[0]
    b = jnp.asarray(np.random.default_rng(7).standard_normal(V.num_dofs))
    Mj = LatticeGMG(ops, free_masks=masks, smoother="jacobi")
    xj, itj, _ = cg(A.matvec, b, M=Mj, rtol=1e-10, max_it=300)
    Mc = LatticeGMG(ops, free_masks=masks, smoother="chebyshev")
    xc, itc, _ = cg(A.matvec, b, M=Mc, rtol=1e-10, max_it=300)
    nrm = np.abs(np.asarray(xj)).max()
    assert np.abs(np.asarray(xc) - np.asarray(xj)).max() < 1e-7 * nrm
    assert itc < itj, (int(itc), int(itj))
    # preconditioner symmetry: <Mu, v> == <u, Mv>
    rng = np.random.default_rng(8)
    u = jnp.asarray(rng.standard_normal(V.num_dofs))
    v = jnp.asarray(rng.standard_normal(V.num_dofs))
    lhs = float(jnp.vdot(Mc(u), v))
    rhs = float(jnp.vdot(u, Mc(v)))
    assert abs(lhs - rhs) < 1e-9 * max(abs(lhs), 1.0)


def test_gmg_blocked_native_solve_matches_flat():
    """blocked_io GMG-CG (vectors in the padded class-major stack, the r4
    production layout for degree 2 — kills the 4.8 ms/matvec layout
    transposes) must reproduce the flat interleaved solve: same iteration
    count, same solution."""
    import jax.numpy as jnp

    def make_level(lv):
        deg, m = lv if isinstance(lv, tuple) else (2, lv)
        return _make_deg(m, deg)[0]

    n = 8
    clf, V = _make_deg(n, 2)
    levels = [(2, n), (1, 2 * n), (1, n), (1, n // 2)]
    ops, masks = build_gmg_hierarchy(make_level, n, 4, levels=levels)
    A = ops[0]
    assert A.supports_blocked()
    b = jnp.asarray(np.random.default_rng(3).standard_normal(V.num_dofs))
    M = LatticeGMG(ops, free_masks=masks)
    x_f, it_f, _ = cg(A.matvec, b, M=M, rtol=1e-10, max_it=200)
    Mb = LatticeGMG(ops, free_masks=masks, blocked_io=True,
                    bounds=M._bounds)
    bb = A.dia._to_blocked(b)
    xb, it_b, _ = cg(A.matvec_blocked, bb, M=Mb, rtol=1e-10, max_it=200)
    x_b = A.dia._from_blocked(xb)
    assert int(it_b) == int(it_f), (int(it_b), int(it_f))
    nrm = np.abs(np.asarray(x_f)).max()
    assert np.abs(np.asarray(x_b) - np.asarray(x_f)).max() < 1e-8 * nrm
    # padded slots never leak into the solution
    ones_b = A.dia._to_blocked(jnp.ones(V.num_dofs, x_b.dtype))
    assert float(jnp.abs(jnp.where(ones_b == 0, xb, 0.0)).max()) == 0.0
