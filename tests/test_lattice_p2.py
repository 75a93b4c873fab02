"""Degree-2 lattice fast path: the P2/Q2 dofs of a box lattice biject with
the degree-refined grid, so the DIA stencil assembler covers the reference's
canonical --degree 2 benchmark config
(/root/reference/python/benchmarks/Makefile:1-9).  Verified operator-
identical to the general slot-CSR assembler (itself pinned to the scipy
K^H A K oracle in test_assembly.py)."""

import numpy as np
import pytest

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube, create_unit_square
from dolfinx_mpc_tpu.ops.assemble import assemble_matrix
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice


def _setup(n, cube, degree=2):
    if cube:
        mesh = create_unit_cube(n, n, n)
        relation = lambda x: np.stack([1.0 - x[0], x[1], x[2]])
    else:
        mesh = create_unit_square(n, n)
        relation = lambda x: np.stack([1.0 - x[0], x[1]])
    V = dmt.functionspace(mesh, ("Lagrange", degree))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0), relation, [bc]
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=2)
    return mesh, V, a, mpc, bc


def test_p2_grid_numbering_bijection():
    mesh = create_unit_cube(3, 3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 2))
    assert V.grid_meta is not None
    G = V.grid_meta["gshape"]
    assert V.num_dofs == G[0] * G[1] * G[2]
    # every grid point is hit by the dofmap (bijection, not just injection)
    assert len(np.unique(V.dofmap_blocks)) == V.num_dofs
    # dof coordinates match the grid-lex convention
    ii = np.unravel_index(np.arange(V.num_dofs), G)
    expect = np.stack(ii, axis=1) / (np.asarray(G) - 1)
    assert np.abs(V.dof_coords_blocks - expect).max() < 1e-12


@pytest.mark.parametrize("cube", [False, True])
@pytest.mark.parametrize("fmt", ["fold", "csr", "cells"])
def test_p2_lattice_matches_general(cube, fmt):
    n = 3
    mesh, V, a, mpc, bc = _setup(n, cube)
    A_ref = assemble_matrix(a, mpc, bcs=[bc]).to_scipy()
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float64, side_format=fmt)
    A_lat = clf.assemble().to_scipy()
    err = abs(A_ref - A_lat).max()
    assert err < 1e-10, f"{fmt}: {err}"


def test_p2_lean_chunked_matches_monolithic():
    mesh, V, a, mpc, bc = _setup(4, True)
    c1 = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float64, side_format="fold")
    c2 = assemble_matrix_lattice(
        a, mpc, bcs=[bc], dtype=np.float64, side_format="fold", x_chunks=2
    )
    assert c1._lean and c2._lean
    d1 = np.asarray(c1.assemble().dia.data)
    d2 = np.asarray(c2.assemble().dia.data)
    assert np.abs(d1 - d2).max() < 1e-12


def test_p2_matvec_matches_scipy():
    mesh, V, a, mpc, bc = _setup(3, True)
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float64, side_format="fold")
    op = clf.assemble()
    rng = np.random.default_rng(7)
    x = rng.standard_normal(V.num_dofs)
    y1 = np.asarray(op.matvec(x))
    y2 = op.to_scipy() @ x
    assert np.abs(y1 - y2).max() < 1e-10


def test_p2_solve_matches_oracle():
    """Full pipeline: P2 periodic Poisson through LinearProblem (auto lattice
    dispatch) vs the dense K^H A K oracle solve."""
    import scipy.sparse.linalg as spla

    mesh, V, a, mpc, bc = _setup(3, True)
    L = dmt.LinearForm(V, lambda v, c: 4.0 * v.value)
    problem = dmt.LinearProblem(a, L, mpc, bcs=[bc], petsc_options={"ksp_rtol": 1e-12})
    uh = problem.solve()
    from dolfinx_mpc_tpu.utils.verification import gather_transformation_matrix

    K = gather_transformation_matrix(mpc)
    A = assemble_matrix(a, None, bcs=[bc]).to_scipy()  # unconstrained oracle
    b = np.asarray(dmt.assemble_vector(L, None))
    b = np.asarray(dmt.set_bc(b, [bc]))
    red = K.conj().T @ A @ K
    x = K @ spla.spsolve(red.tocsc(), K.conj().T @ b)
    assert np.abs(np.asarray(uh.x.array) - x).max() < 1e-8


def test_p2_topological_dofs_on_lattice():
    """locate_dofs_topological on a grid-numbered P2 space (lazy edge store)."""
    from dolfinx_mpc_tpu.fem.mesh import locate_entities_boundary

    mesh = create_unit_cube(2, 2, 2)
    V = dmt.functionspace(mesh, ("Lagrange", 2))
    facets = locate_entities_boundary(mesh, 2, lambda x: np.isclose(x[0], 0.0))
    dofs = dmt.locate_dofs_topological(V, 2, facets)
    coords = V.dof_coords_blocks[dofs]
    assert len(dofs) == 5 * 5  # (2*2+1)^2 grid points on the x=0 face
    assert np.allclose(coords[:, 0], 0.0)
