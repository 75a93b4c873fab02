"""Full pipeline: LinearProblem solution equals K @ spsolve(K^H A K, K^H b)
(mirror of /root/reference/python/tests/test_mpc_pipeline.py:94-110)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_square
from dolfinx_mpc_tpu.utils import compare_mpc_lhs, compare_mpc_rhs, gather_transformation_matrix


def _reduced_solve(a, L, mpc, bcs):
    A = dmt.assemble_matrix(a, None, bcs=bcs).to_scipy()
    b = np.asarray(dmt.assemble_vector(L, None))
    b = np.asarray(dmt.apply_lifting(b, [a], [bcs], None))
    b = np.asarray(dmt.set_bc(b, bcs))
    K = gather_transformation_matrix(mpc)
    red = spla.spsolve((K.T.conj() @ A @ K).tocsr(), K.T.conj() @ b)
    return K @ red


@pytest.mark.parametrize("cell_type", ["triangle", "quadrilateral"])
def test_pipeline(cell_type, scalar_dtype):
    mesh = create_unit_square(5, 5, cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {
            np.array([1.0, 1.0]).tobytes(): {
                np.array([0.0, 1.0]).tobytes(): 0.9,
                np.array([0.4, 1.0]).tobytes(): 0.1,
            }
        }
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)) + inner(u, v))
    L = dmt.LinearForm(V, lambda v, c: (c.x[0] + 3 * c.x[1]) * v.value)

    problem = dmt.LinearProblem(a, L, mpc, bcs=[bc], petsc_options={"ksp_rtol": 1e-13})
    u = problem.solve()
    u_ref = _reduced_solve(a, L, mpc, [bc])
    assert np.abs(np.asarray(u.x.array) - u_ref).max() < 1e-8


def test_pipeline_inhomogeneous_bc(scalar_dtype):
    """Lifting path: nonzero Dirichlet value through apply_lifting
    (reference test_lifting.py)."""
    mesh = create_unit_square(6, 6)
    V = dmt.functionspace(mesh, ("Lagrange", 2))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 0.0))
    bc = dmt.dirichletbc(2.5, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {np.array([1.0, 0.5]).tobytes(): {np.array([0.5, 0.5]).tobytes(): 0.6}}
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    L = dmt.LinearForm(V, lambda v, c: 1.0 * v.value)
    problem = dmt.LinearProblem(a, L, mpc, bcs=[bc], petsc_options={"ksp_rtol": 1e-13})
    u = problem.solve()
    u_ref = _reduced_solve(a, L, mpc, [bc])
    assert np.abs(np.asarray(u.x.array) - u_ref).max() < 1e-8
    # bc actually attained
    assert np.isclose(np.asarray(u.x.array)[bc.dofs], 2.5).all()


def test_matrix_vector_consistency(scalar_dtype):
    """K^H A K and K^H b oracles on the same pipeline objects."""
    mesh = create_unit_square(4, 4)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {np.array([1.0, 1.0]).tobytes(): {np.array([0.0, 0.0]).tobytes(): 0.5}}
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)) + inner(u, v))
    L = dmt.LinearForm(V, lambda v, c: c.x[0] * v.value)
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )
    compare_mpc_rhs(
        np.asarray(dmt.assemble_vector(L, None, dtype=scalar_dtype)),
        np.asarray(dmt.assemble_vector(L, mpc, dtype=scalar_dtype)),
        mpc,
    )
