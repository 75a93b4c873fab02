"""Full scalar-type matrix: the core constrained pipeline at
float32/float64/complex64/complex128 — mirroring the reference CI's 4-way
PETSc scalar matrix (/root/reference/.github/workflows/test_mpc.yml:20-27).
float32 is the production on-chip TPU dtype, so it gets first-class oracle
coverage here (looser tolerance, see conftest.dtype_tol)."""

import numpy as np
import scipy.sparse.linalg as spla

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube, create_unit_square
from dolfinx_mpc_tpu.utils import compare_mpc_lhs, gather_transformation_matrix

from conftest import dtype_tol


def _problem(dtype, cube=False):
    if cube:
        mesh = create_unit_cube(3, 3, 3)
        relation = lambda x: np.stack([1.0 - x[0], x[1], x[2]])
    else:
        mesh = create_unit_square(5, 5)
        relation = lambda x: np.stack([1.0 - x[0], x[1]])
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.3, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=dtype)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0), relation, [bc]
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)) + inner(u, v))
    L = dmt.LinearForm(V, lambda v, c: (1.0 + c.x[0]) * v.value)
    return V, a, L, mpc, bc


def test_matrix_assembly_all_dtypes(full_scalar_dtype):
    dtype = full_scalar_dtype
    V, a, L, mpc, bc = _problem(dtype)
    tol = dtype_tol(dtype)
    A_mpc = dmt.assemble_matrix(a, mpc, bcs=[bc], dtype=dtype).to_scipy()
    assert A_mpc.dtype == np.dtype(dtype)
    A_org = dmt.assemble_matrix(a, None, bcs=[bc], dtype=np.complex128
                                if np.dtype(dtype).kind == "c" else np.float64).to_scipy()
    compare_mpc_lhs(A_org, A_mpc.astype(A_org.dtype), mpc, atol=tol)


def test_vector_and_solve_all_dtypes(full_scalar_dtype):
    dtype = full_scalar_dtype
    V, a, L, mpc, bc = _problem(dtype)
    tol = dtype_tol(dtype)
    # vector assembly: K^H b
    b_mpc = np.asarray(dmt.assemble_vector(L, mpc, dtype=dtype))
    assert b_mpc.dtype == np.dtype(dtype)
    rdt = np.complex128 if np.dtype(dtype).kind == "c" else np.float64
    b_org = np.asarray(dmt.assemble_vector(L, None, dtype=rdt))
    from dolfinx_mpc_tpu.utils import compare_mpc_rhs

    compare_mpc_rhs(b_org, b_mpc.astype(rdt), mpc, atol=10 * tol)
    K = gather_transformation_matrix(mpc)

    # end-to-end LinearProblem at this dtype vs the f64 oracle
    problem = dmt.LinearProblem(a, L, mpc, bcs=[bc], petsc_options={"ksp_rtol": 1e-6 if dtype_tol(dtype) > 1e-6 else 1e-12})
    u = problem.solve()
    A = dmt.assemble_matrix(a, None, bcs=[bc], dtype=rdt).to_scipy()
    b = np.asarray(dmt.assemble_vector(L, None, dtype=rdt))
    b = np.asarray(dmt.apply_lifting(b, [a], [[bc]], None, dtype=rdt))
    b = np.asarray(dmt.set_bc(b, [bc]))
    red = spla.spsolve((K.conj().T @ A @ K).tocsc(), K.conj().T @ b)
    u_ref = K @ red
    assert np.abs(np.asarray(u.x.array) - u_ref).max() < 50 * tol


def test_lattice_all_dtypes(full_scalar_dtype):
    """The DIA fast path at every scalar type (3D periodic fold)."""
    from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

    dtype = full_scalar_dtype
    V, a, L, mpc, bc = _problem(dtype, cube=True)
    tol = dtype_tol(dtype)
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=dtype, side_format="fold")
    A_lat = clf.assemble().to_scipy()
    A_gen = dmt.assemble_matrix(a, mpc, bcs=[bc], dtype=dtype).to_scipy()
    assert abs(A_lat - A_gen).max() < 10 * tol
