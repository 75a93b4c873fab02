"""Sharded (8 virtual CPU devices) solve must match the single-device solve
and the explicit K^T A K oracle — the TPU analogue of the reference running
the same assertions under mpirun -n 2..4 (SURVEY.md §4)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube, create_unit_square
from dolfinx_mpc_tpu.parallel import ShardedLinearProblem, make_device_mesh
from dolfinx_mpc_tpu.utils import gather_transformation_matrix


def _periodic_poisson_2d(n):
    mesh = create_unit_square(n, n)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.3, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V,
        lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1]]),
        [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    L = dmt.LinearForm(V, lambda v, c: (1.0 + c.x[0] * 0.0) * v.value)
    return V, a, L, mpc, bc


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_sharded_matches_oracle(n_dev):
    V, a, L, mpc, bc = _periodic_poisson_2d(12)
    prob = ShardedLinearProblem(
        a, L, mpc, [bc], device_mesh=make_device_mesh(n_dev), rtol=1e-12
    )
    u, its, rnorm = prob.solve()
    u = np.asarray(u)

    A = dmt.assemble_matrix(a, None, bcs=[bc]).to_scipy()
    b = np.asarray(dmt.assemble_vector(L, None))
    b = np.asarray(dmt.apply_lifting(b, [a], [[bc]], None))
    b = np.asarray(dmt.set_bc(b, [bc]))
    K = gather_transformation_matrix(mpc)
    u_ref = K @ spla.spsolve((K.T @ A @ K).tocsr(), K.T @ b)
    # slave rows of u_ref lack the bc inhomogeneity path; compare via backsub
    assert np.abs(u - u_ref).max() < 1e-8, f"n_dev={n_dev}: {np.abs(u - u_ref).max()}"


def test_sharded_3d_runs():
    mesh = create_unit_cube(3, 3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
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
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    L = dmt.LinearForm(V, lambda v, c: 4.0 * v.value)
    prob = ShardedLinearProblem(a, L, mpc, [bc], device_mesh=make_device_mesh(8))
    u, its, rnorm = prob.solve()
    u = np.asarray(u)
    assert np.isfinite(u).all()
    assert its > 0
    # periodic faces agree
    coords = V.dof_coords_blocks
    l = np.flatnonzero(np.isclose(coords[:, 0], 0.0))
    r = np.flatnonzero(np.isclose(coords[:, 0], 1.0))
    key = lambda idx: np.lexsort((coords[idx, 2], coords[idx, 1]))
    assert np.abs(u[l[key(l)]] - u[r[key(r)]]).max() < 1e-7
