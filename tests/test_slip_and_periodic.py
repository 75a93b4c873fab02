"""Slip constraint (u·n = 0) and topological periodic constraints
(mirrors /root/reference/python/tests: test_periodic.py, slip parts of
test_cube_contact.py / demo_stokes)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
from dolfinx_mpc_tpu.fem.mesh import (
    create_unit_square,
    locate_entities_boundary,
    meshtags,
)
from dolfinx_mpc_tpu.utils import compare_mpc_lhs, gather_transformation_matrix
from dolfinx_mpc_tpu.utils.mpc_utils import create_normal_approximation


@pytest.mark.parametrize("cell_type", ["triangle", "quadrilateral"])
def test_periodic_topological(cell_type, scalar_dtype):
    mesh = create_unit_square(4, 4, cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    facets = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[0], 1.0))
    mt = meshtags(mesh, 1, facets, 2)
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)

    def relation(x):
        out = np.copy(x)
        out[0] = 1.0 - x[0]
        return out

    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_periodic_constraint_topological(V, mt, 2, relation, [bc])
    mpc.finalize()
    assert mpc.num_local_slaves == 3  # interior dofs of x=1 edge (ends are bc)
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, bcs=[bc], dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, bcs=[bc], dtype=scalar_dtype).to_scipy(),
        mpc,
    )


def test_periodic_scale(scalar_dtype):
    """Periodic with scale factor (PeriodicConstraint.h scale arg)."""
    mesh = create_unit_square(4, 4)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_periodic_constraint_geometrical(
        V,
        lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1]]),
        [],
        scale=0.5,
    )
    mpc.finalize()
    _, offs = mpc.masters
    coeffs, _ = mpc.coefficients
    assert np.allclose(np.abs(coeffs[np.abs(coeffs) > 1e-13]), 0.5)


def test_periodic_vector_subspace(scalar_dtype):
    """Periodic constraint on one component of a vector space
    (reference test_periodic.py mixed/sub-space cases)."""
    mesh = create_unit_square(4, 4)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_periodic_constraint_geometrical(
        V.sub(1),
        lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1]]),
        [],
    )
    mpc.finalize()
    # all slaves are component-1 dofs
    assert (np.asarray(mpc.slaves) % 2 == 1).all()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )


def test_slip_constraint_elasticity():
    """u·n = 0 on the right wall of an elasticity problem: assembled system
    matches the oracle and the solved solution satisfies u·n ≈ 0."""
    mesh = create_unit_square(6, 6)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    facets = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[0], 1.0))
    mt = meshtags(mesh, 1, facets, 1)
    n_approx = create_normal_approximation(V, mt, 1)

    bfacets = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 0.0))
    bc = dmt.dirichletbc(np.array([0.0, 0.0]), bfacets, V)

    mpc = dmt.MultiPointConstraint(V)
    mpc.create_slip_constraint(V, (mt, 1), n_approx, [bc])
    mpc.finalize()
    assert mpc.num_local_slaves > 0

    mu, lam = 1.0, 1.25

    def elast(u, v, c):
        return 2 * mu * inner(sym(grad(u)), sym(grad(v))) + lam * div(u) * conj(div(v))

    a = dmt.BilinearForm(V, elast)
    L = dmt.LinearForm(V, lambda v, c: inner(np.array([1.0, -0.5]), v))
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, bcs=[bc]).to_scipy(),
        dmt.assemble_matrix(a, mpc, bcs=[bc]).to_scipy(),
        mpc,
    )
    problem = dmt.LinearProblem(a, L, mpc, bcs=[bc], petsc_options={"ksp_rtol": 1e-12})
    u = problem.solve()
    arr = np.asarray(u.x.array).reshape(-1, 2)
    nvals = np.asarray(n_approx.x.array).reshape(-1, 2)
    slave_blocks = np.unique(np.asarray(mpc.slaves) // 2)
    un = np.einsum("bi,bi->b", arr[slave_blocks], nvals[slave_blocks])
    assert np.abs(un).max() < 1e-10, f"slip violated: {np.abs(un).max()}"
    assert np.abs(arr).max() > 1e-3  # nontrivial deformation
