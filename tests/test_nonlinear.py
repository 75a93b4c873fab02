"""Nonlinear (Newton) solves with MPC enforced on iterates (mirror of
/root/reference/python/tests/test_nonlinear_assembly.py — skipped for complex
scalars there and here)."""

import numpy as np

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_square


def test_newton_nonlinear_poisson_periodic():
    mesh = create_unit_square(8, 8)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0), lambda x: np.stack([1.0 - x[0], x[1]]), [bc]
    )
    mpc.finalize()
    u = dmt.Function(V, name="u")
    F = dmt.LinearForm(
        V,
        lambda v, c: inner((1 + c["u"].value ** 2) * grad(c["u"]), grad(v)) - 4.0 * v.value,
        coefficients={"u": u},
    )
    prob = dmt.NonlinearProblem(F, u, mpc, bcs=[bc])
    its, converged = prob.solve()
    assert converged and its < 10
    arr = np.asarray(u.x.array)
    coords = V.dof_coords_blocks
    l = np.flatnonzero(np.isclose(coords[:, 0], 0.0))
    r = np.flatnonzero(np.isclose(coords[:, 0], 1.0))
    ls, rs = l[np.argsort(coords[l, 1])], r[np.argsort(coords[r, 1])]
    assert np.abs(arr[ls] - arr[rs]).max() < 1e-9
    assert arr.max() > 0.1


def test_newton_matches_linear_on_linear_problem():
    """Newton on a linear residual must converge in one step to the
    LinearProblem solution."""
    mesh = create_unit_square(5, 5)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_general_constraint(
        {np.array([1.0, 1.0]).tobytes(): {np.array([0.0, 1.0]).tobytes(): 0.5}}
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)) + inner(u, v))
    L = dmt.LinearForm(V, lambda v, c: 1.0 * v.value)
    u_lin = dmt.LinearProblem(a, L, mpc, bcs=[bc], petsc_options={"ksp_rtol": 1e-13}).solve()

    u = dmt.Function(V, name="u")
    F = dmt.LinearForm(
        V,
        lambda v, c: inner(grad(c["u"]), grad(v)) + c["u"].value * v.value - 1.0 * v.value,
        coefficients={"u": u},
    )
    prob = dmt.NonlinearProblem(F, u, mpc, bcs=[bc], petsc_options={"ksp_rtol": 1e-13})
    its, converged = prob.solve()
    assert converged
    assert np.abs(np.asarray(u.x.array) - np.asarray(u_lin.x.array)).max() < 1e-8
