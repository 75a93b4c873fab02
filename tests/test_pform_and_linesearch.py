"""Round-4 solver-parity corners: the separate `P` preconditioner form in
LinearProblem (reference problem.py:539-558 assembles and applies P) and
Newton globalization (the reference rides SNES newtonls with backtracking,
problem.py:159-350)."""

import numpy as np
import jax.numpy as jnp

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner
from dolfinx_mpc_tpu.fem.mesh import (create_rectangle, create_unit_square,
                                      locate_entities_boundary, meshtags)
from dolfinx_mpc_tpu.utils.mpc_utils import create_normal_approximation


def _stokes_problem(nx=8, ny=4, theta=np.pi / 7):
    """Rotated-channel Taylor-Hood Stokes with a slip MPC, ONE mixed-space
    matrix (the demo_stokes.py setup, small)."""
    L_ch, H_ch = 2.0, 1.0
    mesh = create_rectangle((0, 0), (L_ch, H_ch), (nx, ny))
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    mesh.points[:] = mesh.points @ R.T
    W = dmt.mixed_functionspace(mesh, [("Lagrange", 2, (2,)), ("Lagrange", 1)])
    Wv = W.sub(0)
    in_rot = lambda m: (lambda x: m(R.T @ x[:2]))
    wall = locate_entities_boundary(
        mesh, 1, in_rot(lambda X: np.isclose(X[1], 0.0) | np.isclose(X[1], H_ch)))
    mt = meshtags(mesh, 1, wall, 1)
    inflow_dofs = dmt.locate_dofs_geometrical(
        Wv, in_rot(lambda X: np.isclose(X[0], 0.0)))
    g = dmt.Function(Wv, name="g")

    def inflow(x):
        X = np.linalg.inv(R) @ x[:2]
        return R @ np.stack([4.0 * X[1] * (H_ch - X[1]), np.zeros_like(X[1])])

    g.interpolate(inflow)
    bc_in = dmt.dirichletbc(g, inflow_dofs)
    nh = create_normal_approximation(Wv, mt, 1)
    mpc = dmt.MultiPointConstraint(W, dtype=np.float64)
    mpc.create_slip_constraint(Wv, (mt, 1), nh, [bc_in])
    mpc.finalize()
    a = dmt.BilinearForm(
        W, lambda u, v, c: inner(grad(u[0]), grad(v[0]))
        - div(v[0]) * conj(u[1].value) - div(u[0]) * conj(v[1].value))
    # the reference's P pattern: the preconditioner form adds the pressure
    # mass so the saddle-point (1,1) block gets a usable diagonal
    P = dmt.BilinearForm(
        W, lambda u, v, c: inner(grad(u[0]), grad(v[0]))
        + u[1].value * conj(v[1].value))
    L = dmt.LinearForm(W, lambda v, c: inner(jnp.zeros(2), v[0])
                       + 0.0 * v[1].value)
    return a, P, L, mpc, bc_in


def test_pform_stokes_pressure_mass():
    """Passing the pressure-mass P form must change AND improve the GMRES
    iteration count (Jacobi on the saddle-point A has a zero pressure
    diagonal), while converging to the same solution."""
    a, P, L, mpc, bc_in = _stokes_problem()
    opts = {"ksp_type": "gmres", "pc_type": "jacobi", "ksp_rtol": 1e-10,
            "ksp_max_it": 20000}
    p_no = dmt.LinearProblem(a, L, mpc, bcs=[bc_in], petsc_options=opts)
    u_no = p_no.solve()
    p_P = dmt.LinearProblem(a, L, mpc, bcs=[bc_in], petsc_options=opts, P=P)
    u_P = p_P.solve()
    assert p_P.its < p_no.its / 2, (p_P.its, p_no.its)
    diff = np.abs(np.asarray(u_no.x.array) - np.asarray(u_P.x.array)).max()
    scale = max(np.abs(np.asarray(u_no.x.array)).max(), 1.0)
    assert diff / scale < 1e-6, diff


def test_pform_equal_to_a_is_noop():
    """P spelled as the same bilinear form as `a` must reproduce the no-P
    iteration count exactly (same preconditioner either way)."""
    mesh = create_unit_square(8, 8)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    P = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    L = dmt.LinearForm(V, lambda v, c: 4.0 * v.value)
    opts = {"ksp_rtol": 1e-10}
    p_no = dmt.LinearProblem(a, L, mpc, bcs=[bc], petsc_options=opts)
    u_no = p_no.solve()
    p_P = dmt.LinearProblem(a, L, mpc, bcs=[bc], petsc_options=opts, P=P)
    u_P = p_P.solve()
    assert p_no.its == p_P.its
    assert np.abs(np.asarray(u_no.x.array) - np.asarray(u_P.x.array)).max() < 1e-12


def _arctan_problem(line_search):
    """Pointwise arctan residual: full-step Newton from u0=2 diverges (the
    classic |x0| > 1.39 scalar arctan divergence carries over to the
    mass-weighted PDE form), backtracking converges."""
    mesh = create_unit_square(4, 4)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_general_constraint(
        {np.array([1.0, 1.0]).tobytes(): {np.array([0.0, 1.0]).tobytes(): 0.5}})
    mpc.finalize()
    u = dmt.Function(V, name="u")
    u.x.array[:] = 2.0
    u.x.array[np.asarray(bdofs)] = 0.0  # bc-compatible start
    F = dmt.LinearForm(V, lambda v, c: jnp.arctan(c["u"].value) * v.value,
                       coefficients={"u": u})
    prob = dmt.NonlinearProblem(F, u, mpc, bcs=[bc], line_search=line_search,
                                max_it=30, rtol=1e-10, atol=1e-12)
    its, conv = prob.solve()
    return its, conv, np.asarray(u.x.array)


def test_newton_full_step_diverges_backtracking_converges():
    its_f, conv_f, u_f = _arctan_problem("none")
    assert not conv_f  # full-step Newton runs away (this is the point)
    its_bt, conv_bt, u_bt = _arctan_problem("bt")
    assert conv_bt and its_bt <= 15, (its_bt, conv_bt)
    assert np.abs(u_bt).max() < 1e-8  # the root is u == 0
