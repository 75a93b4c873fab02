"""Nonlinear Newton on BLOCK (nest) systems with MPCs — the reference's
MATNEST SNES path (/root/reference/python/src/dolfinx_mpc/problem.py:159-350,
demo_stokes_nonlinear_nest.py).  A Stokes system with a velocity-dependent
viscosity nu(u) = 1 + eps |u|^2 on a rotated slip channel; Jacobian blocks
auto-derived.  eps = 0 must reproduce the linear nest solution exactly."""

import numpy as np
import pytest

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, dot, grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_rectangle, locate_entities_boundary, meshtags
from dolfinx_mpc_tpu.utils.mpc_utils import create_normal_approximation


def _setup(nx=8, ny=4, theta=np.pi / 7):
    L_ch, H_ch = 2.0, 1.0
    mesh = create_rectangle((0, 0), (L_ch, H_ch), (nx, ny))
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    mesh.points[:] = mesh.points @ R.T
    V = dmt.functionspace(mesh, ("Lagrange", 2, (2,)))
    Q = dmt.functionspace(mesh, ("Lagrange", 1))

    def in_rot(marker):
        return lambda x: marker(R.T @ x[:2])

    wall_facets = locate_entities_boundary(
        mesh, 1, in_rot(lambda X: np.isclose(X[1], 0.0) | np.isclose(X[1], H_ch))
    )
    mt = meshtags(mesh, 1, wall_facets, 1)
    inflow_dofs = dmt.locate_dofs_geometrical(V, in_rot(lambda X: np.isclose(X[0], 0.0)))
    g = dmt.Function(V)

    def inflow(x):
        X = np.linalg.inv(R) @ x[:2]
        return R @ np.stack([4.0 * X[1] * (H_ch - X[1]), np.zeros_like(X[1])])

    g.interpolate(inflow)
    bc_in = dmt.dirichletbc(g, inflow_dofs)

    nh = create_normal_approximation(V, mt, 1)
    mpc_v = dmt.MultiPointConstraint(V)
    mpc_v.create_slip_constraint(V, (mt, 1), nh, [bc_in])
    mpc_v.finalize()
    mpc_q = dmt.MultiPointConstraint(Q)
    mpc_q.finalize()
    return mesh, V, Q, mpc_v, mpc_q, bc_in, nh, wall_facets


def _residual_forms(V, Q, u, p, eps):
    def visc(uval):
        return 1.0 + eps * dot(uval.value, uval.value)

    F0 = dmt.LinearForm(
        V,
        lambda v, c: visc(c["u"]) * inner(grad(c["u"]), grad(v))
        - div(v) * conj(c["p"].value),
        coefficients={"u": u, "p": p},
    )
    F1 = dmt.LinearForm(
        Q,
        lambda q, c: -div(c["u"]) * conj(q.value),
        coefficients={"u": u, "p": p},
    )
    return [F0, F1]


def test_nonlinear_nest_linear_limit():
    """eps = 0: one Newton step must reproduce the linear nest solve."""
    mesh, V, Q, mpc_v, mpc_q, bc_in, nh, wall = _setup()
    u = dmt.Function(V)
    p = dmt.Function(Q)
    F = _residual_forms(V, Q, u, p, eps=0.0)
    prob = dmt.NonlinearProblemNest(
        F, [u, p], [mpc_v, mpc_q], bcs=[bc_in], u_names=["u", "p"],
        petsc_options={"ksp_type": "gmres", "ksp_rtol": 1e-12, "ksp_max_it": 20000},
        rtol=1e-10, atol=1e-9,
    )
    its, converged = prob.solve()
    assert converged
    assert its <= 3  # linear problem: Newton converges in one correction

    # linear reference through the nest assembly path
    import jax.numpy as jnp
    import scipy.sparse.linalg as spla

    a00 = dmt.BilinearForm(V, lambda du, v, c: inner(grad(du), grad(v)))
    a01 = dmt.BilinearForm(V, lambda dp, v, c: -div(v) * conj(dp.value), V_trial=Q)
    a10 = dmt.BilinearForm(Q, lambda du, q, c: -div(du) * conj(q.value), V_trial=V)
    A = dmt.create_matrix_nest([[a00, a01], [a10, None]], [mpc_v, mpc_q])
    dmt.assemble_matrix_nest(A, [[a00, a01], [a10, None]], [mpc_v, mpc_q], bcs=[bc_in])
    L0 = dmt.LinearForm(V, lambda v, c: inner(np.zeros(2), v))
    L1 = dmt.LinearForm(Q, lambda q, c: 0.0 * q.value)
    b = dmt.create_vector_nest([L0, L1], [mpc_v, mpc_q])
    dmt.assemble_vector_nest(b, [L0, L1], [mpc_v, mpc_q])
    b0 = dmt.apply_lifting(b.parts[0], [a00], [[bc_in]], mpc_v)
    b0 = np.asarray(dmt.set_bc(b0, [bc_in]))
    # bc columns of the divergence block lift into the pressure rhs too
    b1 = np.asarray(dmt.apply_lifting(b.parts[1], [a10], [[bc_in]], mpc_q))
    rhs = np.concatenate([b0, b1])
    x = spla.spsolve(A.to_scipy().tocsc(), rhs)
    xs = A.split(jnp.asarray(x))
    u_ref = np.asarray(mpc_v.finalized.backsubstitution(xs[0]))
    err = np.abs(np.asarray(u.x.array) - u_ref).max()
    assert err < 1e-6, err


def test_nonlinear_nest_converges_and_slips():
    """eps > 0: Newton converges quadratically-ish and the slip constraint
    holds on the converged velocity."""
    mesh, V, Q, mpc_v, mpc_q, bc_in, nh, wall = _setup()
    u = dmt.Function(V)
    p = dmt.Function(Q)
    F = _residual_forms(V, Q, u, p, eps=0.05)
    prob = dmt.NonlinearProblemNest(
        F, [u, p], [mpc_v, mpc_q], bcs=[bc_in], u_names=["u", "p"],
        petsc_options={"ksp_type": "gmres", "ksp_rtol": 1e-12, "ksp_max_it": 20000},
        rtol=1e-9, atol=1e-9, max_it=20,
    )
    its, converged = prob.solve()
    assert converged and 2 <= its <= 15
    uv = np.asarray(u.x.array).reshape(-1, 2)
    nvals = np.asarray(nh.x.array).reshape(-1, 2)
    wall_blocks = dmt.locate_dofs_topological(V, 1, wall)
    un = np.abs((uv[wall_blocks] * nvals[wall_blocks]).sum(1))
    assert un.max() < 1e-8
    assert np.abs(uv).max() > 0.1  # a real flow developed
