"""True mixed spaces: several fields in ONE space and ONE matrix.

Mirrors the reference's MixedElement coverage — sub-space constraint
generators (/root/reference/cpp/PeriodicConstraint.h:509-572), mixed-space
periodic tests (python/tests/test_periodic.py:11-14), and the single-matrix
Taylor-Hood Stokes demo (python/demos/demo_stokes.py) — all verified against
the scipy K^H A K oracle."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner
from dolfinx_mpc_tpu.fem.mesh import (
    create_rectangle,
    create_unit_square,
    locate_entities_boundary,
    meshtags,
)
from dolfinx_mpc_tpu.utils import compare_mpc_lhs, gather_transformation_matrix


def _oracle_solve(a, L, mpc, bcs):
    A = dmt.assemble_matrix(a, None, bcs=bcs).to_scipy()
    b = np.asarray(dmt.assemble_vector(L, None))
    b = np.asarray(dmt.apply_lifting(b, [a], [bcs], None))
    b = np.asarray(dmt.set_bc(b, bcs))
    K = gather_transformation_matrix(mpc)
    red = spla.spsolve((K.T.conj() @ A @ K).tocsc(), K.T.conj() @ b)
    return K @ red, A, b


def test_mixed_dofmap_layout():
    mesh = create_unit_square(3, 3)
    W = dmt.mixed_functionspace(mesh, [("Lagrange", 2, (2,)), ("Lagrange", 1)])
    V, Q = W.spaces
    assert W.num_dofs == V.num_dofs + Q.num_dofs
    dm = W.dofmap
    assert dm.shape == (mesh.num_cells, 2 * 6 + 3)
    # field slots: velocity first, pressure offset
    assert dm[:, : 2 * 6].max() < V.num_dofs
    assert dm[:, 2 * 6 :].min() >= V.num_dofs
    # sub-space views carry the offset
    assert W.sub(1).dof_offset == V.num_dofs
    assert W.sub(0).dof_offset == 0


def test_mixed_bc_on_subspace():
    """Dirichlet on a field view lands in parent-global numbering; vector
    constant + Function values both work."""
    mesh = create_unit_square(3, 3)
    W = dmt.mixed_functionspace(mesh, [("Lagrange", 1, (2,)), ("Lagrange", 1)])
    Wv = W.sub(0)
    dofs = dmt.locate_dofs_geometrical(Wv, lambda x: np.isclose(x[0], 0.0))
    bc = dmt.dirichletbc(np.array([1.5, -2.0]), dofs, Wv)
    assert bc.dofs.max() < W.spaces[0].num_dofs
    vals = bc.dof_values()
    assert set(np.unique(vals)) == {1.5, -2.0}
    g = dmt.Function(Wv)
    g.interpolate(lambda x: np.stack([x[0] + 1.0, x[1]]))
    bc2 = dmt.dirichletbc(g, dofs)
    assert np.allclose(bc2.dof_values()[::2], 1.0)  # x=0 plane: x+1 = 1
    # pressure-field bc is offset
    Wq = W.sub(1)
    qdofs = dmt.locate_dofs_geometrical(Wq, lambda x: np.isclose(x[1], 0.0))
    bcq = dmt.dirichletbc(0.0, qdofs, Wq)
    assert bcq.dofs.min() >= W.spaces[0].num_dofs


def test_mixed_periodic_on_subspace():
    """Periodic MPC on the velocity sub-space of a mixed space, full
    K^H A K oracle check + solve (reference test_periodic.py:11-14)."""
    mesh = create_unit_square(4, 4)
    W = dmt.mixed_functionspace(mesh, [("Lagrange", 2, (2,)), ("Lagrange", 1)])
    Wv = W.sub(0)
    bdofs = dmt.locate_dofs_geometrical(
        Wv, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(np.array([0.0, 0.0]), bdofs, Wv)
    mpc = dmt.MultiPointConstraint(W)
    mpc.create_periodic_constraint_geometrical(
        Wv,
        lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1]]),
        [bc],
    )
    mpc.finalize()
    assert mpc.num_local_slaves > 0
    assert np.asarray(mpc.slaves).max() < W.spaces[0].num_dofs

    a = dmt.BilinearForm(
        W,
        lambda u, v, c: inner(grad(u[0]), grad(v[0])) + inner(u[0], v[0])
        + inner(u[1], v[1]),
    )
    L = dmt.LinearForm(W, lambda v, c: inner(np.array([1.0, 0.5]), v[0]) + v[1].value)
    A_mpc = dmt.assemble_matrix(a, mpc, bcs=[bc]).to_scipy()
    A_org = dmt.assemble_matrix(a, None, bcs=[bc]).to_scipy()
    compare_mpc_lhs(A_org, A_mpc, mpc)

    u_ref, _, b = _oracle_solve(a, L, mpc, [bc])
    b_mpc = np.asarray(dmt.assemble_vector(L, mpc))
    b_mpc = np.asarray(dmt.set_bc(b_mpc, [bc]))
    x = spla.spsolve(A_mpc.tocsc(), b_mpc)
    import jax.numpy as jnp

    x = np.asarray(mpc.finalized.backsubstitution(jnp.asarray(x)))
    assert np.abs(x - u_ref).max() < 1e-8


def test_mixed_stokes_single_matrix():
    """Rotated-channel Taylor-Hood Stokes in ONE matrix with a slip MPC on
    the velocity field (reference demo_stokes.py) vs the dense oracle."""
    from dolfinx_mpc_tpu.utils.mpc_utils import create_normal_approximation

    nx, ny, theta = 8, 4, np.pi / 7
    L_ch, H_ch = 2.0, 1.0
    mesh = create_rectangle((0, 0), (L_ch, H_ch), (nx, ny))
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    mesh.points[:] = mesh.points @ R.T

    W = dmt.mixed_functionspace(mesh, [("Lagrange", 2, (2,)), ("Lagrange", 1)])
    Wv = W.sub(0)

    def in_rotated(marker):
        return lambda x: marker(R.T @ x[:2])

    wall_facets = locate_entities_boundary(
        mesh, 1, in_rotated(lambda X: np.isclose(X[1], 0.0) | np.isclose(X[1], H_ch))
    )
    mt = meshtags(mesh, 1, wall_facets, 1)

    inflow_dofs = dmt.locate_dofs_geometrical(Wv, in_rotated(lambda X: np.isclose(X[0], 0.0)))
    g = dmt.Function(Wv)

    def inflow(x):
        X = np.linalg.inv(R) @ x[:2]
        return R @ np.stack([4.0 * X[1] * (H_ch - X[1]), np.zeros_like(X[1])])

    g.interpolate(inflow)
    bc_in = dmt.dirichletbc(g, inflow_dofs)

    nh = create_normal_approximation(Wv, mt, 1)
    mpc = dmt.MultiPointConstraint(W)
    mpc.create_slip_constraint(Wv, (mt, 1), nh, [bc_in])
    mpc.finalize()
    assert mpc.num_local_slaves > 0

    a = dmt.BilinearForm(
        W,
        lambda u, v, c: inner(grad(u[0]), grad(v[0]))
        - div(v[0]) * conj(u[1].value)
        - div(u[0]) * conj(v[1].value),
    )
    L = dmt.LinearForm(W, lambda v, c: inner(np.zeros(2), v[0]) + 0.0 * v[1].value)

    A_mpc = dmt.assemble_matrix(a, mpc, bcs=[bc_in]).to_scipy()
    A_org = dmt.assemble_matrix(a, None, bcs=[bc_in]).to_scipy()
    compare_mpc_lhs(A_org, A_mpc, mpc)

    u_ref, _, _ = _oracle_solve(a, L, mpc, [bc_in])
    b_mpc = np.asarray(dmt.assemble_vector(L, mpc))
    b_mpc = np.asarray(dmt.apply_lifting(b_mpc, [a], [[bc_in]], mpc))
    b_mpc = np.asarray(dmt.set_bc(b_mpc, [bc_in]))
    x = spla.spsolve(A_mpc.tocsc(), b_mpc)
    import jax.numpy as jnp

    x = np.asarray(mpc.finalized.backsubstitution(jnp.asarray(x)))
    assert np.abs(x - u_ref).max() < 1e-8

    # slip actually holds: u·n = 0 on the wall dofs
    u, p = dmt.split(dmt.Function(W, x))
    nvals = np.asarray(nh.x.array).reshape(-1, 2)
    uv = np.asarray(u.x.array).reshape(-1, 2)
    wall_blocks = dmt.locate_dofs_topological(Wv, 1, wall_facets)
    un = np.abs((uv[wall_blocks] * nvals[wall_blocks]).sum(1))
    assert un.max() < 1e-9


def test_mixed_coefficient():
    """A coefficient living on a mixed space feeds the kernel as a tuple of
    per-field Args."""
    mesh = create_unit_square(3, 3)
    W = dmt.mixed_functionspace(mesh, [("Lagrange", 1, (2,)), ("Lagrange", 1)])
    w = dmt.Function(W)
    w.x.array[:] = np.random.default_rng(3).standard_normal(W.num_dofs)
    V1 = dmt.functionspace(mesh, ("Lagrange", 1))
    # L(v) = p * v where p is the pressure field of w
    L = dmt.LinearForm(
        V1, lambda v, c: c["w"][1].value * v.value, coefficients={"w": w}
    )
    b = np.asarray(dmt.assemble_vector(L, None))
    # reference: same integral with the pressure extracted standalone
    _, p = dmt.split(w)
    pq = dmt.Function(V1, np.asarray(p.x.array))
    L2 = dmt.LinearForm(
        V1, lambda v, c: c["p"].value * v.value, coefficients={"p": pq}
    )
    b2 = np.asarray(dmt.assemble_vector(L2, None))
    assert np.abs(b - b2).max() < 1e-13


def test_bc_value_function_space_placements():
    """DirichletBC.dof_values maps correctly for all three placements of a
    Function-typed value: on the offset field view itself, on the collapsed
    base space (what split() returns), and on the full mixed parent.
    Regression: the parent case used to be shifted by the view's offset and
    sampled field 0's dofs (advisor round-3 finding)."""
    mesh = create_unit_square(3, 3)
    W = dmt.mixed_functionspace(mesh, [("Lagrange", 1), ("Lagrange", 1)])
    Wq = W.sub(1)
    assert Wq.dof_offset > 0
    qdofs_blocks = dmt.locate_dofs_geometrical(Wq, lambda x: np.isclose(x[1], 0.0))

    # value on the field view itself: array is field-local
    g_view = dmt.Function(Wq)
    g_view.x.array[:] = 100.0 + np.arange(Wq.num_dofs)
    bc = dmt.dirichletbc(g_view, qdofs_blocks, Wq)
    expect_local = 100.0 + (bc.dofs - Wq.dof_offset)
    assert np.allclose(bc.dof_values(), expect_local)

    # value on the collapsed base space (offset 0, field-sized array)
    g_base = dmt.Function(W.spaces[1])
    g_base.x.array[:] = 100.0 + np.arange(W.spaces[1].num_dofs)
    bc = dmt.dirichletbc(g_base, qdofs_blocks, Wq)
    assert np.allclose(bc.dof_values(), expect_local)

    # value on the FULL mixed parent: bc dofs are already parent-global
    g_par = dmt.Function(W)
    g_par.x.array[:] = 100.0 + np.arange(W.num_dofs)
    bc = dmt.dirichletbc(g_par, qdofs_blocks, Wq)
    assert np.allclose(bc.dof_values(), 100.0 + bc.dofs)
