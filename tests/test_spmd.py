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


def test_sharded_contact_matches_single_device():
    """8-device tied-contact elasticity (the BASELINE config[4] direction):
    the distributed-vector CG must match the single-device assembled solve,
    and the per-device working set must stay well below the full problem
    (ghost window, not replication — cpp/mpc_helpers.h:139-235 analogue)."""
    from dolfinx_mpc_tpu.fem.forms import conj, div, sym
    from dolfinx_mpc_tpu.fem.mesh import Mesh, create_box, meshtags
    from dolfinx_mpc_tpu.la.solvers import cg

    nb, nt = 6, 5
    bot = create_box((0, 0, 0), (1, 1, 1), (nb, nb, nb))
    top = create_box((0, 0, 1), (1, 1, 2), (nt, nt, nt))
    mesh = Mesh(np.vstack([bot.points, top.points]),
                np.vstack([bot.cells, top.cells + bot.num_points]),
                bot.cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    fverts, _, f2c = mesh.facets()
    on_iface = np.isclose(mesh.points[fverts][:, :, 2], 1.0).all(axis=1)
    ext = np.isin(np.arange(fverts.shape[0]), mesh.exterior_facets())
    iface = np.flatnonzero(on_iface & ext)
    cz = mesh.points[mesh.cells[f2c[iface, 0]]].mean(axis=1)[:, 2]
    mt = meshtags(mesh, 2, iface, np.where(cz > 1.0, 1, 2))
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_contact_inelastic_condition(mt, 1, 2)
    mpc.finalize()
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
    bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
    tdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 2.0))
    bc_top = dmt.dirichletbc(np.array([0.0, 0.0, -0.05]), tdofs, V)
    a = dmt.BilinearForm(V, lambda u, v, c: 2 * inner(sym(grad(u)), sym(grad(v)))
                         + 1.25 * div(u) * conj(div(v)))
    L = dmt.LinearForm(V, lambda v, c: inner(np.zeros(3), v))

    prob = ShardedLinearProblem(a, L, mpc, [bc, bc_top],
                                device_mesh=make_device_mesh(8), rtol=1e-10,
                                max_it=4000)
    u, its, rnorm = prob.solve()
    u = np.asarray(u)
    assert its > 20

    # single-device reference: assembled MPC matrix + CG + backsub
    A1 = dmt.assemble_matrix(a, mpc, bcs=[bc, bc_top])
    b1 = dmt.assemble_vector(L, mpc)
    b1 = dmt.apply_lifting(b1, [a], [[bc, bc_top]], mpc)
    import jax.numpy as jnp

    b1 = jnp.asarray(np.asarray(dmt.set_bc(b1, [bc, bc_top])))
    x1, its1, _ = cg(A1.matvec, b1, rtol=1e-10, max_it=4000)
    u1 = np.asarray(mpc.finalized.backsubstitution(x1))
    nrm = max(np.abs(u1).max(), 1e-30)
    assert np.abs(u - u1).max() < 1e-6 * nrm

    # weak scaling: per-device vector window (rows + ghost slots) must be a
    # fraction of the full dof vector
    assert prob._window < 0.55 * V.num_dofs, (prob._window, V.num_dofs)


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
