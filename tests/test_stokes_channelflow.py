"""Order-2/3 Taylor-Hood channel flow with periodic MPCs — mirror of
/root/reference/python/tests/test_stokes_channelflow.py:21-24 (tet AND hex,
order up to 3).

Poiseuille flow between parallel plates: body force (1, 0, 0), no-slip walls
at y in {0, 1}, periodic in x and z.  The analytic velocity
u_x = 0.5 * y * (1 - y) is quadratic, so Taylor-Hood order >= 2 reproduces it
to solver precision — a sharp end-to-end check of degree-3 tabulation,
MPC generation at order 3, constrained nest assembly, and backsubstitution.
"""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner
from dolfinx_mpc_tpu.fem.mesh import CellType, create_unit_cube
from dolfinx_mpc_tpu.utils import gather_transformation_matrix


def _periodic_xz(x):
    return np.isclose(x[0], 1.0) | np.isclose(x[2], 1.0)


def _map_xz(x):
    out = np.array(x, copy=True)
    out[0] = np.where(np.isclose(x[0], 1.0), x[0] - 1.0, x[0])
    out[2] = np.where(np.isclose(x[2], 1.0), x[2] - 1.0, x[2])
    return out


@pytest.mark.parametrize("cell_type", [CellType.tetrahedron, CellType.hexahedron])
@pytest.mark.parametrize("order,els", [(2, 4), (3, 2)])
def test_stokes_channelflow(cell_type, order, els):
    mesh = create_unit_cube(els, els, els, cell_type=cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", order, (3,)))
    Q = dmt.functionspace(mesh, ("Lagrange", order - 1))

    wall = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(np.zeros(3), wall, V)

    mpc_u = dmt.MultiPointConstraint(V)
    mpc_u.create_periodic_constraint_geometrical(V, _periodic_xz, _map_xz, [bc])
    mpc_u.finalize()
    mpc_p = dmt.MultiPointConstraint(Q)
    mpc_p.create_periodic_constraint_geometrical(Q, _periodic_xz, _map_xz, [])
    mpc_p.finalize()

    a00 = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    a01 = dmt.BilinearForm(V, lambda p, v, c: -div(v) * conj(p.value), V_trial=Q)
    a10 = dmt.BilinearForm(Q, lambda u, q, c: -div(u) * conj(q.value), V_trial=V)
    a_nest = [[a00, a01], [a10, None]]

    A = dmt.create_matrix_nest(a_nest, [mpc_u, mpc_p])
    dmt.assemble_matrix_nest(A, a_nest, [mpc_u, mpc_p], bcs=[bc])
    S = A.to_scipy().tolil()

    import jax.numpy as jnp

    L0 = dmt.LinearForm(V, lambda v, c: inner(jnp.array([1.0, 0.0, 0.0]), v))
    L1 = dmt.LinearForm(Q, lambda q, c: 0.0 * q.value)
    b = dmt.create_vector_nest([L0, L1], [mpc_u, mpc_p])
    dmt.assemble_vector_nest(b, [L0, L1], [mpc_u, mpc_p])
    b0 = dmt.set_bc(dmt.apply_lifting(b.parts[0], [a00], [[bc]], mpc_u), [bc])
    rhs = np.concatenate([np.asarray(b0), np.asarray(b.parts[1])])

    # pin one non-slave pressure dof (constant-pressure nullspace) and the
    # pressure-slave rows (the None (1,1) block carries no slave diagval —
    # the reference leaves both to MINRES, test_stokes_channelflow.py:110-126;
    # a direct solve needs the rows regularized; backsubstitution restores
    # the slave values afterwards)
    nV = V.num_dofs
    pins = [nV + int(np.setdiff1d(np.arange(Q.num_dofs), np.asarray(mpc_p.slaves))[0])]
    pins += [nV + int(s) for s in np.asarray(mpc_p.slaves)]
    for pin in pins:
        S.rows[pin], S.data[pin] = [pin], [1.0]
        rhs[pin] = 0.0

    x = spla.spsolve(S.tocsr(), rhs)
    u = np.asarray(mpc_u.finalized.backsubstitution(jnp.asarray(x[:nV])))
    p = np.asarray(mpc_p.finalized.backsubstitution(jnp.asarray(x[nV:])))

    # --- analytic Poiseuille profile (exact for order >= 2) ---------------
    xd = V.tabulate_dof_coordinates()
    if xd.shape[0] == V.num_dofs:  # per-component rows
        xd = xd[::3]
    ue = np.zeros((xd.shape[0], 3))
    ue[:, 0] = 0.5 * xd[:, 1] * (1.0 - xd[:, 1])
    err = np.abs(u.reshape(-1, 3) - ue).max()
    assert err < 1e-8, f"velocity error {err}"
    assert np.abs(u.reshape(-1, 3)[:, 0]).max() > 0.1  # flow happening
    assert np.isfinite(p).all()

    # --- K^H A K oracle on the order-3 velocity block ---------------------
    A_org = dmt.assemble_matrix(a00, None, bcs=[bc]).to_scipy()
    A_mpc = dmt.assemble_matrix(a00, mpc_u, bcs=[bc]).to_scipy()
    K = gather_transformation_matrix(mpc_u)
    keep = np.setdiff1d(np.arange(nV), np.asarray(mpc_u.slaves))
    diff = (K.T @ A_org @ K).tocsr() - A_mpc[keep][:, keep]
    assert (np.abs(diff.data).max() if diff.nnz else 0.0) < 1e-9


@pytest.mark.parametrize("cell_type", [CellType.tetrahedron, CellType.hexahedron])
def test_degree3_scalar_oracle(cell_type):
    """Degree-3 scalar Poisson periodic MPC against the K^H A K oracle —
    the minimal direct exercise of P3 tabulation on both 3D cell types."""
    mesh = create_unit_cube(2, 2, 2, cell_type=cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", 3))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    A_org = dmt.assemble_matrix(a, None, bcs=[bc]).to_scipy()
    A_mpc = dmt.assemble_matrix(a, mpc, bcs=[bc]).to_scipy()
    K = gather_transformation_matrix(mpc)
    keep = np.setdiff1d(np.arange(V.num_dofs), np.asarray(mpc.slaves))
    diff = (K.T @ A_org @ K).tocsr() - A_mpc[keep][:, keep]
    assert (np.abs(diff.data).max() if diff.nnz else 0.0) < 1e-9
