"""Contact constraints between non-matching meshes (mirror of
/root/reference/python/tests/test_cube_contact.py: tied and slip contact
between stacked cubes, verified against the K^H A K oracle)."""

import numpy as np
import pytest

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
from dolfinx_mpc_tpu.fem.mesh import Mesh, create_rectangle, meshtags
from dolfinx_mpc_tpu.utils import compare_mpc_lhs


def _stacked_squares(n_bot=4, n_top=3):
    """Two non-matching square meshes stacked at y=1 as one disconnected Mesh."""
    bot = create_rectangle((0.0, 0.0), (1.0, 1.0), (n_bot, n_bot))
    top = create_rectangle((0.0, 1.0), (1.0, 2.0), (n_top, n_top))
    pts = np.vstack([bot.points, top.points])
    cells = np.vstack([bot.cells, top.cells + bot.num_points])
    return Mesh(pts, cells, bot.cell_type)


def _interface_tags(mesh):
    """Tag facets at y=1: value 1 = top-side (slave), 2 = bottom-side (master)."""
    fverts, _, f2c = mesh.facets()
    pts = mesh.points
    on_iface = np.isclose(pts[fverts], 1.0)[:, :, 1].all(axis=1)
    ext = np.isin(np.arange(fverts.shape[0]), mesh.exterior_facets())
    iface = np.flatnonzero(on_iface & ext)
    # top cells have centroid y > 1
    cent_y = pts[mesh.cells[f2c[iface, 0]]].mean(axis=1)[:, 1]
    vals = np.where(cent_y > 1.0, 1, 2)
    return meshtags(mesh, mesh.tdim - 1, iface, vals)


def test_contact_inelastic(scalar_dtype):
    """Tied contact u_top = u_bottom across the non-matching interface."""
    mesh = _stacked_squares()
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    mt = _interface_tags(mesh)
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_contact_inelastic_condition(mt, 1, 2)
    mpc.finalize()
    assert mpc.num_local_slaves == 2 * 4  # (n_top+1) blocks x 2 components

    mu, lam = 1.0, 1.25

    def elast(u, v, c):
        return 2 * mu * inner(sym(grad(u)), sym(grad(v))) + lam * div(u) * conj(div(v))

    a = dmt.BilinearForm(V, elast)
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )


def test_contact_inelastic_solve():
    """Pull the top block; tied interface must transmit the displacement."""
    mesh = _stacked_squares()
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    mt = _interface_tags(mesh)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_contact_inelastic_condition(mt, 1, 2)
    mpc.finalize()
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    bc = dmt.dirichletbc(np.array([0.0, 0.0]), bdofs, V)
    tdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 2.0))
    bc_top = dmt.dirichletbc(np.array([0.0, 0.1]), tdofs, V)
    mu, lam = 1.0, 1.25

    def elast(u, v, c):
        return 2 * mu * inner(sym(grad(u)), sym(grad(v))) + lam * div(u) * conj(div(v))

    a = dmt.BilinearForm(V, elast)
    L = dmt.LinearForm(V, lambda v, c: inner(np.zeros(2), v))
    prob = dmt.LinearProblem(a, L, mpc, bcs=[bc, bc_top], petsc_options={"ksp_rtol": 1e-12})
    u = prob.solve()
    arr = np.asarray(u.x.array).reshape(-1, 2)
    # displacement is continuous across the interface: evaluate on both sides
    uy_bot = u.eval(np.array([[0.5, 1.0 - 1e-12]]))
    uy_top = u.eval(np.array([[0.5, 1.0 + 1e-12]]))
    assert np.abs(np.asarray(uy_bot) - np.asarray(uy_top)).max() < 1e-6
    assert arr[:, 1].max() > 0.05  # top displacement propagated


def test_contact_slip(scalar_dtype):
    """Slip contact u_s·n_s = u_m·n_m across the interface."""
    mesh = _stacked_squares()
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    mt = _interface_tags(mesh)
    from dolfinx_mpc_tpu.utils.mpc_utils import create_normal_approximation

    nh = create_normal_approximation(V, mt, 1)
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_contact_slip_condition(mt, 1, 2, nh)
    mpc.finalize()
    assert mpc.num_local_slaves == 4

    mu, lam = 1.0, 1.25

    def elast(u, v, c):
        return 2 * mu * inner(sym(grad(u)), sym(grad(v))) + lam * div(u) * conj(div(v))

    a = dmt.BilinearForm(V, elast)
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )


def test_point_to_point(scalar_dtype):
    """Point-to-point constraint between disconnected bodies (reference
    mpc_utils.py:300-419 / demo_elasticity_disconnect)."""
    from dolfinx_mpc_tpu.constraints import create_point_to_point_constraint

    mesh = _stacked_squares(3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    data = create_point_to_point_constraint(
        V, np.array([1.0, 2.0]), np.array([0.0, 0.0]), dtype=scalar_dtype
    )
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.add_constraint_from_mpc_data(V, data)
    mpc.finalize()
    assert mpc.num_local_slaves == 2
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )


def _stacked_cubes_rotated(n_bot=3, n_top=2, theta=0.3):
    """Two non-matching unit cubes stacked at z=1, the WHOLE assembly rotated
    so the interface normal has all-nonzero components — exercising the
    in-block -n_i/n_s contact algebra that axis-aligned interfaces zero out
    (reference test_cube_contact.py:163-165 uses rotated gmsh cubes for
    exactly this).  Returns (mesh, meshtags) with tags computed BEFORE the
    rotation (facet ids survive point transforms)."""
    from dolfinx_mpc_tpu.fem.mesh import create_box
    from dolfinx_mpc_tpu.utils.mpc_utils import rotation_matrix

    bot = create_box((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (n_bot, n_bot, n_bot))
    top = create_box((0.0, 0.0, 1.0), (1.0, 1.0, 2.0), (n_top, n_top, n_top))
    pts = np.vstack([bot.points, top.points])
    cells = np.vstack([bot.cells, top.cells + bot.num_points])
    mesh = Mesh(pts, cells, bot.cell_type)

    fverts, _, f2c = mesh.facets()
    on_iface = np.isclose(mesh.points[fverts][:, :, 2], 1.0).all(axis=1)
    ext = np.isin(np.arange(fverts.shape[0]), mesh.exterior_facets())
    iface = np.flatnonzero(on_iface & ext)
    cent_z = mesh.points[mesh.cells[f2c[iface, 0]]].mean(axis=1)[:, 2]
    vals = np.where(cent_z > 1.0, 1, 2)  # 1 = top (slave), 2 = bottom (master)
    mt = meshtags(mesh, 2, iface, vals)

    R = rotation_matrix([1.0, 1.0, 0.0], theta)
    mesh.points[:] = mesh.points @ R.T
    return mesh, mt, R


def test_contact_slip_rotated(scalar_dtype):
    """Slip contact across a rotated non-matching interface: the slave-block
    normal has THREE nonzero components, so every slave gets in-block
    masters with -n_i/n_s coefficients (reference test_cube_contact.py
    rotated case).  Oracle: K^H A K identity on the elasticity operator."""
    from dolfinx_mpc_tpu.utils.mpc_utils import create_normal_approximation

    mesh, mt, R = _stacked_cubes_rotated()
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    nh = create_normal_approximation(V, mt, 1)
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_contact_slip_condition(mt, 1, 2, nh)
    mpc.finalize()
    assert mpc.num_local_slaves == 3 * 3  # one slip dof per interface block

    # the rotated algebra is actually exercised: in-block masters (same
    # block, other components) exist with nonzero coefficients
    co = mpc._np_coeffs
    ma = mpc._np_masters
    slaves = np.asarray(mpc.slaves)
    found_inblock = False
    for i, s in enumerate(slaves):
        blk = s // 3
        inblk = (ma[i] // 3 == blk) & (np.abs(co[i]) > 1e-12) & (ma[i] != s)
        found_inblock |= bool(inblk.any())
    assert found_inblock, "rotation produced no in-block -n_i/n_s masters"

    mu, lam = 1.0, 1.25

    def elast(u, v, c):
        return 2 * mu * inner(sym(grad(u)), sym(grad(v))) + lam * div(u) * conj(div(v))

    a = dmt.BilinearForm(V, elast)
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )


def test_contact_slip_rotated_solve():
    """Compress the rotated stack; the constrained solve must equal the
    dense reduced oracle and satisfy u_s·n_s = u_m·n_m at slave blocks."""
    import scipy.sparse.linalg as spla

    from dolfinx_mpc_tpu.utils import gather_transformation_matrix
    from dolfinx_mpc_tpu.utils.mpc_utils import create_normal_approximation

    mesh, mt, R = _stacked_cubes_rotated()
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    nh = create_normal_approximation(V, mt, 1)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_contact_slip_condition(mt, 1, 2, nh)
    mpc.finalize()

    def in_rot(marker):
        return lambda x: marker(R.T @ x[:3])

    bdofs = dmt.locate_dofs_geometrical(V, in_rot(lambda X: np.isclose(X[2], 0.0)))
    bc = dmt.dirichletbc(np.zeros(3), bdofs, V)
    tdofs = dmt.locate_dofs_geometrical(V, in_rot(lambda X: np.isclose(X[2], 2.0)))
    g = dmt.Function(V)
    g.interpolate(lambda x: R @ np.stack([0 * x[0], 0 * x[1], -0.05 + 0 * x[2]]))
    bc_top = dmt.dirichletbc(g, tdofs)
    mu, lam = 1.0, 1.25

    def elast(u, v, c):
        return 2 * mu * inner(sym(grad(u)), sym(grad(v))) + lam * div(u) * conj(div(v))

    a = dmt.BilinearForm(V, elast)
    L = dmt.LinearForm(V, lambda v, c: inner(np.zeros(3), v))
    prob = dmt.LinearProblem(a, L, mpc, bcs=[bc, bc_top], petsc_options={"ksp_rtol": 1e-12})
    u = prob.solve()

    A = dmt.assemble_matrix(a, None, bcs=[bc, bc_top]).to_scipy()
    b = np.asarray(dmt.assemble_vector(L, None))
    b = np.asarray(dmt.apply_lifting(b, [a], [[bc, bc_top]], None))
    b = np.asarray(dmt.set_bc(b, [bc, bc_top]))
    K = gather_transformation_matrix(mpc)
    u_ref = K @ spla.spsolve((K.T @ A @ K).tocsc(), K.T @ b)
    assert np.abs(np.asarray(u.x.array) - u_ref).max() < 1e-8
