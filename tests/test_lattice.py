"""Lattice fast-path assembly must equal the general CSR path exactly."""

import numpy as np
import pytest

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube, create_unit_square
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice


@pytest.mark.parametrize("cell_type,mesher", [
    ("triangle", lambda: create_unit_square(4, 3)),
    ("quadrilateral", lambda: create_unit_square(3, 4, "quadrilateral")),
    ("tetrahedron", lambda: create_unit_cube(3, 2, 2)),
    ("hexahedron", lambda: create_unit_cube(2, 3, 2, "hexahedron")),
])
def test_lattice_matches_general(cell_type, mesher):
    mesh = mesher()
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    rel = (lambda x: np.stack([1.0 - x[0], x[1]])) if mesh.gdim == 2 else (
        lambda x: np.stack([1.0 - x[0], x[1], x[2]])
    )
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0), rel, [bc]
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)) + inner(u, v))
    A_ref = dmt.assemble_matrix(a, mpc, bcs=[bc], diagval=2.0).to_scipy()
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], diagval=2.0)
    A_lat = clf.assemble()
    diff = (A_ref - A_lat.to_scipy()).tocoo()
    err = np.abs(diff.data).max() if diff.nnz else 0.0
    assert err < 1e-12, f"lattice vs general mismatch: {err}"
    # matvec agreement (device path, not just to_scipy)
    import jax.numpy as jnp

    x = np.random.default_rng(1).standard_normal(V.num_dofs)
    y_lat = np.asarray(A_lat.matvec(jnp.asarray(x)))
    assert np.abs(y_lat - A_ref @ x).max() < 1e-11
    # diagonal agreement
    assert np.abs(np.asarray(A_lat.diagonal()) - A_ref.diagonal()).max() < 1e-12


def test_lattice_vector_space():
    mesh = create_unit_square(3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_general_constraint(
        {np.array([1.0, 1.0]).tobytes(): {np.array([0.0, 0.0]).tobytes(): 0.5}}
    )
    mpc.finalize()
    from dolfinx_mpc_tpu.fem.forms import conj, div, sym

    a = dmt.BilinearForm(
        V,
        lambda u, v, c: 2.0 * inner(sym(grad(u)), sym(grad(v))) + 1.25 * div(u) * conj(div(v)),
    )
    A_ref = dmt.assemble_matrix(a, mpc).to_scipy()
    A_lat = assemble_matrix_lattice(a, mpc).assemble()
    diff = (A_ref - A_lat.to_scipy()).tocoo()
    err = np.abs(diff.data).max() if diff.nnz else 0.0
    assert err < 1e-12, f"vector lattice mismatch: {err}"


def test_lattice_cells_side_format():
    """Unassembled ('cells') side block gives the same operator as 'csr'."""
    import jax.numpy as jnp

    mesh = create_unit_cube(3, 3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=1)
    A_csr = assemble_matrix_lattice(a, mpc, bcs=[bc], diagval=2.0).assemble()
    A_cel = assemble_matrix_lattice(a, mpc, bcs=[bc], diagval=2.0, side_format="cells").assemble()
    x = np.random.default_rng(5).standard_normal(V.num_dofs)
    y1 = np.asarray(A_csr.matvec(jnp.asarray(x)))
    y2 = np.asarray(A_cel.matvec(jnp.asarray(x)))
    assert np.abs(y1 - y2).max() < 1e-12
    d1 = np.asarray(A_csr.diagonal())
    d2 = np.asarray(A_cel.diagonal())
    assert np.abs(d1 - d2).max() < 1e-12
    diff = (A_csr.to_scipy() - A_cel.to_scipy()).tocoo()
    assert (np.abs(diff.data).max() if diff.nnz else 0.0) < 1e-12


def test_lattice_fold_format():
    """'fold' (plane-identification) operator equals the csr-side operator
    for matching periodic constraints."""
    import jax.numpy as jnp

    mesh = create_unit_cube(4, 3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)) + inner(u, v), quad_degree=2)
    A_csr = assemble_matrix_lattice(a, mpc, bcs=[bc], diagval=3.0).assemble()
    A_fold = assemble_matrix_lattice(a, mpc, bcs=[bc], diagval=3.0, side_format="fold").assemble()
    x = np.random.default_rng(9).standard_normal(V.num_dofs)
    y1 = np.asarray(A_csr.matvec(jnp.asarray(x)))
    y2 = np.asarray(A_fold.matvec(jnp.asarray(x)))
    assert np.abs(y1 - y2).max() < 1e-11, np.abs(y1 - y2).max()
    assert np.abs(np.asarray(A_csr.diagonal()) - np.asarray(A_fold.diagonal())).max() < 1e-11
    diff = (A_csr.to_scipy() - A_fold.to_scipy()).tocoo()
    assert (np.abs(diff.data).max() if diff.nnz else 0.0) < 1e-11
    # non-foldable constraint raises
    mpc2 = dmt.MultiPointConstraint(V)
    mpc2.create_general_constraint(
        {np.array([1.0, 1.0, 1.0]).tobytes(): {np.array([0.0, 0.0, 0.0]).tobytes(): 0.5}}
    )
    mpc2.finalize()
    with pytest.raises(ValueError):
        assemble_matrix_lattice(a, mpc2, bcs=[bc], side_format="fold")


def test_lattice_fold_chunked():
    """x-chunked fold assembly equals the monolithic fold assembly."""
    import jax.numpy as jnp

    mesh = create_unit_cube(8, 3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=1)
    A1 = assemble_matrix_lattice(a, mpc, bcs=[bc], side_format="fold").assemble()
    A4 = assemble_matrix_lattice(a, mpc, bcs=[bc], side_format="fold", x_chunks=4).assemble()
    err = np.abs(np.asarray(A1.dia.data) - np.asarray(A4.dia.data)).max()
    assert err < 1e-13, err
    x = np.random.default_rng(11).standard_normal(V.num_dofs)
    y1 = np.asarray(A1.matvec(jnp.asarray(x)))
    y4 = np.asarray(A4.matvec(jnp.asarray(x)))
    assert np.abs(y1 - y4).max() < 1e-12
