"""Native C++ setup kernels agree with the numpy fallbacks."""

import numpy as np
import pytest

from dolfinx_mpc_tpu import native


def test_native_builds():
    assert native.available(), "native library failed to build"


def test_sort_unique_inverse_matches_numpy():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 10_000, size=100_000).astype(np.int64)
    u1, f1, i1 = native.sort_unique_inverse(keys)
    u2, f2, i2 = np.unique(keys, return_index=True, return_inverse=True)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(i1, i2)
    # first indices both point at an occurrence of the key
    np.testing.assert_array_equal(keys[f1], u1)


@pytest.mark.parametrize("cell_type,mesher", [
    ("triangle", lambda m: m.create_unit_square(5, 5)),
    ("quadrilateral", lambda m: m.create_unit_square(4, 4, "quadrilateral")),
    ("tetrahedron", lambda m: m.create_unit_cube(3, 3, 3)),
    ("hexahedron", lambda m: m.create_unit_cube(3, 3, 3, "hexahedron")),
])
def test_locate_points_matches_eval(cell_type, mesher):
    import dolfinx_mpc_tpu.fem.mesh as mesh_mod
    from dolfinx_mpc_tpu.fem.geometry_maps import PointLocator, _tabulate_rows
    from dolfinx_mpc_tpu.fem.elements import lagrange_element

    mesh = mesher(mesh_mod)
    rng = np.random.default_rng(3)
    pts = rng.random((50, mesh.gdim)) * 0.999 + 5e-4
    loc = PointLocator(mesh)
    cells, X = loc.locate(pts)
    assert (cells >= 0).all()
    # round trip: geometry map of (cell, X) reproduces the query point
    geo = lagrange_element(cell_type, 1)
    phi = _tabulate_rows(geo, X)  # (n, nv)
    cc = mesh.points[mesh.cells[cells]]
    back = np.einsum("nv,nvg->ng", phi, cc)
    assert np.abs(back - pts).max() < 1e-9


def test_locate_points_restricted_cells():
    import dolfinx_mpc_tpu.fem.mesh as mesh_mod
    from dolfinx_mpc_tpu.fem.geometry_maps import PointLocator

    mesh = mesh_mod.create_unit_square(4, 4)
    left_cells = np.flatnonzero(mesh.points[mesh.cells].mean(axis=1)[:, 0] < 0.5)
    loc = PointLocator(mesh, left_cells)
    cells, X = loc.locate(np.array([[0.1, 0.5], [0.9, 0.5]]))
    assert cells[0] in left_cells
    assert cells[1] == -1  # outside the restricted set
