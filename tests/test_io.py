"""XDMF writer + Gmsh reader round trips."""

import os
import subprocess

import numpy as np
import pytest

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube, create_unit_square
from dolfinx_mpc_tpu.io import XDMFFile, read_gmsh


def test_xdmf_write(tmp_path):
    import h5py

    mesh = create_unit_square(3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    u = dmt.Function(V, name="u")
    u.interpolate(lambda x: x[0] + x[1])
    path = str(tmp_path / "out.xdmf")
    with XDMFFile(path) as f:
        f.write_mesh(mesh)
        f.write_function(u)
    assert os.path.exists(path)
    with h5py.File(str(tmp_path / "out.h5")) as h5:
        assert h5["mesh/points"].shape == (mesh.num_points, 3)
        assert h5["mesh/cells"].shape == (mesh.num_cells, 3)
        np.testing.assert_allclose(
            np.asarray(h5["func/u"]).ravel(), np.asarray(u.x.array)
        )
    # xml parses
    import xml.etree.ElementTree as ET

    ET.parse(path)


GMSH_SQUARE = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Entities
4 4 1 0
1 0 0 0 0
2 1 0 0 0
3 1 1 0 0
4 0 1 0 0
1 0 0 0 1 0 0 1 5 2 1 -2
2 1 0 0 1 1 0 1 6 2 2 -3
3 0 1 0 1 1 0 0 2 3 -4
4 0 0 0 0 1 0 0 2 4 -1
1 0 0 0 1 1 0 1 10 4 1 2 3 4
$EndEntities
$Nodes
5 5 1 5
0 1 0 1
1
0 0 0
0 2 0 1
2
1 0 0
0 3 0 1
3
1 1 0
0 4 0 1
4
0 1 0
2 1 0 1
5
0.5 0.5 0
$EndNodes
$Elements
3 8 1 8
1 1 1 2
1 1 2
2 2 3
1 2 1 2
3 2 3
4 3 4
2 1 2 4
5 1 2 5
6 2 3 5
7 3 4 5
8 4 1 5
$EndElements
"""


def test_gmsh_reader(tmp_path):
    p = str(tmp_path / "m.msh")
    with open(p, "w") as f:
        f.write(GMSH_SQUARE)
    mesh, ct, ft = read_gmsh(p)
    assert mesh.cell_type == "triangle"
    assert mesh.num_cells == 4
    assert mesh.num_points == 5
    # physical cell tag 10 everywhere
    assert (ct.values == 10).all()
    # facet tags: 4 tagged boundary edges (phys 5 and 6)
    assert ft is not None
    assert set(ft.values.tolist()) == {5, 6}
    assert len(ft.indices) == 4
    # the mesh is usable for a solve
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    from dolfinx_mpc_tpu.fem.forms import grad, inner

    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)) + inner(u, v))
    A = dmt.assemble_matrix(a, None)
    assert np.isfinite(np.asarray(A.data)).all()
