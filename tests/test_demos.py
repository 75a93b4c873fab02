"""ALL demos as integration tests (the reference CI executes its demos too,
test_mpc.yml:121-196).  Each demo self-verifies (oracle / physics checks);
sizes are shrunk for CI wall-time."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def test_demo_periodic_geometrical():
    from demos.demo_periodic_geometrical import main

    main(n=12)


def test_demo_periodic3d_topological():
    from demos.demo_periodic3d_topological import main

    main(n=4, degree=2)


def test_demo_periodic_gep():
    from demos.demo_periodic_gep import main

    main(n=8, nev=3)


def test_demo_elasticity():
    from demos.demo_elasticity import main

    main(n=8)


def test_demo_elasticity_disconnect_2d(tmp_path):
    from demos.create_and_export_mesh import disconnected_plates_2d
    from demos.demo_elasticity_disconnect_2D import main

    from dolfinx_mpc_tpu.io import write_gmsh

    mesh, ct, ft = disconnected_plates_2d(nl=5, nu=4)
    p = tmp_path / "d2.msh"
    write_gmsh(str(p), mesh, ct, ft)
    main(msh_path=str(p))


def test_demo_elasticity_disconnect_3d(tmp_path):
    from demos.create_and_export_mesh import disconnected_boxes_3d
    from demos.demo_elasticity_disconnect import main

    from dolfinx_mpc_tpu.io import write_gmsh

    mesh, ct, ft = disconnected_boxes_3d(nl=3, nu=2)
    p = tmp_path / "d3.msh"
    write_gmsh(str(p), mesh, ct, ft)
    main(msh_path=str(p))


def test_demo_contact_2d():
    from demos.demo_contact_2D import main

    main(nb=5, nt=4)


def test_demo_contact_3d():
    from demos.demo_contact_3D import main

    main(nb=3, nt=2)


def test_demo_stokes_single_matrix():
    from demos.demo_stokes import main

    main(nx=8, ny=4)


def test_demo_stokes_nest():
    from demos.demo_stokes_nest import main

    main(nx=8, ny=4)


def test_demo_stokes_nonlinear_nest():
    from demos.demo_stokes_nonlinear_nest import main

    main(nx=6, ny=3)


def test_demo_wave():
    from demos.demo_linear_wave_problem import main

    main(n=12, steps=10)


def test_create_and_export_roundtrip(tmp_path):
    """The mesh-export factory writes Gmsh 4.1 files read_gmsh understands."""
    import numpy as np

    from demos.create_and_export_mesh import disconnected_plates_2d

    from dolfinx_mpc_tpu.io import read_gmsh, write_gmsh

    mesh, ct, ft = disconnected_plates_2d(nl=3, nu=2)
    p = tmp_path / "rt.msh"
    write_gmsh(str(p), mesh, ct, ft)
    m2, c2, f2 = read_gmsh(str(p))
    assert m2.num_cells == mesh.num_cells
    assert set(np.unique(c2.values).tolist()) == {1, 2}
    assert f2 is not None and set(np.unique(f2.values).tolist()) == {1, 2, 3}
