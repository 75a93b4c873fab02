"""Direct K^H (b - A g) lifting verification with INHOMOGENEOUS Dirichlet
values (mirror of /root/reference/python/tests/test_lifting.py:24 — the
reference's dedicated lifting test; previously only covered indirectly via
pipeline tests)."""

import numpy as np
import scipy.sparse as sp

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube, create_unit_square
from dolfinx_mpc_tpu.utils import gather_transformation_matrix


def _check_lifting(mesh, dtype, degree=1):
    V = dmt.functionspace(mesh, ("Lagrange", degree))
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[0], 0.0))
    bc = dmt.dirichletbc(2.3, bdofs, V)  # inhomogeneous
    mpc = dmt.MultiPointConstraint(V, dtype=dtype)
    mpc.create_general_constraint(
        {np.array([1.0, 0.5]).tobytes()[: mesh.gdim * 8]: {
            np.array([0.5, 0.5]).tobytes()[: mesh.gdim * 8]: 0.7}}
        if mesh.gdim == 2
        else {np.array([1.0, 0.5, 0.5]).tobytes(): {np.array([0.5, 0.5, 0.5]).tobytes(): 0.7}}
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)) + inner(u, v))
    L = dmt.LinearForm(V, lambda v, c: (1.0 + c.x[0]) * v.value)

    b = dmt.assemble_vector(L, mpc, dtype=dtype)
    b = dmt.apply_lifting(b, [a], [[bc]], mpc, dtype=dtype)
    b = np.asarray(dmt.set_bc(b, [bc]))

    # oracle: K^H (b_org - A_org g), bc rows overwritten with g
    A_org = dmt.assemble_matrix(a, None, dtype=dtype).to_scipy()
    b_org = np.asarray(dmt.assemble_vector(L, None, dtype=dtype))
    g = np.zeros(V.num_dofs, dtype=dtype)
    g[bc.dofs] = bc.dof_values(dtype)
    K = gather_transformation_matrix(mpc)
    lifted = K.conj().T @ (b_org - A_org @ g)
    # slave rows of the assembled vector are zero; bc rows carry g
    ref_full = np.zeros(V.num_dofs, dtype=dtype)
    free = np.ones(V.num_dofs, bool)
    free[np.asarray(mpc.slaves)] = False
    # map reduced entries back: K columns correspond to non-slave dofs
    ref_full[free] = np.asarray(lifted).ravel()
    ref_full[bc.dofs] = g[bc.dofs]
    assert np.abs(b - ref_full).max() < 1e-10, np.abs(b - ref_full).max()


def test_lifting_2d(scalar_dtype):
    _check_lifting(create_unit_square(6, 6), scalar_dtype)


def test_lifting_3d_p2(scalar_dtype):
    _check_lifting(create_unit_cube(2, 2, 2), scalar_dtype, degree=2)
