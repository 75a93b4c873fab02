"""Integration over cell subsets (mirror of
/root/reference/python/tests/test_integration_domains.py: dx(1)+dx(2)-style
forms assembled with MPC equal the K^H A K oracle)."""

import numpy as np

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_square, locate_entities
from dolfinx_mpc_tpu.utils import compare_mpc_lhs


def test_cell_subdomains(scalar_dtype):
    mesh = create_unit_square(4, 4)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    left = locate_entities(mesh, mesh.tdim, lambda x: x[0] <= 0.5 + 1e-12)
    right = np.setdiff1d(np.arange(mesh.num_cells), left)
    # a = 2*grad.grad on left + 5*u*v on right
    a = dmt.BilinearForm(
        V, lambda u, v, c: 2.0 * inner(grad(u), grad(v)), entities=left
    ) + dmt.BilinearForm(V, lambda u, v, c: 5.0 * inner(u, v), entities=right)
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {
            np.array([1.0, 1.0]).tobytes(): {
                np.array([0.25, 1.0]).tobytes(): 0.5,
                np.array([0.0, 1.0]).tobytes(): 0.5,
            }
        }
    )
    mpc.finalize()
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )
