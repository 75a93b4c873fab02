"""Constrained matrix assembly vs the explicit K^H A K oracle.

Mirror of /root/reference/python/tests/test_matrix_assembly.py: assemble the
unconstrained matrix, build the explicit transformation matrix K, and assert
K^H A K equality including the slave-and-master-on-same-cell case (:61-102).
"""

import numpy as np
import pytest

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube, create_unit_square
from dolfinx_mpc_tpu.utils import compare_mpc_lhs, compare_mpc_rhs


def _poisson_forms(V, dtype):
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    L = dmt.LinearForm(V, lambda v, c: (c.x[0] + 2.0) * np.conj(1.0) * v.value)
    return a, L


def _dict_mpc(V, dtype):
    """Simple two-slave constraint using coordinate dictionary (reference
    test pattern: slave and master possibly sharing a cell)."""
    mpc = dmt.MultiPointConstraint(V, dtype=dtype)
    s_m = {
        np.array([1.0, 1.0], dtype=np.float64).tobytes(): {
            np.array([0.0, 0.0], dtype=np.float64).tobytes(): 0.43,
            np.array([1.0, 0.0], dtype=np.float64).tobytes(): 0.11,
        },
        np.array([0.0, 1.0], dtype=np.float64).tobytes(): {
            np.array([1.0, 0.0], dtype=np.float64).tobytes(): 0.57,
        },
    }
    mpc.create_general_constraint({k: v for k, v in s_m.items()})
    mpc.finalize()
    return mpc


@pytest.mark.parametrize("cell_type", ["triangle", "quadrilateral"])
@pytest.mark.parametrize("degree", [1, 2])
def test_matrix_assembly_vs_oracle(cell_type, degree, scalar_dtype):
    mesh = create_unit_square(4, 4, cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", degree))
    a, L = _poisson_forms(V, scalar_dtype)
    mpc = _dict_mpc(V, scalar_dtype)

    A_mpc = dmt.assemble_matrix(a, mpc, dtype=scalar_dtype)
    A_org = dmt.assemble_matrix(a, None, dtype=scalar_dtype)
    compare_mpc_lhs(A_org.to_scipy(), A_mpc.to_scipy(), mpc)

    b_mpc = dmt.assemble_vector(L, mpc, dtype=scalar_dtype)
    b_org = dmt.assemble_vector(L, None, dtype=scalar_dtype)
    compare_mpc_rhs(np.asarray(b_org), np.asarray(b_mpc), mpc)


def test_slave_master_same_cell(scalar_dtype):
    """Slave and master in the same cell (reference
    test_matrix_assembly.py:61-102)."""
    mesh = create_unit_square(1, 1)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    # tie dof at (1,1) to dofs at (1,0) and (0,1): all share cells
    mpc.create_general_constraint(
        {
            np.array([1.0, 1.0]).tobytes(): {
                np.array([1.0, 0.0]).tobytes(): 0.3,
                np.array([0.0, 1.0]).tobytes(): 0.7,
            }
        }
    )
    mpc.finalize()
    a, L = _poisson_forms(V, scalar_dtype)
    A_mpc = dmt.assemble_matrix(a, mpc, dtype=scalar_dtype)
    A_org = dmt.assemble_matrix(a, None, dtype=scalar_dtype)
    compare_mpc_lhs(A_org.to_scipy(), A_mpc.to_scipy(), mpc)


@pytest.mark.parametrize("cell_type", ["tetrahedron", "hexahedron"])
def test_matrix_assembly_3d(cell_type, scalar_dtype):
    mesh = create_unit_cube(2, 2, 2, cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)) + inner(u, v))
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {
            np.array([1.0, 1.0, 1.0]).tobytes(): {
                np.array([0.0, 0.0, 0.0]).tobytes(): 0.5,
                np.array([1.0, 0.0, 0.0]).tobytes(): 0.25,
            }
        }
    )
    mpc.finalize()
    A_mpc = dmt.assemble_matrix(a, mpc, dtype=scalar_dtype)
    A_org = dmt.assemble_matrix(a, None, dtype=scalar_dtype)
    compare_mpc_lhs(A_org.to_scipy(), A_mpc.to_scipy(), mpc)


def test_diagval():
    """Slave and bc diagonals get diagval (assemble_matrix.cpp:711-724)."""
    mesh = create_unit_square(2, 2)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    a, _ = _poisson_forms(V, np.float64)
    mpc = _dict_mpc(V, np.float64)
    A = dmt.assemble_matrix(a, mpc, diagval=3.5)
    d = np.asarray(A.diagonal())
    for s in mpc.slaves:
        assert np.isclose(d[s], 3.5)


def test_chunked_assembly_matches_single_shot():
    """The fori_loop cell-chunked value computation (memory bound for 1M+
    vector problems) is entry-identical to single-shot assembly."""
    import numpy as np

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_square
    from dolfinx_mpc_tpu.ops.assemble import _compile_matrix, _coeff_vectors

    mesh = create_unit_square(6, 6)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_general_constraint(
        {np.array([1.0, 1.0]).tobytes(): {np.array([0.0, 1.0]).tobytes(): 0.8}}
    )
    mpc.finalize()
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[1], 0.0))
    bc = dmt.dirichletbc(np.zeros(2), bdofs, V)
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))

    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.assemble import _bc_masks

    outs = []
    for chunk in (262144, 7):  # single-shot vs 11 chunks
        cm = _compile_matrix(a, mpc, np.float64, cell_chunk=chunk)
        bcm = jnp.asarray(_bc_masks(V, [bc], np.float64))
        bc_diag = np.zeros(V.num_dofs)
        bc_diag[bc.dofs] = 1.0
        data = cm.assemble_fn(
            cm.tables, [_coeff_vectors(t.term) for t in cm.terms],
            bcm, bcm, jnp.asarray(bc_diag), jnp.asarray(1.0),
        )
        outs.append(np.asarray(data))
    assert np.abs(outs[0] - outs[1]).max() < 1e-12
