"""Vector Poisson with sub-space slave/master combinations (mirror of
/root/reference/python/tests/test_vector_poisson.py:26-30)."""

import numpy as np
import pytest

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_square
from dolfinx_mpc_tpu.utils import compare_mpc_lhs, compare_mpc_rhs


@pytest.mark.parametrize("slave_comp, master_comp", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_vector_poisson_subspace_constraint(slave_comp, master_comp, scalar_dtype):
    mesh = create_unit_square(4, 4)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {np.array([1.0, 0.0]).tobytes(): {np.array([0.0, 1.0]).tobytes(): 0.1}},
        subspace_slave=slave_comp,
        subspace_master=master_comp,
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    import jax.numpy as jnp

    L = dmt.LinearForm(
        V, lambda v, c: inner(jnp.stack([-5.0 * c.x[1], 7.0 * c.x[0]]), v)
    )
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )
    compare_mpc_rhs(
        np.asarray(dmt.assemble_vector(L, None, dtype=scalar_dtype)),
        np.asarray(dmt.assemble_vector(L, mpc, dtype=scalar_dtype)),
        mpc,
    )


def test_elasticity_sym_grad(scalar_dtype):
    """Vector elasticity bilinear form assembles and matches the oracle."""
    from dolfinx_mpc_tpu.fem.forms import conj, div, sym

    mesh = create_unit_square(3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (2,)))
    mu, lam = 1.0, 1.25

    def sigma_form(u, v, c):
        eu, ev = sym(grad(u)), sym(grad(v))
        return 2 * mu * inner(eu, ev) + lam * div(u) * conj(div(v))

    a = dmt.BilinearForm(V, sigma_form)
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {
            np.array([1.0, 1.0]).tobytes(): {
                np.array([0.0, 0.0]).tobytes(): 0.3,
                np.array([1.0, 0.0]).tobytes(): 0.2,
            }
        }
    )
    mpc.finalize()
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )
