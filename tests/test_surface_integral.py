"""Exterior-facet (surface) integrals with MPC, incl. coefficient dependence
(mirror of /root/reference/python/tests/test_surface_integral.py)."""

import numpy as np

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import dot, grad, inner
from dolfinx_mpc_tpu.fem.mesh import (
    create_unit_square,
    locate_entities_boundary,
    meshtags,
)
from dolfinx_mpc_tpu.utils import compare_mpc_lhs, compare_mpc_rhs


def test_surface_rhs_with_mpc(scalar_dtype):
    mesh = create_unit_square(4, 4)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    facets = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[0], 1.0))
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {np.array([1.0, 0.5]).tobytes(): {np.array([0.0, 0.5]).tobytes(): 0.8}}
    )
    mpc.finalize()
    L = dmt.LinearForm(
        V, lambda v, c: (2.0 + c.x[1]) * v.value, integral="exterior_facet", entities=facets
    )
    compare_mpc_rhs(
        np.asarray(dmt.assemble_vector(L, None, dtype=scalar_dtype)),
        np.asarray(dmt.assemble_vector(L, mpc, dtype=scalar_dtype)),
        mpc,
    )


def test_surface_bilinear_with_mpc(scalar_dtype):
    """Robin-type boundary term u*v ds added to stiffness."""
    mesh = create_unit_square(4, 4)
    V = dmt.functionspace(mesh, ("Lagrange", 2))
    facets = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[1], 1.0))
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v))) + dmt.BilinearForm(
        V, lambda u, v, c: 3.0 * inner(u, v), integral="exterior_facet", entities=facets
    )
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {np.array([0.5, 1.0]).tobytes(): {np.array([0.5, 0.0]).tobytes(): 0.4}}
    )
    mpc.finalize()
    compare_mpc_lhs(
        dmt.assemble_matrix(a, None, dtype=scalar_dtype).to_scipy(),
        dmt.assemble_matrix(a, mpc, dtype=scalar_dtype).to_scipy(),
        mpc,
    )


def test_surface_with_coefficient(scalar_dtype):
    """Facet integral depending on a coefficient function (reference
    test_surface_integral.py coefficient-dependence case)."""
    mesh = create_unit_square(3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    g = dmt.Function(V, name="g")
    g.interpolate(lambda x: x[0] ** 2 + x[1])
    facets = locate_entities_boundary(mesh, 1, lambda x: np.isclose(x[0], 0.0))
    L = dmt.LinearForm(
        V,
        lambda v, c: c["g"].value * v.value,
        integral="exterior_facet",
        entities=facets,
        coefficients={"g": g},
    )
    mpc = dmt.MultiPointConstraint(V, dtype=scalar_dtype)
    mpc.create_general_constraint(
        {np.array([0.0, 1.0]).tobytes(): {np.array([1.0, 1.0]).tobytes(): 0.3}}
    )
    mpc.finalize()
    compare_mpc_rhs(
        np.asarray(dmt.assemble_vector(L, None, dtype=scalar_dtype)),
        np.asarray(dmt.assemble_vector(L, mpc, dtype=scalar_dtype)),
        mpc,
    )
