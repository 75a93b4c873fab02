"""Rectangular (two-space) assembly with two MPCs and block (nest) systems
(mirror of /root/reference/python/tests/test_rectangular_assembly.py and the
nest paths of assemble_matrix.py:91-146)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_square
from dolfinx_mpc_tpu.utils import gather_transformation_matrix


def _two_mpcs(V, Q, dtype):
    mpc_v = dmt.MultiPointConstraint(V, dtype=dtype)
    mpc_v.create_general_constraint(
        {np.array([1.0, 1.0]).tobytes(): {np.array([0.0, 0.0]).tobytes(): 0.2}},
        subspace_slave=0,
        subspace_master=0,
    )
    mpc_v.finalize()
    mpc_q = dmt.MultiPointConstraint(Q, dtype=dtype)
    mpc_q.create_general_constraint(
        {np.array([0.0, 1.0]).tobytes(): {np.array([1.0, 0.0]).tobytes(): 0.3}}
    )
    mpc_q.finalize()
    return mpc_v, mpc_q


def test_rectangular_assembly(scalar_dtype):
    """b(v, q) = div(v) q with row MPC on V and col MPC on Q equals
    K_V^H B K_Q."""
    mesh = create_unit_square(4, 4)
    V = dmt.functionspace(mesh, ("Lagrange", 2, (2,)))
    Q = dmt.functionspace(mesh, ("Lagrange", 1))
    mpc_v, mpc_q = _two_mpcs(V, Q, scalar_dtype)
    b_form = dmt.BilinearForm(V, lambda p, v, c: div(v) * conj(p.value), V_trial=Q)

    B_org = dmt.assemble_matrix(b_form, None, dtype=scalar_dtype).to_scipy()
    B_mpc = dmt.assemble_matrix(b_form, (mpc_v, mpc_q), dtype=scalar_dtype).to_scipy()

    Kv = gather_transformation_matrix(mpc_v)
    Kq = gather_transformation_matrix(mpc_q)
    ref = (Kv.T.conj() @ B_org @ Kq).tocsr()
    sl_v = np.asarray(mpc_v.slaves)
    sl_q = np.asarray(mpc_q.slaves)
    keep_r = np.setdiff1d(np.arange(V.num_dofs), sl_v)
    keep_c = np.setdiff1d(np.arange(Q.num_dofs), sl_q)
    diff = ref - B_mpc[keep_r][:, keep_c]
    assert np.abs(diff.data).max() < 1e-9 if diff.nnz else True


def test_nest_stokes_like(scalar_dtype):
    """2x2 block system (Stokes-like saddle point) assembled blockwise with
    per-space MPCs; fused NestMatrix matvec equals the scipy bmat matvec."""
    mesh = create_unit_square(3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 2, (2,)))
    Q = dmt.functionspace(mesh, ("Lagrange", 1))
    mpc_v, mpc_q = _two_mpcs(V, Q, scalar_dtype)

    a00 = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    a01 = dmt.BilinearForm(V, lambda p, v, c: -div(v) * conj(p.value), V_trial=Q)
    a10 = dmt.BilinearForm(Q, lambda u, q, c: -div(u) * conj(q.value), V_trial=V)
    a_nest = [[a00, a01], [a10, None]]

    A = dmt.create_matrix_nest(a_nest, [mpc_v, mpc_q])
    dmt.assemble_matrix_nest(A, a_nest, [mpc_v, mpc_q])
    S = A.to_scipy()
    x = np.random.default_rng(0).standard_normal(S.shape[1]).astype(scalar_dtype)
    import jax.numpy as jnp

    y_nest = np.asarray(A.matvec(jnp.asarray(x)))
    y_ref = S @ x
    assert np.abs(y_nest - y_ref).max() < 1e-10

    L = [
        dmt.LinearForm(V, lambda v, c: inner(jnp_ones2(c), v)),
        dmt.LinearForm(Q, lambda q, c: 0.0 * q.value),
    ]
    b = dmt.create_vector_nest(L, [mpc_v, mpc_q])
    dmt.assemble_vector_nest(b, L, [mpc_v, mpc_q])
    assert np.isfinite(np.asarray(b.array)).all()


def jnp_ones2(c):
    import jax.numpy as jnp

    return jnp.ones(2)
