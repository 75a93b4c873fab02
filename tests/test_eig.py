"""Shift-and-invert generalized eigensolver vs scipy (the reference drives
SLEPc EPS shift-and-invert in demo_periodic_gep.py; la/eig.py is the
TPU-native counterpart)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def test_eigsh_shift_invert_poisson_pencil():
    import jax.numpy as jnp

    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import grad, inner
    from dolfinx_mpc_tpu.fem.mesh import create_unit_square
    from dolfinx_mpc_tpu.la import eigsh_shift_invert, jacobi_preconditioner

    mesh = create_unit_square(10, 10)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1]]), [bc])
    mpc.finalize()
    k_form = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)))
    m_form = dmt.BilinearForm(V, lambda u, v, c: inner(u, v))
    K = dmt.assemble_matrix(k_form, mpc, bcs=[bc], diagval=1e4)
    M = dmt.assemble_matrix(m_form, mpc, bcs=[bc], diagval=1.0)

    nev = 3
    pc = jacobi_preconditioner(jnp.asarray(np.asarray(K.diagonal())))
    lam, U, info = eigsh_shift_invert(K, M, nev, sigma=0.0, pc=pc, tol=1e-9)
    lam = np.sort(np.asarray(lam))

    # scipy oracle on the reduced free pencil
    from dolfinx_mpc_tpu.utils import gather_transformation_matrix

    Ks = dmt.assemble_matrix(k_form, None, bcs=[bc]).to_scipy()
    Ms = dmt.assemble_matrix(m_form, None, bcs=[bc]).to_scipy()
    Kt = gather_transformation_matrix(mpc)
    is_slave = np.zeros(V.num_dofs, bool)
    is_slave[np.asarray(mpc.slaves)] = True
    red = -np.ones(V.num_dofs, np.int64)
    red[~is_slave] = np.arange((~is_slave).sum())
    free = red[np.setdiff1d(np.flatnonzero(~is_slave), bc.dofs)]
    Kr = (Kt.T @ Ks @ Kt).tocsr()[free][:, free]
    Mr = (Kt.T @ Ms @ Kt).tocsr()[free][:, free]
    vals = np.sort(spla.eigsh(Kr, k=nev, M=Mr, sigma=0, which="LM",
                              return_eigenvectors=False))
    assert np.allclose(lam, vals, rtol=1e-8), (lam, vals)

    # eigenvector residuals: ||K u - lam M u|| / lam small
    for i in range(nev):
        u = np.asarray(U[:, i])
        r = np.asarray(K.matvec(jnp.asarray(u))) - np.asarray(
            M.matvec(jnp.asarray(u))) * np.asarray(lam)[i]
        assert np.linalg.norm(r) / lam[i] < 1e-7


def test_eigsh_shift_invert_nonzero_sigma():
    """sigma targeting (sigma below the spectrum keeps A - sigma*M SPD,
    the documented requirement for the CG inner solves): eigenvalues of a
    diagonal pencil nearest sigma."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.la import eigsh_shift_invert

    n = 200
    rng = np.random.default_rng(3)
    d = np.sort(rng.uniform(1.0, 100.0, n))
    m = rng.uniform(0.5, 2.0, n)
    A = lambda x: jnp.asarray(d) * m * x  # pencil A = D M -> lam = d
    M = lambda x: jnp.asarray(m) * x
    sigma = 0.5  # below lam_min ~ 1.0
    lam, U, info = eigsh_shift_invert(A, M, 4, sigma=sigma,
                                      X0=jnp.asarray(
                                          rng.standard_normal((n, 8))),
                                      tol=1e-9)
    want = d[np.argsort(np.abs(d - sigma))[:4]]
    assert np.allclose(np.sort(np.asarray(lam)), np.sort(want), rtol=1e-7)
