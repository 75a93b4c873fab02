"""BELL (blocked-ELL) format: conversion and matvec equality vs scipy,
including overflow-to-COO spill and the pallas kernel in interpret mode.

Counterpart of the reference's reliance on PETSc MATAIJ SpMV correctness
(implicit in every reference test that solves on an assembled matrix)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp


def _rand_mesh_like(n, nnz_per_row, seed, n_dense_rows=0, spread=40):
    """Banded random matrix with mesh-like locality + a few dense rows."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), nnz_per_row)
    cols = rows + rng.integers(-spread, spread + 1, rows.shape[0])
    cols = np.clip(cols, 0, n - 1)
    vals = rng.standard_normal(rows.shape[0])
    if n_dense_rows:
        dr = rng.choice(n, n_dense_rows, replace=False)
        drr = np.repeat(dr, n // 3)
        drc = rng.integers(0, n, drr.shape[0])
        rows = np.concatenate([rows, drr])
        cols = np.concatenate([cols, drc])
        vals = np.concatenate([vals, rng.standard_normal(drr.shape[0])])
    return sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()


@pytest.mark.parametrize("n,nnz,dense", [(317, 9, 0), (1024, 15, 3), (73, 5, 1)])
def test_bell_matvec_matches_scipy(n, nnz, dense):
    from dolfinx_mpc_tpu.la.bell import bell_from_scipy

    A = _rand_mesh_like(n, nnz, seed=n, n_dense_rows=dense)
    B = bell_from_scipy(A)
    x = np.random.default_rng(1).standard_normal(n)
    y_ref = A @ x
    y = np.asarray(B.matvec(jnp.asarray(x, jnp.float32)))
    assert np.abs(y - y_ref).max() < 1e-3 * max(1.0, np.abs(y_ref).max())
    # float64 carries full precision through the XLA path
    B64 = bell_from_scipy(A, dtype=np.float64)
    y64 = np.asarray(B64.matvec(jnp.asarray(x)))
    assert np.abs(y64 - y_ref).max() < 1e-11 * max(1.0, np.abs(y_ref).max())
    assert np.abs(np.asarray(B64.diagonal()) - A.diagonal()).max() < 1e-14


def test_bell_overflow_spills_to_remainder():
    from dolfinx_mpc_tpu.la.bell import bell_from_scipy

    A = _rand_mesh_like(400, 7, seed=3, n_dense_rows=4)
    B = bell_from_scipy(A, mt_cap=2, dtype=np.float64)
    assert B.rem_data.shape[0] > 0
    x = np.random.default_rng(2).standard_normal(400)
    assert np.abs(np.asarray(B.matvec(jnp.asarray(x))) - A @ x).max() < 1e-11
    # reconstruction round-trips exactly
    assert abs(B.to_scipy() - A).max() < 1e-14


def test_bell_roundtrip_assembled_matrix():
    """BELL of a real assembled MPC matrix (vector elasticity, contact)."""
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
    from dolfinx_mpc_tpu.fem.mesh import Mesh, create_box, meshtags
    from dolfinx_mpc_tpu.la.bell import bell_from_scipy

    nb, nt = 5, 4
    bot = create_box((0, 0, 0), (1, 1, 1), (nb, nb, nb))
    top = create_box((0, 0, 1), (1, 1, 2), (nt, nt, nt))
    mesh = Mesh(np.vstack([bot.points, top.points]),
                np.vstack([bot.cells, top.cells + bot.num_points]),
                bot.cell_type)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    fverts, _, f2c = mesh.facets()
    on_iface = np.isclose(mesh.points[fverts][:, :, 2], 1.0).all(axis=1)
    ext = np.isin(np.arange(fverts.shape[0]), mesh.exterior_facets())
    iface = np.flatnonzero(on_iface & ext)
    cz = mesh.points[mesh.cells[f2c[iface, 0]]].mean(axis=1)[:, 2]
    mt = meshtags(mesh, 2, iface, np.where(cz > 1.0, 1, 2))
    mpc = dmt.MultiPointConstraint(V)
    mpc.create_contact_inelastic_condition(mt, 1, 2)
    mpc.finalize()
    bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
    bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
    a = dmt.BilinearForm(V, lambda u, v, c: 2 * inner(sym(grad(u)), sym(grad(v)))
                         + 1.25 * div(u) * conj(div(v)))
    A = dmt.assemble_matrix(a, mpc, bcs=[bc])
    As = A.to_scipy()
    B = bell_from_scipy(As, dtype=np.float64)
    x = np.random.default_rng(5).standard_normal(V.num_dofs)
    assert np.abs(np.asarray(B.matvec(jnp.asarray(x))) - As @ x).max() < 1e-10
    assert np.abs(np.asarray(B.diagonal()) - As.diagonal()).max() < 1e-14
    # spill must be a tiny fraction at worst
    assert B.rem_data.shape[0] <= 0.02 * As.nnz + 1


def test_bell_pallas_interpret_matches_xla():
    """The pallas kernel (interpret mode on CPU) equals the XLA path."""
    from dolfinx_mpc_tpu.la import bell as bl

    A = _rand_mesh_like(700, 11, seed=9, n_dense_rows=2)
    B = bl.bell_from_scipy(A)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(700), jnp.float32)
    x2 = B._x_tiles(x)
    nblk, mt, R, C = B.data.shape
    yb_pl = bl._bell_matvec_pallas(nblk, mt, R, C, x2.shape[0],
                                   interpret=True)(B.cols, B.data, x2)
    xg = x2[B.cols]
    yb_xla = jnp.sum(B.data * xg[:, :, None, :], axis=(1, 3))
    assert np.abs(np.asarray(yb_pl) - np.asarray(yb_xla)).max() < 1e-4


def test_chunked_conversion_matches():
    """The block-chunked bincount conversion equals the single-shot one."""
    import scipy.sparse as sp

    from dolfinx_mpc_tpu.la.bell import bell_from_scipy

    rng = np.random.default_rng(4)
    n = 700
    A = sp.random(n, n, density=0.01, random_state=3, format="csr") + sp.eye(n)
    B1 = bell_from_scipy(A)
    B2 = bell_from_scipy(A, _bchunk=3)
    assert np.abs(np.asarray(B1.data) - np.asarray(B2.data)).max() == 0.0
    assert (np.asarray(B1.cols) == np.asarray(B2.cols)).all()
