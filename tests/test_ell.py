"""Block-ELL format (la/ell.py): conversion and matvec equality vs scipy,
node-block (bs=3) structure, quantile spill to the COO remainder, and the
AMG integration path (fine_op sharing).

Counterpart of the reference's reliance on PETSc blocked MATAIJ SpMV
correctness for elasticity/contact problems
(/root/reference/python/benchmarks/bench_contact_3D.py:186-213)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp


def _rand_block_matrix(nn, deg, bs, seed, n_dense_nodes=0, spread=30):
    """Random node-block matrix: banded node graph, dense bs x bs blocks."""
    rng = np.random.default_rng(seed)
    rn = np.repeat(np.arange(nn), deg)
    cn = np.clip(rn + rng.integers(-spread, spread + 1, rn.shape[0]), 0, nn - 1)
    if n_dense_nodes:
        dn = rng.choice(nn, n_dense_nodes, replace=False)
        drn = np.repeat(dn, nn // 3)
        dcn = rng.integers(0, nn, drn.shape[0])
        rn = np.concatenate([rn, drn])
        cn = np.concatenate([cn, dcn])
    rows = (rn[:, None, None] * bs + np.arange(bs)[None, :, None]).ravel()
    cols = (cn[:, None, None] * bs + np.arange(bs)[None, None, :]).ravel()
    vals = rng.standard_normal(rows.shape[0])
    return sp.coo_matrix((vals, (rows, cols)),
                         shape=(nn * bs, nn * bs)).tocsr()


@pytest.mark.parametrize("nn,deg,bs,dense", [
    (211, 9, 1, 0), (150, 12, 3, 2), (64, 5, 2, 1)])
def test_ell_matvec_matches_scipy(nn, deg, bs, dense):
    from dolfinx_mpc_tpu.la.ell import ell_from_scipy

    A = _rand_block_matrix(nn, deg, bs, seed=nn, n_dense_nodes=dense)
    E = ell_from_scipy(A, br=bs, dtype=np.float64)
    x = np.random.default_rng(1).standard_normal(nn * bs)
    y_ref = A @ x
    y = np.asarray(E.matvec(jnp.asarray(x)))
    assert np.abs(y - y_ref).max() < 1e-11 * max(1.0, np.abs(y_ref).max())
    assert np.abs(np.asarray(E.diagonal()) - A.diagonal()).max() < 1e-14
    # reconstruction round-trips exactly
    assert abs(E.to_scipy() - A).max() < 1e-14


def test_ell_rectangular():
    """Rectangular block matrices (AMG prolongators P, restrictions R)."""
    from dolfinx_mpc_tpu.la.ell import ell_from_scipy

    rng = np.random.default_rng(7)
    nf, nc, bs = 120, 17, 3
    rn = np.repeat(np.arange(nf), 4)
    cn = rng.integers(0, nc, rn.shape[0])
    rows = (rn[:, None, None] * bs + np.arange(bs)[None, :, None]).ravel()
    cols = (cn[:, None, None] * bs + np.arange(bs)[None, None, :]).ravel()
    vals = rng.standard_normal(rows.shape[0])
    P = sp.coo_matrix((vals, (rows, cols)), shape=(nf * bs, nc * bs)).tocsr()
    E = ell_from_scipy(P, br=bs, dtype=np.float64)
    x = rng.standard_normal(nc * bs)
    assert np.abs(np.asarray(E.matvec(jnp.asarray(x))) - P @ x).max() < 1e-11
    R = sp.csr_matrix(P.T)
    ER = ell_from_scipy(R, br=bs, dtype=np.float64)
    y = rng.standard_normal(nf * bs)
    assert np.abs(np.asarray(ER.matvec(jnp.asarray(y))) - R @ y).max() < 1e-11


def test_ell_quantile_spill():
    """Dense (MPC-master-like) rows spill whole blocks into the remainder."""
    from dolfinx_mpc_tpu.la.ell import ell_from_scipy

    A = _rand_block_matrix(180, 7, 3, seed=3, n_dense_nodes=3)
    E = ell_from_scipy(A, br=3, k_cap=8, dtype=np.float64)
    assert E.rem_data.shape[0] > 0
    assert E.data.shape[1] == 8
    x = np.random.default_rng(2).standard_normal(540)
    assert np.abs(np.asarray(E.matvec(jnp.asarray(x))) - A @ x).max() < 1e-11
    assert abs(E.to_scipy() - A).max() < 1e-14
    # quantile form picks K below the dense-node max
    Eq = ell_from_scipy(A, br=3, k_quantile=95.0, dtype=np.float64)
    assert Eq.data.shape[1] < np.diff(A.tocsr().indptr).max()
    assert np.abs(np.asarray(Eq.matvec(jnp.asarray(x))) - A @ x).max() < 1e-11


def test_ell_non_divisible_and_f32():
    """Rows/cols that don't divide the block size; f32 tolerance."""
    from dolfinx_mpc_tpu.la.ell import ell_from_scipy

    rng = np.random.default_rng(11)
    n = 101  # not divisible by 3
    A = sp.random(n, n, density=0.05, random_state=4, format="csr") + sp.eye(n)
    E = ell_from_scipy(A, br=3, dtype=np.float32)
    x = rng.standard_normal(n)
    y = np.asarray(E.matvec(jnp.asarray(x, jnp.float32)))
    assert np.abs(y - A @ x).max() < 1e-4 * max(1.0, np.abs(A @ x).max())


def test_ell_assembled_contact_matrix_and_amg_share():
    """ELL of a real assembled contact elasticity matrix + AMG fine_op
    sharing: the shared-operator preconditioner solves to the same answer."""
    import dolfinx_mpc_tpu as dmt
    from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
    from dolfinx_mpc_tpu.fem.mesh import Mesh, create_box, meshtags
    from dolfinx_mpc_tpu.la.amg import smoothed_aggregation_amg
    from dolfinx_mpc_tpu.la.ell import ell_from_scipy
    from dolfinx_mpc_tpu.la.solvers import cg

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
    E = ell_from_scipy(As, br=3, k_quantile=99.5, dtype=np.float64)
    x = np.random.default_rng(5).standard_normal(V.num_dofs)
    assert np.abs(np.asarray(E.matvec(jnp.asarray(x))) - As @ x).max() < 1e-10
    # padding economy: stored entries within 3x of nnz at this tiny mesh
    # (boundary nodes + 1-nnz BC identity rows dominate at nb=5; the 1M-dof
    # contact mesh measures 97% fill where 8x128 BELL measured 3.4%)
    assert E.nnz_stored < 3.0 * As.nnz

    # AMG with the shared ELL fine op matches AMG with its own conversion
    b = np.asarray(As @ np.ones(V.num_dofs))
    M0 = smoothed_aggregation_amg(As, bs=3, dtype=np.float64)
    M1 = smoothed_aggregation_amg(As, bs=3, dtype=np.float64, fine_op=E)
    x0, i0, _ = cg(E.matvec, jnp.asarray(b), M=M0, rtol=1e-10)
    x1, i1, _ = cg(E.matvec, jnp.asarray(b), M=M1, rtol=1e-10)
    assert np.abs(np.asarray(x0) - np.asarray(x1)).max() < 1e-7
    assert abs(int(i0) - int(i1)) <= 2
