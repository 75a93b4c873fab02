"""The fused pallas lean assembler must be ENTRY-IDENTICAL to the XLA lean
fold path (interpret mode on CPU; on TPU it is the production assembly for
the flagship P1 config)."""

import numpy as np
import pytest

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import grad, inner
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice
from dolfinx_mpc_tpu.ops.pallas_lattice import make_lean_fold_pallas, pallas_supported


def _clf(n=6):
    import jax.numpy as jnp

    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=1)
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32, side_format="fold")
    assert clf._lean and pallas_supported(clf)
    return clf


@pytest.mark.parametrize("jitter", [0.0, 0.037])
def test_pallas_matches_xla_lean(jitter):
    import jax.numpy as jnp

    clf = _clf(6)
    dv = jnp.asarray(1.0, jnp.float32)
    jit = jnp.asarray(jitter, jnp.float32)
    ref = clf._assemble_fold_lean(jit, dv, clf._keep_grid)
    pal = make_lean_fold_pallas(clf, interpret=True)
    data_p = jnp.asarray(np.asarray(pal(jit))[:, None, None])
    data_p = clf._zero_bc_on_grid(data_p, clf._keep_grid)
    data_p = np.asarray(clf._diag_adds(data_p, dv))
    err = np.abs(np.asarray(ref.dia.data) - data_p).max()
    scale = np.abs(np.asarray(ref.dia.data)).max()
    assert err < 5e-6 * max(scale, 1.0), (err, scale)


def test_pallas_offset_split_matches():
    """The VMEM offset-split path (multiple pallas calls) is identical to
    the single-call kernel."""
    import jax.numpy as jnp

    clf = _clf(5)
    jit = jnp.asarray(0.01, jnp.float32)
    one = make_lean_fold_pallas(clf, interpret=True)(jit)
    split = make_lean_fold_pallas(clf, interpret=True, max_off=4)(jit)
    assert np.abs(np.asarray(one) - np.asarray(split)).max() < 1e-6


def test_pallas_matvec_matches():
    """Pallas DIA SpMV == XLA DIA matvec (interpret mode)."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.pallas_lattice import (
        dia_matvec_supported,
        make_dia_matvec_pallas,
    )

    clf = _clf(5)
    A = clf.assemble()
    dia = A.dia
    assert dia_matvec_supported(dia.offsets, dia.vshape, dia.bs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dia.shape[0]).astype(np.float32))
    y_ref = np.asarray(dia.matvec(x))
    mv = make_dia_matvec_pallas(dia.offsets, dia.vshape, interpret=True)
    y_pal = np.asarray(mv(dia.data, x))
    scale = np.abs(y_ref).max()
    assert np.abs(y_pal - y_ref).max() < 5e-6 * max(scale, 1.0)


def _clf_custom(n, degree, integrand, quad_degree):
    import jax.numpy as jnp

    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", degree))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, integrand, quad_degree=quad_degree)
    return assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32, side_format="fold")


@pytest.mark.parametrize("degree", [1, 2])
def test_pallas_degree_and_reaction(degree):
    """General constant-M forms (Laplacian + mass) at degrees 1 and 2 match
    the XLA lean path."""
    import jax.numpy as jnp

    # quad_degree = degree + 1 keeps the SoA unroll budget happy at P2
    # (both paths share the rule, so equivalence holds regardless)
    clf = _clf_custom(
        3, degree,
        lambda u, v, c: inner(grad(u), grad(v)) + 0.5 * inner(u, v),
        quad_degree=degree + 1,
    )
    assert clf._lean and pallas_supported(clf)
    dv = jnp.asarray(1.0, jnp.float32)
    jit = jnp.asarray(0.02, jnp.float32)
    ref = clf._assemble_fold_lean(jit, dv, clf._keep_grid)
    pal = make_lean_fold_pallas(clf, interpret=True)
    data_p = jnp.asarray(np.asarray(pal(jit))[:, None, None])
    data_p = clf._zero_bc_on_grid(data_p, clf._keep_grid)
    data_p = np.asarray(clf._diag_adds(data_p, dv))
    ref_d = np.asarray(ref.dia.data)
    err = np.abs(ref_d - data_p).max()
    scale = np.abs(ref_d).max()
    assert err < 5e-6 * max(scale, 1.0), (err, scale)


def test_pallas_rejects_coefficient_forms():
    """Forms with FEM coefficients or x-dependence must NOT ride the pallas
    path (it only handles constant feature matrices)."""
    import jax.numpy as jnp

    mesh = create_unit_cube(3, 3, 3)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [],
    )
    mpc.finalize()
    from dolfinx_mpc_tpu.ops.pallas_lattice import _probe_constant_M

    a_x = dmt.BilinearForm(V, lambda u, v, c: (1.0 + c.x[0]) * inner(grad(u), grad(v)))
    assert _probe_constant_M(a_x.terms[0], 3) is None
    w = dmt.Function(V, dtype=np.float32)
    a_w = dmt.BilinearForm(
        V, lambda u, v, c: c["w"].value * inner(grad(u), grad(v)),
        coefficients={"w": w},
    )
    assert _probe_constant_M(a_w.terms[0], 3) is None


def test_pallas_matvec_offset_split():
    """The VMEM offset-split SpMV equals the single-call SpMV."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.pallas_lattice import make_dia_matvec_pallas

    clf = _clf(5)
    dia = clf.assemble().dia
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(dia.shape[0]).astype(np.float32))
    one = make_dia_matvec_pallas(dia.offsets, dia.vshape, interpret=True)(dia.data, x)
    split = make_dia_matvec_pallas(dia.offsets, dia.vshape, interpret=True, max_off=4)(dia.data, x)
    assert np.abs(np.asarray(one) - np.asarray(split)).max() < 1e-5


# ---------------------------------------------------------------------------
# parity-blocked (degree-2) path
# ---------------------------------------------------------------------------


def _clf_p2(n=4):
    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", 2))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=2)
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32, side_format="fold")
    assert clf._lean and clf._blocked_lean
    return clf


def test_blocked_operator_matches_refined_dia():
    """The parity-blocked P2 operator is ENTRY-IDENTICAL to the refined
    65-diagonal DIA operator (same matrix, 2.26x fewer stored bytes)."""
    import os

    clf_b = _clf_p2(4)
    # rebuild without the blocked layout
    os.environ["DMT_NO_BLOCKED"] = "1"
    try:
        mesh = create_unit_cube(4, 4, 4)
        V = dmt.functionspace(mesh, ("Lagrange", 2))
        bdofs = dmt.locate_dofs_geometrical(
            V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
        )
        bc = dmt.dirichletbc(0.0, bdofs, V)
        mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
        mpc.create_periodic_constraint_geometrical(
            V, lambda x: np.isclose(x[0], 1.0),
            lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
        )
        mpc.finalize()
        a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)),
                             quad_degree=2)
        clf_d = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                                        side_format="fold")
    finally:
        del os.environ["DMT_NO_BLOCKED"]
    assert not clf_d._blocked_lean
    A_b = clf_b.assemble().dia.to_scipy()
    A_d = clf_d.assemble().dia.to_scipy()
    err = abs(A_b - A_d).max()
    assert err < 5e-5 * max(abs(A_d).max(), 1.0), err
    # matvec agreement on the fine-layout vectors
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(A_b.shape[0]).astype(np.float32))
    y_b = np.asarray(clf_b.assemble().dia.matvec(x))
    y_d = np.asarray(clf_d.assemble().dia.matvec(x))
    assert np.abs(y_b - y_d).max() < 5e-4 * max(np.abs(y_d).max(), 1.0)
    # diagonal agreement
    d_b = np.asarray(clf_b.assemble().dia.diagonal())
    d_d = np.asarray(clf_d.assemble().dia.diagonal())
    assert np.abs(d_b - d_d).max() < 5e-5 * max(np.abs(d_d).max(), 1.0)


def test_blocked_pallas_assembler_matches_xla():
    """make_lean_blocked_pallas (interpret) == the XLA blocked packer."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.pallas_lattice import make_lean_blocked_pallas

    clf = _clf_p2(3)
    dv = jnp.asarray(1.0, jnp.float32)
    jit = jnp.asarray(0.013, jnp.float32)
    ref = clf._assemble_fold_lean_blocked(jit, dv, clf._keep_blocked)
    pal = make_lean_blocked_pallas(clf, interpret=True)
    data_p = jnp.asarray(np.asarray(pal(jit)))
    data_p = clf._zero_bc_blocked(data_p, clf._keep_blocked)
    data_p = np.asarray(clf._diag_adds_blocked(data_p, dv))
    ref_d = np.asarray(ref.dia.data)
    err = np.abs(ref_d - data_p).max()
    scale = np.abs(ref_d).max()
    assert err < 5e-6 * max(scale, 1.0), (err, scale)


def test_blocked_pallas_assembler_split_matches():
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.pallas_lattice import make_lean_blocked_pallas

    clf = _clf_p2(3)
    jit = jnp.asarray(0.02, jnp.float32)
    one = make_lean_blocked_pallas(clf, interpret=True)(jit)
    split = make_lean_blocked_pallas(clf, interpret=True, max_off=37)(jit)
    assert np.abs(np.asarray(one) - np.asarray(split)).max() < 1e-6


@pytest.fixture(params=["factored", "2d"])
def _force_fuse_mode(request, monkeypatch):
    """Run fused-mask tests in both kernel modes: "factored" (separable
    axis factors — production for axis-aligned BCs at any n) and "2d"
    (plane-stack masks — the general fallback while they fit VMEM)."""
    if request.param == "2d":
        from dolfinx_mpc_tpu.ops import pallas_lattice as PL

        monkeypatch.setattr(PL, "_detect_factored_masks", lambda clf: None)
    return request.param


def test_fused_mask_blocked_matches_xla_masking(_force_fuse_mode):
    """fuse_mask=True (BC row/col masks + diagval applied inside the
    kernel) == unmasked kernel + the XLA _zero_bc_blocked/_diag_adds
    passes, on the blocked (degree-2) layout.  The fused path is
    production on TPU: the 230-pass XLA masking was 4.5 ms of the 4.53 ms
    n=64 assembly (r4 probe)."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.pallas_lattice import make_lean_blocked_pallas

    clf = _clf_p2(3)
    jit = jnp.asarray(0.013, jnp.float32)
    dv = jnp.asarray(1.7, jnp.float32)
    raw = make_lean_blocked_pallas(clf, interpret=True)(jit)
    ref = clf._zero_bc_blocked(jnp.asarray(np.asarray(raw)),
                               clf._keep_blocked)
    ref = np.asarray(clf._diag_adds_blocked(ref, dv))
    fused = np.asarray(make_lean_blocked_pallas(clf, interpret=True,
                                                fuse_mask=True)(
        jit, clf._keep_blocked, dv, clf._bc_ind_blocked))
    err = np.abs(ref - fused).max()
    assert err < 1e-6 * max(np.abs(ref).max(), 1.0), err


def test_fused_mask_blocked_split_matches(_force_fuse_mode):
    """The VMEM offset-split fused path == single-call fused kernel."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.pallas_lattice import make_lean_blocked_pallas

    clf = _clf_p2(3)
    jit = jnp.asarray(0.02, jnp.float32)
    dv = jnp.asarray(1.0, jnp.float32)
    args = (jit, clf._keep_blocked, dv, clf._bc_ind_blocked)
    one = make_lean_blocked_pallas(clf, interpret=True, fuse_mask=True)(*args)
    split = make_lean_blocked_pallas(clf, interpret=True, fuse_mask=True,
                                     max_off=37)(*args)
    assert np.abs(np.asarray(one) - np.asarray(split)).max() < 1e-6


def test_fused_mask_grid_matches_xla_masking(_force_fuse_mode):
    """fuse_mask on the P1 grid layout == unmasked + _zero_bc_on_grid +
    _diag_adds."""
    import jax.numpy as jnp

    clf = _clf(5)
    n0, n1, n2 = clf.vshape
    jit = jnp.asarray(0.017, jnp.float32)
    dv = jnp.asarray(2.3, jnp.float32)
    raw = make_lean_fold_pallas(clf, interpret=True)(jit)
    raw4 = jnp.asarray(np.asarray(raw))[:, None, None]
    ref = clf._zero_bc_on_grid(raw4, clf._keep_grid)
    ref = np.asarray(clf._diag_adds(ref, dv)).reshape(-1, n0, n1, n2)
    fused = np.asarray(make_lean_fold_pallas(clf, interpret=True,
                                             fuse_mask=True)(
        jit, clf._keep_grid, dv, clf._bc_ind_grid))
    err = np.abs(ref - fused).max()
    assert err < 1e-6 * max(np.abs(ref).max(), 1.0), err


@pytest.mark.slow
def test_fused_mask_factored_wide_axes():
    """The FACTORED fused kernel at vector axes > 128 lanes (9 x 133 x 133
    nodes — the scripts/probe_factored_wide.py grid).  Locks the shape logic
    of the r4 Mosaic wide-axis fix (transposed 2-D j-factor slices,
    ops/pallas_lattice.py kernel_factored): the r4d chain crashed at
    n=128/216 with `Unsupported reshape vector<217xf32> ->
    vector<217x1xf32>` because 1-D mask-factor slices wider than one lane
    register cannot lower.  interpret=True exercises exactly the traced
    shapes Mosaic sees."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops import pallas_lattice as PL

    mesh = create_unit_cube(2, 132, 132)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)),
                         quad_degree=1)
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                                  side_format="fold")
    assert clf._lean and pallas_supported(clf)
    assert clf.vshape[1] > 128 and clf.vshape[2] > 128
    assert PL._detect_factored_masks(clf) == "factored"
    jit = jnp.asarray(0.013, jnp.float32)
    dv = jnp.asarray(1.0, jnp.float32)
    n0, n1, n2 = clf.vshape
    raw = make_lean_fold_pallas(clf, interpret=True)(jit)
    ref = clf._zero_bc_on_grid(jnp.asarray(np.asarray(raw))[:, None, None],
                               clf._keep_grid)
    ref = np.asarray(clf._diag_adds(ref, dv)).reshape(-1, n0, n1, n2)
    fused = np.asarray(make_lean_fold_pallas(clf, interpret=True,
                                             fuse_mask=True)(
        jit, clf._keep_grid, dv, clf._bc_ind_grid))
    err = np.abs(ref - fused).max()
    assert err < 1e-6 * max(np.abs(ref).max(), 1.0), err


def test_fused_mask_nonseparable_detection():
    """A geometric (non-axis-plane) BC must NOT be treated as separable:
    _detect_factored_masks returns None and the 2d kernel still matches
    the XLA masking."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops import pallas_lattice as PL

    mesh = create_unit_cube(5, 5, 5)
    V = dmt.functionspace(mesh, ("Lagrange", 1))
    # corner blob: not a product of per-axis masks
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: (x[0] + x[1] + x[2]) < 0.35)
    bc = dmt.dirichletbc(0.0, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mpc.finalize()
    a = dmt.BilinearForm(V, lambda u, v, c: inner(grad(u), grad(v)),
                         quad_degree=1)
    clf = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                                  side_format="fold")
    assert clf._lean
    assert PL._detect_factored_masks(clf) is None
    jit = jnp.asarray(0.01, jnp.float32)
    dv = jnp.asarray(1.3, jnp.float32)
    n0, n1, n2 = clf.vshape
    raw = make_lean_fold_pallas(clf, interpret=True)(jit)
    ref = clf._zero_bc_on_grid(jnp.asarray(np.asarray(raw))[:, None, None],
                               clf._keep_grid)
    ref = np.asarray(clf._diag_adds(ref, dv)).reshape(-1, n0, n1, n2)
    fused = np.asarray(make_lean_fold_pallas(clf, interpret=True,
                                             fuse_mask=True)(
        jit, clf._keep_grid, dv, clf._bc_ind_grid))
    err = np.abs(ref - fused).max()
    assert err < 1e-6 * max(np.abs(ref).max(), 1.0), err


def test_blocked_pallas_matvec_matches():
    """Blocked pallas SpMV (blocked-layout vectors, compressed data,
    interpret) == the XLA blocked matvec."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.pallas_lattice import make_blocked_matvec_pallas

    clf = _clf_p2(4)
    dia = clf.assemble().dia
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(dia.shape[0]).astype(np.float32))
    y_ref = np.asarray(dia.matvec(x))
    mv = make_blocked_matvec_pallas(dia.trips, dia.vshape, dia.r3, interpret=True)
    assert mv is not None
    y_pal = np.asarray(dia._from_blocked(mv(dia.data, dia._to_blocked(x))))
    scale = np.abs(y_ref).max()
    assert np.abs(y_pal - y_ref).max() < 5e-6 * max(scale, 1.0)


def test_blocked_pallas_matvec_split_matches():
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.pallas_lattice import make_blocked_matvec_pallas

    clf = _clf_p2(3)
    dia = clf.assemble().dia
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(dia.shape[0]).astype(np.float32))
    xb = dia._to_blocked(x)
    one = make_blocked_matvec_pallas(dia.trips, dia.vshape, dia.r3, interpret=True)
    split = make_blocked_matvec_pallas(dia.trips, dia.vshape, dia.r3,
                                       interpret=True, max_m=29)
    assert np.abs(np.asarray(one(dia.data, xb)) - np.asarray(split(dia.data, xb))).max() < 1e-5


# ---------------------------------------------------------------------------
# vector (bs = 3) path: elasticity — VERDICT r2 #3
# ---------------------------------------------------------------------------


def _clf_elast(n=4):
    from dolfinx_mpc_tpu.fem.forms import conj, div, sym

    mesh = create_unit_cube(n, n, n)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0)
    )
    bc = dmt.dirichletbc(np.zeros(3), bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc],
    )
    mpc.finalize()
    mu, lam = 1.0, 1.25
    a = dmt.BilinearForm(
        V,
        lambda u, v, c: 2 * mu * inner(sym(grad(u)), sym(grad(v)))
        + lam * div(u) * conj(div(v)),
        quad_degree=1,
    )
    return assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                                   side_format="fold")


def test_pallas_bs3_assembler_matches_xla():
    """The vector (bs=3) pallas assembler == the XLA lean fold path."""
    import jax.numpy as jnp

    clf = _clf_elast(4)
    assert clf._lean and clf.bs == 3 and pallas_supported(clf)
    dv = jnp.asarray(1.0, jnp.float32)
    jit = jnp.asarray(0.021, jnp.float32)
    ref = clf._assemble_fold_lean(jit, dv, clf._keep_grid)
    pal = make_lean_fold_pallas(clf, interpret=True)
    n0, n1, n2 = clf.vshape
    data_p = jnp.asarray(np.asarray(pal(jit))).reshape(
        len(clf.offsets), 3, 3, n0, n1, n2)
    data_p = clf._zero_bc_on_grid(data_p, clf._keep_grid)
    data_p = np.asarray(clf._diag_adds(data_p, dv))
    ref_d = np.asarray(ref.dia.data)
    err = np.abs(ref_d - data_p).max()
    scale = np.abs(ref_d).max()
    assert err < 5e-6 * max(scale, 1.0), (err, scale)


def test_pallas_bs3_offset_split_matches():
    import jax.numpy as jnp

    clf = _clf_elast(3)
    jit = jnp.asarray(0.007, jnp.float32)
    one = make_lean_fold_pallas(clf, interpret=True)(jit)
    split = make_lean_fold_pallas(clf, interpret=True, max_off=4)(jit)
    assert np.abs(np.asarray(one) - np.asarray(split)).max() < 1e-6


def test_pallas_bs3_matvec_matches():
    """Blocked-component pallas DIA SpMV == XLA matvec (interpret)."""
    import jax.numpy as jnp

    from dolfinx_mpc_tpu.ops.pallas_lattice import make_dia_matvec_bs_pallas

    clf = _clf_elast(4)
    dia = clf.assemble().dia
    assert dia.bs == 3
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(dia.shape[0]).astype(np.float32))
    y_ref = np.asarray(dia.matvec(x))
    mv = make_dia_matvec_bs_pallas(dia.offsets, dia.vshape, dia.bs, interpret=True)
    y_pal = np.asarray(mv(dia.data, x))
    scale = np.abs(y_ref).max()
    assert np.abs(y_pal - y_ref).max() < 5e-6 * max(scale, 1.0)
    # row-split path
    mv_s = make_dia_matvec_bs_pallas(dia.offsets, dia.vshape, dia.bs,
                                     interpret=True, max_rows=17)
    y_s = np.asarray(mv_s(dia.data, x))
    assert np.abs(y_s - y_pal).max() < 1e-5 * max(scale, 1.0)


def test_pallas_bs3_oracle():
    """bs=3 lattice operator (pallas-structured data via interpret path)
    equals the slot-CSR general assembler on the same problem."""
    import jax.numpy as jnp

    clf = _clf_elast(3)
    A_lat = clf.assemble()
    sp_lat = A_lat.to_scipy()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(sp_lat.shape[0]).astype(np.float32))
    y = np.asarray(A_lat.matvec(x))
    y_ref = sp_lat @ np.asarray(x)
    assert np.abs(y - y_ref).max() < 5e-5 * max(np.abs(y_ref).max(), 1.0)
