"""Minimal-composition bisect of the bs=3 pallas DIA SpMV wrongness.

Known: standalone arg-passed stages correct; monolithic V-cycle wrong unless
DMT_NO_PALLAS_SPMV=1; optimization barriers do NOT fix it.  Here: compose
pairs/triples of stages in ONE jit program (arg-passed) and compare each
against the composition of separately-jitted stages (which matched CPU).

Usage: python scripts/probe_bs3_pairs.py [n=64]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
bs = 3
print(f"backend={jax.default_backend()} n={n}", flush=True)


def make_problem(m):
    mesh = create_unit_cube(m, m, m)
    V = dmt.functionspace(mesh, ("Lagrange", 1, (bs,)))
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(np.zeros(bs), bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mu, lam = 1.0, 1.25
    a = dmt.BilinearForm(
        V, lambda u, v, c: 2 * mu * inner(sym(grad(u)), sym(grad(v)))
        + lam * div(u) * conj(div(v)), quad_degree=1)
    return mesh, V, bc, mpc, a


mesh, V, bc, mpc, a = make_problem(n)
mpc.finalize()
A = assemble_matrix_lattice(a, mpc, bcs=[bc], dtype=np.float32,
                            side_format="fold")

from dolfinx_mpc_tpu.la.gmg import LatticeGMG, build_gmg_hierarchy


def make_level(lv):
    deg_l, m = lv if isinstance(lv, tuple) else (1, lv)
    if m == n:
        return A
    _, V_l, bc_l, mpc_l, a_l = make_problem(m)
    mpc_l.finalize()
    return assemble_matrix_lattice(a_l, mpc_l, bcs=[bc_l], dtype=np.float32,
                                   side_format="fold")


ops, masks = build_gmg_hierarchy(make_level, n, 4, min_n=8, coarse_on_cpu=True)
M = LatticeGMG(ops, free_masks=masks)
rng = np.random.default_rng(0)
x1 = jnp.asarray(rng.standard_normal(ops[0].shape[0]), jnp.float32)

# separately-jitted references (validated == CPU in the stage probe)
smooth = jax.jit(lambda P, lvl, x, b_: P._smooth(lvl, x, b_, 2),
                 static_argnums=1)
matvec = jax.jit(lambda P, lvl, v: P.ops[lvl].matvec(v), static_argnums=1)
restrict = jax.jit(
    lambda P, lvl, r: P._mask(lvl + 1, P._restrict(lvl, P._mask(lvl, r))),
    static_argnums=1)


def cmp(name, got, ref):
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    d = np.abs(got - ref)
    rel = d.max() / max(np.abs(ref).max(), 1e-300)
    print(f"{name}: max|diff|={d.max():.3e} rel={rel:.3e}", flush=True)


# references
s0 = smooth(M, 0, jnp.zeros_like(x1), x1)
r0 = x1 - matvec(M, 0, s0)
rc1 = restrict(M, 0, jax.jit(lambda P, v: P._mask(0, v))(M, r0))
s1 = smooth(M, 1, jnp.zeros_like(rc1), rc1)
mm0 = matvec(M, 0, np.asarray(matvec(M, 0, x1)))

# A. matvec(matvec(x)) at l0 in one program
got = jax.jit(lambda P, r: P.ops[0].matvec(P.ops[0].matvec(r)))(M, x1)
cmp("A mv(mv) l0", got, mm0)

# B. smooth l0 -> residual matvec in one program
got = jax.jit(lambda P, r: r - P.ops[0].matvec(
    P._smooth(0, jnp.zeros_like(r), r, 2)))(M, x1)
cmp("B smooth+res l0", got, r0)

# C. smooth l0 -> mask/restrict/mask -> smooth l1 in one program
got = jax.jit(lambda P, r: P._smooth(1, jnp.zeros_like(
    P._mask(1, P._restrict(0, P._mask(0, r - P.ops[0].matvec(
        P._smooth(0, jnp.zeros_like(r), r, 2)))))),
    P._mask(1, P._restrict(0, P._mask(0, r - P.ops[0].matvec(
        P._smooth(0, jnp.zeros_like(r), r, 2))))), 2))(M, x1)
cmp("C down-to-l1-smooth", got, s1)

# D. l0 and l1 matvecs in one program (shapes differ; outputs summed by
#    folding l1 result back via prolong to keep one output)
ref_d = matvec(M, 0, x1) + np.asarray(jax.jit(
    lambda P, v: P._prolong(0, v))(M, np.asarray(matvec(M, 1, rc1))))
got = jax.jit(lambda P, r, rc: P.ops[0].matvec(r)
              + P._prolong(0, P.ops[1].matvec(rc)))(M, x1, rc1)
cmp("D l0+l1 matvecs", got, ref_d)

# E. smoother with 4 sweeps standalone (longer fori_loop)
ref_e = smooth(M, 0, np.asarray(smooth(M, 0, jnp.zeros_like(x1), x1)), x1)
got = jax.jit(lambda P, r: P._smooth(0, P._smooth(
    0, jnp.zeros_like(r), r, 2), r, 2))(M, x1)
cmp("E smooth4 l0 (2x fori)", got, ref_e)
