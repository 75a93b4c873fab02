"""Level-depth bisect of the monolithic bs=3 V-cycle wrongness on TPU.

Pairs (probe_bs3_pairs) are all exact; full V-cycle is wrong.  Build manual
k-level V-cycles (coarse = 2 Jacobi sweeps, NO dense matmul) in one jit and
compare against the same cycle composed from separately-jitted stages.
Then the full cycle with the real dense coarse solve.

Usage: python scripts/probe_bs3_levels.py [n=64]
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

smooth = jax.jit(lambda P, lvl, x, b_: P._smooth(lvl, x, b_, 2),
                 static_argnums=1)
matvec = jax.jit(lambda P, lvl, v: P.ops[lvl].matvec(v), static_argnums=1)
restr = jax.jit(
    lambda P, lvl, r: P._mask(lvl + 1, P._restrict(lvl, P._mask(lvl, r))),
    static_argnums=1)
prol = jax.jit(lambda P, lvl, xc: P._mask(lvl, P._prolong(
    lvl, P._mask(lvl + 1, xc))), static_argnums=1)
coarse = jax.jit(lambda P, b_: P._coarse_solve(b_))


def kcycle(P, lvl, b, kmax, dense):
    """k-level V-cycle; at lvl == kmax the 'coarse solve' is either 2 Jacobi
    sweeps (dense=False) or the real coarse solve (dense=True, only valid
    when kmax == len(P.ops) - 1)."""
    if lvl == kmax:
        if dense:
            return P._coarse_solve(b)
        return P._smooth(lvl, jnp.zeros_like(b), b, 2)
    x = P._smooth(lvl, jnp.zeros_like(b), b, 2)
    r = P._mask(lvl, b - P.ops[lvl].matvec(x))
    rc = P._mask(lvl + 1, P._restrict(lvl, r))
    xc = kcycle(P, lvl + 1, rc, kmax, dense)
    x = x + P._mask(lvl, P._prolong(lvl, P._mask(lvl + 1, xc)))
    return P._smooth(lvl, x, b, P.n_post)


def staged_kcycle(lvl, b, kmax, dense):
    if lvl == kmax:
        if dense:
            return np.asarray(coarse(M, b))
        return np.asarray(smooth(M, lvl, jnp.zeros_like(b), b))
    x = np.asarray(smooth(M, lvl, jnp.zeros_like(b), b))
    r = b - np.asarray(matvec(M, lvl, x))
    r = np.asarray(jax.jit(lambda P, v, l=lvl: P._mask(l, v))(M, r))
    rc = np.asarray(restr(M, lvl, jnp.asarray(r + 0.0)))
    # NOTE: restr applies mask(lvl) again — masks are idempotent projections
    xc = staged_kcycle(lvl + 1, jnp.asarray(rc), kmax, dense)
    x = x + np.asarray(prol(M, lvl, jnp.asarray(xc)))
    return np.asarray(smooth(M, lvl, jnp.asarray(x), b))


for kmax, dense in ((1, False), (2, False), (3, False), (3, True)):
    got = jax.jit(lambda P, r, k=kmax, d=dense: kcycle(P, 0, r, k, d))(M, x1)
    ref = staged_kcycle(0, x1, kmax, dense)
    g = np.asarray(got, np.float64)
    d = np.abs(g - ref)
    print(f"k={kmax} dense={dense}: max|diff|={d.max():.3e} "
          f"rel={d.max() / max(np.abs(ref).max(), 1e-300):.3e}", flush=True)
