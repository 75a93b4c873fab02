"""Up-sweep bisect of the 2-level (k=1) monolithic V-cycle wrongness.

probe_bs3_levels: k=1 cycle in one program wrong (rel 2.2e-1), while the
down-sweep composition (pairs C) is exact.  Here: isolate which up-sweep
composition breaks, feeding exact staged intermediates as inputs.

Usage: python scripts/probe_bs3_up.py [n=64]
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

# exact staged intermediates
x_pre = smooth(M, 0, jnp.zeros_like(x1), x1)
r0 = jnp.asarray(np.asarray(x1) - np.asarray(matvec(M, 0, x_pre)))
rc = restr(M, 0, r0)
xc = smooth(M, 1, jnp.zeros_like(rc), rc)
x_corr = jnp.asarray(np.asarray(x_pre) + np.asarray(prol(M, 0, xc)))
final = smooth(M, 0, x_corr, x1)


def cmp(name, got, ref):
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    d = np.abs(got - ref)
    print(f"{name}: max|diff|={d.max():.3e}", flush=True)


# u2: up-sweep only in one program (x_pre, xc as inputs)
got = jax.jit(lambda P, xp, xcc, b_: P._smooth(
    0, xp + P._mask(0, P._prolong(0, P._mask(1, xcc))), b_, 2))(
    M, x_pre, xc, x1)
cmp("u2 add+prolong+post-smooth", got, final)

# u3: smooth_l1 + prolong + add (no post-smooth), rc as input
got = jax.jit(lambda P, xp, rcc: xp + P._mask(0, P._prolong(0, P._mask(
    1, P._smooth(1, jnp.zeros_like(rcc), rcc, 2)))))(M, x_pre, rc)
cmp("u3 smoothl1+prolong+add", got, x_corr)

# u4: k=1 cycle WITHOUT post-smooth
got = jax.jit(lambda P, b_: (lambda x: x + P._mask(0, P._prolong(0, P._mask(
    1, P._smooth(1, jnp.zeros_like(P._mask(1, P._restrict(0, P._mask(
        0, b_ - P.ops[0].matvec(x))))), P._mask(1, P._restrict(0, P._mask(
            0, b_ - P.ops[0].matvec(x)))), 2)))))(
    P._smooth(0, jnp.zeros_like(b_), b_, 2)))(M, x1)
cmp("u4 k1-no-post-smooth", got, x_corr)

# u5: post-smooth alone with x_corr input (= pairs E shape, sanity)
got = jax.jit(lambda P, xcr, b_: P._smooth(0, xcr, b_, 2))(M, x_corr, x1)
cmp("u5 post-smooth alone", got, final)

# u6: smooth_l1 then prolong in one program (no add)
ref6 = prol(M, 0, xc)
got = jax.jit(lambda P, rcc: P._mask(0, P._prolong(0, P._mask(
    1, P._smooth(1, jnp.zeros_like(rcc), rcc, 2)))))(M, rc)
cmp("u6 smoothl1+prolong", got, ref6)
