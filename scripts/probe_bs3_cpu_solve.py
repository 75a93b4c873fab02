"""Does bs=3 elasticity GMG-CG converge AT ALL (CPU, exact arithmetic)?

Same problem as bench.py BENCH_BS=3: unit cube, vector P1 elasticity,
Dirichlet y-faces, periodic x, GMG hierarchy like the bench.  Runs CG with
GMG and with Jacobi at f32 and (optionally) f64 on CPU and prints its/rnorm.

Usage: python scripts/probe_bs3_cpu_solve.py [n=32] [levels=4]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.la.gmg import LatticeGMG, build_gmg_hierarchy
from dolfinx_mpc_tpu.la.solvers import cg, jacobi_preconditioner
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
nlev = int(sys.argv[2]) if len(sys.argv) > 2 else 4
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
print(f"{V.num_dofs} dofs", flush=True)


def make_level(lv):
    deg_l, m = lv if isinstance(lv, tuple) else (1, lv)
    if m == n:
        return A
    _, V_l, bc_l, mpc_l, a_l = make_problem(m)
    mpc_l.finalize()
    return assemble_matrix_lattice(a_l, mpc_l, bcs=[bc_l], dtype=np.float32,
                                   side_format="fold")


ops, masks = build_gmg_hierarchy(make_level, n, nlev, min_n=8,
                                 coarse_on_cpu=True)
Aop = ops[0]
M = LatticeGMG(ops, free_masks=masks)
print(f"levels={len(ops)} coarse={M.coarse_mode} omegas={M.omegas}",
      flush=True)

n0, n1, n2 = A.vshape
ii = jnp.arange(n0, dtype=jnp.float32)[:, None, None] / n0
jj = jnp.arange(n1, dtype=jnp.float32)[None, :, None] / n1
kk = jnp.arange(n2, dtype=jnp.float32)[None, None, :] / n2
pat = jnp.sin(np.pi * ii) * jnp.sin(np.pi * jj) * jnp.sin(2 * np.pi * kk)
u0 = jnp.moveaxis(pat[None] * A._keep_grid, 0, -1).reshape(-1)
b = jax.jit(lambda A_, u: A_.matvec(u))(Aop, u0)


@jax.jit
def solve(A_, M_, b_, rtol, max_it):
    return cg(A_.matvec, b_, M=M_, rtol=rtol, atol=1e-12, max_it=max_it)


x, its, rn = solve(Aop, M, b, 1e-6, 3000)
err = float(jnp.linalg.norm(x - u0) / jnp.linalg.norm(u0))
print(f"GMG-CG f32: its={int(its)} rnorm={float(rn):.2e} err-vs-u0={err:.2e}",
      flush=True)

Mj = jacobi_preconditioner(Aop.diagonal())
xj, itsj, rnj = jax.jit(
    lambda A_, M_, b_: cg(A_.matvec, b_, M=M_, rtol=1e-6, atol=1e-12,
                          max_it=3000))(Aop, Mj, b)
errj = float(jnp.linalg.norm(xj - u0) / jnp.linalg.norm(u0))
print(f"Jacobi-CG f32: its={int(itsj)} rnorm={float(rnj):.2e} "
      f"err-vs-u0={errj:.2e}", flush=True)
