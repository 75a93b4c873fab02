"""Variant test for the TPU monolithic-V-cycle wrongness (arg-passed M).

Known: staged (per-stage jit) and closure-jitted V-cycles are correct on
TPU; the monolithic arg-passed one is deterministically wrong (6.8%% rel).
Variants tried here, all arg-passed and compared against the staged result:
  1. plain monolithic (reproduce)
  2. DMT_NO_PALLAS_SPMV=1 at trace time (XLA SpMV inside the same program)
  3. optimization_barrier around each _vcycle stage (block cross-stage fusion)

Usage: python scripts/probe_bs3_variants.py [n=64]
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

ref = np.load("/tmp/bs3_stage_cpu/z_clo.npy")  # CPU truth


def check(name, z):
    z = np.asarray(z, np.float64)
    d = np.abs(z - ref)
    print(f"{name}: |z|={np.linalg.norm(z):.9e} max|diff-vs-cpu|={d.max():.3e}",
          flush=True)


# 1. plain monolithic arg-passed (reproduce)
check("arg plain", jax.jit(lambda P, r: P(r))(M, x1))

# 2. XLA SpMV inside the same monolithic program
os.environ["DMT_NO_PALLAS_SPMV"] = "1"
check("arg no-pallas-spmv", jax.jit(lambda P, r: P(r))(M, x1))
del os.environ["DMT_NO_PALLAS_SPMV"]


# 3. optimization_barrier between stages
def vcycle_barrier(P, lvl, b):
    if lvl == len(P.ops) - 1:
        return P._coarse_solve(b)
    x = jnp.zeros_like(b)
    x = jax.lax.optimization_barrier(P._smooth(lvl, x, b, P.n_pre))
    r = jax.lax.optimization_barrier(
        P._mask(lvl, b - P.ops[lvl].matvec(x)))
    rc = jax.lax.optimization_barrier(P._mask(lvl + 1, P._restrict(lvl, r)))
    xc = vcycle_barrier(P, lvl + 1, rc)
    x = x + P._mask(lvl, P._prolong(lvl, P._mask(lvl + 1, xc)))
    x = jax.lax.optimization_barrier(x)
    return P._smooth(lvl, x, b, P.n_post)


check("arg barrier", jax.jit(lambda P, r: vcycle_barrier(P, 0, r))(M, x1))

# 4. barrier only around the coarse solve
def vcycle_cbar(P, lvl, b):
    if lvl == len(P.ops) - 1:
        return jax.lax.optimization_barrier(
            P._coarse_solve(jax.lax.optimization_barrier(b)))
    x = jnp.zeros_like(b)
    x = P._smooth(lvl, x, b, P.n_pre)
    r = P._mask(lvl, b - P.ops[lvl].matvec(x))
    rc = P._mask(lvl + 1, P._restrict(lvl, r))
    xc = vcycle_cbar(P, lvl + 1, rc)
    x = x + P._mask(lvl, P._prolong(lvl, P._mask(lvl + 1, xc)))
    return P._smooth(lvl, x, b, P.n_post)


check("arg coarse-barrier", jax.jit(lambda P, r: vcycle_cbar(P, 0, r))(M, x1))
