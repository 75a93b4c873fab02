"""Dense spectral analysis of the bs=3 elasticity GMG V-cycle at tiny n.

Materializes A and M = V-cycle as dense matrices on CPU (f32 ops, f64
analysis), restricted to the FREE dofs (mask=1), then reports:
  - symmetry of A and M on the free subspace
  - eigenvalue range of M (SPD required for CG)
  - eigenvalue range and condition number of M^(1/2) A M^(1/2)

Usage: python scripts/probe_bs3_spectrum.py [n=8] [bs=3]
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
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
bs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
print(f"n={n} bs={bs}", flush=True)


def make_problem(m):
    mesh = create_unit_cube(m, m, m)
    if bs == 1:
        V = dmt.functionspace(mesh, ("Lagrange", 1))
        val = 0.0
    else:
        V = dmt.functionspace(mesh, ("Lagrange", 1, (bs,)))
        val = np.zeros(bs)
    bdofs = dmt.locate_dofs_geometrical(
        V, lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 1.0))
    bc = dmt.dirichletbc(val, bdofs, V)
    mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
    mpc.create_periodic_constraint_geometrical(
        V, lambda x: np.isclose(x[0], 1.0),
        lambda x: np.stack([1.0 - x[0], x[1], x[2]]), [bc])
    mu, lam = 1.0, 1.25
    if bs == 1:
        a = dmt.BilinearForm(
            V, lambda u, v, c: inner(grad(u), grad(v)), quad_degree=1)
    else:
        a = dmt.BilinearForm(
            V, lambda u, v, c: 2 * mu * inner(sym(grad(u)), sym(grad(v)))
            + lam * div(u) * conj(div(v)), quad_degree=1)
    return mesh, V, bc, mpc, a


def make_level(lv):
    deg_l, m = lv if isinstance(lv, tuple) else (1, lv)
    _, V_l, bc_l, mpc_l, a_l = make_problem(m)
    mpc_l.finalize()
    return assemble_matrix_lattice(a_l, mpc_l, bcs=[bc_l], dtype=np.float32,
                                   side_format="fold")


ops, masks = build_gmg_hierarchy(make_level, n, 4, min_n=4,
                                 coarse_on_cpu=False)
M = LatticeGMG(ops, free_masks=masks)
A = ops[0]
nd = A.shape[0]
free = np.asarray(masks[0]) > 0
nf = int(free.sum())
print(f"{nd} dofs, {nf} free, levels={len(ops)} coarse={M.coarse_mode} "
      f"omegas={[round(o,3) for o in M.omegas]}", flush=True)

I = jnp.eye(nd, dtype=jnp.float32)
Ad = np.asarray(jax.jit(lambda A_: jax.vmap(A_.matvec)(I))(A), np.float64).T
Md = np.asarray(jax.jit(lambda M_: jax.vmap(M_)(I))(M), np.float64).T

Af = Ad[np.ix_(free, free)]
Mf = Md[np.ix_(free, free)]
print(f"A sym: {np.abs(Af - Af.T).max():.3e}  "
      f"M sym: {np.abs(Mf - Mf.T).max():.3e} (|M|max {np.abs(Mf).max():.3e})",
      flush=True)

Mf_s = 0.5 * (Mf + Mf.T)
wM = np.linalg.eigvalsh(Mf_s)
print(f"eig(M): min={wM[0]:.4e} max={wM[-1]:.4e} "
      f"n_nonpos={(wM <= 0).sum()}", flush=True)

wA = np.linalg.eigvalsh(0.5 * (Af + Af.T))
print(f"eig(A): min={wA[0]:.4e} max={wA[-1]:.4e} "
      f"n_nonpos={(wA <= 0).sum()}", flush=True)

if (wM > 0).all():
    # generalized eigenvalues of M A (similar to M^1/2 A M^1/2)
    L = np.linalg.cholesky(Mf_s)
    S = L.T @ (0.5 * (Af + Af.T)) @ L
    wMA = np.linalg.eigvalsh(0.5 * (S + S.T))
    print(f"eig(M A): min={wMA[0]:.4e} max={wMA[-1]:.4e} "
        f"kappa={wMA[-1]/max(wMA[0],1e-300):.3e}", flush=True)
