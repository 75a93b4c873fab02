"""Repro probe for the bs=3 elasticity GMG-CG NaN (chain r3d, n=64, f32 TPU).

Replicates bench.py's BENCH_BS=3 problem on the CPU backend in f32 and
inspects the V-cycle preconditioner: coarse spectrum, inverse magnitude,
PD-ness of M (r^T M r over random vectors), and the CG trajectory.

Usage: python scripts/probe_bs3_gmg.py [n=32]
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
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
bs = 3


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
print(f"n={n}: {V.num_dofs} dofs, lean={A._lean}")

from dolfinx_mpc_tpu.la.gmg import (LatticeGMG, build_gmg_hierarchy,
                                    dense_coarse_inverse)


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
print(f"levels={len(ops)} coarse={M.coarse_mode} omegas={M.omegas} "
      f"bounds={M._bounds}")

# coarse spectrum
Ac = ops[-1]
nd = Ac.shape[0]
C = np.asarray(jax.vmap(Ac.matvec)(jnp.eye(nd, dtype=jnp.float32)), np.float64)
sym_err = np.abs(C - C.T).max() / np.abs(C).max()
w = np.linalg.eigvalsh(0.5 * (C + C.T))
print(f"coarse {nd}x{nd}: sym_err={sym_err:.2e} eig[min,max]=[{w[0]:.3e},"
      f" {w[-1]:.3e}] cond={w[-1] / max(w[0], 1e-300):.3e}")
inv = np.asarray(M.coarse_inv, np.float64) if M.coarse_inv is not None else None
if inv is not None:
    print(f"coarse_inv max|entry|={np.abs(inv).max():.3e}")

# PD-ness of the V-cycle operator M in f32
apply_M = jax.jit(lambda P, r: P(r))
rng = np.random.default_rng(0)
nf = ops[0].shape[0]
quad, asym = [], 0.0
z_store = []
for k in range(4):
    r = jnp.asarray(rng.standard_normal(nf), jnp.float32)
    z = apply_M(M, r)
    quad.append(float(r @ z))
    z_store.append((r, z))
for i in range(len(z_store)):
    for j in range(i + 1, len(z_store)):
        ri, zi = z_store[i]
        rj, zj = z_store[j]
        a1, a2 = float(rj @ zi), float(ri @ zj)
        asym = max(asym, abs(a1 - a2) / max(abs(a1), 1e-30))
print(f"M quad forms (must be >0): {['%.3e' % q for q in quad]}; "
      f"max asym={asym:.2e}")

# CG trajectory with NaN watch (bench.py's manufactured RHS: b = A u0)
from dolfinx_mpc_tpu.la.solvers import cg

n0, n1, n2 = A.vshape
ii = jnp.arange(n0, dtype=jnp.float32)[:, None, None] / n0
jj = jnp.arange(n1, dtype=jnp.float32)[None, :, None] / n1
kk = jnp.arange(n2, dtype=jnp.float32)[None, None, :] / n2
pat = jnp.sin(np.pi * ii) * jnp.sin(np.pi * jj) * jnp.sin(2 * np.pi * kk)
u0 = jnp.moveaxis(pat[None] * A._keep_grid, 0, -1).reshape(-1)
b = jax.jit(lambda A_, u: A_.matvec(u))(ops[0], u0)
x, its, rnorm = cg(ops[0].matvec, b, M=M, rtol=1e-6, max_it=500)
print(f"CG its={int(its)} rnorm={float(rnorm):.3e} "
      f"finite={bool(np.isfinite(np.asarray(x)).all())}")

# simulate the TPU MXU's bf16 multiply in the coarse solve: if THIS is what
# NaN'd the n=64 TPU run, the bf16-rounded inverse should reproduce the
# divergence here on CPU
if M.coarse_inv is not None:
    M2 = LatticeGMG(ops, free_masks=masks, bounds=M._bounds,
                    coarse_inv=M.coarse_inv.astype(jnp.bfloat16).astype(jnp.float32))
    x2, its2, rn2 = cg(ops[0].matvec, b, M=M2, rtol=1e-6, max_it=500)
    print(f"CG (bf16-rounded coarse inv): its={int(its2)} rnorm={float(rn2):.3e} "
          f"finite={bool(np.isfinite(np.asarray(x2)).all())}")

# exact MXU model: BOTH operands rounded to bf16, products/accum in f32 —
# the b-rounding makes M nonlinear across CG iterations
if M.coarse_inv is not None:
    import types

    M3 = LatticeGMG(ops, free_masks=masks, bounds=M._bounds,
                    coarse_inv=M.coarse_inv.astype(jnp.bfloat16).astype(jnp.float32))

    def mxu_coarse(self, b):
        bb = b.astype(jnp.bfloat16).astype(jnp.float32)
        return self.coarse_inv @ bb

    M3._coarse_solve = types.MethodType(mxu_coarse, M3)
    x3, its3, rn3 = cg(ops[0].matvec, b, M=M3, rtol=1e-6, max_it=500)
    print(f"CG (full MXU bf16 model): its={int(its3)} rnorm={float(rn3):.3e} "
          f"finite={bool(np.isfinite(np.asarray(x3)).all())}")
