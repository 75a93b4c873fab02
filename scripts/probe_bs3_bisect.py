"""Bisect the TPU V-cycle asymmetry (bs=3 elasticity, chain r3d NaN).

Measures, with HOST f64 dots over seeded random vectors:
  1. fine-operator symmetry (pallas + XLA paths)
  2. 2-sweep Jacobi smoother-from-zero symmetry per level
  3. transfer adjointness: <restrict(r), xc>  vs  <r, prolong(xc)> / 2^naxes
  4. coarse dense-solve symmetry
  5. full V-cycle symmetry with pallas on and off

Usage: python scripts/probe_bs3_bisect.py [n=64]   (PROBE_CPU=1 for CPU)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
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


def sym_check(name, f, nn):
    x1 = jnp.asarray(rng.standard_normal(nn), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal(nn), jnp.float32)
    y1 = np.asarray(f(x1), np.float64)
    y2 = np.asarray(f(x2), np.float64)
    h1 = np.asarray(x2, np.float64) @ y1
    h2 = np.asarray(x1, np.float64) @ y2
    print(f"{name}: a={h1:.9e} b={h2:.9e} rel={abs(h1 - h2) / abs(h1):.2e}",
          flush=True)


# 1. per-level operator symmetry
for li, op in enumerate(ops):
    sym_check(f"A l{li} (default path)",
              jax.jit(lambda v, op=op: op.matvec(v)), op.shape[0])

# 2. smoother-from-zero (2 sweeps): linear in b, should be symmetric
for li in range(len(ops)):
    sm = jax.jit(lambda b_, li=li: M._smooth(
        li, jnp.zeros_like(b_), b_, 2))
    sym_check(f"smooth2 l{li}", sm, ops[li].shape[0])

# 3. transfer adjointness: R = 2^k P^T => <Rr, xc> = 2^k <r, P xc>;
#    compare <restrict(r), xc> vs <r, prolong(xc)> * 2^k
for li in range(len(ops) - 1):
    nf, nc = ops[li].shape[0], ops[li + 1].shape[0]
    r = jnp.asarray(rng.standard_normal(nf), jnp.float32)
    xc = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    naxes = sum(1 for a_, b_ in zip(ops[li].dia.vshape, ops[li + 1].dia.vshape)
                if a_ != b_)
    rr = np.asarray(jax.jit(lambda r_: M._restrict(li, r_))(r), np.float64)
    pp = np.asarray(jax.jit(lambda x_: M._prolong(li, x_))(xc), np.float64)
    h1 = rr @ np.asarray(xc, np.float64)
    h2 = (np.asarray(r, np.float64) @ pp) * (2.0 ** naxes)
    print(f"transfer l{li}: <Rr,xc>={h1:.9e} 2^k<r,Pxc>={h2:.9e} "
          f"rel={abs(h1 - h2) / max(abs(h1), 1e-300):.2e}", flush=True)

# 4. coarse solve symmetry
sym_check("coarse dense", jax.jit(M._coarse_solve), ops[-1].shape[0])

# 5. full V-cycle, pallas on/off
sym_check("V-cycle (pallas)", jax.jit(lambda r_: M(r_)), ops[0].shape[0])
os.environ["DMT_NO_PALLAS"] = "1"
sym_check("V-cycle (XLA)", jax.jit(lambda r_: M(r_)), ops[0].shape[0])
del os.environ["DMT_NO_PALLAS"]
