"""Stage-level dump of the bs=3 V-cycle to localize the TPU divergence.

probe_bs3_compare showed: operators identical CPU/TPU, fine matvec equal to
1e-7, but M(x1) differs by 6.8%% rel on 95%% of entries when M is passed as a
jit ARGUMENT.  This probe, on the same seeded x1:
  1. applies M as a jit closure constant AND as a jit argument
  2. runs the V-cycle stage by stage (arg-passed), dumping every intermediate
Run on TPU then CPU (PROBE_CPU=1), compare dumps with probe_bs3_compare.py.

Usage: python scripts/probe_bs3_stage.py [n=64] [outdir]
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
outdir = sys.argv[2] if len(sys.argv) > 2 else (
    "/tmp/bs3_stage_" + jax.default_backend())
os.makedirs(outdir, exist_ok=True)
bs = 3
print(f"backend={jax.default_backend()} n={n} outdir={outdir}", flush=True)


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
L = len(ops)
rng = np.random.default_rng(0)
x1 = jnp.asarray(rng.standard_normal(ops[0].shape[0]), jnp.float32)


def dump(name, v):
    v = np.asarray(v, np.float64)
    np.save(f"{outdir}/{name}.npy", v)
    print(f"{name}: |v|={np.linalg.norm(v):.9e}", flush=True)


# 1. closure vs argument apply
z_clo = jax.jit(lambda r: M(r))(x1)
z_arg = jax.jit(lambda P, r: P(r))(M, x1)
dump("z_clo", z_clo)
dump("z_arg", z_arg)
d = np.abs(np.asarray(z_clo, np.float64) - np.asarray(z_arg, np.float64))
print(f"clo-vs-arg: max|diff|={d.max():.3e} "
      f"rel={d.max() / max(np.abs(np.asarray(z_clo)).max(), 1e-300):.3e}",
      flush=True)

# 2. stage-by-stage, arg-passed (mirrors LatticeGMG._vcycle exactly)
smooth = jax.jit(lambda P, lvl, x, b_: P._smooth(lvl, x, b_, 2),
                 static_argnums=1)
matvec = jax.jit(lambda P, lvl, v: P.ops[lvl].matvec(v), static_argnums=1)
restrict = jax.jit(
    lambda P, lvl, r: P._mask(lvl + 1, P._restrict(lvl, P._mask(lvl, r))),
    static_argnums=1)
prolong = jax.jit(lambda P, lvl, xc: P._mask(lvl, P._prolong(
    lvl, P._mask(lvl + 1, xc))), static_argnums=1)
coarse = jax.jit(lambda P, b_: P._coarse_solve(b_))

bs_down = [x1]
xs_pre = []
for lvl in range(L - 1):
    b_l = bs_down[lvl]
    x_pre = smooth(M, lvl, jnp.zeros_like(b_l), b_l)
    dump(f"x_pre_l{lvl}", x_pre)
    r = b_l - matvec(M, lvl, x_pre)
    dump(f"res_l{lvl}", r)
    rc = restrict(M, lvl, r)
    dump(f"rc_l{lvl + 1}", rc)
    xs_pre.append(x_pre)
    bs_down.append(rc)

xc = coarse(M, bs_down[-1])
dump(f"xc_l{L - 1}", xc)
for lvl in range(L - 2, -1, -1):
    x = xs_pre[lvl] + prolong(M, lvl, xc)
    dump(f"x_corr_l{lvl}", x)
    xc = smooth(M, lvl, x, bs_down[lvl])
    dump(f"x_post_l{lvl}", xc)

d = np.abs(np.asarray(xc, np.float64) - np.asarray(z_arg, np.float64))
print(f"staged-vs-arg: max|diff|={d.max():.3e}", flush=True)
