"""TPU-side instrumentation for the bs=3 elasticity GMG-CG failure.

Builds the exact bench problem (BENCH_BS=3, n configurable), then:
  1. dumps the assembled fine DIA data + coarse dense operator to .npy
  2. checks fine-operator and V-cycle symmetry with HOST f64 dots
  3. runs segmented CG printing (its, rnorm, rz, pAp) per segment so the
     NaN iteration and the quantity that blows up are visible

Run on TPU (default backend) and on CPU (JAX_PLATFORMS=cpu) with the same
args; compare /tmp/bs3_dump_{tpu,cpu}/*.npy.

Usage: python scripts/probe_bs3_tpu.py [n=64] [outdir]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

if os.environ.get("PROBE_CPU"):  # sitecustomize pins JAX_PLATFORMS=axon;
    jax.config.update("jax_platforms", "cpu")  # env overrides don't work
import jax.numpy as jnp

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
from dolfinx_mpc_tpu.fem.mesh import create_unit_cube
from dolfinx_mpc_tpu.ops.lattice import assemble_matrix_lattice

n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
outdir = sys.argv[2] if len(sys.argv) > 2 else (
    "/tmp/bs3_dump_" + jax.default_backend())
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
print(f"{V.num_dofs} dofs, lean={A._lean}", flush=True)

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
print(f"levels={len(ops)} coarse={M.coarse_mode} omegas={M.omegas}",
      flush=True)
np.save(f"{outdir}/coarse_inv.npy", np.asarray(M.coarse_inv, np.float64))
for li, op in enumerate(ops):
    np.save(f"{outdir}/dia_data_l{li}.npy", np.asarray(op.dia.data))

# --- host-f64 symmetry checks (no device dots involved) ------------------
rng = np.random.default_rng(0)
nf = ops[0].shape[0]
mv = jax.jit(lambda Ao, v: Ao.matvec(v))
apply_M = jax.jit(lambda P, r: P(r))
x1 = jnp.asarray(rng.standard_normal(nf), jnp.float32)
x2 = jnp.asarray(rng.standard_normal(nf), jnp.float32)
y1 = np.asarray(mv(ops[0], x1), np.float64)
y2 = np.asarray(mv(ops[0], x2), np.float64)
h1, h2 = np.asarray(x2, np.float64) @ y1, np.asarray(x1, np.float64) @ y2
print(f"A sym: x2.Ax1={h1:.9e} x1.Ax2={h2:.9e} rel={abs(h1-h2)/abs(h1):.2e}",
      flush=True)
z1 = np.asarray(apply_M(M, x1), np.float64)
z2 = np.asarray(apply_M(M, x2), np.float64)
m1, m2 = np.asarray(x2, np.float64) @ z1, np.asarray(x1, np.float64) @ z2
print(f"M sym: x2.Mx1={m1:.9e} x1.Mx2={m2:.9e} rel={abs(m1-m2)/abs(m1):.2e}; "
      f"PD: x1.Mx1={np.asarray(x1, np.float64) @ z1:.3e} "
      f"x2.Mx2={np.asarray(x2, np.float64) @ z2:.3e}", flush=True)
np.save(f"{outdir}/Ax1.npy", y1)
np.save(f"{outdir}/Mx1.npy", z1)

# --- segmented CG with per-segment state dump -----------------------------
n0, n1, n2 = A.vshape
ii = jnp.arange(n0, dtype=jnp.float32)[:, None, None] / n0
jj = jnp.arange(n1, dtype=jnp.float32)[None, :, None] / n1
kk = jnp.arange(n2, dtype=jnp.float32)[None, None, :] / n2
pat = jnp.sin(np.pi * ii) * jnp.sin(np.pi * jj) * jnp.sin(2 * np.pi * kk)
u0 = jnp.moveaxis(pat[None] * A._keep_grid, 0, -1).reshape(-1)
b = mv(ops[0], u0)


@jax.jit
def seg10(Ao, Mo, state):
    def body(_, s):
        x, r, z, p, rz = s
        Ap = Ao.matvec(p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        z = Mo(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new)

    s = jax.lax.fori_loop(0, 10, body, state)
    # also return the diagnostic scalars of the LAST iteration
    x, r, z, p, rz = s
    Ap = Ao.matvec(p)
    return s, (jnp.linalg.norm(r), rz, jnp.vdot(p, Ap))


x = jnp.zeros_like(b)
r = b - mv(ops[0], x)
z = apply_M(M, r)
state = (x, r, z, z, jnp.vdot(r, z))
bn = float(jnp.linalg.norm(b))
print(f"|b|={bn:.6e}", flush=True)
for s_i in range(40):
    state, (rn, rz, pAp) = seg10(ops[0], M, state)
    rn, rz, pAp = float(rn), float(rz), float(pAp)
    print(f"it={10*(s_i+1):4d} rnorm={rn:.6e} rel={rn/bn:.3e} "
          f"rz={rz:.6e} pAp={pAp:.6e}", flush=True)
    if not np.isfinite(rn):
        np.save(f"{outdir}/x_at_nan.npy", np.asarray(state[0]))
        np.save(f"{outdir}/r_at_nan.npy", np.asarray(state[1]))
        break
    if rn / bn < 1e-6:
        print("converged", flush=True)
        break
