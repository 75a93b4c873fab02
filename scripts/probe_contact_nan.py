"""Diagnose the NaN in the f32 AMG+ELL contact solve (chain r3f failure).

Builds the same stacked-cube tied-contact operator as
benchmarks/bench_contact_3D.py at a configurable size, then checks each
stage in isolation on the current backend:
  1. ELL f32 matvec vs scipy f64 (operator correctness on-chip)
  2. AMG V-cycle symmetry <Mu,v> == <u,Mv> in f32 (CG requires SPD M)
  3. V-cycle as a stationary iteration: does ||r|| decay? (divergent
     smoother shows up here without CG in the way)
  4. short CG with per-iteration rz / pAp signs
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("PROBE_CPU"):
    # sitecustomize imports jax with JAX_PLATFORMS=axon; env var alone is
    # too late (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
from dolfinx_mpc_tpu.fem.mesh import Mesh, create_box, meshtags

nb = int(os.environ.get("NB", "16"))
nt = int(os.environ.get("NT", "13"))

bot = create_box((0, 0, 0), (1, 1, 1), (nb, nb, nb))
top = create_box((0, 0, 1), (1, 1, 2), (nt, nt, nt))
mesh = Mesh(
    np.vstack([bot.points, top.points]),
    np.vstack([bot.cells, top.cells + bot.num_points]),
    bot.cell_type,
)
V = dmt.functionspace(mesh, ("Lagrange", 1, (3,)))
fverts, _, f2c = mesh.facets()
on_iface = np.isclose(mesh.points[fverts][:, :, 2], 1.0).all(axis=1)
ext = np.isin(np.arange(fverts.shape[0]), mesh.exterior_facets())
iface = np.flatnonzero(on_iface & ext)
cz = mesh.points[mesh.cells[f2c[iface, 0]]].mean(axis=1)[:, 2]
mt = meshtags(mesh, 2, iface, np.where(cz > 1.0, 1, 2))

mpc = dmt.MultiPointConstraint(V)
mpc.create_contact_inelastic_condition(mt, 1, 2)
mpc.finalize()
bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
tdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 2.0))
bc_top = dmt.dirichletbc(np.array([0.0, 0.0, -0.05]), tdofs, V)
mu, lam = 1.0, 1.25
a = dmt.BilinearForm(
    V, lambda u, v, c: 2 * mu * inner(sym(grad(u)), sym(grad(v)))
    + lam * div(u) * conj(div(v)))
L = dmt.LinearForm(V, lambda v, c: inner(jnp.zeros(3), v))
A = dmt.assemble_matrix(a, mpc, bcs=[bc, bc_top])
b = dmt.assemble_vector(L, mpc)
b = dmt.apply_lifting(b, [a], [[bc, bc_top]], mpc)
b = jnp.asarray(np.asarray(dmt.set_bc(b, [bc, bc_top])))
print(f"dofs={V.num_dofs} slaves={mpc.num_local_slaves}", flush=True)

As = A.to_scipy().tocsr()
n = As.shape[0]
rng = np.random.default_rng(0)

# -- 0. host-side sanity on the assembled operator ----------------------
asym = abs(As - As.T)
d = As.diagonal()
print(f"0. As: nnz={As.nnz} max|A-A^T|={asym.max() if asym.nnz else 0.0:.3e} "
      f"diag range [{d.min():.3e}, {d.max():.3e}] zero-diag={int((d == 0).sum())} "
      f"nonfinite={int((~np.isfinite(As.data)).sum())} "
      f"b finite={bool(np.isfinite(np.asarray(b)).all())} "
      f"||b||={float(np.linalg.norm(np.asarray(b))):.3e}", flush=True)

# -- 1. ELL matvec correctness ------------------------------------------
from dolfinx_mpc_tpu.la.ell import ell_from_scipy

E = ell_from_scipy(As, br=3, k_quantile=99.5, dtype=np.float32)
x = rng.standard_normal(n)
y_ref = As @ x
y_ell = np.asarray(E.matvec(jnp.asarray(x, jnp.float32)), dtype=np.float64)
rel = np.linalg.norm(y_ell - y_ref) / np.linalg.norm(y_ref)
print(f"1. ELL f32 vs scipy f64 rel = {rel:.3e}", flush=True)

# symmetry of the ELL op itself in f32
u = jnp.asarray(rng.standard_normal(n), jnp.float32)
v = jnp.asarray(rng.standard_normal(n), jnp.float32)
uAv = float(jnp.vdot(u, E.matvec(v)))
vAu = float(jnp.vdot(v, E.matvec(u)))
print(f"1b. <u,Av>={uAv:.8e} <v,Au>={vAu:.8e} "
      f"relasym={abs(uAv - vAu) / max(abs(uAv), 1e-30):.3e}", flush=True)

# -- 2. AMG build + symmetry --------------------------------------------
from dolfinx_mpc_tpu.la.amg import smoothed_aggregation_amg

t0 = time.time()
ns = None
if not os.environ.get("PROBE_NO_NULLSPACE"):
    # match bench_contact_3D.py r4: all 6 rigid modes as the near-nullspace
    from dolfinx_mpc_tpu.utils.mpc_utils import rigid_motions_nullspace

    ns = rigid_motions_nullspace(V)
M = smoothed_aggregation_amg(As, bs=3, dtype=np.float32, fine_op=E,
                             nullspace=ns)
print(f"2. AMG levels={len(M.ops) + 1} cheb={[(f'{lo:.3f}', f'{hi:.3f}') for lo, hi in M.cheb]} "
      f"setup={time.time() - t0:.1f}s", flush=True)
Mu = M(u)
Mv = M(v)
uMv = float(jnp.vdot(u, Mv))
vMu = float(jnp.vdot(v, Mu))
print(f"2b. <u,Mv>={uMv:.8e} <v,Mu>={vMu:.8e} "
      f"relasym={abs(uMv - vMu) / max(abs(uMv), 1e-30):.3e} "
      f"finite={bool(jnp.isfinite(Mu).all() and jnp.isfinite(Mv).all())} "
      f"<u,Mu>={float(jnp.vdot(u, Mu)):.3e}", flush=True)

# -- 3. stationary V-cycle iteration ------------------------------------
xk = jnp.zeros_like(b)
for k in range(8):
    r = b - E.matvec(xk)
    print(f"3. stationary it {k}: ||r||={float(jnp.linalg.norm(r)):.6e}", flush=True)
    xk = xk + M(r)

# -- 4. short CG with scalar diagnostics --------------------------------
xc = jnp.zeros_like(b)
r = b - E.matvec(xc)
z = M(r)
p = z
rz = float(jnp.vdot(r, z))
for k in range(60):
    Ap = E.matvec(p)
    pAp = float(jnp.vdot(p, Ap))
    if k % 5 == 0 or pAp <= 0 or not np.isfinite(pAp):
        print(f"4. cg it {k}: rz={rz:.6e} pAp={pAp:.6e} "
              f"||r||={float(jnp.linalg.norm(r)):.6e}", flush=True)
    if not np.isfinite(pAp):
        break
    alpha = rz / pAp
    xc = xc + alpha * p
    r = r - alpha * Ap
    z = M(r)
    rzn = float(jnp.vdot(r, z))
    p = z + (rzn / rz) * p
    rz = rzn
print("done", flush=True)
