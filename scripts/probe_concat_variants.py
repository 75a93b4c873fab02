"""Check both assembly value paths for the r4 corrupted-tail TPU bug on the
real NB=24/NT=20 contact problem:

  1. values_fn — the flat concatenate (diagnostic-only; XLA:TPU miscompiles
     the final bc-diag passthrough operand at this size: 15519/74658 wrong,
     and optimization_barrier does not help)
  2. assemble_fn — the production per-block scatter (the r4 fix): assembles
     the matrix and checks for the zero/negative diagonals the concat bug
     caused.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp

import dolfinx_mpc_tpu as dmt
from dolfinx_mpc_tpu.fem.forms import conj, div, grad, inner, sym
from dolfinx_mpc_tpu.fem.mesh import Mesh, create_box, meshtags

nb = int(os.environ.get("NB", "24"))
nt = int(os.environ.get("NT", "20"))

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

mpc = dmt.MultiPointConstraint(V, dtype=np.float32)
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
bcs = [bc, bc_top]

from dolfinx_mpc_tpu.ops import assemble as asm

dtype = np.float32
cm = asm._get_compiled_matrix(a, mpc, dtype)
Vt = a.test_space
bc_row = jnp.asarray(asm._bc_masks(Vt, bcs, dtype))
bc_diag_np = np.zeros(Vt.num_dofs, dtype=dtype)
for b_ in bcs:
    bc_diag_np[b_.dofs] = 1.0
bc_diag = jnp.asarray(bc_diag_np)
coeff_vecs = [asm._coeff_vectors(t.term) for t in cm.terms]
dv = jnp.asarray(1.0, dtype=dtype)
nd, ns = Vt.num_dofs, mpc.num_local_slaves
print(f"platform={jax.devices()[0].platform} dofs={nd} slaves={ns}", flush=True)

# 1. the concatenated values path (diagnostic-only; miscompiled on TPU)
vals = cm.values_fn(cm.tables, coeff_vecs, bc_row, bc_row, bc_diag, dv)
tail = np.asarray(vals[-nd:])
print("1 values_fn (concat): tail bad =",
      int((np.abs(tail - bc_diag_np) > 1e-6).sum()), "/", nd, flush=True)

# 2. the production per-block scatter path: diag stats of the assembled
#    matrix — zero or negative diagonals mean corruption
A = dmt.assemble_matrix(a, mpc, bcs=bcs, dtype=dtype)
d = A.to_scipy().tocsr().diagonal()
print(f"2 assemble_fn (per-block scatter): zero-diag={int((d == 0).sum())} "
      f"neg-diag={int((d < 0).sum())} "
      f"range=[{d.min():.3e}, {d.max():.3e}]", flush=True)
