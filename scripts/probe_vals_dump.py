"""Dump the flat per-entry assembly values for the contact problem on the
current backend (axon TPU by default, PROBE_CPU=1 for host CPU), so two runs
can be diffed elementwise to locate where the TPU values diverge from CPU.

Usage:
  python scripts/probe_vals_dump.py /tmp/vals_tpu.npy
  PROBE_CPU=1 python scripts/probe_vals_dump.py /tmp/vals_cpu.npy
  python scripts/probe_vals_cmp.py /tmp/vals_cpu.npy /tmp/vals_tpu.npy
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
out = sys.argv[1]

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

from dolfinx_mpc_tpu.ops.assemble import (
    _bc_masks, _coeff_vectors, _get_compiled_matrix)

dtype = np.float32
cm = _get_compiled_matrix(a, mpc, dtype)
Vt, Vs = a.test_space, a.trial_space
bc_row = jnp.asarray(_bc_masks(Vt, bcs, dtype))
bc_diag = np.zeros(Vt.num_dofs, dtype=dtype)
for b in bcs:
    bc_diag[b.dofs] = 1.0
coeff_vecs = [_coeff_vectors(t.term) for t in cm.terms]
vals = cm.values_fn(
    cm.tables, coeff_vecs, bc_row, bc_row, jnp.asarray(bc_diag),
    jnp.asarray(1.0, dtype=dtype),
)
vals = np.asarray(jax.device_get(vals))
print(f"platform={jax.devices()[0].platform} dofs={V.num_dofs} "
      f"slaves={mpc.num_local_slaves} len={vals.size}", flush=True)
np.save(out, vals)
# the host-known tail expectation, for standalone checking
meta = dict(ndofs=V.num_dofs, nslaves=mpc.num_local_slaves, bc_diag=bc_diag)
np.savez(out + ".meta.npz", **meta)
print("saved", out, flush=True)
