"""Dump the assembled contact CSR (data/indices/indptr) for the current
backend to NPZ so TPU vs CPU runs can be diffed entry-wise.

env: OUT=<npz path>, PROBE_CPU=1 to force the CPU backend, NB/NT sizes.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

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
mpc = dmt.MultiPointConstraint(V)
mpc.create_contact_inelastic_condition(mt, 1, 2)
mpc.finalize()
mu, lam = 1.0, 1.25
a = dmt.BilinearForm(
    V, lambda u, v, c: 2 * mu * inner(sym(grad(u)), sym(grad(v)))
    + lam * div(u) * conj(div(v)))
bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
tdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 2.0))
bc_top = dmt.dirichletbc(np.array([0.0, 0.0, -0.05]), tdofs, V)
A = dmt.assemble_matrix(a, mpc, bcs=[bc, bc_top])
As = A.to_scipy().tocsr()
As.sort_indices()
out = os.environ.get("OUT", "/tmp/contact_csr.npz")
np.savez(out, data=As.data, indices=As.indices, indptr=As.indptr,
         shape=np.array(As.shape), slaves=np.asarray(A.mpc.slaves if hasattr(A, "mpc") else []))
print("saved", out, "nnz", As.nnz, "backend", jax.default_backend(), flush=True)
