"""Bisect the TPU assembly of the nb=24/nt=20 contact operator: accelerator
backend vs local-CPU backend of the SAME unstructured slot-CSR assembler.

Note (ADVICE r3): the unstructured path (ops/assemble.py) is XLA-only — it
has no pallas branch, so a DMT_NO_PALLAS toggle is a no-op here (it only
affects lattice/BELL paths), and the compiled kernel is cached on the form
keyed by (constraint ids, dtype), so each pass below rebuilds the
BilinearForm to guarantee the toggled code path is actually retraced."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

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
mpc = dmt.MultiPointConstraint(V)
mpc.create_contact_inelastic_condition(mt, 1, 2)
mpc.finalize()
mu, lam = 1.0, 1.25
bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
tdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 2.0))
bc_top = dmt.dirichletbc(np.array([0.0, 0.0, -0.05]), tdofs, V)

import contextlib

diags = {}
for tag, ctx in (("accel", contextlib.nullcontext()),
                 ("cpu", jax.default_device(jax.devices("cpu")[0]))):
    # fresh form per pass: the compiled kernel is cached ON the form, so a
    # shared form would silently reuse the first pass's program
    a = dmt.BilinearForm(
        V, lambda u, v, c: 2 * mu * inner(sym(grad(u)), sym(grad(v)))
        + lam * div(u) * conj(div(v)))
    with ctx:
        A = dmt.assemble_matrix(a, mpc, bcs=[bc, bc_top])
    d = np.asarray(A.to_scipy().tocsr().diagonal())
    diags[tag] = d
    print(f"{tag}: zero-diag={int((d == 0).sum())} neg-diag={int((d < 0).sum())} "
          f"min={d.min():.4e} max={d.max():.4e}", flush=True)
rel = (np.abs(diags["accel"] - diags["cpu"]).max()
       / max(np.abs(diags["cpu"]).max(), 1e-30))
print(f"accel-vs-cpu diag rel diff: {rel:.3e}", flush=True)
