"""Bisect the TPU assembly of the nb=24/nt=20 contact operator: full path
vs DMT_NO_PALLAS=1 vs CPU reference diag (set env before running)."""

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
a = dmt.BilinearForm(
    V, lambda u, v, c: 2 * mu * inner(sym(grad(u)), sym(grad(v)))
    + lam * div(u) * conj(div(v)))
bdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 0.0))
bc = dmt.dirichletbc(np.array([0.0, 0.0, 0.0]), bdofs, V)
tdofs = dmt.locate_dofs_geometrical(V, lambda x: np.isclose(x[2], 2.0))
bc_top = dmt.dirichletbc(np.array([0.0, 0.0, -0.05]), tdofs, V)

for tag, env in (("full", None), ("no-pallas", "1")):
    if env is None:
        os.environ.pop("DMT_NO_PALLAS", None)
    else:
        os.environ["DMT_NO_PALLAS"] = env
    A = dmt.assemble_matrix(a, mpc, bcs=[bc, bc_top])
    d = np.asarray(A.to_scipy().tocsr().diagonal())
    print(f"{tag}: zero-diag={int((d == 0).sum())} neg-diag={int((d < 0).sum())} "
          f"min={d.min():.4e} max={d.max():.4e}", flush=True)
