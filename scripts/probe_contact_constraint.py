"""Which dofs lose their diagonal at nb=24/nt=20? Inspect the contact
constraint: masters per slave, coefficient sums, and who the zero-diag rows
are (slave / master / interface / interior)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

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

mpc = dmt.MultiPointConstraint(V)
mpc.create_contact_inelastic_condition(mt, 1, 2)
mpc.finalize()
f = mpc.finalized
slaves = np.asarray(f.slaves)
masters = np.asarray(f.masters_padded if hasattr(f, "masters_padded") else f.masters)
coeffs = np.asarray(f.coeffs_padded if hasattr(f, "coeffs_padded") else f.coeffs)
print(f"dofs={V.num_dofs} slaves={len(slaves)}")
print("attrs:", [a for a in dir(f) if not a.startswith("_")][:30])
print("masters shape", masters.shape, "coeffs shape", coeffs.shape)
# per-slave coefficient sums (inelastic contact: interpolation weights,
# should sum to ~1 per component)
csum = coeffs.sum(axis=-1) if coeffs.ndim > 1 else None
if csum is not None:
    print("coeff sums: min", csum.min(), "max", csum.max(),
          "n<0.5:", int((csum < 0.5).sum()), "n>1.5:", int((csum > 1.5).sum()))
    bad = np.flatnonzero((csum < 0.5) | (csum > 1.5))
    print("bad slaves:", bad[:10], "of", len(bad))
    if len(bad):
        pts = mesh.points  # dof -> node = dof//3
        for s in bad[:8]:
            sd = slaves[s]
            print(f"  slave dof {sd} node xyz {pts[sd // 3]} csum {csum[s]:.4f} "
                  f"coeffs {coeffs[s][:8]} masters {masters[s][:8]}")

# zero-diag rows of the assembled operator
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
d = As.diagonal()
z = np.flatnonzero(d == 0)
neg = np.flatnonzero(d < 0)
print(f"zero-diag={len(z)} neg-diag={len(neg)}")
pts = mesh.points
sset = set(slaves.tolist())
mset = set(masters.ravel().tolist())
for name, idx in (("zero", z[:12]), ("neg", neg[:12])):
    for dof in idx:
        node = dof // 3
        print(f"  {name}-diag dof {dof} node {node} xyz {pts[node]} "
              f"slave={dof in sset} master={dof in mset}")
print("zero-diag z-coords histogram:",
      np.unique(np.round(pts[z // 3][:, 2], 3), return_counts=True) if len(z) else "-")
