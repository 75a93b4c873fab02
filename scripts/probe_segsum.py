"""Minimal repro: is jax.ops.segment_sum dropping updates on TPU for the
contact assembly's slot array?  Build the identical slots (host-side,
deterministic), feed synthetic values, compare TPU vs CPU/numpy."""

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
from dolfinx_mpc_tpu.ops.assemble import _get_compiled_matrix

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
cm = _get_compiled_matrix(a, mpc, np.float32)
slots = np.asarray(cm.tables["slots"])
nnz = len(cm.pattern.indices)
print(f"slots len={len(slots)} nnz={nnz} dtype={slots.dtype} "
      f"min={slots.min()} max={slots.max()}", flush=True)

rng = np.random.default_rng(0)
vals = rng.standard_normal(len(slots)).astype(np.float32)
# the probe assumes a single dump slot at exactly nnz: an out-of-range slot
# id would be dropped by segment_sum but EXTEND the bincount array, and the
# diff below would then compare misaligned shapes
assert slots.max() <= nnz, (slots.max(), nnz)
# numpy reference in f64
ref = np.bincount(slots, weights=vals.astype(np.float64), minlength=nnz + 1)
out = np.asarray(jax.ops.segment_sum(
    jnp.asarray(vals), jnp.asarray(slots), num_segments=nnz + 1))
diff = np.abs(out - ref)
bad = np.flatnonzero(diff > 1e-3)
print(f"backend={jax.default_backend()} bad segments={len(bad)} "
      f"maxdiff={diff.max():.4e}", flush=True)
if len(bad):
    print("sample bad segs:", bad[:10])
    # how many contributions does each bad segment have, and where do they
    # sit in the flat array?
    order = np.argsort(slots, kind="stable")
    ss = slots[order]
    for s in bad[:5]:
        pos = np.flatnonzero(slots == s)
        print(f"  seg {s}: count={len(pos)} positions={pos[:6]} "
              f"ref={ref[s]:.4f} tpu={out[s]:.4f}")
    # position histogram of all contributions to bad segments
    posns = np.concatenate([np.flatnonzero(slots == s) for s in bad[:200]])
    print("positions of bad-seg contributions: min", posns.min(),
          "max", posns.max(), "of total", len(slots))

