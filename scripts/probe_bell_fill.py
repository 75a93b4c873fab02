"""Measure BELL (R=8,C=128) padding for the contact elasticity sparsity.

Builds the node-adjacency pattern of the stacked-cube contact mesh from
cells alone (no assembly), expands bs=3, and reports the per-block
tile-count distribution + projected BELL data bytes — to size the fix for
the contact-1M RESOURCE_EXHAUSTED (chain r3d, bell_from_scipy OOM).
"""
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, "/root/repo")
from dolfinx_mpc_tpu.fem.mesh import Mesh, create_box

nb = int(sys.argv[1]) if len(sys.argv) > 1 else 58
nt = int(sys.argv[2]) if len(sys.argv) > 2 else 50
bs, R, C = 3, 8, 128

bot = create_box((0, 0, 0), (1, 1, 1), (nb, nb, nb))
top = create_box((0, 0, 1), (1, 1, 2), (nt, nt, nt))
mesh = Mesh(np.vstack([bot.points, top.points]),
            np.vstack([bot.cells, top.cells + bot.num_points]),
            bot.cell_type)
cells = mesh.cells
nn = mesh.points.shape[0]
# node adjacency: all pairs within a cell
nv = cells.shape[1]
ii = np.repeat(cells, nv, axis=1).ravel()
jj = np.tile(cells, (1, nv)).ravel()
G = sp.coo_matrix((np.ones_like(ii, np.int8), (ii, jj)), shape=(nn, nn)).tocsr()
G.sum_duplicates()
nnz_node = G.nnz
print(f"nodes={nn} node-nnz={nnz_node} ({nnz_node/nn:.1f}/node) "
      f"dof-nnz={nnz_node*bs*bs/1e6:.1f}M rows={nn*bs}")

# expand to dof pattern implicitly: row r=node*3+c has cols node_j*3+{0,1,2}
# tile membership per (block, tile): block=r//8, tile=col//128
Gc = G.tocoo()
rn = np.repeat(Gc.row, bs * bs)
cn = np.repeat(Gc.col, bs * bs)
comp = np.tile(np.arange(bs * bs), Gc.nnz)
rows = rn * bs + comp // bs
cols = cn * bs + comp % bs
blk = rows // R
tile = cols // C
key = blk.astype(np.int64) * ((nn * bs + C - 1) // C) + tile
uniq = np.unique(key)
ub = uniq // ((nn * bs + C - 1) // C)
nblk = nn * bs // R + 1
counts = np.bincount(ub.astype(np.int64), minlength=nblk)
pct = np.percentile(counts[counts > 0], [50, 90, 99, 100])
for q, v in zip([50, 90, 99, 100], pct):
    print(f"  tiles/block p{q}: {v:.0f}")
nnz_dof = rows.shape[0]
for mt in [int(pct[2]), int(pct[1]), 8, 4]:
    bytes_ = nblk * mt * R * C * 4
    cov = np.minimum(counts, mt).sum() / max(counts.sum(), 1)
    print(f"  mt={mt}: data={bytes_/2**30:.2f} GiB, fill={nnz_dof/ (nblk*mt*R*C):.3f}, "
          f"tile-coverage={cov:.3f}")
# block-ELL (3x3 blocks, per-node ELL) comparison
deg = np.diff(G.indptr)
for q in [99, 100]:
    k = int(np.percentile(deg, q))
    print(f"  block-ELL k=p{q}({k}): data={nn*k*9*4/2**30:.2f} GiB "
          f"idx={nn*k*4/2**30:.2f} GiB fill={nnz_node/ (nn*k):.3f}")
