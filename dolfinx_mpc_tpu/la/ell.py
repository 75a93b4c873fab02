"""Block-ELL sparse format for unstructured vector (and scalar) operators.

The TPU-native answer to the reference's blocked PETSc MATAIJ for
elasticity/contact problems (/root/reference/python/benchmarks/
bench_contact_3D.py:186-213 solves them with GAMG over a bs=3 AIJ matrix):
FEM matrices from vector spaces are node-block matrices — every nonzero is
part of a dense bs x bs block coupling two mesh nodes — and the node graph
has a tight degree distribution (p50=p100=15 for P1 tets measured on the
1M-dof stacked-cube contact mesh).

So: pad each node row to a fixed K neighbor blocks and store

    data: (nbr, K, br, bc)   dense blocks (zero-padded slots)
    cols: (nbr, K) int32     block-column indices (padded slots -> 0)

The matvec is gather + multiply + reduce — no scatter, no segment_sum:

    y[n, i] = sum_k sum_j data[n, k, i, j] * x[cols[n, k], j]

measured fill 97% on the contact mesh vs 3.4% for 8x128 BELL tiles
(la/bell.py), whose column-tile padding needed 4.8 GiB for a 177 MB matrix
and RESOURCE_EXHAUSTED'd the 1M-dof contact run.  Rows denser than K (MPC
master rows gain cross-interface couplings) spill whole blocks into a COO
remainder handled by one small segment_sum.

The reduction is written as explicit broadcast-multiply-sum (VPU, full f32)
rather than dot_general: a bs=3 contraction would hit the MXU at bf16
default precision and inject ~4e-3 noise into every CG matvec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BlockEllMatrix", "ell_from_scipy"]


@jax.tree_util.register_pytree_node_class
class BlockEllMatrix:
    """data: (nbr, K, br, bc) node blocks; cols: (nbr, K) int32 block-column
    ids (padded slots point at block-col 0 with zero data); diag: (n,) stored
    at conversion; rem_*: COO overflow for rows denser than K."""

    def __init__(self, data, cols, diag, rem_data, rem_rows, rem_cols, shape):
        self.data = data
        self.cols = cols
        self.diag = diag
        self.rem_data = rem_data
        self.rem_rows = rem_rows
        self.rem_cols = rem_cols
        self.shape = shape

    def tree_flatten(self):
        ch = (self.data, self.cols, self.diag, self.rem_data, self.rem_rows,
              self.rem_cols)
        return ch, (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, aux[0])

    @property
    def br(self):
        return self.data.shape[2]

    @property
    def bc(self):
        return self.data.shape[3]

    @property
    def nnz_stored(self):
        return int(np.prod(self.data.shape)) + int(self.rem_data.shape[0])

    def matvec(self, x):
        n_rows, n_cols = self.shape
        nbr, K, br, bc = self.data.shape
        nbc = -(-n_cols // bc)
        xp = jnp.pad(x, (0, nbc * bc - n_cols)).reshape(nbc, bc)
        xg = xp[self.cols]  # (nbr, K, bc) gather of whole node vectors
        # broadcast-multiply-sum on the VPU (full f32; see module docstring)
        y = jnp.sum(self.data * xg[:, :, None, :], axis=(1, 3))  # (nbr, br)
        y = y.reshape(-1)[:n_rows]
        if self.rem_data.shape[0]:
            y = y + jax.ops.segment_sum(
                self.rem_data * x[self.rem_cols], self.rem_rows,
                num_segments=n_rows, indices_are_sorted=True)
        return y

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self):
        return self.diag

    def to_scipy(self):
        import scipy.sparse as sp

        nbr, K, br, bc = self.data.shape
        n_rows, n_cols = self.shape
        data = np.asarray(self.data)
        cols = np.asarray(self.cols)
        rr = (np.arange(nbr)[:, None, None, None] * br
              + np.arange(br)[None, None, :, None])
        cc = (cols[:, :, None, None] * bc + np.arange(bc)[None, None, None, :])
        rr, cc = np.broadcast_to(rr, data.shape), np.broadcast_to(cc, data.shape)
        keep = (rr < n_rows) & (cc < n_cols)
        A = sp.coo_matrix((data[keep], (rr[keep], cc[keep])),
                          shape=self.shape)
        if self.rem_data.shape[0]:
            A = A + sp.coo_matrix(
                (np.asarray(self.rem_data),
                 (np.asarray(self.rem_rows), np.asarray(self.rem_cols))),
                shape=self.shape)
        A = sp.csr_matrix(A)
        A.eliminate_zeros()
        return A


def ell_from_scipy(A, br=1, bc=None, k_cap=None, k_quantile=100.0,
                   dtype=np.float32):
    """Convert a scipy sparse matrix to block-ELL with br x bc blocks.

    K (blocks per block-row) is min(max needed, `k_cap` or the `k_quantile`
    percentile of per-row block counts); spilled blocks land in the COO
    remainder.  Rows/cols need not divide br/bc (trailing partial block is
    zero-padded)."""
    import scipy.sparse as sp

    bc = br if bc is None else bc
    diag = np.asarray(sp.csr_matrix(A).diagonal(), dtype=dtype)
    A = sp.coo_matrix(A)
    A.sum_duplicates()
    n_rows, n_cols = A.shape
    nbr = -(-n_rows // br)
    nbc = -(-n_cols // bc)
    row = A.row.astype(np.int64)
    col = A.col.astype(np.int64)
    val = A.data.astype(dtype)
    brow = row // br
    bcol = col // bc
    key = brow * nbc + bcol
    uniq, inv = np.unique(key, return_inverse=True)
    ub = uniq // nbc
    ucol = (uniq % nbc).astype(np.int32)
    counts = np.bincount(ub, minlength=nbr)
    K = int(counts.max()) if counts.size and counts.max() > 0 else 1
    if k_cap is not None:
        K = min(K, int(k_cap))
    elif k_quantile < 100.0 and (counts > 0).any():
        K = min(K, max(int(np.percentile(counts[counts > 0], k_quantile)), 1))
    K = max(K, 1)
    # rank of each unique block within its row (uniq is (brow, bcol)-sorted)
    first = np.searchsorted(ub, np.arange(nbr))
    slot_u = np.arange(len(uniq)) - first[ub]
    keep_u = slot_u < K
    cols = np.zeros((nbr, K), dtype=np.int32)
    cols[ub[keep_u], slot_u[keep_u]] = ucol[keep_u]

    keep_e = keep_u[inv]
    slot_e = slot_u[inv]
    lin = (((brow[keep_e] * K + slot_e[keep_e]) * br + row[keep_e] % br) * bc
           + col[keep_e] % bc)
    size = nbr * K * br * bc
    if np.iscomplexobj(val):
        data = (np.bincount(lin, weights=val[keep_e].real, minlength=size)
                + 1j * np.bincount(lin, weights=val[keep_e].imag,
                                   minlength=size)).astype(dtype)
    else:
        data = np.bincount(lin, weights=val[keep_e].astype(np.float64),
                           minlength=size).astype(dtype)
    data = data.reshape(nbr, K, br, bc)

    ov = ~keep_e
    order = np.argsort(row[ov], kind="stable")
    rem_rows = row[ov][order].astype(np.int32)
    rem_cols = col[ov][order].astype(np.int32)
    rem_data = val[ov][order]
    return BlockEllMatrix(
        jnp.asarray(data), jnp.asarray(cols), jnp.asarray(diag),
        jnp.asarray(rem_data), jnp.asarray(rem_rows), jnp.asarray(rem_cols),
        (n_rows, n_cols),
    )
