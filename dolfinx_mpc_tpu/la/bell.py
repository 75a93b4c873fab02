"""Blocked-ELL (BELL) sparse matrix — the TPU fast path for unstructured
operators.

The reference hands unstructured matrices to PETSc MATMPIAIJ, whose CSR
SpMV is a per-scalar gather loop (reference problem.py:585 KSP solve over
assemble_matrix.cpp CSR).  A literal CSR SpMV on TPU
(`la/sparse.py:CSRMatrix.matvec`, gather + segment_sum) costs ~16 ns per
nonzero — 233 ms/it at 14.7M nnz — because every element takes the scalar
gather/scatter path.

BELL trades bytes for vectorization, the TPU-native move: rows are grouped
into blocks of R=8, columns into LANE-ALIGNED tiles of C=128, and every
(row-block, column-tile) pair containing a nonzero stores a dense (R, C)
tile.  The matvec is then pure dense FMA at full VPU width:

    y[b*R + r] = sum_t  data[b, t, r, :] . x[cols[b, t]*C : +C]

For mesh matrices under a locality-preserving dof order (lattice boxes,
RCM) the nonzeros of 8 consecutive rows cluster into ~9-13 aligned runs,
so tile density is 5-10% — ~10-20x CSR bytes but ~25x faster than the
scalar path on TPU (bandwidth-bound at HBM speed instead of latency-bound
per element).

Rows denser than the `mt` tile budget (MPC slave rows coupling to far-away
masters) spill their overflow nonzeros to a COO remainder handled by one
small segment_sum — the irregular 0.1% rides the old path, the regular
99.9% rides the VPU.

Two matvec paths, verified identical in tests/test_bell.py:
 - XLA: row-gather of x tiles + fused multiply-reduce (any backend/dtype)
 - pallas (TPU f32): x resident in VMEM as an (ntiles, C) grid, tile
   windows read with dynamic SUBLANE slices (no lane shifts), data tiles
   streamed from HBM via the grid pipeline, col tile ids scalar-prefetched
   into SMEM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BellMatrix", "bell_from_scipy"]


@jax.tree_util.register_pytree_node_class
class BellMatrix:
    """data: (nblk, mt, R, C) dense tiles; cols: (nblk, mt) int32 column
    TILE indices (padded slots point at tile 0 with zero data);
    diag: (n,) stored at conversion; rem_*: COO overflow."""

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
    def R(self):
        return self.data.shape[2]

    @property
    def C(self):
        return self.data.shape[3]

    @property
    def nnz_stored(self):
        return int(np.prod(self.data.shape)) + int(self.rem_data.shape[0])

    def _x_tiles(self, x):
        """x -> (ntiles, C) zero-padded tile grid."""
        n = self.shape[1]
        C = self.C
        ntc = -(-n // C)
        xp = jnp.pad(x, (0, ntc * C - n))
        return xp.reshape(ntc, C)

    def matvec(self, x):
        n_rows, n = self.shape
        nblk, mt, R, C = self.data.shape
        x2 = self._x_tiles(x)
        use_pallas = (
            self.data.dtype == jnp.float32
            and x.dtype == jnp.float32
            and jax.default_backend() in ("tpu", "axon")
            and x2.shape[0] * C * 4 <= 8 * 2**20  # x must fit in VMEM
            and not os.environ.get("DMT_NO_PALLAS")
        )
        if use_pallas:
            yb = _bell_matvec_pallas(nblk, mt, R, C, x2.shape[0])(
                self.cols, self.data, x2)
        else:
            # row-gather of whole x tiles (C-contiguous), then one fused
            # multiply-reduce — the portable path (CPU tests, big-x fallback)
            xg = x2[self.cols]  # (nblk, mt, C)
            yb = jnp.sum(self.data * xg[:, :, None, :], axis=(1, 3))
        y = yb.reshape(-1)[:n_rows]
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

        nblk, mt, R, C = self.data.shape
        data = np.asarray(self.data)
        cols = np.asarray(self.cols)
        b, t, r, c = np.nonzero(data)
        rows = b * R + r
        ccols = cols[b, t] * C + c
        vals = data[b, t, r, c]
        n_rows, n_cols = self.shape
        ok = (rows < n_rows) & (ccols < n_cols)
        A = sp.coo_matrix((vals[ok], (rows[ok], ccols[ok])), shape=self.shape)
        if self.rem_data.shape[0]:
            A = A + sp.coo_matrix(
                (np.asarray(self.rem_data),
                 (np.asarray(self.rem_rows), np.asarray(self.rem_cols))),
                shape=self.shape)
        return A.tocsr()


@functools.lru_cache(maxsize=32)
def _bell_matvec_pallas(nblk, mt, R, C, ntc, interpret=False):
    """Pallas TPU kernel: grid over row-block groups; data tiles stream
    through the pipeline, x tile-grid stays whole in VMEM, column tile ids
    stream per-step into SMEM.  (Scalar-PREFETCHING the whole cols array
    overflows the 1MB SMEM at contact scale — nblk*mt ints was 4.8MB at
    1M dofs; the blocked SMEM operand is G*mt ints per step.)"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # group G row blocks per program: amortizes grid/step overhead, keeps
    # the per-step data block ~0.5MB for clean double-buffering
    G = 1
    for g in (16, 8, 4, 2, 1):
        if nblk % g == 0:
            G = g
            break

    def kernel(cols_ref, data_ref, x_ref, out_ref):
        for g in range(G):
            acc = jnp.zeros((R, C), jnp.float32)
            for t in range(mt):
                tidx = cols_ref[g, t]
                xs = x_ref[pl.ds(tidx, 1), :]  # (1, C) sublane slice
                acc = acc + data_ref[g, t] * xs
            out_ref[g, :] = jnp.sum(acc, axis=1)

    grid_spec = pl.GridSpec(
        grid=(nblk // G,),
        in_specs=[
            pl.BlockSpec((G, mt), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((G, mt, R, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ntc, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return jax.jit(pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((nblk, R), jnp.float32),
    ))


def bell_from_scipy(A, R=8, C=128, mt_cap=None, mt_quantile=99.0,
                    dtype=np.float32, _bchunk=None):
    """Convert a scipy sparse matrix to BELL.

    mt (tiles per row block) is min(max needed, `mt_cap` or the
    `mt_quantile` percentile of per-block tile counts, rounded up so at
    most ~0.5% of nonzeros spill) — dense outlier rows (MPC masters)
    overflow into the COO remainder instead of inflating every block.
    """
    import scipy.sparse as sp

    A = sp.coo_matrix(A)
    n_rows, n_cols = A.shape
    # round nblk to a multiple of 16 so the pallas grid always has a clean
    # group size (trailing blocks are all-zero rows, sliced off in matvec)
    nblk = -(-(-(-n_rows // R)) // 16) * 16
    ntc = -(-n_cols // C)
    row = A.row.astype(np.int64)
    col = A.col.astype(np.int64)
    val = A.data.astype(dtype)
    blk = row // R
    tile = col // C
    key = blk * ntc + tile
    uniq, inv = np.unique(key, return_inverse=True)
    ub = (uniq // ntc).astype(np.int64)
    ut = (uniq % ntc).astype(np.int32)
    counts = np.bincount(ub, minlength=nblk)
    mt_need = int(counts.max()) if counts.size else 1
    mt = mt_need
    if mt_cap is not None:
        mt = min(mt, int(mt_cap))
    elif (counts > 0).any():  # all-zero matrix: skip (percentile on empty raises)
        mt = min(mt, max(int(np.percentile(counts[counts > 0], mt_quantile)), 1))
    mt = max(mt, 1)
    # rank of each unique tile within its block (uniq is (blk, tile)-sorted)
    first = np.searchsorted(ub, np.arange(nblk))
    slot_u = np.arange(len(uniq)) - first[ub]
    keep_u = slot_u < mt

    cols = np.zeros((nblk, mt), dtype=np.int32)
    cols[ub[keep_u], slot_u[keep_u]] = ut[keep_u]

    keep_e = keep_u[inv]
    slot_e = slot_u[inv]
    # scatter-add via bincount on linear indices (np.add.at is ~20x slower
    # at tens of millions of entries), CHUNKED over block ranges so the
    # float64 bincount target stays ~1 GB instead of nblk*mt*R*C*8 bytes
    # (tens of GB at 1M-dof contact scale)
    lin = (((blk[keep_e] * mt + slot_e[keep_e]) * R + row[keep_e] % R) * C
           + col[keep_e] % C)
    data = np.empty(nblk * mt * R * C, dtype=dtype)
    bchunk = _bchunk or max(1, int(1e9 / (mt * R * C * 8)))
    stride = mt * R * C
    order_l = np.argsort(blk[keep_e], kind="stable")
    lin_s = lin[order_l]
    val_s = val[keep_e][order_l]
    blk_s = blk[keep_e][order_l]
    for b0 in range(0, nblk, bchunk):
        b1 = min(b0 + bchunk, nblk)
        e0, e1 = np.searchsorted(blk_s, [b0, b1])
        seg = np.bincount(lin_s[e0:e1] - b0 * stride,
                          weights=val_s[e0:e1],
                          minlength=(b1 - b0) * stride)
        data[b0 * stride: b1 * stride] = seg
    data = data.reshape(nblk, mt, R, C)

    ov = ~keep_e
    order = np.argsort(row[ov], kind="stable")
    rem_rows = row[ov][order].astype(np.int32)
    rem_cols = col[ov][order].astype(np.int32)
    rem_data = val[ov][order]

    diag = np.asarray(sp.csr_matrix(A).diagonal(), dtype=dtype)
    return BellMatrix(
        jnp.asarray(data), jnp.asarray(cols), jnp.asarray(diag),
        jnp.asarray(rem_data), jnp.asarray(rem_rows), jnp.asarray(rem_cols),
        (n_rows, n_cols),
    )
