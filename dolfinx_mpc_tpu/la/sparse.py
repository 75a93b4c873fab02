"""Sparse matrices: slot-based CSR built from static sparsity patterns.

TPU-native replacement for PETSc Mat + dolfinx la::SparsityPattern
(/root/reference/cpp/utils.h:141-173, 277-496).  Instead of dynamic
`MatSetValuesLocal` insertion, the sparsity is computed ONCE on the host and
each scattered element entry gets a precomputed *slot* into the CSR data
array; assembly is then a single `segment_sum` — fully jittable, static
shapes, no atomics.  Entry slot `nnz` is a trash slot for padded entries.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SlotPattern", "CSRMatrix", "build_slot_pattern"]


@dataclass
class SlotPattern:
    """Static CSR sparsity + per-scattered-entry slot map.

    indptr: (n_rows+1,), indices: (nnz,) — CSR structure.
    slots: list of int32 arrays, one per scatter batch registered at build
    time, mapping each flattened (row, col) entry to its CSR slot (or nnz for
    padded/invalid entries).
    """

    shape: tuple
    indptr: np.ndarray
    indices: np.ndarray
    slots: list
    row_ids: np.ndarray  # (nnz,) row of each stored entry — for SpMV

    @property
    def nnz(self) -> int:
        return self.indices.shape[0]


def build_slot_pattern(shape, batches, valid_masks=None) -> SlotPattern:
    """Build CSR + slots from scatter batches.

    batches: list of (rows, cols) int arrays of equal shape (flattened
    internally).  valid_masks: optional per-batch bool arrays; invalid entries
    map to the trash slot.
    """
    n_rows, n_cols = shape
    flat = []
    for bi, (r, c) in enumerate(batches):
        r = np.asarray(r).ravel().astype(np.int64)
        c = np.asarray(c).ravel().astype(np.int64)
        if valid_masks is not None and valid_masks[bi] is not None:
            m = np.asarray(valid_masks[bi]).ravel()
            r = np.where(m, r, -1)
            c = np.where(m, c, -1)
        flat.append((r, c))
    all_r = np.concatenate([f[0] for f in flat])
    all_c = np.concatenate([f[1] for f in flat])
    valid = (all_r >= 0) & (all_c >= 0)
    keys = all_r * n_cols + all_c
    uniq = np.unique(keys[valid])
    rows_u = uniq // n_cols
    cols_u = uniq % n_cols
    nnz = uniq.shape[0]
    counts = np.bincount(rows_u, minlength=n_rows)
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    # uniq is sorted by key = row-major => indices already CSR-ordered
    indices = cols_u.astype(np.int32)
    slot_all = np.full(keys.shape, nnz, dtype=np.int64)
    slot_all[valid] = np.searchsorted(uniq, keys[valid])
    slots = []
    off = 0
    for r, _ in flat:
        slots.append(slot_all[off : off + r.shape[0]].astype(np.int32))
        off += r.shape[0]
    return SlotPattern((n_rows, n_cols), indptr, indices, slots, rows_u.astype(np.int32))


@jax.tree_util.register_pytree_node_class
class CSRMatrix:
    """CSR matrix with static structure and jit-friendly matvec."""

    def __init__(self, data, indices, indptr, row_ids, shape):
        self.data = data
        self.indices = indices
        self.indptr = indptr
        self.row_ids = row_ids
        self.shape = shape

    def tree_flatten(self):
        # index arrays are CHILDREN (traced leaves): as aux they make the
        # matrix unhashable as a jit argument, forcing callers to close over
        # it — and 100MB+ closure constants fault the remote-compiled
        # executable at scale
        ch = (self.data, self.indices, self.indptr, self.row_ids)
        return ch, (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    @classmethod
    def from_pattern(cls, pattern: SlotPattern, data):
        return cls(
            data,
            jnp.asarray(pattern.indices),
            jnp.asarray(pattern.indptr),
            jnp.asarray(pattern.row_ids),
            pattern.shape,
        )

    def matvec(self, x):
        prod = self.data * x[self.indices]
        # row_ids are row-major sorted by construction (build_slot_pattern);
        # the sorted hint lets XLA lower the reduction without the general
        # scatter path
        return jax.ops.segment_sum(
            prod, self.row_ids, num_segments=self.shape[0], indices_are_sorted=True
        )

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self):
        is_diag = self.row_ids == self.indices
        return jax.ops.segment_sum(
            jnp.where(is_diag, self.data, 0), self.row_ids,
            num_segments=self.shape[0], indices_are_sorted=True,
        )

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix(
            (np.asarray(self.data), np.asarray(self.indices), np.asarray(self.indptr)),
            shape=self.shape,
        )

    def to_dense(self):
        return np.asarray(self.to_scipy().todense())

    def to_bell(self, **kw):
        """Convert to the blocked-ELL TPU fast-path format (la/bell.py)."""
        from .bell import bell_from_scipy

        return bell_from_scipy(self.to_scipy(), **kw)
