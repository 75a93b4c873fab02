"""Algebraic verification oracle: explicit K, K^H A K / K^H b comparison.

Port of the reference's core test oracle
(/root/reference/python/src/dolfinx_mpc/utils/test.py:67-265): build the
explicit global transformation matrix K, and assert that constrained assembly
equals the reduced system.  In a single address space the rank-0 gather
(test.py:165-193) is trivial — device arrays come back via numpy.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = [
    "gather_transformation_matrix",
    "compare_mpc_lhs",
    "compare_mpc_rhs",
    "gather_PETScMatrix",
    "gather_PETScVector",
]


def gather_transformation_matrix(mpc, root=0) -> sp.csr_matrix:
    """Explicit K: (num_dofs, num_reduced) with identity rows for non-slave
    dofs and coefficient rows for slaves (test.py:67-149)."""
    N = mpc.V.num_dofs
    slaves = np.asarray(mpc.slaves, dtype=np.int64)
    is_slave = np.zeros(N, dtype=bool)
    is_slave[slaves] = True
    reduced = np.flatnonzero(~is_slave)
    red_index = -np.ones(N, dtype=np.int64)
    red_index[reduced] = np.arange(len(reduced))
    rows, cols, vals = [], [], []
    rows.extend(reduced.tolist())
    cols.extend(red_index[reduced].tolist())
    vals.extend([1.0] * len(reduced))
    flat_m, offs = mpc.masters
    flat_c, _ = mpc.coefficients
    for i, s in enumerate(slaves):
        for m, c in zip(flat_m[offs[i] : offs[i + 1]], flat_c[offs[i] : offs[i + 1]]):
            if red_index[m] < 0:
                raise ValueError("master is a slave")
            rows.append(int(s))
            cols.append(int(red_index[m]))
            vals.append(c)
    dtype = np.asarray(flat_c).dtype if len(flat_c) else np.float64
    return sp.csr_matrix((np.asarray(vals, dtype), (rows, cols)), shape=(N, len(reduced)))


def gather_PETScMatrix(A, root=0) -> sp.csr_matrix:
    """Compat shim with the reference util name (test.py:165-182)."""
    if sp.issparse(A):
        return A.tocsr()
    return A.to_scipy()


def gather_PETScVector(b, root=0) -> np.ndarray:
    return np.asarray(b)


def compare_mpc_lhs(A_org, A_mpc, mpc, root=0, atol=5e3 * np.finfo(np.float64).resolution):
    """Assert K^H A_org K == A_mpc restricted to non-slave rows/cols
    (test.py:202-242)."""
    K = gather_transformation_matrix(mpc, root)
    A_org = gather_PETScMatrix(A_org)
    A_mpc = gather_PETScMatrix(A_mpc)
    KHAK = (K.T.conj() @ A_org @ K).tocsr()
    N = mpc.V.num_dofs
    is_slave = np.zeros(N, dtype=bool)
    is_slave[np.asarray(mpc.slaves, dtype=np.int64)] = True
    reduced = np.flatnonzero(~is_slave)
    A_mpc_red = A_mpc[reduced][:, reduced]
    diff = (KHAK - A_mpc_red).tocoo()
    if diff.nnz:
        err = np.abs(diff.data).max()
        assert err < atol, f"K^H A K mismatch: max |diff| = {err:.3e} > {atol:.1e}"


def compare_mpc_rhs(b_org, b_mpc, mpc, root=0, atol=1e-8):
    """Assert K^H b_org == b_mpc on non-slave dofs (test.py:245-265)."""
    K = gather_transformation_matrix(mpc, root)
    b_org = gather_PETScVector(b_org)
    b_mpc = gather_PETScVector(b_mpc)
    reduced_b = K.T.conj() @ b_org
    N = mpc.V.num_dofs
    is_slave = np.zeros(N, dtype=bool)
    is_slave[np.asarray(mpc.slaves, dtype=np.int64)] = True
    reduced = np.flatnonzero(~is_slave)
    err = np.abs(reduced_b - b_mpc[reduced]).max() if len(reduced) else 0.0
    assert err < atol, f"K^H b mismatch: max |diff| = {err:.3e}"
