"""Matrix-free K^H A K operator.

The reference always assembles an explicit PETSc matrix; the TPU-native
alternative (BASELINE.json north star: "explicit assembled path AND a
matrix-free K^T A K operator") composes three fused stages per action:

    y = K^H (A (K x))  + diagval * (slave/bc identity)

where A's action is element-local: gather x per cell, per-cell dense
`A_e @ x_e` (one batched matmul on the MXU), add-scatter.  The element
tensors A_e are tabulated once at operator construction (the form is linear
in the geometry, which is static) — for nonlinear re-assembly call
`refresh()`.  Memory: O(n_cells · nd²) instead of O(nnz) CSR, and no
sparsity-pattern construction at all — the option of choice at the 10M-dof
scale where pattern dedup dominates setup.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.forms import Form
from ..multipointconstraint import MultiPointConstraint
from .assemble import _bc_masks, _mpc_pair, _real_dtype
from .kernels import compile_term

__all__ = ["MatrixFreeKTAK"]


class MatrixFreeKTAK:
    """Linear operator for the reduced system K^H A K with Dirichlet rows
    replaced by diagval·I (same system LinearProblem assembles explicitly)."""

    def __init__(self, a: Form, mpc: Optional[MultiPointConstraint] = None, bcs=None, diagval=1.0, dtype=np.float64):
        bcs = bcs or []
        mpc_r, _ = _mpc_pair(mpc)
        V = a.test_space
        assert a.trial_space is V, "matrix-free path needs square forms"
        self.V = V
        self.mpc = mpc_r
        self.dtype = np.dtype(dtype)
        self.diagval = diagval
        self._terms = [compile_term(t, V, V) for t in a.terms]
        self._form = a
        mesh = V.mesh
        self._tabs = []
        for ct in self._terms:
            cells = ct.cells
            lf = ct.local_facets if ct.local_facets is not None else np.zeros(len(cells), np.int32)
            self._tabs.append(
                dict(
                    coords=jnp.asarray(mesh.points[mesh.cells[cells]].astype(_real_dtype(dtype))),
                    lf=jnp.asarray(lf.astype(np.int32)),
                    dm=jnp.asarray(V.dofmap[cells].astype(np.int32)),
                    wdofmaps={
                        n: jnp.asarray(W.dofmap[cells].astype(np.int32))
                        for n, W in zip(ct.coeff_names, ct.coeff_spaces)
                    },
                )
            )
        bc_mask = _bc_masks(V, bcs, self.dtype)
        self._bc_mask = jnp.asarray(bc_mask)
        if mpc_r is not None and mpc_r.num_local_slaves:
            self._slave_mask = jnp.asarray(mpc_r.is_slave.astype(_real_dtype(self.dtype)))
        else:
            self._slave_mask = jnp.zeros(V.num_dofs, _real_dtype(self.dtype))
        self.refresh()
        self._matvec = jax.jit(self._matvec_impl)

    def refresh(self):
        """(Re-)tabulate the element tensors (coefficients may have changed)."""
        self._Ae = []
        for ct, tb in zip(self._terms, self._tabs):
            wl = {
                n: jnp.array(ct.term.coefficients[n].x.array, copy=True)[tb["wdofmaps"][n]]
                for n in ct.coeff_names
            }
            self._Ae.append(ct.kernel(tb["coords"], tb["lf"], wl))

    @property
    def shape(self):
        return (self.V.num_dofs, self.V.num_dofs)

    def _matvec_impl(self, Ae_list, x):
        V = self.V
        fmpc = self.mpc.finalized if self.mpc is not None else None
        bc = self._bc_mask
        sl = self._slave_mask
        keep = (1.0 - bc) * (1.0 - sl)
        # u = K x (on non-bc dofs)
        u = x * keep.astype(x.dtype)
        if fmpc is not None:
            u = fmpc.backsubstitution(u)
        y = jnp.zeros(V.num_dofs + 1, dtype=x.dtype)
        for Ae, tb in zip(Ae_list, self._tabs):
            xe = u[tb["dm"]]
            ye = jnp.einsum("cij,cj->ci", Ae, xe, preferred_element_type=x.dtype)
            y = y.at[tb["dm"].reshape(-1)].add(ye.reshape(-1))
        y = y[: V.num_dofs]
        # z = K^H y, zero slave rows
        if fmpc is not None:
            y = fmpc.reduce_transpose(y)
        z = y * keep.astype(x.dtype)
        # bc/slave rows: diagval * x
        z = z + (bc + sl).astype(x.dtype) * self.diagval * x
        return z

    def matvec(self, x):
        return self._matvec(self._Ae, x)

    def diagonal(self):
        """Jacobi diagonal of K^H A K (host/one-time): via probing with the
        element tensors — diag[i] = sum over cells of (K^T Ae K)_{ii}."""
        V = self.V
        N = V.num_dofs
        diag = jnp.zeros(N + 1, dtype=self.dtype)
        fmpc = self.mpc.finalized if self.mpc is not None else None
        for Ae, tb in zip(self._Ae, self._tabs):
            d = jnp.diagonal(Ae, axis1=1, axis2=2)  # (c, nd)
            diag = diag.at[tb["dm"].reshape(-1)].add(d.reshape(-1))
        diag = diag[:N]
        keep = (1.0 - self._bc_mask) * (1.0 - self._slave_mask)
        diag = diag * keep.astype(diag.dtype) + (self._bc_mask + self._slave_mask).astype(diag.dtype) * self.diagval
        # note: master-master couplings from elimination are not included in
        # this approximation — Jacobi quality only, exact values come from the
        # assembled path
        return diag
