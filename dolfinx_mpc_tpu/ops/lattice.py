"""Lattice fast path: scatter-free assembly + roll-based SpMV for structured
box meshes.

The reference assembles every mesh through PETSc's dynamic-insertion CSR
machinery (/root/reference/cpp/assemble_matrix.cpp + MatSetValuesLocal).  On
TPU the scatter-add that a general CSR assembly needs (`segment_sum`) is the
single slowest op (measured ~46ms for 3.1M entries on v5e — ~1000x off the
HBM roofline).  For the structured box meshes used by every reference
benchmark (bench_periodic.py, bench_elasticity*.py, bench_contact_3D.py) the
sparsity is a *stencil*: the (cell, a, b) -> matrix-entry map collapses to a
fixed set of lattice diagonal offsets.  Assembly then becomes ~[cell-types x
nd^2] static padded slice-adds (pure VPU/HBM streaming, no gather, no
scatter), and SpMV becomes shifted elementwise FMAs — both at the memory
roofline, which is what "TPU-native" means for this workload.

MPC slave cells break the stencil; their eliminated `K^H A_e K` contributions
(and any Dirichlet diagonal) go into a small CSR *side* matrix built with the
general slot machinery over the O(surface) slave cells only:

    A = DIA(stencil part, slave-cell rows/cols excluded) + CSR(side)

which is algebraically identical to the reference's elimination-during-
assembly (assemble_matrix.cpp:100-268) and is verified against the
K^H A K oracle in tests/test_lattice.py.
"""

from __future__ import annotations

import functools

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.forms import Form
from ..fem.functionspace import FunctionSpace
from ..la.sparse import build_slot_pattern
from ..multipointconstraint import MultiPointConstraint
from .assemble import (
    _bc_masks,
    _bc_values,
    _build_cell_transforms,
    _mpc_pair,
    _real_dtype,
)
from .kernels import compile_term

__all__ = ["LatticeInfo", "attach_lattice_info", "DIAMatrix", "LatticeOperator", "assemble_matrix_lattice"]


@dataclass
class LatticeInfo:
    """Structured-box metadata: cells are ordered (i, j, k, t) with t the
    sub-cell index (6 Kuhn tets or 1 hex), vertices lex-ordered
    (i*(ny+1) + j)*(nz+1) + k.  Attached by the create_box/create_rectangle
    generators in fem/mesh.py."""

    dims: tuple  # (nx, ny, nz) cells per axis (nz=0 for 2D)
    cells_per_box: int  # 6 tet / 1 hex / 2 tri / 1 quad


def attach_lattice_info(mesh, dims, cells_per_box):
    mesh._cache["lattice"] = LatticeInfo(tuple(dims), cells_per_box)


def get_lattice_info(mesh) -> Optional[LatticeInfo]:
    return mesh._cache.get("lattice")


# ---------------------------------------------------------------------------
# DIA matrix: data per diagonal offset over the vertex lattice
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class DIAMatrix:
    """Stencil matrix over an (n0, n1, n2) vertex lattice with `bs` dof
    components per vertex.

    data: (n_off, bs, bs, n0, n1, n2) — entry A[(v, ci), (v+off_d, cj)] =
    data[d, ci, cj, v].  Matvec = shifted slice FMAs (no gather/scatter).
    """

    def __init__(self, data, offsets, vshape, bs):
        self.data = data
        self.offsets = offsets  # host tuple of (do, dj, dk)
        self.vshape = vshape
        self.bs = bs

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.vshape, self.bs)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], *aux)

    @property
    def shape(self):
        n = int(np.prod(self.vshape)) * self.bs
        return (n, n)

    def matvec(self, x):
        n0, n1, n2 = self.vshape
        bs = self.bs
        # pallas SpMV on accelerators (scalar stencils): plane programs with
        # roll+mask per offset — the XLA slice-add chain runs ~10x off the
        # HBM roofline
        import os as _os

        # bs>1 pallas SpMV was REMOVED from dispatch (round 4): when fused
        # into large composed programs (the monolithic GMG V-cycle) Mosaic
        # miscompiles it — deterministic wrong planes, 6.8% rel error vs the
        # same stages jitted separately (scripts/probe_bs3_{pairs,levels,
        # variants}.py, 2026-08-18; operand/stage optimization_barriers and
        # coarse-solve barriers do NOT fix it), and a standalone equality
        # check passes, so no runtime gate can catch the composed failure.
        # Standalone it only matched XLA speed anyway (1.52 vs 1.60 ms at
        # 824k dofs).  The kernel itself stays in pallas_lattice.py for the
        # Mosaic repro probes (scripts/probe_bs3_bisect.py).
        if (bs == 1 and self.data.dtype == jnp.float32
                and x.dtype == jnp.float32  # f64/complex x: XLA path keeps
                # the promoted dtype; the pallas kernel would silently
                # downcast (ADVICE r2)
                and n0 * n1 * n2 >= 32768  # tiny (GMG-coarse) grids: XLA wins
                # Mosaic primitives are TPU-only (axon = tunneled TPU); a
                # CUDA backend must fall back to the XLA path, not fail at
                # lowering (ADVICE r2)
                and jax.default_backend() in ("tpu", "axon")
                and not _os.environ.get("DMT_NO_PALLAS")
                # SpMV-only opt-out: isolates solve-path issues from the
                # pallas assembler when bisecting on hardware
                and not _os.environ.get("DMT_NO_PALLAS_SPMV")):
            from .pallas_lattice import (dia_matvec_supported,
                                         make_dia_matvec_pallas)

            if dia_matvec_supported(self.offsets, self.vshape, bs):
                mv = make_dia_matvec_pallas(self.offsets, self.vshape)
                return mv(self.data, x.astype(jnp.float32))
        # (bs, n0, n1, n2) component-major grids: every op below is a static
        # slice + FMA — no einsum (a bs=1 einsum lowers to batched 1x1
        # dot_generals, ~1000x slower than the elementwise form on TPU)
        xg = jnp.moveaxis(x.reshape(n0, n1, n2, bs), -1, 0)
        y = jnp.zeros_like(xg)
        for d, (di, dj, dk) in enumerate(self.offsets):
            dst = (
                slice(max(-di, 0), n0 - max(di, 0)),
                slice(max(-dj, 0), n1 - max(dj, 0)),
                slice(max(-dk, 0), n2 - max(dk, 0)),
            )
            src = (
                slice(max(di, 0), n0 + min(di, 0)),
                slice(max(dj, 0), n1 + min(dj, 0)),
                slice(max(dk, 0), n2 + min(dk, 0)),
            )
            for ci in range(bs):
                acc = None
                for cj in range(bs):
                    term = self.data[(d, ci, cj) + dst] * xg[(cj,) + src]
                    acc = term if acc is None else acc + term
                y = y.at[(ci,) + dst].add(acc)
        return jnp.moveaxis(y, 0, -1).reshape(-1)

    def diagonal(self):
        for d, off in enumerate(self.offsets):
            if off == (0, 0, 0):
                # (bs, bs, n0, n1, n2) -> interleaved (n*bs,)
                blk = self.data[d]
                diag = jnp.diagonal(blk, axis1=0, axis2=1)  # (n0, n1, n2, bs)
                return diag.reshape(-1)
        return jnp.zeros(self.shape[0], self.data.dtype)

    def to_scipy(self):
        import scipy.sparse as sp

        n0, n1, n2 = self.vshape
        bs = self.bs
        N = n0 * n1 * n2 * bs
        rows, cols, vals = [], [], []
        data = np.asarray(self.data)
        I, J, K = np.meshgrid(np.arange(n0), np.arange(n1), np.arange(n2), indexing="ij")
        vid = (I * n1 + J) * n2 + K
        for d, (di, dj, dk) in enumerate(self.offsets):
            m = (
                (I + di >= 0) & (I + di < n0)
                & (J + dj >= 0) & (J + dj < n1)
                & (K + dk >= 0) & (K + dk < n2)
            )
            r = vid[m]
            c = ((I + di) * n1 + (J + dj)) * n2 + (K + dk)
            c = c[m]
            for ci in range(bs):
                for cj in range(bs):
                    v = data[d, ci, cj][m]
                    rows.append(r * bs + ci)
                    cols.append(c * bs + cj)
                    vals.append(v)
        return sp.csr_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))), shape=(N, N)
        )


@jax.tree_util.register_pytree_node_class
class BlockDIAMatrix:
    """Parity-blocked stencil matrix for r-refined lattices (the degree-2
    fast path).  Dofs are classified by their parity inside a coarse box
    (vertex / edge / face / body families); each (row-class, col-class,
    coarse-offset) triple stores ONE value per coarse box.  P2 tets need 230
    triples vs the refined 65-diagonal DIA's 65*8 = 520 values per box —
    2.26x fewer operator bytes, which bound both assembly and SpMV (the
    VERDICT r2 "compressed P2 operator / per-family stencils" design).

    data: (n_trip, s0, s1, s2) over the PADDED class grid
    s = ceil(vshape / r3); trips[m] = (cls_row, cls_col, off) with off in
    coarse boxes.  Padded rows/cols hold exact zeros (assembly never writes
    them, the x split pads with zeros), so matvec is plain shifted slice
    FMAs on the uniform padded grid.  Replaces the same reference operator
    as DIAMatrix (cpp/assemble_matrix.cpp per-cell CSR); scalar only.
    """

    def __init__(self, data, trips, vshape, r3, bs=1, use_pallas_mv=False):
        assert bs == 1, "blocked stencil path is scalar-only"
        self.data = data
        self.trips = trips  # host tuple of ((p0,p1,p2), (q0,q1,q2), (di,dj,dk))
        self.vshape = vshape
        self.r3 = r3
        self.bs = bs
        # pallas SpMV opt-in: set ONLY after an on-chip composed-program
        # equality check (see matvec_blocked)
        self.use_pallas_mv = use_pallas_mv

    def tree_flatten(self):
        return (self.data,), (self.trips, self.vshape, self.r3, self.bs,
                              self.use_pallas_mv)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = cls.__new__(cls)
        obj.data = ch[0]
        obj.trips, obj.vshape, obj.r3, obj.bs, obj.use_pallas_mv = aux
        return obj

    @property
    def cdims(self):
        return tuple(-(-n // r) for n, r in zip(self.vshape, self.r3))

    @property
    def classes(self):
        import itertools

        return tuple(itertools.product(*(range(r) for r in self.r3)))

    @property
    def shape(self):
        n = int(np.prod(self.vshape))
        return (n, n)

    def _to_blocked(self, x):
        """fine (n0, n1, n2) flat vector -> (n_classes, s0, s1, s2) padded
        class stack (class-major split by refined parity)."""
        n0, n1, n2 = self.vshape
        r0, r1, r2 = self.r3
        s0, s1, s2 = self.cdims
        xf = x.reshape(n0, n1, n2)
        xp = jnp.pad(xf, ((0, r0 * s0 - n0), (0, r1 * s1 - n1), (0, r2 * s2 - n2)))
        return (xp.reshape(s0, r0, s1, r1, s2, r2)
                .transpose(1, 3, 5, 0, 2, 4)
                .reshape(-1, s0, s1, s2))

    def _from_blocked(self, yb):
        n0, n1, n2 = self.vshape
        r0, r1, r2 = self.r3
        s0, s1, s2 = self.cdims
        yf = (yb.reshape(r0, r1, r2, s0, s1, s2)
              .transpose(3, 0, 4, 1, 5, 2)
              .reshape(r0 * s0, r1 * s1, r2 * s2))
        return yf[:n0, :n1, :n2].reshape(-1)

    def matvec(self, x):
        return self._from_blocked(self.matvec_blocked(self._to_blocked(x)))

    def matvec_blocked(self, xb):
        """SpMV on the padded BLOCKED class stack (n_cls, s0, s1, s2) —
        the native layout of the solve path: the interleaved<->class-major
        transposes in matvec() measure 4.8 ms of its 10.5 ms at 2.1M dofs
        (scripts/probe_p2_asm_phases.py r4), so GMG/CG keep vectors blocked
        and convert only at the problem boundary.  Padded slots stay exact
        zeros (data's padded slots are zeros)."""
        import os as _os

        s0, s1, s2 = self.cdims
        # pallas plane-program kernel (2.28 ms vs 10.46 at 2.1M dofs): OFF
        # by default — the bs>1 DIA pallas kernels miscompiled under Mosaic
        # when fused into the monolithic V-cycle (round 3) and a standalone
        # equality check cannot catch that class.  bench.py enables it per
        # run after an on-chip COMPOSED-program check (full GMG-CG pallas
        # vs XLA), which is exactly the failing composition.
        if (getattr(self, "use_pallas_mv", False)
                and jax.default_backend() in ("tpu", "axon")
                and not _os.environ.get("DMT_NO_PALLAS")):
            from .pallas_lattice import make_blocked_matvec_pallas

            mv = make_blocked_matvec_pallas(self.trips, self.vshape, self.r3)
            if mv is not None:
                return mv(self.data, xb)
        cls_id = {c: i for i, c in enumerate(self.classes)}
        if _os.environ.get("DMT_BLOCKED_RMW"):
            # legacy read-modify-write path (kept for bisecting): 230
            # serialized .at[].add passes over the output — measured
            # 85 ms / 3 GB/s at 2.1M dofs on v5e
            yb = jnp.zeros_like(xb)
            for m, (cr, cc, off) in enumerate(self.trips):
                di, dj, dk = off
                dst = (
                    slice(max(-di, 0), s0 - max(di, 0)),
                    slice(max(-dj, 0), s1 - max(dj, 0)),
                    slice(max(-dk, 0), s2 - max(dk, 0)),
                )
                src = (
                    slice(max(di, 0), s0 + min(di, 0)),
                    slice(max(dj, 0), s1 + min(dj, 0)),
                    slice(max(dk, 0), s2 + min(dk, 0)),
                )
                yb = yb.at[(cls_id[cr],) + dst].add(
                    self.data[(m,) + dst] * xb[(cls_id[cc],) + src]
                )
            return yb
        # fused path: halo-pad the class stack once so every (cc, off)
        # source is a STATIC full-size slice, then build each output class
        # as ONE sum of elementwise products — XLA fuses the ~29 terms per
        # class into a single HBM pass instead of 230 serialized
        # read-modify-writes of the full output.  Rows whose source box
        # falls outside the domain read the zero halo, matching the legacy
        # dst/src clipping (padded rows of `data` hold exact zeros).
        xh = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (1, 1)))
        terms = {i: [] for i in range(xb.shape[0])}
        for m, (cr, cc, off) in enumerate(self.trips):
            di, dj, dk = off
            src = xh[cls_id[cc],
                     1 + di:1 + di + s0,
                     1 + dj:1 + dj + s1,
                     1 + dk:1 + dk + s2]
            terms[cls_id[cr]].append(self.data[m] * src)
        zero = jnp.zeros((s0, s1, s2), self.data.dtype)
        yb = jnp.stack([
            functools.reduce(jnp.add, terms[i]) if terms[i] else zero
            for i in range(xb.shape[0])
        ])
        return yb

    def diagonal_blocked(self):
        """Diagonal as the padded blocked class stack (n_cls, s0, s1, s2)."""
        s0, s1, s2 = self.cdims
        cls_id = {c: i for i, c in enumerate(self.classes)}
        rows = [None] * len(self.classes)
        for m, (cr, cc, off) in enumerate(self.trips):
            if cr == cc and off == (0, 0, 0):
                rows[cls_id[cr]] = self.data[m]
        zero = jnp.zeros((s0, s1, s2), self.data.dtype)
        return jnp.stack([r if r is not None else zero for r in rows])

    def diagonal(self):
        s0, s1, s2 = self.cdims
        cls_id = {c: i for i, c in enumerate(self.classes)}
        rows = [None] * len(self.classes)
        for m, (cr, cc, off) in enumerate(self.trips):
            if cr == cc and off == (0, 0, 0):
                rows[cls_id[cr]] = self.data[m]
        zero = jnp.zeros((s0, s1, s2), self.data.dtype)
        db = jnp.stack([r if r is not None else zero for r in rows])
        return self._from_blocked(db)

    def to_scipy(self):
        import scipy.sparse as sp

        n0, n1, n2 = self.vshape
        s0, s1, s2 = self.cdims
        r0, r1, r2 = self.r3
        N = n0 * n1 * n2
        data = np.asarray(self.data)
        Q0, Q1, Q2 = np.meshgrid(
            np.arange(s0), np.arange(s1), np.arange(s2), indexing="ij"
        )
        rows, cols, vals = [], [], []
        for m, (cr, cc, off) in enumerate(self.trips):
            fi = r0 * Q0 + cr[0]
            fj = r1 * Q1 + cr[1]
            fk = r2 * Q2 + cr[2]
            gi = r0 * (Q0 + off[0]) + cc[0]
            gj = r1 * (Q1 + off[1]) + cc[1]
            gk = r2 * (Q2 + off[2]) + cc[2]
            ok = ((fi < n0) & (fj < n1) & (fk < n2)
                  & (gi >= 0) & (gi < n0) & (gj >= 0) & (gj < n1)
                  & (gk >= 0) & (gk < n2))
            rows.append(((fi * n1 + fj) * n2 + fk)[ok])
            cols.append(((gi * n1 + gj) * n2 + gk)[ok])
            vals.append(data[m][ok])
        return sp.csr_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(N, N),
        )


@jax.tree_util.register_pytree_node_class
class LatticeOperator:
    """DIA stencil + MPC/BC side corrections.

    The side block comes in two formats:
    - "csr": assembled (side_data over static slots) — full parity with the
      reference's assembled matrix;
    - "cells": UNASSEMBLED per-slave-cell eliminated blocks
      (side_Aep (n_sc, W, W) + side_er (n_sc, W) dof tables + slave diagval),
      applied as gather -> batched matmul -> index-add.  Skips the O(n_sc·W²)
      scatter entirely (4-5x faster operator construction on v5e); the
      analogue of PETSc's unassembled interface (MATIS) formats.
    """

    def __init__(self, dia: DIAMatrix, side_data, side_cols, side_rows, side_nrows,
                 side_Aep=None, side_er=None, slaves=None, diagval=None,
                 fold_axis=None, fold_mask=None, fold_pairs=None,
                 fold_mask_b=None):
        self.dia = dia
        self.side_data = side_data
        self.side_cols = side_cols
        self.side_rows = side_rows
        self.side_nrows = side_nrows
        self.side_Aep = side_Aep
        self.side_er = side_er
        self.slaves = slaves
        self.diagval = diagval
        self.fold_axis = fold_axis
        self.fold_mask = fold_mask
        self.fold_pairs = fold_pairs
        # blocked-layout fold mask (n_cls, sA, sB) — see
        # CompiledLatticeForm._build_blocked_structure; enables the
        # blocked-native matvec_blocked on folded operators
        self.fold_mask_b = fold_mask_b

    def tree_flatten(self):
        # fold_pairs (host numpy, to_scipy only) deliberately not carried —
        # array-valued aux breaks jit pytree equality
        ch = (self.dia, self.side_data, self.side_Aep, self.diagval,
              self.side_cols, self.side_rows, self.side_er, self.slaves,
              self.fold_mask, self.fold_mask_b)
        return ch, (self.side_nrows, self.fold_axis)

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0], ch[1], ch[4], ch[5], aux[0], side_Aep=ch[2],
                   side_er=ch[6], slaves=ch[7], diagval=ch[3],
                   fold_axis=aux[1], fold_mask=ch[8], fold_mask_b=ch[9])

    @property
    def shape(self):
        return self.dia.shape

    def _unassembled(self):
        return self.side_Aep is not None

    def _grid(self, x):
        n0, n1, n2 = self.dia.vshape
        return x.reshape(n0, n1, n2, self.dia.bs)

    def matvec(self, x):
        if self.fold_axis is not None:
            # plane identification: u = K x (copy first plane onto the slave
            # plane), y = A u, fold slave-plane rows back (K^T), slave rows
            # get diagval — K^H A K without any irregular ops
            ax = self.fold_axis
            m = self.fold_mask
            xg = jnp.moveaxis(self._grid(x), ax, 0)
            u = xg.at[-1].set(jnp.where(m, xg[0], xg[-1]))
            y = self.dia.matvec(jnp.moveaxis(u, 0, ax).reshape(-1))
            yg = jnp.moveaxis(self._grid(y), ax, 0)
            yg = yg.at[0].add(jnp.where(m, yg[-1], 0))
            yg = yg.at[-1].set(jnp.where(m, self.diagval * xg[-1], yg[-1]))
            return jnp.moveaxis(yg, 0, ax).reshape(-1)
        y = self.dia.matvec(x)
        if self._unassembled():
            if self.side_Aep.shape[0]:
                er = self.side_er  # (n_sc, W), trash -> shape[0]
                xe = jnp.where(er < self.shape[0], x[jnp.minimum(er, self.shape[0] - 1)], 0)
                ye = jnp.einsum("cwv,cv->cw", self.side_Aep, xe,
                                preferred_element_type=x.dtype)
                yp = jnp.zeros(self.shape[0] + 1, x.dtype)
                yp = yp.at[er.reshape(-1)].add(ye.reshape(-1))
                y = y + yp[: self.shape[0]]
            if self.slaves is not None and self.slaves.shape[0]:
                y = y.at[self.slaves].add(self.diagval * x[self.slaves])
            return y
        if self.side_data.shape[0]:
            prod = self.side_data * x[self.side_cols]
            y = y + jax.ops.segment_sum(prod, self.side_rows, num_segments=self.shape[0])
        return y

    def supports_blocked(self):
        """True when the blocked-native solve layout applies: lean blocked
        operator (no side blocks), with any fold carrying its blocked mask."""
        return (isinstance(self.dia, BlockDIAMatrix)
                and not self._unassembled()
                and (self.side_data is None or self.side_data.shape[0] == 0)
                and (self.fold_axis is None or self.fold_mask_b is not None))

    def matvec_blocked(self, xb):
        """K^H A K matvec on the padded blocked class stack (n_cls, s0, s1,
        s2) — the solve-path layout (matvec()'s interleave<->class-major
        transposes are 4.8 ms of 10.5 ms at 2.1M dofs, probe r4).  The fold
        (periodic plane identification) runs per class on the class grids:
        only parity-0 classes along the fold axis carry the end planes (all
        refined dims are odd), so fold_mask_b zeroes everything else."""
        dia = self.dia
        if self.fold_axis is None:
            return dia.matvec_blocked(xb)
        ax = self.fold_axis
        mb = self.fold_mask_b
        xg = jnp.moveaxis(xb, 1 + ax, 1)  # (n_cls, s_ax, sA, sB)
        u = xg.at[:, -1].set(jnp.where(mb, xg[:, 0], xg[:, -1]))
        y = dia.matvec_blocked(jnp.moveaxis(u, 1, 1 + ax))
        yg = jnp.moveaxis(y, 1 + ax, 1)
        yg = yg.at[:, 0].add(jnp.where(mb, yg[:, -1], 0))
        yg = yg.at[:, -1].set(jnp.where(mb, self.diagval * xg[:, -1], yg[:, -1]))
        return jnp.moveaxis(yg, 1, 1 + ax)

    def diagonal_blocked(self):
        """diagonal() in the blocked class-stack layout."""
        d = self.dia.diagonal_blocked()
        if self.fold_axis is None:
            return d
        ax = self.fold_axis
        mb = self.fold_mask_b
        dg = jnp.moveaxis(d, 1 + ax, 1)
        dg = dg.at[:, 0].add(jnp.where(mb, dg[:, -1], 0))
        dg = dg.at[:, -1].set(jnp.where(mb, self.diagval, dg[:, -1]))
        return jnp.moveaxis(dg, 1, 1 + ax)

    def diagonal(self):
        if self.fold_axis is not None:
            ax = self.fold_axis
            m = self.fold_mask
            dg = jnp.moveaxis(self._grid(self.dia.diagonal()), ax, 0)
            dg = dg.at[0].add(jnp.where(m, dg[-1], 0))
            dg = dg.at[-1].set(jnp.where(m, self.diagval, dg[-1]))
            return jnp.moveaxis(dg, 0, ax).reshape(-1)
        d = self.dia.diagonal()
        if self._unassembled():
            if self.side_Aep.shape[0]:
                de = jnp.diagonal(self.side_Aep, axis1=1, axis2=2)  # (n_sc, W)
                dp = jnp.zeros(self.shape[0] + 1, d.dtype)
                dp = dp.at[self.side_er.reshape(-1)].add(de.reshape(-1))
                d = d + dp[: self.shape[0]]
            if self.slaves is not None and self.slaves.shape[0]:
                d = d.at[self.slaves].add(self.diagval)
            return d
        if self.side_data.shape[0]:
            is_diag = self.side_rows == self.side_cols
            d = d + jax.ops.segment_sum(
                jnp.where(is_diag, self.side_data, 0), self.side_rows, num_segments=self.shape[0]
            )
        return d

    def to_scipy(self):
        import scipy.sparse as sp

        if self.fold_axis is not None:
            assert self.fold_pairs is not None, "to_scipy needs the host-side operator"
            N = self.shape[0]
            slaves, masters = self.fold_pairs
            A = self.dia.to_scipy()
            K = sp.lil_matrix((N, N))
            K.setdiag(1.0)
            for s, mm in zip(slaves, masters):
                K[s, s] = 0.0
                K[s, mm] = 1.0
            K = K.tocsr()
            A2 = (K.T @ A @ K).tolil()
            A2[slaves, :] = 0.0
            A2[:, slaves] = 0.0
            dv = float(np.real(np.asarray(self.diagval)))
            for s in slaves:
                A2[s, s] = dv
            return A2.tocsr()

        A = self.dia.to_scipy().tolil()
        if self._unassembled():
            N = self.shape[0]
            rows, cols, vals = [], [], []
            er = np.asarray(self.side_er)
            Aep = np.asarray(self.side_Aep)
            for c in range(er.shape[0]):
                ok = er[c] < N
                ii = er[c][ok]
                vals.append(Aep[c][np.ix_(ok, ok)].ravel())
                rows.append(np.repeat(ii, len(ii)))
                cols.append(np.tile(ii, len(ii)))
            if self.slaves is not None and len(np.asarray(self.slaves)):
                sl = np.asarray(self.slaves)
                rows.append(sl)
                cols.append(sl)
                vals.append(np.full(len(sl), float(np.real(np.asarray(self.diagval)))))
            if rows:
                side = sp.csr_matrix(
                    (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
                    shape=self.shape,
                )
                return (A.tocsr() + side).tocsr()
            return A.tocsr()
        side = sp.csr_matrix(
            (np.asarray(self.side_data), (np.asarray(self.side_rows), np.asarray(self.side_cols))),
            shape=self.shape,
        )
        return (A.tocsr() + side).tocsr()


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------


def _vertex_delta_table(mesh, lat: LatticeInfo):
    """For each sub-cell type t and local vertex a: the lattice delta
    (di, dj, dk) of that vertex relative to the cell's base corner (derived
    from the generator's vertex-id arithmetic in fem/mesh.py)."""
    nx, ny, nz = lat.dims
    n1, n2 = ny + 1, max(nz + 1, 1)
    deltas = np.empty((lat.cells_per_box, mesh.cells.shape[1], 3), dtype=np.int64)
    for t in range(lat.cells_per_box):
        verts = mesh.cells[t]  # cell t of box (0,0,0): vertex ids ARE the deltas
        for a, v in enumerate(verts):
            i = v // (n1 * n2)
            j = (v % (n1 * n2)) // n2
            k = v % n2
            deltas[t, a] = (i, j, k)
    return deltas


def _dof_delta_table(mesh, element, lat: LatticeInfo):
    """(T, ndofs_scalar, 3) integer node deltas on the degree-refined grid:
    node position in refined lattice units = degree * sum_v phi_v(node_ref) *
    vertex_delta (the geometry map is P1/Q1).  For degree 1 this IS the
    vertex delta table; for degree 2 edge/face/interior nodes land on the
    half-step grid (see fem/functionspace.py:_lattice_grid_dofs)."""
    vdeltas = _vertex_delta_table(mesh, lat)
    r = element.degree
    if r == 1:
        return vdeltas
    from ..fem.elements import lagrange_element

    geo = lagrange_element(mesh.cell_type, 1)
    phi = geo.tabulate(element.nodes)  # (nd, nv)
    dd = r * np.einsum("nv,tvd->tnd", phi, vdeltas.astype(np.float64))
    ddi = np.rint(dd).astype(np.int64)
    assert np.abs(dd - ddi).max() < 1e-9, "element nodes off the refined lattice"
    return ddi


def _detect_lattice_wrap(mpc, vshape, bs):
    """Check that the MPC is a pure lattice-plane identification: every slave
    has exactly one master with coefficient 1, slaves live on the LAST plane
    of one axis, masters at the same (other-coords, component) on the FIRST
    plane.  Returns (axis, fold_mask over that plane incl. bs, (slaves,
    masters) host arrays); raises ValueError otherwise."""
    if mpc is None or mpc.num_local_slaves == 0:
        raise ValueError("no constraint to fold")
    co = mpc._np_coeffs
    ma = mpc._np_masters
    nzc = (co != 0).sum(axis=1)
    if not ((nzc == 1).all() and np.allclose(co[np.arange(len(co)), np.argmax(co != 0, axis=1)], 1.0)):
        raise ValueError("constraint is not a pure identification (coeff != 1 or >1 master)")
    slaves = np.asarray(mpc.slaves, np.int64)
    masters = ma[np.arange(len(ma)), np.argmax(co != 0, axis=1)]
    n0, n1, n2 = vshape

    def coords_of(dofs):
        blk, comp = dofs // bs, dofs % bs
        i = blk // (n1 * n2)
        j = (blk % (n1 * n2)) // n2
        k = blk % n2
        return np.stack([i, j, k, comp], axis=1)

    cs, cm = coords_of(slaves), coords_of(masters)
    for axis, nax in enumerate((n0, n1, n2)):
        if (cs[:, axis] == nax - 1).all() and (cm[:, axis] == 0).all():
            others = [a for a in range(4) if a != axis]
            if (cs[:, others] == cm[:, others]).all():
                plane_shape = tuple(s for a, s in enumerate((n0, n1, n2)) if a != axis) + (bs,)
                mask = np.zeros(plane_shape, bool)
                mask[tuple(cs[:, a] for a in others)] = True
                return axis, mask, (slaves, masters)
    raise ValueError("constraint is not an axis-plane wrap")


def _uniform_lattice_geometry(mesh, lat: LatticeInfo):
    """(origin, spacing) if mesh.points is exactly the uniform box grid the
    generator produced (nothing rotated/deformed it afterwards), else None.
    Uniform geometry lets assembly synthesize cell coordinates on device from
    iota — no host gather, no O(cells) h2d transfer."""
    nx, ny, nz_ = lat.dims
    gdim = mesh.gdim
    dims = (nx, ny, nz_)[:gdim]
    shape = tuple(d + 1 for d in dims)
    pts = mesh.points
    if pts.shape[0] != int(np.prod(shape)):
        return None
    origin = pts[0].copy()
    corner = pts[-1]
    spacing = (corner - origin) / np.asarray(dims, pts.dtype)
    if not np.all(np.isfinite(spacing)) or np.any(spacing == 0):
        return None
    scale = np.abs(spacing).max()
    tol = 1e-12 * max(scale, 1.0, np.abs(origin).max() + np.abs(corner).max())
    pts3 = pts.reshape(*shape, gdim)  # view (points are lex-ordered, C-contig)
    for d in range(gdim):
        axis_vals = origin[d] + spacing[d] * np.arange(shape[d])
        bshape = [1] * gdim
        bshape[d] = shape[d]
        if np.abs(pts3[..., d] - axis_vals.reshape(bshape)).max() > tol:
            return None
    return origin, spacing


def assemble_matrix_lattice(
    form: Form,
    constraint: Optional[MultiPointConstraint] = None,
    bcs=None,
    diagval=1.0,
    dtype=np.float64,
    side_format="csr",
    x_chunks=1,
):
    """Assemble a bilinear form on a lattice mesh into DIA + side block.

    side_format "csr" assembles the MPC side into static-slot CSR;
    "cells" keeps it as per-slave-cell eliminated blocks (faster to build,
    identical operator action — requires the SoA kernel path); "fold"
    collapses matching periodic constraints into the stencil.
    x_chunks > 1 processes x-slabs sequentially inside one jit (bounds the
    element-tensor working set for 10M-dof-scale meshes; fold mode only).
    Returns a `CompiledLatticeForm`; call `.assemble()` for the jitted path.
    """
    return CompiledLatticeForm(form, constraint, bcs or [], diagval, dtype, side_format, x_chunks)


class CompiledLatticeForm:
    def __init__(self, form, constraint, bcs, diagval, dtype, side_format="csr", x_chunks=1):
        self.side_format = side_format
        self.x_chunks = int(x_chunks)
        mpc_r, mpc_c = _mpc_pair(constraint)
        assert mpc_r is mpc_c, "lattice path supports square forms with one MPC"
        V = form.test_space
        assert form.trial_space is V, "lattice path needs test == trial space"
        mesh = V.mesh
        lat = get_lattice_info(mesh)
        assert lat is not None, "mesh has no lattice info (use create_box/create_rectangle)"
        assert len(form.terms) == 1 and form.terms[0].integral == "cell" and form.terms[0].entities is None
        assert not getattr(V, "is_mixed", False), "lattice path: uniform spaces only"
        r = V.element.degree
        assert r in (1, 2), "lattice fast path supports degree 1 and 2"
        if r > 1:
            # degree 2 requires the grid-lex dof numbering so dofs == points
            # of the r-refined lattice (fem/functionspace.py:_lattice_grid_dofs)
            assert getattr(V, "grid_meta", None) is not None, (
                "degree-2 lattice path needs a grid-numbered space (pristine box mesh)"
            )
        self.V, self.mesh, self.lat = V, mesh, lat
        self.dtype = np.dtype(dtype)
        self.bcs = bcs
        self.diagval = diagval
        nx, ny, nz_ = lat.dims
        is2d = mesh.tdim == 2
        self.refine = r
        self.r3 = (r, r, 1 if is2d else r)
        self.vshape = (r * nx + 1, r * ny + 1, 1 if is2d else r * nz_ + 1)
        bs = V.block_size
        self.bs = bs

        ct = compile_term(form.terms[0], V, V)
        self.kernel = ct.kernel
        self.coeff_names = ct.coeff_names
        self.term = form.terms[0]
        # cells-last SoA kernel (soa_kernels.py) — the fast path on TPU
        from .soa_kernels import compile_cell_kernel_soa

        self.kernel_soa = compile_cell_kernel_soa(mesh, V, V, form.terms[0], self.dtype)

        # node deltas (refined-grid units) and diagonal offsets
        deltas = _dof_delta_table(mesh, V.element, lat)  # (T, ns, 3)
        T, ns, _ = deltas.shape
        offs = {}
        self.moves = []  # (t, a, b, off_id, da)
        for t in range(T):
            for a in range(ns):
                for b in range(ns):
                    off = tuple(deltas[t, b] - deltas[t, a])
                    oid = offs.setdefault(off, len(offs))
                    self.moves.append((t, a, b, oid, tuple(deltas[t, a])))
        self.offsets = tuple(offs.keys())
        self._deltas = deltas
        # geometry (cell-corner) deltas for device coord synthesis
        self._geo_deltas = _vertex_delta_table(mesh, lat)

        # bc data
        bc_mask_np = _bc_masks(V, bcs, self.dtype)
        self._bc_mask = jnp.asarray(bc_mask_np)
        bc_dofs = np.unique(np.concatenate([bc.dofs for bc in bcs])) if bcs else np.zeros(0, np.int64)
        self._bc_dofs_grid = jnp.asarray(bc_dofs.astype(np.int32))
        self.mpc = mpc_r

        # ---- lean fold path: periodic identification collapses into the
        # stencil AND the geometry is a pristine uniform grid, so assembly
        # needs NO per-cell host arrays at all — coordinates are synthesized
        # on device from iota, bc zeroing happens on the assembled DIA grid.
        # This is what makes 10M-dof setup O(surface) instead of O(cells). --
        self._lean = False
        self._blocked_lean = False
        if self.kernel_soa is not None and self.side_format == "fold":
            self._fold_axis, fold_mask, self._fold_pairs = _detect_lattice_wrap(
                mpc_r, self.vshape, bs
            )
            self._fold_mask = jnp.asarray(fold_mask)
            geo = None if ct.coeff_names else _uniform_lattice_geometry(mesh, lat)
            if geo is not None:
                self._lean = True
                self._origin, self._spacing = geo
                n0, n1, n2 = self.vshape
                keep = (1.0 - bc_mask_np).reshape(n0, n1, n2, bs)
                self._keep_grid = jnp.asarray(
                    np.moveaxis(keep, -1, 0).copy().astype(_real_dtype(self.dtype))
                )
                # static bc-dof multiplicity grid for the fused diagval add
                # (duplicate bc dofs add diagval once each, like .at[].add)
                indg = np.zeros(self.V.num_dofs, np.float64)
                np.add.at(indg, bc_dofs, 1.0)
                self._bc_ind_grid = jnp.asarray(
                    np.moveaxis(indg.reshape(n0, n1, n2, bs), -1, 0)
                    .copy().astype(np.float32))
                self.pattern = None
                self._keep_arg = self._keep_grid
                # fused pallas assembler (flagship P1 config, DEFAULT on
                # accelerators — 1560 MDoF/s vs 149 for the XLA lean path at
                # n=128; one plane-program pass, no O(cells) intermediates so
                # no x-chunking needed): opt out with DMT_NO_PALLAS=1
                import os as _os

                from .pallas_lattice import make_lean_fold_pallas, pallas_supported

                on_accel = jax.default_backend() in ("tpu", "axon")
                use_pallas = (pallas_supported(self) and on_accel
                              and not _os.environ.get("DMT_NO_PALLAS"))
                # parity-blocked layout for refined (degree-2) lattices:
                # 2.26x fewer operator bytes than the 65-diagonal refined DIA
                if r > 1 and bs == 1 and not _os.environ.get("DMT_NO_BLOCKED"):
                    self._blocked_lean = True
                    self._build_blocked_structure(
                        keep.reshape(n0, n1, n2).astype(_real_dtype(self.dtype))
                    )
                    self._keep_arg = self._keep_blocked
                    if use_pallas:
                        from .pallas_lattice import make_lean_blocked_pallas

                        # BC row/col masking fused into the kernel: the XLA
                        # 230-pass .at[m].multiply costs 4.5 ms of the
                        # 4.53 ms n=64 assembly (probe_p2_asm_phases, r4)
                        self._pallas_fused = (
                            self._bc_dofs_grid.shape[0] > 0
                            and not _os.environ.get("DMT_NO_FUSED_MASK"))
                        self._pallas_raw = make_lean_blocked_pallas(
                            self, fuse_mask=self._pallas_fused)
                        self._assemble = jax.jit(self._assemble_fold_lean_blocked_pallas)
                    else:
                        self._assemble = jax.jit(self._assemble_fold_lean_blocked)
                    return
                if use_pallas:
                    self._pallas_fused = (
                        r == 1  # fused masking is an r==1 feature
                        and self._bc_dofs_grid.shape[0] > 0
                        and not _os.environ.get("DMT_NO_FUSED_MASK"))
                    self._pallas_raw = make_lean_fold_pallas(
                        self, fuse_mask=self._pallas_fused)
                    self._assemble = jax.jit(self._assemble_fold_lean_pallas)
                elif self.x_chunks > 1:
                    nxl = lat.dims[0]
                    assert nxl % self.x_chunks == 0, "x_chunks must divide nx"
                    self._assemble = jax.jit(self._assemble_fold_lean_chunked)
                else:
                    self._assemble = jax.jit(self._assemble_fold_lean)
                return

        self._wdofmaps = {
            n: jnp.asarray(W.dofmap, jnp.int32) for n, W in zip(ct.coeff_names, ct.coeff_spaces)
        }
        self.coords = jnp.asarray(mesh.points[mesh.cells].astype(_real_dtype(dtype)))
        self.lf = jnp.zeros(mesh.num_cells, jnp.int32)
        if self.kernel_soa is not None:
            # reorder cells t-major (t, i, j, k): grid slices of Ae become
            # contiguous (stride-1 lanes) instead of stride-T on the cell axis
            nxl, nyl, nzl = lat.dims
            nzc_l = 1 if mesh.tdim == 2 else nzl
            Tl = lat.cells_per_box
            perm = (
                np.arange(mesh.num_cells)
                .reshape(nxl, nyl, nzc_l, Tl)
                .transpose(3, 0, 1, 2)
                .reshape(-1)
            )
            self._soa_perm = perm
            self.coords_soa = jnp.asarray(
                mesh.points[mesh.cells[perm]].astype(_real_dtype(dtype)).transpose(1, 2, 0)
            )

        # ---- MPC + BC side matrix over slave cells ----------------------
        tr = _build_cell_transforms(V, mpc_r, self.dtype)
        self.slave_cell_mask = jnp.asarray(
            tr.slave_cell_mask.astype(_real_dtype(self.dtype))
        )
        sc = np.flatnonzero(tr.slave_cell_mask)
        self._sc = sc
        batches, masks = [], []
        if len(sc):
            er = tr.ext_dofs  # (n_sc, W)
            rr = np.broadcast_to(er[:, :, None], (len(sc), er.shape[1], er.shape[1]))
            cc = np.broadcast_to(er[:, None, :], rr.shape)
            batches.append((rr, cc))
            masks.append((rr >= 0) & (cc >= 0))
            self._Tr = jnp.asarray(tr.T)
        else:
            batches.append((np.zeros((0, 1, 1), np.int64), np.zeros((0, 1, 1), np.int64)))
            masks.append(None)
            self._Tr = jnp.zeros((0, V.ndofs_cell, 1), self.dtype)
        slaves_row = (
            np.asarray(mpc_r.slaves, np.int64)
            if (mpc_r is not None and mpc_r.num_local_slaves)
            else np.zeros(0, np.int64)
        )
        batches.append((slaves_row, slaves_row))
        masks.append(None)
        N = V.num_dofs
        pattern = build_slot_pattern((N, N), batches, masks)
        self.pattern = pattern
        self._slots = [jnp.asarray(s.astype(np.int32)) for s in pattern.slots]
        self._side_cols = jnp.asarray(pattern.indices.astype(np.int32))
        self._side_rows = jnp.asarray(pattern.row_ids.astype(np.int32))
        self.n_slaves_diag = slaves_row.shape[0]
        self._dm_sc = jnp.asarray(V.dofmap[sc].astype(np.int32)) if len(sc) else jnp.zeros((0, V.ndofs_cell), jnp.int32)
        self._sc_dev = jnp.asarray(sc.astype(np.int32))

        if self.kernel_soa is not None:
            perm = self._soa_perm
            inv_perm = np.empty_like(perm)
            inv_perm[perm] = np.arange(len(perm))
            # static (nd, c) keep mask — bcs are fixed per compiled form
            self._keep_soa = jnp.asarray((1.0 - bc_mask_np[V.dofmap[perm]]).T.copy())
            self._slave_mask_soa = jnp.asarray(
                tr.slave_cell_mask[perm].astype(_real_dtype(self.dtype))
            )
            self._sc_soa = jnp.asarray(inv_perm[sc].astype(np.int32)) if len(sc) else jnp.zeros((0,), jnp.int32)
            self._wdofmaps_soa = {
                n: jnp.asarray(W.dofmap[perm], jnp.int32)
                for n, W in zip(ct.coeff_names, ct.coeff_spaces)
            }
            self._coeff_shapes = {
                n: (W.element.ndofs, W.block_size)
                for n, W in zip(ct.coeff_names, ct.coeff_spaces)
            }
            if self.side_format == "cells":
                er = tr.ext_dofs if len(sc) else np.zeros((0, 1), np.int64)
                self._er_soa = jnp.asarray(
                    np.where(er >= 0, er, V.num_dofs).astype(np.int32)
                )
                self._slaves_dev = (
                    jnp.asarray(np.asarray(mpc_r.slaves, np.int32))
                    if (mpc_r is not None and mpc_r.num_local_slaves)
                    else jnp.zeros((0,), jnp.int32)
                )
            # (fold_axis/fold_mask already detected in the lean branch above)
            if self.x_chunks > 1:
                # chunked assembly (memory-bounded for 10M-dof scale): cells
                # ordered i-major (i, t, j, k) so an x-slab is one contiguous
                # dynamic_slice; requires fold mode (no side machinery)
                assert self.side_format == "fold", "x_chunks needs side_format='fold'"
                assert not ct.coeff_names, "x_chunks v1: coefficient-free forms"
                nxl, nyl, nzl = lat.dims
                nzc_l = 1 if mesh.tdim == 2 else nzl
                assert nxl % self.x_chunks == 0, "x_chunks must divide nx"
                permx = (
                    np.arange(mesh.num_cells)
                    .reshape(nxl, nyl, nzc_l, lat.cells_per_box)
                    .transpose(0, 3, 1, 2)
                    .reshape(-1)
                )
                self._coords_xc = jnp.asarray(
                    mesh.points[mesh.cells[permx]].astype(_real_dtype(dtype)).transpose(1, 2, 0)
                )
                self._keep_xc = jnp.asarray((1.0 - bc_mask_np[V.dofmap[permx]]).T.copy())
                self._assemble = jax.jit(self._assemble_impl_fold_chunked)
            else:
                self._assemble = jax.jit(self._assemble_impl_soa)
        else:
            assert self.side_format == "csr", "side_format='cells' needs the SoA path"
            self._assemble = jax.jit(self._assemble_impl)

    # ------------------------------------------------------------------
    def _grouped_moves(self):
        grouped = {}
        for t, a, b, oid, da in self.moves:
            grouped.setdefault((oid, da), []).append((t, a, b))
        return grouped

    def _pack(self, fill, nb, out_xyz, zdtype):
        """Accumulate move-group blocks into the DIA data array.

        fill(tab, ci, cj) -> (nb[0], nb[1], nb[2]) box-grid block (the summed
        element-tensor entries of one (offset, corner-delta) group).  Targets
        are da + r*box — placed in ONE `lax.pad` with INTERIOR padding r-1
        per axis (strided placement without scatter).  For r=1 this is the
        plain edge pad; for r=2 it replaces a (q, s)-interleave
        transpose+reshape whose (…, 2)-minor relayout cost ~600x the element
        kernel on TPU (measured 994 ms vs 1.65 ms at P2 n=54)."""
        r3 = self.r3
        bs = self.bs
        zero = np.zeros((), zdtype).item() if np.dtype(zdtype).kind != "c" else np.dtype(zdtype).type(0)
        parts = [[[None for _ in range(bs)] for _ in range(bs)] for _ in self.offsets]
        for (oid, da), tab in self._grouped_moves().items():
            cfg = tuple(
                (da[d], out_xyz[d] - da[d] - r3[d] * (nb[d] - 1) - 1, r3[d] - 1)
                for d in range(3)
            )
            for ci in range(bs):
                for cj in range(bs):
                    blk = fill(tab, ci, cj)
                    padded = jax.lax.pad(blk, jnp.asarray(zero, blk.dtype), cfg)
                    cur = parts[oid][ci][cj]
                    parts[oid][ci][cj] = padded if cur is None else cur + padded
        zerog = None
        rows = []
        for oid in range(len(self.offsets)):
            for ci in range(bs):
                for cj in range(bs):
                    e = parts[oid][ci][cj]
                    if e is None:
                        if zerog is None:
                            zerog = jnp.zeros(out_xyz, zdtype)
                        e = zerog
                    rows.append(e)
        return jnp.stack(rows).reshape(
            (len(self.offsets), bs, bs) + tuple(out_xyz)
        )

    # ------------------------------------------------------------------
    def _assemble_impl(self, coords, bc_mask, coeff_vecs, diagval):
        V, lat = self.V, self.lat
        nx, ny, nz_ = lat.dims
        n0, n1, n2 = self.vshape
        bs = self.bs
        T = lat.cells_per_box
        ns = V.element.ndofs
        dt = self.dtype

        wl = {n: coeff_vecs[n][self._wdofmaps[n]] for n in coeff_vecs}
        Ae = self.kernel(coords, self.lf, wl)  # (n_cells, nd, nd) nd = ns*bs
        # zero BC rows/cols; diagval handled on the DIA diagonal below
        mr = 1.0 - bc_mask[jnp.asarray(V.dofmap, jnp.int32)]  # (n_cells, nd)
        Ae_bc = Ae * mr[:, :, None] * mr[:, None, :]
        # exclude slave cells from the stencil part
        Ae_st = Ae_bc * (1.0 - self.slave_cell_mask)[:, None, None].astype(Ae.dtype)
        nz_cells = 1 if self.mesh.tdim == 2 else nz_
        Ae_grid = Ae_st.reshape(nx, ny, nz_cells, T, ns, bs, ns, bs)

        data = self._pack(
            lambda tab, ci, cj: sum(Ae_grid[:, :, :, t, a, ci, b, cj] for t, a, b in tab),
            (nx, ny, nz_cells), (n0, n1, n2), Ae.dtype,
        )
        # Dirichlet + slave diagval on the (0,0,0) diagonal
        zid = self.offsets.index((0, 0, 0))
        diag_add = jnp.zeros(self.V.num_dofs, dtype=Ae.dtype)
        if self._bc_dofs_grid.shape[0]:
            diag_add = diag_add.at[self._bc_dofs_grid].add(diagval)
        dg = diag_add.reshape(n0, n1, n2, bs)
        for ci in range(bs):
            data = data.at[zid, ci, ci].add(dg[:, :, :, ci])

        # side matrix: K^H Ae K over slave cells + slave diagval
        n_sc = self._sc_dev.shape[0]
        nnz = self.pattern.nnz
        if n_sc:
            Ae_sl = Ae_bc[self._sc_dev]
            Aep = jnp.einsum(
                "ciw,cij,cjv->cwv", jnp.conj(self._Tr), Ae_sl, self._Tr,
                preferred_element_type=Ae.dtype,
            )
            vals = [Aep.reshape(-1)]
        else:
            vals = [jnp.zeros(self._slots[0].shape, Ae.dtype)]
        vals.append(jnp.full((self.n_slaves_diag,), diagval, dtype=Ae.dtype))
        side = jax.ops.segment_sum(
            jnp.concatenate(vals), jnp.concatenate(self._slots), num_segments=nnz + 1
        )[:nnz]
        dia = DIAMatrix(data, self.offsets, self.vshape, bs)
        return LatticeOperator(dia, side, self._side_cols, self._side_rows, self.V.num_dofs)

    # ------------------------------------------------------------------
    def _assemble_impl_soa(self, coords_soa, keep_soa, coeff_vecs, diagval):
        """Cells-last fast path: Ae arrives as (nd, nd, c) and every masking /
        grid-accumulation op broadcasts on the 128-lane cell axis."""
        V, lat = self.V, self.lat
        nx, ny, nz_ = lat.dims
        n0, n1, n2 = self.vshape
        bs = self.bs
        T = lat.cells_per_box
        nz_cells = 1 if self.mesh.tdim == 2 else nz_

        wl_soa = {}
        for n in self.coeff_names:
            ndw, bsw = self._coeff_shapes[n]
            wl = coeff_vecs[n][self._wdofmaps_soa[n]]  # (c, ndw*bsw)
            wl_soa[n] = jnp.moveaxis(wl.reshape(-1, ndw, bsw), 0, -1)  # (ndw, bsw, c)

        Ae = self.kernel_soa(coords_soa, wl_soa)  # (nd, nd, c) — cells t-major
        Ae_bc = Ae * keep_soa[:, None, :] * keep_soa[None, :, :]
        if self.side_format == "fold":
            # elimination happens in the operator's fold (plane identification)
            # — slave cells stay in the stencil, no side block at all
            Ae_st = Ae_bc
        else:
            Ae_st = Ae_bc * (1.0 - self._slave_mask_soa).astype(Ae.dtype)
        nd = Ae.shape[0]
        Ae_grid = Ae_st.reshape(nd, nd, T, nx, ny, nz_cells)

        # group moves by (offset, corner shift) and build each diagonal as ONE
        # fused pad(sum(...)) expression — a chain of .at[].add on the big
        # data array costs a full read-modify-write per move (~96x) while
        # padded sums fuse into one output pass per (oid, ci, cj)
        data = self._pack(
            lambda tab, ci, cj: sum(Ae_grid[a * bs + ci, b * bs + cj, t] for t, a, b in tab),
            (nx, ny, nz_cells), (n0, n1, n2), Ae.dtype,
        )
        zid = self.offsets.index((0, 0, 0))
        diag_add = jnp.zeros(self.V.num_dofs, dtype=Ae.dtype)
        if self._bc_dofs_grid.shape[0]:
            diag_add = diag_add.at[self._bc_dofs_grid].add(diagval)
        dg = diag_add.reshape(n0, n1, n2, bs)
        for ci in range(bs):
            data = data.at[zid, ci, ci].add(dg[:, :, :, ci])

        n_sc = self._sc_soa.shape[0]
        nnz = self.pattern.nnz
        dia = DIAMatrix(data, self.offsets, self.vshape, bs)
        if self.side_format == "fold":
            return LatticeOperator(
                dia, jnp.zeros((0,), Ae.dtype), None, None, self.V.num_dofs,
                diagval=diagval, fold_axis=self._fold_axis, fold_mask=self._fold_mask,
            )
        if n_sc:
            Ae_sl = jnp.moveaxis(Ae_bc[:, :, self._sc_soa], -1, 0)  # (n_sc, nd, nd)
            Aep = jnp.einsum(
                "ciw,cij,cjv->cwv", jnp.conj(self._Tr), Ae_sl, self._Tr,
                preferred_element_type=Ae.dtype,
            )
        else:
            Aep = None
        if self.side_format == "cells":
            W = self._er_soa.shape[1] if self._er_soa.size else 1
            Aep_c = Aep if Aep is not None else jnp.zeros((0, W, W), Ae.dtype)
            return LatticeOperator(
                dia, jnp.zeros((0,), Ae.dtype), None, None, self.V.num_dofs,
                side_Aep=Aep_c, side_er=self._er_soa, slaves=self._slaves_dev,
                diagval=diagval,
            )
        vals = [Aep.reshape(-1)] if Aep is not None else [jnp.zeros(self._slots[0].shape, Ae.dtype)]
        vals.append(jnp.full((self.n_slaves_diag,), diagval, dtype=Ae.dtype))
        side = jax.ops.segment_sum(
            jnp.concatenate(vals), jnp.concatenate(self._slots), num_segments=nnz + 1
        )[:nnz]
        return LatticeOperator(dia, side, self._side_cols, self._side_rows, self.V.num_dofs)

    # ------------------------------------------------------------------
    def _assemble_impl_fold_chunked(self, coords_xc, keep_xc, diagval):
        """Memory-bounded fold assembly: fori_loop over x-slabs; each slab's
        element tensors live only for its iteration (the monolithic version
        OOMs past ~8M cells when XLA materializes the fused J/G intermediates)."""
        lat = self.lat
        nx, ny, nz_ = lat.dims
        n0, n1, n2 = self.vshape
        bs = self.bs
        T = lat.cells_per_box
        nz_cells = 1 if self.mesh.tdim == 2 else nz_
        NC = self.x_chunks
        nxc = nx // NC
        nv = self.mesh.cells.shape[1]
        g = self.mesh.gdim
        nd = self.V.ndofs_cell
        csz = nxc * T * ny * nz_cells
        r0 = self.r3[0]
        wx = r0 * nxc + 1  # refined-grid x extent of one slab window

        def body(ic, data):
            c0 = ic * csz
            cs = jax.lax.dynamic_slice(coords_xc, (0, 0, c0), (nv, g, csz))
            ks = jax.lax.dynamic_slice(keep_xc, (0, c0), (nd, csz))
            Ae = self.kernel_soa(cs, {})
            Ae = Ae * ks[:, None, :] * ks[None, :, :]
            Ag = Ae.reshape(nd, nd, nxc, T, ny, nz_cells)
            local = self._pack(
                lambda tab, ci, cj: sum(Ag[a * bs + ci, b * bs + cj, :, t] for t, a, b in tab),
                (nxc, ny, nz_cells), (wx, n1, n2), Ae.dtype,
            )
            win = jax.lax.dynamic_slice(
                data, (0, 0, 0, ic * r0 * nxc, 0, 0),
                (len(self.offsets), bs, bs, wx, n1, n2),
            )
            return jax.lax.dynamic_update_slice(
                data, win + local, (0, 0, 0, ic * r0 * nxc, 0, 0)
            )

        data = jax.lax.fori_loop(
            0, NC, body, jnp.zeros((len(self.offsets), bs, bs, n0, n1, n2),
                                   _real_dtype(self.dtype) if np.dtype(self.dtype).kind != "c" else self.dtype)
        )
        zid = self.offsets.index((0, 0, 0))
        diag_add = jnp.zeros(self.V.num_dofs, dtype=data.dtype)
        if self._bc_dofs_grid.shape[0]:
            diag_add = diag_add.at[self._bc_dofs_grid].add(diagval)
        dg = diag_add.reshape(n0, n1, n2, bs)
        for ci in range(bs):
            data = data.at[zid, ci, ci].add(dg[:, :, :, ci])
        dia = DIAMatrix(data, self.offsets, self.vshape, bs)
        return LatticeOperator(
            dia, jnp.zeros((0,), data.dtype), None, None, self.V.num_dofs,
            diagval=diagval, fold_axis=self._fold_axis, fold_mask=self._fold_mask,
        )

    # ------------------------------------------------------------------
    # lean fold path: device-synthesized coords, grid-level bc zeroing
    # ------------------------------------------------------------------
    def _synth_coords(self, jitter, order, ic=0):
        """Cell-corner coordinates synthesized on device from iota for a
        pristine uniform lattice (no host gather, no O(cells) transfer).
        order "tmajor": all cells ordered (t, i, j, k); order "islab": slab
        `ic` of x_chunks with cells ordered (i_local, t, j, k).  `jitter`
        scales the geometry (used by bench.py to defeat dispatch caching
        while keeping real per-cell geometry work in the kernel)."""
        lat = self.lat
        nx, ny, nz_ = lat.dims
        nzc = 1 if self.mesh.tdim == 2 else nz_
        T = lat.cells_per_box
        nv = self._geo_deltas.shape[1]
        g = self.mesh.gdim
        dt = _real_dtype(self.dtype)
        if order == "tmajor":
            shape = (T, nx, ny, nzc)
            t_ax, axes = 0, (1, 2, 3)
            i0 = 0
        else:
            nxc = nx // self.x_chunks
            shape = (nxc, T, ny, nzc)
            t_ax, axes = 1, (0, 2, 3)
            i0 = ic * (nx // self.x_chunks)
        base = [jax.lax.broadcasted_iota(jnp.int32, shape, ax) for ax in axes]
        base[0] = base[0] + i0
        dshape = [1, 1, 1, 1]
        dshape[t_ax] = T
        scale = 1.0 + jitter
        comps = []
        for d in range(g):
            deltas_d = self._geo_deltas[:, :, d].T.reshape(nv, *dshape)  # (nv,1,T,1,1)
            pos = base[d][None].astype(dt) + jnp.asarray(deltas_d.astype(np.float64), dt)
            # python-float origin/spacing: numpy f64 scalars would promote
            # the whole f32 stream to f64 under x64
            x_d = scale * (float(self._origin[d]) + float(self._spacing[d]) * pos)
            comps.append(x_d.reshape(nv, -1))
        return jnp.stack(comps, axis=1)  # (nv, g, n_cells_or_slab)

    def _zero_bc_on_grid(self, data, keep_grid):
        """Zero bc rows/cols directly on the DIA data: entry (r, r+off) dies
        iff r or r+off is a bc dof — identical to element-level masking but
        O(n_off * grid) instead of O(nd^2 * cells).  `keep_grid` is a traced
        ARGUMENT: as a closed-over constant XLA folds its broadcast/pad
        chains into per-offset literals with a pathological size-1-minor
        layout (632 MB each at P2 n=54 — 128x padding)."""
        if self._bc_dofs_grid.shape[0] == 0:
            return data
        kb = keep_grid.astype(data.dtype)  # (bs, n0, n1, n2)
        n0, n1, n2 = self.vshape
        bs = self.bs
        # pure 3-D elementwise ops: broadcasting with size-1 axes
        # (kb[None,:,None] * kcols[:,None]) makes XLA pick layouts with a
        # size-1 minor dim -> T(1,128) tiling pads every temp 128x (632 MB
        # buffers at P2 n=54)
        rows = []
        for d, (di, dj, dk) in enumerate(self.offsets):
            src = (
                slice(None),
                slice(max(di, 0), n0 + min(di, 0)),
                slice(max(dj, 0), n1 + min(dj, 0)),
                slice(max(dk, 0), n2 + min(dk, 0)),
            )
            pad = (
                (0, 0),
                (max(-di, 0), max(di, 0)),
                (max(-dj, 0), max(dj, 0)),
                (max(-dk, 0), max(dk, 0)),
            )
            kcol = jnp.pad(kb[src], pad)  # (bs, n0, n1, n2)
            for ci in range(bs):
                for cj in range(bs):
                    rows.append(data[d, ci, cj] * kb[ci] * kcol[cj])
        return jnp.stack(rows).reshape(data.shape)

    def _diag_adds(self, data, diagval):
        """Add diagval on Dirichlet diagonals (surface-sized scatter)."""
        n0, n1, n2 = self.vshape
        zid = self.offsets.index((0, 0, 0))
        diag_add = jnp.zeros(self.V.num_dofs, dtype=data.dtype)
        if self._bc_dofs_grid.shape[0]:
            diag_add = diag_add.at[self._bc_dofs_grid].add(diagval)
        dg = diag_add.reshape(n0, n1, n2, self.bs)
        for ci in range(self.bs):
            data = data.at[zid, ci, ci].add(dg[:, :, :, ci])
        return data

    # ------------------------------------------------------------------
    # parity-blocked (degree-2) lean path: see BlockDIAMatrix
    # ------------------------------------------------------------------
    def _build_blocked_structure(self, keep_fine):
        """Classify every move by (row parity class, col parity class,
        coarse offset) and precompute the padded per-class keep masks.
        keep_fine: host (n0, n1, n2) array, 1.0 on non-bc dofs."""
        import itertools

        deltas = self._deltas
        r3 = self.r3
        self._cdims = tuple(-(-n // r) for n, r in zip(self.vshape, r3))
        self._classes = tuple(itertools.product(*(range(r) for r in r3)))
        tripmap = {}
        self._bmoves = []  # (t, a, b, trip_id, (sx, sy, sz) corner shift)
        for t, a, b, oid, da in self.moves:
            db_ = tuple(int(v) for v in deltas[t, b])
            cr = tuple(int(da[i]) % r3[i] for i in range(3))
            cc = tuple(db_[i] % r3[i] for i in range(3))
            off = tuple(db_[i] // r3[i] - int(da[i]) // r3[i] for i in range(3))
            m = tripmap.setdefault((cr, cc, off), len(tripmap))
            self._bmoves.append(
                (t, a, b, m, tuple(int(da[i]) // r3[i] for i in range(3)))
            )
        trips = tuple(tripmap.keys())
        # order triples x-parity-contiguously: the pallas SpMV issues one
        # call per row x-parity and must slice (not gather) its data rows
        order = sorted(range(len(trips)), key=lambda m: trips[m][0][0])
        remap = {old: new for new, old in enumerate(order)}
        self.trips = tuple(trips[o] for o in order)
        self._bmoves = [(t, a, b, remap[m], sh) for t, a, b, m, sh in self._bmoves]
        s0, s1, s2 = self._cdims
        kb = np.zeros((len(self._classes), s0, s1, s2), np.asarray(keep_fine).dtype)
        for i, (p0, p1, p2) in enumerate(self._classes):
            g = np.asarray(keep_fine)[p0::r3[0], p1::r3[1], p2::r3[2]]
            kb[i, : g.shape[0], : g.shape[1], : g.shape[2]] = g
        self._keep_blocked = jnp.asarray(kb)
        # static blocked bc-dof indicator (for the diagval diagonal add):
        # count multiplicity like .at[].add does (duplicate bc dofs add twice)
        ind = np.zeros(int(np.prod(self.vshape)), np.float64)
        np.add.at(ind, np.asarray(self._bc_dofs_grid), 1.0)
        ind = ind.reshape(self.vshape)
        ib = np.zeros((len(self._classes), s0, s1, s2), np.float64)
        for i, (p0, p1, p2) in enumerate(self._classes):
            g = ind[p0::r3[0], p1::r3[1], p2::r3[2]]
            ib[i, : g.shape[0], : g.shape[1], : g.shape[2]] = g
        self._bc_ind_blocked = jnp.asarray(ib.astype(np.float32))
        # blocked fold mask for the blocked-native matvec: per class, the
        # perpendicular-plane identification mask on the class grid (only
        # classes with parity 0 along the fold axis participate; both end
        # planes are even since refined dims are odd).  Shape (n_cls, sA, sB)
        # with (A, B) the non-fold axes in order; padded slots are False.
        self._fold_mask_blocked = None
        if self._fold_axis is not None:
            ax = self._fold_axis
            mf = np.asarray(self._fold_mask)  # (nA, nB, bs), bs == 1
            mf = mf.reshape(mf.shape[0], mf.shape[1])
            perp = [a for a in range(3) if a != ax]
            sA, sB = self._cdims[perp[0]], self._cdims[perp[1]]
            mb = np.zeros((len(self._classes), sA, sB), bool)
            for i, pc in enumerate(self._classes):
                if pc[ax] != 0:
                    continue
                g = mf[pc[perp[0]]::r3[perp[0]], pc[perp[1]]::r3[perp[1]]]
                mb[i, : g.shape[0], : g.shape[1]] = g
            self._fold_mask_blocked = jnp.asarray(mb)

    def _grouped_bmoves(self):
        grouped = {}
        for t, a, b, m, sh in self._bmoves:
            grouped.setdefault((m, sh), []).append((t, a, b))
        return grouped

    def _pack_blocked(self, fill, nb, zdtype):
        """Blocked analogue of _pack: accumulate per-(triple, corner-shift)
        box blocks onto the padded class grids — edge pads only, no interior
        pad, no upsampling (the compression IS the layout)."""
        s = self._cdims
        zero = (np.zeros((), zdtype).item()
                if np.dtype(zdtype).kind != "c" else np.dtype(zdtype).type(0))
        parts = [None] * len(self.trips)
        for (m, sh), tab in self._grouped_bmoves().items():
            blk = fill(tab)
            cfg = tuple((sh[d], s[d] - sh[d] - nb[d], 0) for d in range(3))
            padded = jax.lax.pad(blk, jnp.asarray(zero, blk.dtype), cfg)
            parts[m] = padded if parts[m] is None else parts[m] + padded
        return jnp.stack(parts)

    def _zero_bc_blocked(self, data, keep_blocked):
        """Blocked analogue of _zero_bc_on_grid: entry (r, r+off) dies iff
        either end is a bc dof, applied per class pair on the padded grids."""
        if self._bc_dofs_grid.shape[0] == 0:
            return data
        s0, s1, s2 = self._cdims
        cls_id = {c: i for i, c in enumerate(self._classes)}
        kb = keep_blocked.astype(data.dtype)
        # per-triple IN-PLACE multiplies: a stack/concatenate over the 230
        # triple rows let XLA pick a layout with the triple axis inside the
        # (8, 128) tile — 130x padding per row temp, 18.7 GB HLO-temp OOM at
        # n=54.  Sequential .at[m].multiply keeps one small temp live.
        for m, (cr, cc, off) in enumerate(self.trips):
            di, dj, dk = off
            src = (
                cls_id[cc],
                slice(max(di, 0), s0 + min(di, 0)),
                slice(max(dj, 0), s1 + min(dj, 0)),
                slice(max(dk, 0), s2 + min(dk, 0)),
            )
            pad = (
                (max(-di, 0), max(di, 0)),
                (max(-dj, 0), max(dj, 0)),
                (max(-dk, 0), max(dk, 0)),
            )
            kcol = jnp.pad(kb[src], pad)
            data = data.at[m].multiply(kb[cls_id[cr]] * kcol)
        return data

    def _diag_adds_blocked(self, data, diagval):
        """Add diagval on Dirichlet diagonals (per-class surface scatter).

        The bc indicator in blocked layout is STATIC — precomputed in
        _build_blocked_structure — so this is 8 diagonal-plane adds, not the
        interleave->blocked transpose of a full vector (which measured
        ~2.5 ms of the 2.8 ms fused-assembler total at n=64, probe r4)."""
        if not self._bc_dofs_grid.shape[0]:
            return data
        db = self._bc_ind_blocked.astype(data.dtype)
        cls_id = {c: i for i, c in enumerate(self._classes)}
        for m, (cr, cc, off) in enumerate(self.trips):
            if cr == cc and off == (0, 0, 0):
                data = data.at[m].add(diagval * db[cls_id[cr]])
        return data

    def _assemble_fold_lean_blocked(self, jitter, diagval, keep_blocked):
        """Lean fold assembly into the parity-blocked layout (XLA path;
        same element kernel, blocked packing).  Mirrors
        _assemble_fold_lean / reference assemble_matrix.cpp:488-547."""
        lat = self.lat
        nx, ny, nz_ = lat.dims
        T = lat.cells_per_box
        nzc = 1 if self.mesh.tdim == 2 else nz_

        Ae = self.kernel_soa(self._synth_coords(jitter, "tmajor"), {})
        nd = Ae.shape[0]
        Ae_grid = Ae.reshape(nd, nd, T, nx, ny, nzc)
        data = self._pack_blocked(
            lambda tab: sum(Ae_grid[a, b, t] for t, a, b in tab),
            (nx, ny, nzc), Ae.dtype,
        )
        data = self._zero_bc_blocked(data, keep_blocked)
        data = self._diag_adds_blocked(data, diagval)
        dia = BlockDIAMatrix(data, self.trips, self.vshape, self.r3, self.bs)
        return LatticeOperator(
            dia, jnp.zeros((0,), Ae.dtype), None, None, self.V.num_dofs,
            diagval=diagval, fold_axis=self._fold_axis, fold_mask=self._fold_mask,
            fold_mask_b=self._fold_mask_blocked,
        )

    def _assemble_fold_lean_blocked_pallas(self, jitter, diagval, keep_blocked):
        """Blocked contract via the fused pallas kernel
        (ops/pallas_lattice.py:make_lean_blocked_pallas)."""
        if getattr(self, "_pallas_fused", False):
            # BC row/col masks AND the diagval bc-diagonal add applied
            # inside the kernel: one HBM pass writes the final operator
            data = self._pallas_raw(jitter, keep_blocked, diagval,
                                    self._bc_ind_blocked)
        else:
            data = self._pallas_raw(jitter)  # (n_trip, s0, s1, s2) unmasked
            data = self._zero_bc_blocked(data, keep_blocked)
            data = self._diag_adds_blocked(data, diagval)
        dia = BlockDIAMatrix(data, self.trips, self.vshape, self.r3, self.bs)
        return LatticeOperator(
            dia, jnp.zeros((0,), data.dtype), None, None, self.V.num_dofs,
            diagval=diagval, fold_axis=self._fold_axis, fold_mask=self._fold_mask,
            fold_mask_b=self._fold_mask_blocked,
        )

    def _assemble_fold_lean(self, jitter, diagval, keep_grid):
        lat = self.lat
        nx, ny, nz_ = lat.dims
        n0, n1, n2 = self.vshape
        bs = self.bs
        T = lat.cells_per_box
        nzc = 1 if self.mesh.tdim == 2 else nz_

        Ae = self.kernel_soa(self._synth_coords(jitter, "tmajor"), {})
        nd = Ae.shape[0]
        Ae_grid = Ae.reshape(nd, nd, T, nx, ny, nzc)
        data = self._pack(
            lambda tab, ci, cj: sum(Ae_grid[a * bs + ci, b * bs + cj, t] for t, a, b in tab),
            (nx, ny, nzc), (n0, n1, n2), Ae.dtype,
        )
        data = self._zero_bc_on_grid(data, keep_grid)
        data = self._diag_adds(data, diagval)
        dia = DIAMatrix(data, self.offsets, self.vshape, bs)
        return LatticeOperator(
            dia, jnp.zeros((0,), Ae.dtype), None, None, self.V.num_dofs,
            diagval=diagval, fold_axis=self._fold_axis, fold_mask=self._fold_mask,
        )

    def _assemble_fold_lean_pallas(self, jitter, diagval, keep_grid):
        """Same contract as _assemble_fold_lean, via the fused pallas kernel
        (ops/pallas_lattice.py; verified entry-identical in
        tests/test_pallas_lattice.py)."""
        n0, n1, n2 = self.vshape
        if getattr(self, "_pallas_fused", False):
            # masks + diagval fused in-kernel: one HBM pass
            data = self._pallas_raw(jitter, keep_grid, diagval,
                                    self._bc_ind_grid)
            data = data.reshape(len(self.offsets), self.bs, self.bs, n0, n1, n2)
        else:
            data = self._pallas_raw(jitter)  # (n_off*bs*bs, n0, n1, n2) unmasked
            data = data.reshape(len(self.offsets), self.bs, self.bs, n0, n1, n2)
            data = self._zero_bc_on_grid(data, keep_grid)
            data = self._diag_adds(data, diagval)
        dia = DIAMatrix(data, self.offsets, self.vshape, self.bs)
        return LatticeOperator(
            dia, jnp.zeros((0,), data.dtype), None, None, self.V.num_dofs,
            diagval=diagval, fold_axis=self._fold_axis, fold_mask=self._fold_mask,
        )

    def _assemble_fold_lean_chunked(self, jitter, diagval, keep_grid):
        """Memory-bounded lean assembly: fori_loop over x-slabs with
        device-synthesized slab coordinates (10M-dof scale: nothing of
        O(cells) ever exists on host OR in a single device buffer)."""
        lat = self.lat
        nx, ny, nz_ = lat.dims
        n0, n1, n2 = self.vshape
        bs = self.bs
        T = lat.cells_per_box
        nzc = 1 if self.mesh.tdim == 2 else nz_
        NC = self.x_chunks
        nxc = nx // NC
        nd = self.V.ndofs_cell
        r0 = self.r3[0]
        wx = r0 * nxc + 1

        rdt = _real_dtype(self.dtype)
        out_dt = self.dtype if np.dtype(self.dtype).kind == "c" else rdt

        def body(ic, data):
            cs = self._synth_coords(jitter, "islab", ic)
            Ae = self.kernel_soa(cs, {})
            Ag = Ae.reshape(nd, nd, nxc, T, ny, nzc)
            local = self._pack(
                lambda tab, ci, cj: sum(Ag[a * bs + ci, b * bs + cj, :, t] for t, a, b in tab),
                (nxc, ny, nzc), (wx, n1, n2), Ae.dtype,
            )
            win = jax.lax.dynamic_slice(
                data, (0, 0, 0, ic * r0 * nxc, 0, 0),
                (len(self.offsets), bs, bs, wx, n1, n2),
            )
            return jax.lax.dynamic_update_slice(
                data, win + local, (0, 0, 0, ic * r0 * nxc, 0, 0)
            )

        data = jax.lax.fori_loop(
            0, NC, body, jnp.zeros((len(self.offsets), bs, bs, n0, n1, n2), out_dt)
        )
        data = self._zero_bc_on_grid(data, keep_grid)
        data = self._diag_adds(data, diagval)
        dia = DIAMatrix(data, self.offsets, self.vshape, bs)
        return LatticeOperator(
            dia, jnp.zeros((0,), data.dtype), None, None, self.V.num_dofs,
            diagval=diagval, fold_axis=self._fold_axis, fold_mask=self._fold_mask,
        )

    def assemble(self) -> LatticeOperator:
        if self._lean:
            op = self._assemble(
                jnp.asarray(0.0, _real_dtype(self.dtype)),
                jnp.asarray(self.diagval, self.dtype),
                self._keep_arg,
            )
            op.fold_pairs = self._fold_pairs
            return op
        coeff_vecs = {
            n: jnp.array(self.term.coefficients[n].x.array, copy=True)
            for n in self.coeff_names
        }
        if self.kernel_soa is not None:
            if self.x_chunks > 1:
                op = self._assemble(
                    self._coords_xc, self._keep_xc, jnp.asarray(self.diagval, self.dtype)
                )
                op.fold_pairs = self._fold_pairs
                return op
            op = self._assemble(
                self.coords_soa, self._keep_soa, coeff_vecs, jnp.asarray(self.diagval, self.dtype)
            )
            if self.side_format == "fold":
                op.fold_pairs = self._fold_pairs  # host data for to_scipy
            return op
        return self._assemble(
            self.coords, self._bc_mask, coeff_vecs, jnp.asarray(self.diagval, self.dtype)
        )
