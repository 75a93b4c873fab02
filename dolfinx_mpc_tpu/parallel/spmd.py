"""SPMD distributed path: cell-sharded constrained assembly + row-block CG
over a `jax.sharding.Mesh`.

TPU-native replacement for the reference's MPI domain decomposition
(SURVEY.md §2.3): DOLFINx's IndexMap owner/ghost machinery and PETSc's
off-process value caching (/root/reference/cpp/mpc_helpers.h:139-235,
python/src/dolfinx_mpc/numba/numba_setup.py:76-153) become static slot
tables + two XLA collectives:

- assembly: every device computes element tensors for its cell shard,
  segment-sums them into the GLOBAL packed CSR-slot layout, and a single
  `psum_scatter` leaves each device with exactly its row-block of matrix
  data (replacing PETSc MatAssembly's neighbor exchanges).
- solve: CG with BOTH the matrix and every Krylov vector row-block
  sharded.  Each device holds only its rpd-row block plus the ghost
  values its columns reference; the per-iteration halo exchange is ONE
  `all_to_all` moving static, host-computed per-(src,dst) index lists —
  the direct analogue of DOLFINx's IndexMap scatter_fwd
  (/root/reference/cpp/mpc_helpers.h:139-235) expressed as an XLA
  collective.  Memory and exchange volume per device scale with
  rpd + ghosts, not with N (weak scaling), unlike an all_gather design.

Unlike the single-device fast path (ops/assemble.py) which splits
slave/non-slave cell batches, the SPMD path treats every cell uniformly with
a per-cell prolongation T (identity for unconstrained cells) so the per-cell
work is homogeneous across the shard — no load imbalance, one fused
`conj(T)^T A_e T` einsum on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fem.forms import Form
from ..la.sparse import build_slot_pattern
from ..multipointconstraint import MultiPointConstraint
from ..ops.assemble import (
    CellTransforms,
    _bc_masks,
    _bc_values,
    _build_cell_transforms,
    _mpc_pair,
    _real_dtype,
)
from ..ops.kernels import compile_term

__all__ = ["make_device_mesh", "ShardedLinearProblem"]

AXIS = "shard"


def make_device_mesh(n_devices=None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _ext_uniform(tr: CellTransforms, pos: np.ndarray, dm: np.ndarray) -> np.ndarray:
    """ext dof table for EVERY cell: plain dofs for unconstrained cells,
    the slave-cell extended row otherwise.  Vectorized (no per-cell loop)."""
    n, nd = dm.shape
    We = tr.ext_dofs.shape[1] if tr.ext_dofs.size else nd
    W = max(We, nd)
    out = np.full((n, W), -1, dtype=np.int64)
    out[:, :nd] = dm
    hit = pos >= 0
    if hit.any():
        sub = np.full((int(hit.sum()), W), -1, dtype=np.int64)
        sub[:, :We] = tr.ext_dofs[pos[hit]]
        out[hit] = sub
    return out


def _T_uniform(tr: CellTransforms, pos: np.ndarray, nd: int, W: int, dtype) -> np.ndarray:
    n = len(pos)
    out = np.zeros((n, nd, W), dtype=dtype)
    out[:, :, :nd] = np.eye(nd, dtype=dtype)
    hit = pos >= 0
    if hit.any():
        Wt = tr.T.shape[2]
        sub = np.zeros((int(hit.sum()), nd, W), dtype=dtype)
        sub[:, :, :Wt] = tr.T[pos[hit]]
        out[hit] = sub
    return out


def _pad_cells(arr: np.ndarray, n_pad: int, fill="repeat"):
    """Pad the leading (cell) axis to n_pad; `repeat` duplicates row 0 (keeps
    geometry non-degenerate), otherwise fills with the given constant."""
    n = arr.shape[0]
    if n == n_pad:
        return arr
    pad_shape = (n_pad - n,) + arr.shape[1:]
    if fill == "repeat":
        pad = np.broadcast_to(arr[:1], pad_shape).copy() if n else np.zeros(pad_shape, arr.dtype)
    else:
        pad = np.full(pad_shape, fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


@dataclass
class RowPartition:
    """Row-block partition of a SlotPattern across n_dev devices.

    Packed layout: entry j of device d lives at global packed slot
    d*nnz_pad + (j - indptr[row_start_d]); CSR entries are row-sorted so each
    device's rows are a contiguous slot range.
    """

    n_dev: int
    rows_per_dev: int  # rpd; device d owns rows [d*rpd, (d+1)*rpd)
    nnz_pad: int
    remap: np.ndarray  # (nnz+1,) old slot -> packed slot (trash -> n_dev*nnz_pad)
    cols: np.ndarray  # (n_dev, nnz_pad) int32, 0-padded
    lrows: np.ndarray  # (n_dev, nnz_pad) int32 local row, 0-padded
    valid: np.ndarray  # (n_dev, nnz_pad) bool


def build_ghost_exchange(part: RowPartition):
    """Static halo-exchange tables for the distributed SpMV.

    For each device d, the off-block columns of its rows are its GHOSTS.
    Ghost traffic is organized by ring OFFSET delta = (dst - src) mod n_dev
    — one `ppermute` rotation per ACTIVE offset, each with its own buffer
    width.  With row-block partitions of a locality-ordered mesh, only
    delta = +-1 (slab neighbors) and the few offsets induced by MPC
    couplings (periodic wrap, contact interface) are active, so the
    receive window is rpd + sum_active(ms_delta) — NOT n_dev * max (an
    all_to_all would pad every pair to the global max), and the halos ride
    neighbor ICI links.

    Returns:
      rounds: list of (delta, send_idx) with send_idx (n_dev, ms_delta)
        int32 — device s sends x_loc[send_idx[s]] to (s+delta) % n_dev;
      lcols: (n_dev, nnz_pad) int32 — per-nnz LOCAL column: owned columns
        map to [0, rpd), ghosts to rpd + offset_of(delta) + j;
      window: rpd + total ghost slots (per-device vector length).
    """
    n_dev, rpd = part.n_dev, part.rows_per_dev
    # ghosts[s][d]: global cols device d needs from source s
    ghosts = [[np.zeros(0, np.int64)] * n_dev for _ in range(n_dev)]
    for d in range(n_dev):
        cols = part.cols[d][part.valid[d]].astype(np.int64)
        off = cols[(cols // rpd) != d]
        if off.size:
            u = np.unique(off)
            own = u // rpd
            for s in np.unique(own):
                ghosts[int(s)][d] = u[own == s]
    # active ring offsets and their buffer widths
    ms_delta = {}
    for s in range(n_dev):
        for d in range(n_dev):
            cnt = ghosts[s][d].shape[0]
            if cnt:
                delta = (d - s) % n_dev
                ms_delta[delta] = max(ms_delta.get(delta, 0), cnt)
    deltas = sorted(ms_delta)
    offsets = {}
    pos = rpd
    for delta in deltas:
        offsets[delta] = pos
        pos += ms_delta[delta]
    window = pos
    rounds = []
    for delta in deltas:
        si = np.zeros((n_dev, ms_delta[delta]), np.int32)
        for s in range(n_dev):
            g = ghosts[s][(s + delta) % n_dev]
            si[s, : g.shape[0]] = (g - s * rpd).astype(np.int32)
        rounds.append((delta, si))
    lcols = np.zeros((n_dev, part.nnz_pad), np.int32)
    for d in range(n_dev):
        gmap = {}
        for s in range(n_dev):
            g = ghosts[s][d]
            if g.size:
                base = offsets[(d - s) % n_dev]
                for j, c in enumerate(g):
                    gmap[int(c)] = base + j
        cols = part.cols[d].astype(np.int64)
        own = (cols // rpd) == d
        lc = np.where(own & part.valid[d], cols - d * rpd, 0).astype(np.int64)
        gh = np.flatnonzero(~own & part.valid[d])
        if gh.size:
            lc[gh] = np.fromiter((gmap[int(c)] for c in cols[gh]), np.int64,
                                 count=gh.size)
        lcols[d] = lc.astype(np.int32)
    return rounds, lcols, window


def partition_rows(pattern, n_dev: int) -> RowPartition:
    N = pattern.shape[0]
    rpd = -(-N // n_dev)
    nnz = pattern.nnz
    row_ids = pattern.row_ids.astype(np.int64)
    indptr = pattern.indptr
    bounds = np.minimum(np.arange(n_dev + 1) * rpd, N)
    start = indptr[bounds[:-1]]
    end = indptr[bounds[1:]]
    nnz_d = end - start
    nnz_pad = max(int(nnz_d.max()) if n_dev else 1, 1)
    dev_of = row_ids // rpd
    new_slot = dev_of * nnz_pad + (np.arange(nnz, dtype=np.int64) - start[dev_of])
    remap = np.append(new_slot, n_dev * nnz_pad).astype(np.int64)
    cols = np.zeros((n_dev, nnz_pad), dtype=np.int32)
    lrows = np.zeros((n_dev, nnz_pad), dtype=np.int32)
    valid = np.zeros((n_dev, nnz_pad), dtype=bool)
    for d in range(n_dev):
        k = nnz_d[d]
        cols[d, :k] = pattern.indices[start[d] : end[d]]
        lrows[d, :k] = row_ids[start[d] : end[d]] - d * rpd
        valid[d, :k] = True
    return RowPartition(n_dev, rpd, nnz_pad, remap, cols, lrows, valid)


class ShardedLinearProblem:
    """Distributed constrained Poisson-type solve: one jitted SPMD step doing
    assemble(A, b) + lifting + set_bc + CG + backsubstitution, with cells
    sharded over the device mesh (reference LinearProblem.solve end-to-end,
    problem.py:532-598, re-expressed as a single XLA program)."""

    def __init__(
        self,
        a: Form,
        L: Form,
        mpc: MultiPointConstraint,
        bcs=None,
        device_mesh: Mesh = None,
        dtype=np.float64,
        rtol=1e-8,
        max_it=2000,
        diagval=1.0,
    ):
        self.device_mesh = device_mesh if device_mesh is not None else make_device_mesh()
        n_dev = self.device_mesh.devices.size
        self.n_dev = n_dev
        bcs = bcs or []
        mpc_r, mpc_c = _mpc_pair(mpc)
        self.mpc = mpc_r
        Vt, Vs = a.test_space, a.trial_space
        self.V = Vt
        dtype = np.dtype(dtype)
        self.dtype = dtype
        tr_row = _build_cell_transforms(Vt, mpc_r, dtype)
        tr_col = _build_cell_transforms(Vs, mpc_c, dtype)
        mesh = Vt.mesh
        points = mesh.points

        # ---- host: uniform per-cell tables, sharded on the cell axis ------
        a_terms = [compile_term(t, Vt, Vs) for t in a.terms]
        L_terms = [compile_term(t, Vt, None) for t in L.terms]

        N = Vt.num_dofs
        batches, masks = [], []
        a_tabs = []
        for ct in a_terms:
            cells = ct.cells
            dmr, dmc = Vt.dofmap[cells], Vs.dofmap[cells]
            pr, pc = tr_row.cell_pos[cells], tr_col.cell_pos[cells]
            er = _ext_uniform(tr_row, pr, dmr)
            ec = _ext_uniform(tr_col, pc, dmc)
            Tr = _T_uniform(tr_row, pr, dmr.shape[1], er.shape[1], dtype)
            Tc = _T_uniform(tr_col, pc, dmc.shape[1], ec.shape[1], dtype)
            n_act = len(cells)
            rr = np.broadcast_to(er[:, :, None], (n_act, er.shape[1], ec.shape[1]))
            cc = np.broadcast_to(ec[:, None, :], rr.shape)
            batches.append((rr, cc))
            masks.append((rr >= 0) & (cc >= 0))
            lf = ct.local_facets if ct.local_facets is not None else np.zeros(n_act, np.int32)
            a_tabs.append(
                dict(
                    coords=points[mesh.cells[cells]].astype(_real_dtype(dtype)),
                    lf=lf.astype(np.int32),
                    Tr=Tr,
                    Tc=Tc,
                    dmr=dmr.astype(np.int32),
                    dmc=dmc.astype(np.int32),
                    er=er,
                    wdofmaps={
                        n: W.dofmap[cells].astype(np.int32)
                        for n, W in zip(ct.coeff_names, ct.coeff_spaces)
                    },
                )
            )
        slaves_row = (
            np.asarray(mpc_r.slaves, np.int64)
            if (mpc_r is not None and mpc_r.num_local_slaves)
            else np.zeros(0, np.int64)
        )
        batches.append((slaves_row, slaves_row))
        masks.append(None)
        bc_dofs = (
            np.unique(np.concatenate([bc.dofs for bc in bcs])) if bcs else np.zeros(0, np.int64)
        )
        batches.append((bc_dofs, bc_dofs))
        masks.append(None)

        pattern = build_slot_pattern((N, Vs.num_dofs), batches, masks)
        part = partition_rows(pattern, n_dev)
        self.pattern = pattern
        self.part = part
        rounds, self._lcols, self._window = build_ghost_exchange(part)
        self._deltas = tuple(d for d, _ in rounds)
        self._round_tabs = tuple(si for _, si in rounds)
        rpd = part.rows_per_dev
        N_pad = rpd * n_dev
        self.N_pad = N_pad
        TRASH = n_dev * part.nnz_pad

        # remap + shard the per-term slot tables on the cell axis
        for ti, tb in enumerate(a_tabs):
            n_act = tb["coords"].shape[0]
            C = -(-n_act // n_dev)
            n_pad = C * n_dev
            sl = part.remap[pattern.slots[ti]].reshape(n_act, -1)
            sl = _pad_cells(sl, n_pad, fill=TRASH)
            er = tb.pop("er")
            tgt = np.where(er >= 0, er, N_pad).astype(np.int32)  # vector trash row
            tb["slots"] = sl.reshape(n_dev, -1).astype(np.int32)
            tb["tgt"] = _pad_cells(tgt, n_pad, fill=N_pad).reshape(n_dev, C, -1)
            tb["coords"] = _pad_cells(tb["coords"], n_pad).reshape(n_dev, C, *tb["coords"].shape[1:])
            tb["lf"] = _pad_cells(tb["lf"], n_pad).reshape(n_dev, C)
            tb["Tr"] = _pad_cells(tb["Tr"], n_pad, fill=0).reshape(n_dev, C, *tb["Tr"].shape[1:])
            tb["Tc"] = _pad_cells(tb["Tc"], n_pad, fill=0).reshape(n_dev, C, *tb["Tc"].shape[1:])
            tb["dmr"] = _pad_cells(tb["dmr"], n_pad).reshape(n_dev, C, -1)
            tb["dmc"] = _pad_cells(tb["dmc"], n_pad).reshape(n_dev, C, -1)
            tb["wdofmaps"] = {
                n: _pad_cells(w, n_pad).reshape(n_dev, C, -1) for n, w in tb["wdofmaps"].items()
            }
        diag_slots_slave = part.remap[pattern.slots[len(a_tabs)]].astype(np.int32)
        diag_slots_bc = part.remap[pattern.slots[len(a_tabs) + 1]].astype(np.int32)

        # rhs term tables (uniform T, cell-sharded)
        L_tabs = []
        for ct in L_terms:
            cells = ct.cells
            dmr = Vt.dofmap[cells]
            pr = tr_row.cell_pos[cells]
            er = _ext_uniform(tr_row, pr, dmr)
            Tr = _T_uniform(tr_row, pr, dmr.shape[1], er.shape[1], dtype)
            n_act = len(cells)
            C = -(-n_act // n_dev)
            n_pad = C * n_dev
            lf = ct.local_facets if ct.local_facets is not None else np.zeros(n_act, np.int32)
            tgt = np.where(er >= 0, er, N_pad).astype(np.int32)
            L_tabs.append(
                dict(
                    coords=_pad_cells(points[mesh.cells[cells]].astype(_real_dtype(dtype)), n_pad).reshape(
                        n_dev, C, -1, mesh.gdim
                    ),
                    lf=_pad_cells(lf.astype(np.int32), n_pad).reshape(n_dev, C),
                    Tr=_pad_cells(Tr, n_pad, fill=0).reshape(n_dev, C, *Tr.shape[1:]),
                    tgt=_pad_cells(tgt, n_pad, fill=N_pad).reshape(n_dev, C, -1),
                    wdofmaps={
                        n: _pad_cells(W.dofmap[cells].astype(np.int32), n_pad).reshape(n_dev, C, -1)
                        for n, W in zip(ct.coeff_names, ct.coeff_spaces)
                    },
                )
            )

        # bc data (replicated)
        bc_row_mask = _bc_masks(Vt, bcs, dtype)
        bc_vals = _bc_values(Vs, bcs, dtype)
        self._bc_row_mask = np.concatenate([bc_row_mask, np.zeros(N_pad - N, bc_row_mask.dtype)])
        self._bc_vals = np.concatenate([bc_vals, np.zeros(N_pad - N, dtype)])

        # mpc tables padded to N_pad address space (replicated)
        if mpc_r is not None and mpc_r.num_local_slaves:
            # host copies (avoid d2h pulls of device tables — slow over tunnel)
            self._mpc_tabs = (
                np.asarray(mpc_r.slaves, np.int32),
                mpc_r._np_masters,
                mpc_r._np_coeffs,
            )
        else:
            self._mpc_tabs = None

        self._a_tabs, self._L_tabs = a_tabs, L_tabs
        self._a_kernels = [ct.kernel for ct in a_terms]
        self._L_kernels = [ct.kernel for ct in L_terms]
        self._a_coeffs = [
            {n: np.asarray(t.term.coefficients[n].x.array) for n in t.coeff_names} for t in a_terms
        ]
        self._L_coeffs = [
            {n: np.asarray(t.term.coefficients[n].x.array) for n in t.coeff_names} for t in L_terms
        ]
        self._diag_slots = (diag_slots_slave, diag_slots_bc)
        self.rtol, self.max_it, self.diagval = rtol, max_it, diagval
        self._build_step()

    # ------------------------------------------------------------------
    def _build_step(self):
        n_dev, part = self.n_dev, self.part
        rpd, nnz_pad, N_pad = part.rows_per_dev, part.nnz_pad, self.N_pad
        TRASH_ROWS = N_pad
        a_kernels, L_kernels = self._a_kernels, self._L_kernels
        diag_slots_slave, diag_slots_bc = self._diag_slots
        dtype = self.dtype
        diagval = jnp.asarray(self.diagval, dtype=dtype)
        rtol, max_it = self.rtol, self.max_it
        mpc_tabs = self._mpc_tabs

        deltas = self._deltas

        def device_step(a_tabs, L_tabs, a_coeffs, L_coeffs, cols_d, lrows_d,
                        valid_d, round_tabs, lcols_d, bc_row, g):
            """Runs per device inside shard_map.  Sharded args arrive with a
            leading block axis of size 1 — squeeze it."""
            sq = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
            a_tabs, L_tabs = sq(a_tabs), sq(L_tabs)
            cols_d, lrows_d, valid_d = cols_d[0], lrows_d[0], valid_d[0]
            round_tabs = tuple(si[0] for si in round_tabs)
            lcols_d = lcols_d[0]
            me = jax.lax.axis_index(AXIS)
            vals, slots = [], []
            b_part = jnp.zeros(N_pad + 1, dtype=dtype)
            for ti, tb in enumerate(a_tabs):
                wl = {n: a_coeffs[ti][n][tb["wdofmaps"][n]] for n in a_coeffs[ti]}
                Ae = a_kernels[ti](tb["coords"], tb["lf"], wl)  # (C, ndt, nds)
                # lifting from the RAW tensor: be = -Ae (g masked to bc cols)
                gcell = g[tb["dmc"]] * bc_row[tb["dmc"]].astype(dtype)
                be_l = -jnp.einsum("cij,cj->ci", Ae, gcell)
                bep = jnp.einsum("ciw,ci->cw", jnp.conj(tb["Tr"]), be_l)
                b_part = b_part.at[tb["tgt"].reshape(-1)].add(bep.reshape(-1))
                # bc row/col zeroing then uniform K^H Ae K
                mr = 1.0 - bc_row[tb["dmr"]]
                mc = 1.0 - bc_row[tb["dmc"]]
                Ae = Ae * mr[:, :, None] * mc[:, None, :]
                Aep = jnp.einsum(
                    "ciw,cij,cjv->cwv", jnp.conj(tb["Tr"]), Ae, tb["Tc"],
                    preferred_element_type=Ae.dtype,
                )
                vals.append(Aep.reshape(-1))
                slots.append(tb["slots"].reshape(-1))
            # diagonals, contributed once (device 0 only)
            on0 = (me == 0).astype(dtype)
            vals.append(jnp.full(diag_slots_slave.shape, diagval) * on0)
            slots.append(jnp.asarray(diag_slots_slave))
            vals.append(jnp.full(diag_slots_bc.shape, diagval) * on0)
            slots.append(jnp.asarray(diag_slots_bc))
            partial_mat = jax.ops.segment_sum(
                jnp.concatenate(vals), jnp.concatenate(slots), num_segments=n_dev * nnz_pad + 1
            )[:-1]
            data_d = jax.lax.psum_scatter(partial_mat, AXIS, scatter_dimension=0, tiled=True)

            for ti, tb in enumerate(L_tabs):
                wl = {n: L_coeffs[ti][n][tb["wdofmaps"][n]] for n in L_coeffs[ti]}
                be = L_kernels[ti](tb["coords"], tb["lf"], wl)
                bep = jnp.einsum("ciw,ci->cw", jnp.conj(tb["Tr"]), be)
                b_part = b_part.at[tb["tgt"].reshape(-1)].add(bep.reshape(-1))
            # row-block-distributed RHS: one psum_scatter, never a full
            # replicated b (weak-scaling memory)
            b_loc = jax.lax.psum_scatter(
                b_part[:N_pad], AXIS, scatter_dimension=0, tiled=True)
            # set_bc on the local block: b[bc] = diagval * g
            row0 = me * rpd
            bc_loc = jax.lax.dynamic_slice(bc_row, (row0,), (rpd,))
            g_loc = jax.lax.dynamic_slice(g, (row0,), (rpd,))
            b_loc = jnp.where(bc_loc > 0, diagval * g_loc, b_loc)

            # ---- CG on distributed vectors (static halo exchange) --------
            def exchange(x_loc):
                """ghost scatter: one ppermute ring rotation per active
                offset, each with its own (tight) buffer width — the
                IndexMap scatter_fwd analogue on ICI neighbor links."""
                parts = [x_loc]
                for delta, si_d in zip(deltas, round_tabs):
                    perm = [(s, (s + delta) % n_dev) for s in range(n_dev)]
                    parts.append(jax.lax.ppermute(x_loc[si_d], AXIS, perm))
                return jnp.concatenate(parts)

            def matvec(x_loc):
                xw = exchange(x_loc)
                prod = data_d * xw[lcols_d]
                return jax.ops.segment_sum(prod, lrows_d, num_segments=rpd)

            def pdot(u, v):
                return jax.lax.psum(jnp.vdot(u, v), AXIS)

            def pdot2(u1, v1, u2, v2):
                # two inner products in ONE allreduce round
                s = jax.lax.psum(
                    jnp.stack([jnp.vdot(u1, v1), jnp.vdot(u2, v2)]), AXIS)
                return s[0], s[1]

            gd = lrows_d + me * rpd
            diag_loc = jax.ops.segment_sum(
                jnp.where((cols_d == gd) & valid_d, data_d, 0), lrows_d,
                num_segments=rpd)
            inv = jnp.where(diag_loc != 0, 1.0 / diag_loc, 0.0)

            x = jnp.zeros(rpd, dtype=dtype)
            r = b_loc - matvec(x)
            z = inv * r
            p = z
            rz, rr = pdot2(r, z, r, r)
            tol2 = rtol**2 * jnp.real(pdot(b_loc, b_loc))

            # rr is CARRIED in the loop state (fused with the rz allreduce in
            # the body), so each iteration costs exactly 2 collective rounds
            # (p.Ap, then [r.z, r.r]) — a cond-side pdot(r, r) would add a
            # third, +50% collective latency on multi-chip solves
            def cond(s):
                _, _, _, _, _, rr, k = s
                return (jnp.real(rr) > tol2) & (k < max_it)

            def body(s):
                x, r, z, p, rz, _, k = s
                Ap = matvec(p)
                alpha = rz / pdot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = inv * r
                rz_new, rr_new = pdot2(r, z, r, r)
                p = z + (rz_new / rz) * p
                return (x, r, z, p, rz_new, rr_new, k + 1)

            x, r, _, _, _, rr, k = jax.lax.while_loop(
                cond, body, (x, r, z, p, rz, rr, 0))
            rnorm = jnp.sqrt(jnp.real(rr))
            # gather the solution once at the end (the OUTPUT is global);
            # backsubstitution may reference remote masters
            xg = jax.lax.all_gather(x, AXIS, tiled=True)
            if mpc_tabs is not None:
                sl, ma, co = mpc_tabs
                xg = xg.at[jnp.asarray(sl)].set(
                    jnp.einsum("sm,sm->s", jnp.asarray(co), xg[jnp.asarray(ma)].astype(dtype))
                )
            return xg, k, rnorm

        dev_spec = P(AXIS)
        rep = P()

        def spec_tree(tabs):
            return jax.tree_util.tree_map(lambda _: dev_spec, tabs)

        smapped = jax.shard_map(
            device_step,
            mesh=self.device_mesh,
            in_specs=(
                spec_tree(self._a_tabs),
                spec_tree(self._L_tabs),
                jax.tree_util.tree_map(lambda _: rep, self._a_coeffs),
                jax.tree_util.tree_map(lambda _: rep, self._L_coeffs),
                dev_spec,
                dev_spec,
                dev_spec,
                tuple(dev_spec for _ in self._round_tabs),
                dev_spec,
                rep,
                rep,
            ),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )
        self._step = jax.jit(smapped)

    # ------------------------------------------------------------------
    def solve(self):
        """Returns (u (num_dofs,), cg_iterations, residual_norm)."""
        to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        x, k, rnorm = self._step(
            to_dev(self._a_tabs),
            to_dev(self._L_tabs),
            to_dev(self._a_coeffs),
            to_dev(self._L_coeffs),
            jnp.asarray(self.part.cols),
            jnp.asarray(self.part.lrows),
            jnp.asarray(self.part.valid),
            tuple(jnp.asarray(si) for si in self._round_tabs),
            jnp.asarray(self._lcols),
            jnp.asarray(self._bc_row_mask),
            jnp.asarray(self._bc_vals),
        )
        self.its = int(k)
        self.rnorm = float(rnorm)
        return x[: self.V.num_dofs], self.its, self.rnorm
