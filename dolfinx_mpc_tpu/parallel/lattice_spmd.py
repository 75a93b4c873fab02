"""Sharded lattice solve: x-slab domain decomposition with ppermute halos.

This is the TPU-native rendition of the reference's entire distributed story
(SURVEY.md §2.3): DOLFINx partitions the mesh over MPI ranks with owner/ghost
IndexMaps and PETSc exchanges ghost values during MatAssembly and each SpMV
(/root/reference/cpp/mpc_helpers.h:139-235, README.md:33).  Here the vertex
lattice is cut into x-slabs, one per device, with the shared vertex plane
DUPLICATED on both neighbours:

- assembly: every device runs the SoA element kernel + stencil accumulation
  on its cell slab; the two partial boundary planes are summed with a single
  bidirectional `ppermute` (replacing MPI ghost scatter-reverse).
- SpMV: local stencil matvec on the (nxc+1)-plane slab, then the same
  bidirectional plane exchange completes boundary rows (replacing the PETSc
  halo exchange in every KSP iteration, reference problem.py:585).
- MPC side matrix (slave-cell K^H A_e K couplings, reaching arbitrarily far
  across the domain — e.g. periodic partners): assembled into a REPLICATED
  O(surface)-sized vector with one psum; the needed x-values are likewise
  gathered by one psum of an O(surface) packed vector per iteration.
- dot products: plane-weighted local partials + psum (duplicated planes are
  weighted on one side only).

Everything — assembly, CG, backsubstitution — is ONE jitted shard_map program.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..fem.forms import Form
from ..la.sparse import build_slot_pattern
from ..multipointconstraint import MultiPointConstraint
from ..ops.assemble import _bc_masks, _bc_values, _build_cell_transforms, _mpc_pair, _real_dtype
from ..ops.lattice import get_lattice_info
from ..ops.soa_kernels import compile_cell_kernel_soa
from .spmd import AXIS, make_device_mesh

__all__ = ["ShardedLatticeProblem"]


class ShardedLatticeProblem:
    """Distributed lattice Poisson-type solve over a 1D device mesh."""

    def __init__(self, a: Form, L: Form, mpc, bcs=None, device_mesh: Mesh = None,
                 dtype=np.float64, rtol=1e-8, max_it=3000, diagval=1.0,
                 pc_type="jacobi", cheb_degree=3, cheb_power_iters=20,
                 coarse_gmg=None, gmg_pre=2, gmg_post=2, gmg_omega=0.8):
        self.device_mesh = device_mesh if device_mesh is not None else make_device_mesh()
        D = int(self.device_mesh.devices.size)
        self.D = D
        bcs = bcs or []
        mpc_r, _ = _mpc_pair(mpc)
        V = a.test_space
        mesh = V.mesh
        lat = get_lattice_info(mesh)
        assert lat is not None, "ShardedLatticeProblem needs a lattice mesh"
        dtype = np.dtype(dtype)
        self.dtype = dtype
        self.V, self.mpc = V, mpc_r
        nx, ny, nz_ = lat.dims
        is2d = mesh.tdim == 2
        nzc = 1 if is2d else nz_
        n1, n2 = ny + 1, (1 if is2d else nz_ + 1)
        bs = V.block_size
        T = lat.cells_per_box
        self.bs, self.T = bs, T
        self.vshape = (nx + 1, n1, n2)
        self.rtol, self.max_it = rtol, max_it
        self.diagval = diagval
        self.pc_type = pc_type
        self.cheb_degree = int(cheb_degree)
        self.cheb_power_iters = int(cheb_power_iters)
        self.coarse_gmg = coarse_gmg
        self.gmg_pre, self.gmg_post = int(gmg_pre), int(gmg_post)
        self.gmg_omega = float(gmg_omega)
        if pc_type == "gmg":
            # sharded two-level scheme: the fine level is smoothed/restricted
            # in x-slabs; the (n/2)-and-down hierarchy runs REPLICATED on
            # every device (1/8 of fine memory) — the reference's AMG-on-
            # every-rank analogue without cross-device transfer operators
            assert coarse_gmg is not None, "pc_type='gmg' needs coarse_gmg"
            assert nx % 2 == 0 and ny % 2 == 0 and (is2d or nz_ % 2 == 0), (
                "gmg two-level needs even lattice dims")
            assert not is2d, "sharded gmg: 3D lattices only"
            c0 = coarse_gmg.ops[0].dia.vshape
            assert c0 == (nx // 2 + 1, ny // 2 + 1, nz_ // 2 + 1), (
                f"coarse hierarchy finest level {c0} != half-resolution grid")

        # one SoA kernel per cell term; their element tensors sum (the
        # reference sums integral contributions the same way).  Coefficients
        # are packed per slab at setup (they are fixed for the solve, like
        # the RHS).
        assert all(t.integral == "cell" and t.entities is None for t in a.terms), (
            "sharded lattice path: full-domain cell integrals only"
        )
        self.kernels = []
        self._coeff_meta = []  # per term: list of (name, nd_w, bs_w)
        for t in a.terms:
            k = compile_cell_kernel_soa(mesh, V, V, t, dtype)
            assert k is not None, "form term not supported by the SoA kernel"
            self.kernels.append(k)
            metas = []
            for nme, fn in t.coefficients.items():
                W = fn.function_space
                metas.append((nme, W.element.ndofs, W.block_size, W, fn))
            self._coeff_meta.append(metas)
        self.kernel = self.kernels[0]

        # ---- slab partition --------------------------------------------
        nxc = -(-nx // D)  # cells per device (last padded)
        self.nxc = nxc
        nd = V.ndofs_cell
        nv = mesh.cells.shape[1]
        g = mesh.gdim
        c_loc = nxc * ny * nzc * T

        tr = _build_cell_transforms(V, mpc_r, dtype)
        bc_mask = _bc_masks(V, bcs, dtype)
        pts = mesh.points[mesh.cells].astype(_real_dtype(dtype))  # (c, nv, g)
        dm = V.dofmap  # (c, nd)
        keep_cell = (1.0 - bc_mask[dm]).astype(_real_dtype(dtype))  # (c, nd)

        coords_sh = np.zeros((D, nv, g, c_loc), _real_dtype(dtype))
        w_cell = np.zeros((D, c_loc), _real_dtype(dtype))
        keep_sh = np.ones((D, nd, c_loc), _real_dtype(dtype))
        cells_grid = np.arange(mesh.num_cells).reshape(nx, ny, nzc, T)
        valid_mask_full = (1.0 - tr.slave_cell_mask.astype(_real_dtype(dtype)))
        for d in range(D):
            i0, i1 = d * nxc, min((d + 1) * nxc, nx)
            ids = cells_grid[i0:i1].reshape(-1)
            k = len(ids)
            coords_sh[d, :, :, :k] = pts[ids].transpose(1, 2, 0)
            coords_sh[d, :, :, k:] = pts[0][:, :, None]
            w_cell[d, :k] = valid_mask_full[ids]
            keep_sh[d, :, :k] = keep_cell[ids].T
        self._coords_sh = jnp.asarray(coords_sh)
        self._w_cell = jnp.asarray(w_cell)
        self._keep_sh = jnp.asarray(keep_sh)

        # per-term, per-slab coefficient locals: (D, nd_w, bs_w, c_loc)
        wl_sh = []
        for metas in self._coeff_meta:
            term_wl = {}
            for nme, nd_w, bs_w, W, fn in metas:
                warr = np.asarray(fn.x.array, dtype=dtype)
                wcell = warr[W.dofmap]  # (c, nd_w*bs_w)
                buf = np.zeros((D, nd_w, bs_w, c_loc), dtype)
                for d in range(D):
                    i0, i1 = d * nxc, min((d + 1) * nxc, nx)
                    ids = cells_grid[i0:i1].reshape(-1)
                    k = len(ids)
                    buf[d, :, :, :k] = wcell[ids].reshape(k, nd_w, bs_w).transpose(1, 2, 0)
                term_wl[nme] = jnp.asarray(buf)
            wl_sh.append(term_wl)
        self._wl_sh = wl_sh

        # stencil moves (same derivation as ops/lattice.py)
        from ..ops.lattice import _vertex_delta_table

        deltas = _vertex_delta_table(mesh, lat)
        offs = {}
        moves = []
        for t in range(T):
            for a_ in range(nv):
                for b_ in range(nv):
                    off = tuple(int(x) for x in (deltas[t, b_] - deltas[t, a_]))
                    oid = offs.setdefault(off, len(offs))
                    moves.append((t, a_, b_, oid, tuple(int(x) for x in deltas[t, a_])))
        self.offsets = tuple(offs.keys())
        self.moves = moves

        # per-device diag additions (bc diagval), shared planes on both owners
        bc_dofs = np.unique(np.concatenate([bc.dofs for bc in bcs])) if bcs else np.zeros(0, np.int64)
        diag_grid = np.zeros((nx + 1, n1, n2, bs), dtype)
        dg = np.zeros(V.num_dofs, dtype)
        dg[bc_dofs] = diagval
        diag_grid[:] = dg.reshape(nx + 1, n1, n2, bs)
        self._diag_sh = jnp.asarray(self._to_slabs(diag_grid, D, nxc))

        # rhs (assembled on host once: L is cheap and static) + set_bc values
        import jax as _jax

        from ..ops.assemble import apply_lifting, assemble_vector, set_bc

        b = assemble_vector(L, mpc, dtype=dtype)
        b = apply_lifting(b, [a], [bcs], mpc, dtype=dtype)
        b = set_bc(b, bcs)
        b_grid = np.asarray(b).reshape(nx + 1, n1, n2, bs)
        self._b_sh = jnp.asarray(self._to_slabs(b_grid, D, nxc))

        # ---- side matrix (slave cells + slave diagonal) ------------------
        sc = np.flatnonzero(tr.slave_cell_mask)
        slaves_row = (np.asarray(mpc_r.slaves, np.int64)
                      if (mpc_r is not None and mpc_r.num_local_slaves) else np.zeros(0, np.int64))
        batches, masks_ = [], []
        if len(sc):
            er = tr.ext_dofs
            rr = np.broadcast_to(er[:, :, None], (len(sc), er.shape[1], er.shape[1]))
            cc = np.broadcast_to(er[:, None, :], rr.shape)
            batches.append((rr, cc))
            masks_.append((rr >= 0) & (cc >= 0))
        else:
            batches.append((np.zeros((0, 1, 1), np.int64), np.zeros((0, 1, 1), np.int64)))
            masks_.append(None)
        batches.append((slaves_row, slaves_row))
        masks_.append(None)
        pattern = build_slot_pattern((V.num_dofs, V.num_dofs), batches, masks_)
        self.pattern = pattern
        nnz_side = pattern.nnz
        self.nnz_side = nnz_side

        # per-device slave-cell tables (cells assigned to their slab owner)
        sc_dev = [[] for _ in range(D)]
        cell_x = (sc // (ny * nzc * T)) if len(sc) else np.zeros(0, np.int64)
        for idx, c in enumerate(sc):
            d = min(int(cell_x[idx]) // nxc, D - 1)
            sc_dev[d].append(idx)
        max_sc = max((len(s) for s in sc_dev), default=1) or 1
        Wd = tr.T.shape[2] if tr.T.size else 1
        Tr_sh = np.zeros((D, max_sc, nd, Wd), dtype)
        sc_pos = np.zeros((D, max_sc), np.int32)  # position of cell in device slab
        sc_valid = np.zeros((D, max_sc), _real_dtype(dtype))
        slot_sh = np.full((D, max_sc * Wd * Wd), nnz_side, np.int32)
        slots0 = pattern.slots[0].reshape(len(sc), Wd, Wd) if len(sc) else np.zeros((0, 1, 1), np.int64)
        for d in range(D):
            i0 = d * nxc
            for m, idx in enumerate(sc_dev[d]):
                c = sc[idx]
                ci = int(cell_x[idx])
                local = ((ci - i0) * ny * nzc * T) + int(c % (ny * nzc * T))
                sc_pos[d, m] = local
                sc_valid[d, m] = 1.0
                Tr_sh[d, m] = tr.T[idx]
                slot_sh[d, m * Wd * Wd : (m + 1) * Wd * Wd] = slots0[idx].reshape(-1)
        self._Tr_sh = jnp.asarray(Tr_sh)
        self._sc_pos = jnp.asarray(sc_pos)
        self._sc_valid = jnp.asarray(sc_valid)
        self._slot_sh = jnp.asarray(slot_sh)
        # slave diagonal slots contributed once (device 0)
        self._slave_diag_slots = jnp.asarray(pattern.slots[1].astype(np.int32))

        # needed columns for the side matvec + row routing
        need_cols = np.unique(pattern.indices)
        colpos = np.searchsorted(need_cols, pattern.indices)
        self.n_need = len(need_cols)
        # map each needed global col -> (device, local flat index) for every
        # device whose slab contains it (weighted to count once)
        loc_sz = (nxc + 1) * n1 * n2 * bs
        need_idx = np.zeros((D, self.n_need), np.int32)
        need_w = np.zeros((D, self.n_need), _real_dtype(dtype))
        gx = need_cols // (n1 * n2 * bs)
        rem = need_cols % (n1 * n2 * bs)
        for d in range(D):
            x0 = d * nxc
            own_lo = x0 if d == 0 else x0 + 1  # plane x0 counted by left owner
            sel = (gx >= own_lo) & (gx <= min((d + 1) * nxc, nx))
            need_idx[d, sel] = ((gx[sel] - x0) * n1 * n2 * bs + rem[sel]).astype(np.int32)
            need_w[d, sel] = 1.0
        self._need_idx = jnp.asarray(need_idx)
        self._need_w = jnp.asarray(need_w)

        # side rows per device (duplicated-plane rows on both owners)
        srows = pattern.row_ids.astype(np.int64)
        sx = srows // (n1 * n2 * bs)
        srem = srows % (n1 * n2 * bs)
        per_dev = []
        for d in range(D):
            x0, x1 = d * nxc, min((d + 1) * nxc, nx)
            sel = np.flatnonzero((sx >= x0) & (sx <= x1))
            per_dev.append(sel)
        max_rows = max((len(s) for s in per_dev), default=1) or 1
        side_sel = np.zeros((D, max_rows), np.int32)
        side_lrow = np.zeros((D, max_rows), np.int32)
        side_colp = np.zeros((D, max_rows), np.int32)
        side_vw = np.zeros((D, max_rows), _real_dtype(dtype))
        for d in range(D):
            sel = per_dev[d]
            k = len(sel)
            side_sel[d, :k] = sel
            side_lrow[d, :k] = ((sx[sel] - d * nxc) * n1 * n2 * bs + srem[sel]).astype(np.int32)
            side_colp[d, :k] = colpos[sel]
            side_vw[d, :k] = 1.0
        self._side_sel = jnp.asarray(side_sel)
        self._side_lrow = jnp.asarray(side_lrow)
        self._side_colp = jnp.asarray(side_colp)
        self._side_vw = jnp.asarray(side_vw)
        self._loc_sz = loc_sz
        # diagonal side entries (row == col): their values must join the
        # Jacobi/Chebyshev diagonal — the MPC folds master-master stiffness
        # into the side matrix, and ignoring it under-scales every row on
        # the periodic plane (measured 242 vs 37 CG its at n=48)
        is_diag = (pattern.row_ids == pattern.indices)
        side_diag_w = np.zeros((D, max_rows), _real_dtype(dtype))
        for d in range(D):
            sel = per_dev[d]
            k = len(sel)
            side_diag_w[d, :k] = is_diag[sel].astype(_real_dtype(dtype))
        self._side_diag_w = jnp.asarray(side_diag_w)

        # plane weights for dots: shared plane counted by the LEFT owner
        wpl = np.ones((D, nxc + 1), _real_dtype(dtype))
        wpl[:, 0] = 0.0
        wpl[0, 0] = 1.0
        # planes beyond global nx (padding on the last device) weigh 0
        for d in range(D):
            for p in range(nxc + 1):
                if d * nxc + p > nx:
                    wpl[d, p] = 0.0
        self._wpl = jnp.asarray(wpl)

        # ---- two-level GMG transfer tables (pc_type == "gmg") -------------
        if pc_type == "gmg":
            # free-dof slab mask: corrections/residuals are projected onto
            # the unconstrained subspace around the coarse transfer (bc and
            # slave rows carry identity x diagval and must not pollute the
            # coarse problem)
            free = np.ones(V.num_dofs, _real_dtype(dtype))
            if len(bc_dofs):
                free[bc_dofs] = 0.0
            if mpc_r is not None and mpc_r.num_local_slaves:
                free[np.asarray(mpc_r.slaves)] = 0.0
            self._free_sh = jnp.asarray(
                self._to_slabs(free.reshape(nx + 1, n1, n2, bs), D, nxc))
            nc0 = nx // 2 + 1
            # restriction scatter: local fine plane p on device d maps to
            # coarse plane (d*nxc+p)//2 when the global plane is even and
            # this device owns it (left-owner rule, padding excluded)
            r_idx = np.zeros((D, nxc + 1), np.int32)
            r_w = np.zeros((D, nxc + 1), _real_dtype(dtype))
            # prolongation gather: fine plane g even -> coarse g//2; odd ->
            # mean of (g-1)/2 and (g+1)/2
            p_lo = np.zeros((D, nxc + 1), np.int32)
            p_hi = np.zeros((D, nxc + 1), np.int32)
            p_wlo = np.zeros((D, nxc + 1), _real_dtype(dtype))
            p_whi = np.zeros((D, nxc + 1), _real_dtype(dtype))
            for d in range(D):
                for p in range(nxc + 1):
                    g = d * nxc + p
                    if g > nx:
                        continue
                    if g % 2 == 0:
                        r_idx[d, p] = g // 2
                        r_w[d, p] = wpl[d, p]
                        p_lo[d, p] = g // 2
                        p_wlo[d, p] = 1.0
                    else:
                        p_lo[d, p] = (g - 1) // 2
                        p_hi[d, p] = (g + 1) // 2
                        p_wlo[d, p] = 0.5
                        p_whi[d, p] = 0.5
            self._gmg_tabs = tuple(jnp.asarray(t) for t in
                                   (r_idx, r_w, p_lo, p_hi, p_wlo, p_whi))
        else:
            self._free_sh = jnp.zeros((D, 1), _real_dtype(dtype))
            z = jnp.zeros((D, 1), np.int32)
            zf = jnp.zeros((D, 1), _real_dtype(dtype))
            self._gmg_tabs = (z, zf, z, z, zf, zf)

        # backsubstitution tables
        if mpc_r is not None and mpc_r.num_local_slaves:
            self._bs_tabs = (
                np.asarray(mpc_r.slaves, np.int32),
                mpc_r._np_masters.astype(np.int32),
                mpc_r._np_coeffs.astype(dtype),
            )
        else:
            self._bs_tabs = None
        self._build_step(nx, ny, nzc, n1, n2)

    @staticmethod
    def _to_slabs(grid, D, nxc):
        """(n0, n1, n2, bs) -> (D, nxc+1, n1, n2, bs) duplicated-plane slabs."""
        n0 = grid.shape[0]
        out = np.zeros((D, nxc + 1) + grid.shape[1:], grid.dtype)
        for d in range(D):
            x0 = d * nxc
            x1 = min(x0 + nxc + 1, n0)
            if x1 > x0:
                out[d, : x1 - x0] = grid[x0:x1]
        return out

    # ------------------------------------------------------------------
    def _build_step(self, nx, ny, nzc, n1, n2):
        D, nxc, bs, T = self.D, self.nxc, self.bs, self.T
        kernels = self.kernels
        moves, offsets = self.moves, self.offsets
        n_off = len(offsets)
        dtype = self.dtype
        nnz_side = self.nnz_side
        loc_sz = self._loc_sz
        rtol, max_it = self.rtol, self.max_it
        pc_type = self.pc_type
        cheb_degree, cheb_power_iters = self.cheb_degree, self.cheb_power_iters
        diagval = jnp.asarray(self.diagval, dtype)
        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]
        nd = self.V.ndofs_cell
        bs_tabs = self._bs_tabs
        me_last = D - 1

        def exchange_planes(lo_partial, hi_partial):
            """Sum duplicated-plane partials with both neighbours.
            lo_partial: this device's partial for its FIRST plane (shared with
            the left neighbour's last); hi_partial: partial for its LAST
            plane.  Returns completed (lo, hi)."""
            from_left = jax.lax.ppermute(hi_partial, AXIS, fwd)  # left's hi -> my lo
            from_right = jax.lax.ppermute(lo_partial, AXIS, bwd)  # right's lo -> my hi
            me = jax.lax.axis_index(AXIS)
            lo = lo_partial + jnp.where(me > 0, 1.0, 0.0).astype(lo_partial.dtype) * from_left
            hi = hi_partial + jnp.where(me < me_last, 1.0, 0.0).astype(hi_partial.dtype) * from_right
            return lo, hi

        gmg_pre, gmg_post, gmg_omega = self.gmg_pre, self.gmg_post, self.gmg_omega
        nx_ = nx

        def device_step(coords, w_cell, keep, diag_sh, b_sh, Tr_sh, sc_pos, sc_valid,
                        slot_sh, need_idx, need_w, side_sel, side_lrow, side_colp,
                        side_vw, wpl, side_diag_w, wl_sh, free_sh, gmg_tabs, cgmg):
            sq = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
            (coords, w_cell, keep, diag_sh, b_sh, Tr_sh, sc_pos, sc_valid, slot_sh,
             need_idx, need_w, side_sel, side_lrow, side_colp, side_vw, wpl,
             side_diag_w, wl_sh, free_sh, gmg_tabs) = sq(
                (coords, w_cell, keep, diag_sh, b_sh, Tr_sh, sc_pos, sc_valid, slot_sh,
                 need_idx, need_w, side_sel, side_lrow, side_colp, side_vw, wpl,
                 side_diag_w, wl_sh, free_sh, gmg_tabs))

            # ---- assembly: sum of all cell terms ---------------------------
            Ae = None
            for kern, wl_t in zip(kernels, wl_sh):
                Ae_t = kern(coords, wl_t)  # (nd, nd, c_loc)
                Ae = Ae_t if Ae is None else Ae + Ae_t
            Ae_bc = Ae * keep[:, None, :] * keep[None, :, :]
            Ae_st = Ae_bc * w_cell
            Ae_grid = Ae_st.reshape(nd, nd, nxc, ny, nzc, T)
            data = jnp.zeros((n_off, bs, bs, nxc + 1, n1, n2), dtype=Ae.dtype)
            for t, a_, b_, oid, (di, dj, dk) in moves:
                for ci in range(bs):
                    for cj in range(bs):
                        data = data.at[
                            oid, ci, cj, di : di + nxc, dj : dj + ny, dk : dk + nzc
                        ].add(Ae_grid[a_ * bs + ci, b_ * bs + cj, :, :, :, t])
            lo, hi = exchange_planes(data[:, :, :, 0], data[:, :, :, nxc])
            data = data.at[:, :, :, 0].set(lo).at[:, :, :, nxc].set(hi)
            # bc diagval
            zid = offsets.index((0, 0, 0))
            for ci in range(bs):
                data = data.at[zid, ci, ci].add(diag_sh[:, :, :, ci])

            # side matrix: replicated via one psum (skipped when no MPC/side)
            if nnz_side:
                Ae_sl = jnp.moveaxis(Ae_bc[:, :, sc_pos], -1, 0) * sc_valid[:, None, None].astype(Ae.dtype)
                Aep = jnp.einsum("ciw,cij,cjv->cwv", jnp.conj(Tr_sh), Ae_sl, Tr_sh,
                                 preferred_element_type=Ae.dtype)
                me = jax.lax.axis_index(AXIS)
                on0 = (me == 0).astype(dtype)
                vals = jnp.concatenate([
                    Aep.reshape(-1),
                    jnp.full((self._slave_diag_slots.shape[0],), diagval, dtype) * on0,
                ])
                slots = jnp.concatenate([slot_sh, self._slave_diag_slots])
                side = jax.lax.psum(
                    jax.ops.segment_sum(vals, slots, num_segments=nnz_side + 1)[:nnz_side], AXIS
                )
            else:
                side = jnp.zeros((0,), dtype)

            # ---- matvec over the slab -------------------------------------
            # x-halo gather: fetch ONE plane from each neighbour so every
            # device computes COMPLETE rows for all its (duplicated-plane-
            # consistent) planes — no y-exchange, no double counting of the
            # shared plane's diagonal terms.
            def matvec(x):  # x: (nxc+1, n1, n2, bs)
                from_left = jax.lax.ppermute(x[nxc - 1], AXIS, fwd)
                from_right = jax.lax.ppermute(x[1], AXIS, bwd)
                xext = jnp.concatenate([from_left[None], x, from_right[None]], axis=0)
                y = jnp.zeros_like(x)
                N0 = nxc + 1
                for d_, (di, dj, dk) in enumerate(offsets):
                    dstjk = (slice(max(-dj, 0), n1 - max(dj, 0)),
                             slice(max(-dk, 0), n2 - max(dk, 0)))
                    srcjk = (slice(max(dj, 0), n1 + min(dj, 0)),
                             slice(max(dk, 0), n2 + min(dk, 0)))
                    for ci in range(bs):
                        acc = None
                        for cj in range(bs):
                            term = (
                                data[(d_, ci, cj, slice(None)) + dstjk]
                                * xext[(slice(1 + di, 1 + di + N0),) + srcjk + (cj,)]
                            )
                            acc = term if acc is None else acc + term
                        y = y.at[(slice(None),) + dstjk + (ci,)].add(acc)
                if nnz_side:
                    # side part: gather needed x, add owned rows (both owners
                    # for duplicated planes -> consistent)
                    xf = x.reshape(-1)
                    need_x = jax.lax.psum(need_w.astype(x.dtype) * xf[need_idx], AXIS)
                    prod = side[side_sel] * need_x[side_colp] * side_vw.astype(x.dtype)
                    y = (y.reshape(-1).at[side_lrow].add(prod)).reshape(x.shape)
                return y

            def dot(u, v):
                return jax.lax.psum(
                    jnp.sum(wpl[:, None, None, None].astype(u.dtype) * jnp.conj(u) * v), AXIS
                )

            # Jacobi diag: stencil + bc diagonal PLUS the side-matrix
            # diagonal (MPC master-master terms; slave rows get diagval)
            diag = jnp.zeros((nxc + 1, n1, n2, bs), dtype)
            zoff = offsets.index((0, 0, 0))
            for ci in range(bs):
                diag = diag.at[:, :, :, ci].set(data[zoff, ci, ci])
            if nnz_side:
                sd = side[side_sel] * side_diag_w.astype(dtype)
                diag = (diag.reshape(-1).at[side_lrow].add(sd)).reshape(diag.shape)
            dflat = diag.reshape(-1)
            inv = jnp.where(dflat != 0, 1.0 / dflat, 0.0).reshape(diag.shape)

            if pc_type == "chebyshev":
                # Chebyshev-Jacobi under shard_map.  lambda_max of D^-1 A via
                # the GERSHGORIN bound max_i sum_j|a_ij| / d_i — a safe,
                # deterministic OVERestimate computed in one pass over the
                # local DIA data + a pmax.  (Power iteration underestimates
                # at scale, which makes the Chebyshev polynomial AMPLIFY the
                # untargeted top modes — measured 2584 CG its at 389k dofs.)
                rdt = jnp.real(jnp.zeros((), dtype)).dtype
                rowsum = jnp.abs(data).sum(axis=(0, 2))  # (bs, nxc+1, n1, n2)
                dpos = jnp.moveaxis(jnp.abs(diag), -1, 0)  # (bs, nxc+1, n1, n2)
                ratio = jnp.where(dpos > 0, rowsum / jnp.maximum(dpos, 1e-30), 0.0)
                lmax = jax.lax.pmax(jnp.max(ratio).astype(rdt), AXIS) * 1.05
                lmin = 0.06 * lmax
                theta = (lmax + lmin) / 2
                delta = (lmax - lmin) / 2

                def M(r):
                    rr = inv * r
                    xk = rr / theta
                    if cheb_degree == 1:
                        return xk
                    res = rr - inv * matvec(xk)
                    dk = res / theta
                    sigma = theta / delta
                    rho = 1.0 / sigma
                    for _ in range(cheb_degree - 1):
                        rho_new = 1.0 / (2 * sigma - rho)
                        dk = rho_new * rho * dk + 2 * rho_new / delta * res
                        xk = xk + dk
                        res = res - inv * matvec(dk)
                        rho = rho_new
                    return xk
            elif pc_type == "gmg":
                # sharded two-level V-cycle: slab-local Jacobi smoothing +
                # x-halo full-weighting restriction, psum-replicated coarse
                # residual solved by the (n/2)-rooted LatticeGMG hierarchy
                # (identical deterministic computation on every device),
                # masked prolongation back onto the slab.  The reference
                # analogue: BoomerAMG applied rank-parallel inside every KSP
                # iteration (bench_periodic.py:115-133).
                from ..la.gmg import _prolong1, _restrict1

                r_idx, r_w, p_lo, p_hi, p_wlo, p_whi = gmg_tabs
                nc0 = nx_ // 2 + 1
                cmask0 = (cgmg.free_masks[0]
                          if cgmg.free_masks is not None else None)

                def smooth(x0, r0, n_sweeps):
                    def body(_, xi):
                        return xi + gmg_omega * inv * (r0 - matvec(xi))

                    return jax.lax.fori_loop(0, n_sweeps, body, x0)

                def M(r):
                    x0 = smooth(jnp.zeros_like(r), r, gmg_pre)
                    res = (r - matvec(x0)) * free_sh.astype(r.dtype)
                    # y,z full weighting locally (R = P^T: 2x per axis) ...
                    g = 2.0 * _restrict1(res, 1)
                    g = 2.0 * _restrict1(g, 2)
                    # ... then x full weighting with one halo plane per side
                    from_left = jax.lax.ppermute(g[nxc - 1], AXIS, fwd)
                    from_right = jax.lax.ppermute(g[1], AXIS, bwd)
                    me = jax.lax.axis_index(AXIS)
                    wl = jnp.where(me > 0, 1.0, 0.0).astype(g.dtype)
                    wr = jnp.where(me < me_last, 1.0, 0.0).astype(g.dtype)
                    gext = jnp.concatenate(
                        [(wl * from_left)[None], g, (wr * from_right)[None]], 0)
                    gx = 2.0 * (0.5 * gext[1:-1] + 0.25 * (gext[:-2] + gext[2:]))
                    rc = jnp.zeros((nc0,) + gx.shape[1:], r.dtype)
                    rc = rc.at[r_idx].add(
                        r_w[:, None, None, None].astype(r.dtype) * gx)
                    rc = jax.lax.psum(rc, AXIS)  # replicated coarse residual
                    rcf = rc.reshape(-1)
                    if cmask0 is not None:
                        rcf = rcf * cmask0.astype(rcf.dtype)
                    ec = cgmg(rcf)
                    if cmask0 is not None:
                        ec = ec * cmask0.astype(ec.dtype)
                    ecg = ec.reshape(rc.shape)
                    # x prolongation: per-plane gather from the replicated
                    # coarse grid (even plane: copy; odd: neighbour mean)
                    ef = (p_wlo[:, None, None, None].astype(r.dtype) * ecg[p_lo]
                          + p_whi[:, None, None, None].astype(r.dtype) * ecg[p_hi])
                    ef = _prolong1(ef, 1)
                    ef = _prolong1(ef, 2)
                    x1 = x0 + ef * free_sh.astype(r.dtype)
                    return smooth(x1, r, gmg_post)
            else:
                M = lambda r: inv * r

            b = b_sh
            x = jnp.zeros_like(b)
            r = b - matvec(x)
            z = M(r)
            p = z
            rz = dot(r, z)
            tol2 = (rtol ** 2) * jnp.real(dot(b, b))

            def cond(s):
                _, r, _, _, _, k = s
                return (jnp.real(dot(r, r)) > tol2) & (k < max_it)

            def body(s):
                x, r, z, p, rz, k = s
                Ap = matvec(p)
                alpha = rz / dot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = M(r)
                rzn = dot(r, z)
                p = z + (rzn / rz) * p
                return (x, r, z, p, rzn, k + 1)

            x, r, _, _, _, k = jax.lax.while_loop(cond, body, (x, r, z, p, rz, 0))
            rnorm = jnp.sqrt(jnp.real(dot(r, r)))
            return x[None], k, rnorm

        dev = P(AXIS)
        rep = P()
        smapped = jax.shard_map(
            device_step,
            mesh=self.device_mesh,
            # specs broadcast over pytree args (wl_sh, gmg_tabs, cgmg);
            # the coarse GMG hierarchy is REPLICATED on every device
            in_specs=(dev,) * 17 + (dev, dev, dev, rep),
            out_specs=(dev, rep, rep),
            check_vma=False,
        )
        self._step = jax.jit(smapped)

    # ------------------------------------------------------------------
    def solve(self):
        cgmg = self.coarse_gmg
        if cgmg is None:
            cgmg = jnp.zeros(())  # placeholder pytree for the rep spec
        xs, k, rnorm = self._step(
            self._coords_sh, self._w_cell, self._keep_sh, self._diag_sh, self._b_sh,
            self._Tr_sh, self._sc_pos, self._sc_valid, self._slot_sh,
            self._need_idx, self._need_w, self._side_sel, self._side_lrow,
            self._side_colp, self._side_vw, self._wpl, self._side_diag_w,
            self._wl_sh, self._free_sh, self._gmg_tabs, cgmg,
        )
        # stitch slabs: device d owns planes [d*nxc, d*nxc + nxc) plus the
        # global last plane from the last device
        n0, n1, n2 = self.vshape
        bs = self.bs
        xs = np.asarray(xs)  # (D, nxc+1, n1, n2, bs)
        full = np.zeros((n0, n1, n2, bs), xs.dtype)
        for p in range(n0):
            d = min(p // self.nxc, self.D - 1)
            local = p - d * self.nxc
            if local > self.nxc:  # beyond the last device's slab: walk back
                d = (p - 1) // self.nxc
                local = p - d * self.nxc
            full[p] = xs[d, local]
        u = full.reshape(-1)
        if self._bs_tabs is not None:
            sl, ma, co = self._bs_tabs
            u[sl] = np.einsum("sm,sm->s", co, u[ma])
        self.its = int(k)
        self.rnorm = float(rnorm)
        return u, self.its, self.rnorm
