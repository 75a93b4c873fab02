"""Constrained assembly: batched element tensors + dense per-cell K^T A K
elimination + slot-scatter into static CSR.

TPU-native rebuild of the reference assemblers:
- matrix: /root/reference/cpp/assemble_matrix.cpp (hot loop :488-547,
  `modify_mpc_cell` :100-268) — here the 3-way master-row/col/row-col scatter
  becomes a dense batched `conj(T)^T A_e T` over slave cells only (SURVEY.md §7
  step 4), which XLA maps onto the MXU.
- vector: /root/reference/cpp/assemble_vector.cpp (`modify_mpc_vec`
  assemble_vector.h:36-69) — `conj(T)^T b_e`.
- lifting: /root/reference/cpp/lifting.h:441-670 — `b -= scale·conj(T)^T A_e (g-x0)`.

All sparsity/slot/transformation tables are built ONCE on the host; the
per-assembly path is a single jitted function of the coefficient/BC data.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.forms import Form
from ..fem.functionspace import DirichletBC, Function, FunctionSpace
from ..la.sparse import CSRMatrix, SlotPattern, build_slot_pattern
from ..multipointconstraint import MultiPointConstraint
from .kernels import CompiledTerm, compile_term

__all__ = [
    "assemble_matrix",
    "assemble_vector",
    "apply_lifting",
    "set_bc",
    "create_sparsity_pattern",
    "MPCMatrix",
]


# ---------------------------------------------------------------------------
# per-cell transformation tables
# ---------------------------------------------------------------------------


@dataclass
class CellTransforms:
    """Per-slave-cell elimination data for one (dofmap, mpc) pair.

    slave_cell_mask: (n_cells,) bool
    For the slave cells (in mesh order):
      ext_dofs: (n_sc, W) int64, -1-padded — the cell's dofs followed by the
          masters of its slaves (reference `modify_mpc_cell` scatters to the
          same index set, assemble_matrix.cpp:119-201).
      T: (n_sc, nd, W) — local prolongation K_e: identity columns for
          non-slave dofs, coefficient columns for masters; slave columns zero.
    """

    slave_cell_mask: np.ndarray
    cell_pos: np.ndarray  # (n_cells,) position within slave-cell list or -1
    ext_dofs: np.ndarray
    T: np.ndarray


def _build_cell_transforms(V: FunctionSpace, mpc: Optional[MultiPointConstraint], dtype) -> CellTransforms:
    dm = V.dofmap  # (n_cells, nd) unrolled
    n_cells, nd = dm.shape
    if mpc is None or mpc.num_local_slaves == 0:
        return CellTransforms(
            np.zeros(n_cells, bool), -np.ones(n_cells, np.int64), np.zeros((0, nd), np.int64), np.zeros((0, nd, nd), dtype)
        )
    is_slave = mpc.is_slave
    slave_pos = -np.ones(V.num_dofs, dtype=np.int64)
    slave_pos[mpc.slaves] = np.arange(mpc.num_local_slaves)
    cell_is_slave = is_slave[dm].any(axis=1)
    sc = np.flatnonzero(cell_is_slave)
    # host-side table copies (never pull the device arrays back — d2h through
    # the TPU tunnel costs minutes even for KB-sized arrays)
    masters_tab = mpc._np_masters
    coeffs_tab = mpc._np_coeffs
    # width: nd + total master slots of slaves in the cell (padded max)
    n_masters_per_slave = (coeffs_tab != 0).sum(axis=1)
    extra = np.array(
        [n_masters_per_slave[slave_pos[dm[c]][slave_pos[dm[c]] >= 0]].sum() for c in sc],
        dtype=np.int64,
    )
    W = nd + (int(extra.max()) if extra.size else 0)
    ext = -np.ones((len(sc), W), dtype=np.int64)
    T = np.zeros((len(sc), nd, W), dtype=dtype)
    for k, c in enumerate(sc):
        dofs = dm[c]
        ext[k, :nd] = dofs
        ptr = nd
        for i, d in enumerate(dofs):
            sp = slave_pos[d]
            if sp < 0:
                T[k, i, i] = 1
            else:
                nm = n_masters_per_slave[sp]
                ext[k, ptr : ptr + nm] = masters_tab[sp, :nm]
                T[k, i, ptr : ptr + nm] = coeffs_tab[sp, :nm]
                ptr += nm
        # slave-dof positions in ext are invalid (-1): their T column is zero,
        # so their global rows/cols receive no contribution (diagval is added
        # separately, mirroring assemble_matrix.cpp:711-724)
        for i, d in enumerate(dofs):
            if slave_pos[d] >= 0:
                ext[k, i] = -1
    cell_pos = -np.ones(n_cells, dtype=np.int64)
    cell_pos[sc] = np.arange(len(sc))
    return CellTransforms(cell_is_slave, cell_pos, ext, T)


# ---------------------------------------------------------------------------
# compiled forms (cached on the Form object)
# ---------------------------------------------------------------------------


@dataclass
class CompiledMatrixForm:
    form: Form
    terms: list  # CompiledTerm
    tr_row: CellTransforms
    tr_col: CellTransforms
    pattern: SlotPattern
    slots_dev: object  # concatenated slot array (device)
    tables: dict  # device arrays per term
    slaves_row: np.ndarray
    assemble_fn: object
    values_fn: object = None  # flat entry values only (scatter bisection)


def _mpc_pair(constraint):
    if constraint is None:
        return None, None
    if isinstance(constraint, (list, tuple)):
        return constraint[0], constraint[1]
    return constraint, constraint


def _coeff_vectors(term):
    # copy=True: jnp.asarray may zero-copy an aligned numpy buffer on CPU;
    # with async dispatch, a user mutating f.x.array after this call could
    # otherwise change what the pending assembly reads
    return {n: jnp.array(f.x.array, copy=True) for n, f in term.coefficients.items()}


def _compile_matrix(form: Form, constraint, dtype, cell_chunk=262144) -> CompiledMatrixForm:
    """Compile the constrained matrix assembly.

    Cells of each term are reordered (non-slave first, slave after) so the
    value computation can run in UNIFORM padded chunks inside a fori_loop —
    bounding the per-quadrature-point kernel intermediates that otherwise
    scale O(n_cells * nq * nd^2) (a 1M-dof vector problem materialized 5.6GB
    and OOMed the chip).  Single-shot below `cell_chunk` active cells."""
    mpc_r, mpc_c = _mpc_pair(constraint)
    Vt, Vs = form.test_space, form.trial_space
    tr_row = _build_cell_transforms(Vt, mpc_r, dtype)
    tr_col = _build_cell_transforms(Vs, mpc_c, dtype)
    terms = [compile_term(t, Vt, Vs) for t in form.terms]
    mesh = Vt.mesh
    points = mesh.points

    batches = []  # (rows, cols) host arrays in registration order
    masks = []
    tables = {"terms": []}
    term_meta = []
    for ct in terms:
        cells = ct.cells
        sl = tr_row.slave_cell_mask[cells] | tr_col.slave_cell_mask[cells]
        idx_ns = np.flatnonzero(~sl)
        idx_sl = np.flatnonzero(sl)
        dmr = Vt.dofmap[cells]
        dmc = Vs.dofmap[cells]
        # non-slave batch
        r_ns = np.broadcast_to(dmr[idx_ns][:, :, None], (len(idx_ns), dmr.shape[1], dmc.shape[1]))
        c_ns = np.broadcast_to(dmc[idx_ns][:, None, :], r_ns.shape)
        batches.append((r_ns, c_ns))
        masks.append(None)
        # slave batch: ext_row x ext_col
        pr = tr_row.cell_pos[cells[idx_sl]]
        pc = tr_col.cell_pos[cells[idx_sl]]
        # cells slave only on one side: use identity ext = own dofs
        er = _ext_or_identity(tr_row, pr, dmr[idx_sl])
        ecol = _ext_or_identity(tr_col, pc, dmc[idx_sl])
        r_sl = np.broadcast_to(er[:, :, None], (len(idx_sl), er.shape[1], ecol.shape[1]))
        c_sl = np.broadcast_to(ecol[:, None, :], r_sl.shape)
        batches.append((r_sl, c_sl))
        masks.append((r_sl >= 0) & (c_sl >= 0))

        Tr = _T_or_identity(tr_row, pr, dmr.shape[1], er.shape[1], dtype)
        Tc = _T_or_identity(tr_col, pc, dmc.shape[1], ecol.shape[1], dtype)
        lf_all = ct.local_facets if ct.local_facets is not None else np.zeros(len(cells), np.int32)

        def gather(order, pad_to):
            """Per-class tables in `order`, padded to pad_to with cell 0."""
            n = len(order)
            o = np.concatenate([order, np.zeros(pad_to - n, np.int64)]) if pad_to > n else order
            return dict(
                coords=jnp.asarray(points[mesh.cells[cells[o]]], dtype=_real_dtype(dtype)),
                lf=jnp.asarray(lf_all[o]),
                dmr=jnp.asarray(dmr[o], jnp.int32),
                dmc=jnp.asarray(dmc[o], jnp.int32),
                wdofmaps={
                    n_: jnp.asarray(W.dofmap[cells[o]], jnp.int32)
                    for n_, W in zip(ct.coeff_names, ct.coeff_spaces)
                },
            )

        n_ns, n_sl = len(idx_ns), len(idx_sl)
        chunk = min(cell_chunk, max(n_ns, 1))
        nc_ns = -(-n_ns // chunk) if n_ns else 0
        pad_ns = nc_ns * chunk
        chunk_sl = min(cell_chunk, max(n_sl, 1))
        nc_sl = -(-n_sl // chunk_sl) if n_sl else 0
        pad_sl = nc_sl * chunk_sl
        tb = dict(ns=gather(idx_ns, pad_ns), sl=gather(idx_sl, pad_sl))
        if n_sl:
            Tr_p = np.concatenate([Tr, np.broadcast_to(Tr[:1], (pad_sl - n_sl,) + Tr.shape[1:])]) if pad_sl > n_sl else Tr
            Tc_p = np.concatenate([Tc, np.broadcast_to(Tc[:1], (pad_sl - n_sl,) + Tc.shape[1:])]) if pad_sl > n_sl else Tc
        else:
            Tr_p = np.zeros((0, dmr.shape[1], 1), dtype)
            Tc_p = np.zeros((0, dmc.shape[1], 1), dtype)
        tb["sl"]["Tr"] = jnp.asarray(Tr_p)
        tb["sl"]["Tc"] = jnp.asarray(Tc_p)
        tables["terms"].append(tb)
        term_meta.append(dict(
            n_ns=n_ns, n_sl=n_sl, chunk=chunk, chunk_sl=chunk_sl,
            nc_ns=nc_ns, nc_sl=nc_sl, ndt=dmr.shape[1], nds=dmc.shape[1],
            W_r=Tr_p.shape[2] if Tr_p.size else 1,
            W_c=Tc_p.shape[2] if Tc_p.size else 1,
        ))

    # slave diagonal + bc diagonal slots (square forms only — rectangular
    # blocks have no diagonal, reference assemble_matrix.py:44-65)
    square = Vt.num_dofs == Vs.num_dofs
    slaves_row = (
        mpc_r.slaves if (square and mpc_r is not None and mpc_r.num_local_slaves) else np.zeros(0, np.int64)
    )
    batches.append((slaves_row, slaves_row))
    masks.append(None)
    all_dofs = np.arange(Vt.num_dofs if square else 0, dtype=np.int64)
    batches.append((all_dofs, all_dofs))  # bc diagonal: every diagonal entry available
    masks.append(None)

    pattern = build_slot_pattern((Vt.num_dofs, Vs.num_dofs), batches, masks)
    nnz = pattern.nnz
    # the flat slot table is a jit *argument* (in `tables`), never a closure —
    # closed-over device arrays become HLO constants, which explodes compile
    # time (a 12MB constant took minutes through the remote-compile tunnel).
    # Measured on v5e: plain unsorted segment_sum beats gather-into-sorted-
    # order + sorted segment_sum (46ms vs 77ms for 3.1M entries).
    tables["slots"] = jnp.asarray(np.concatenate(pattern.slots).astype(np.int32))
    slots_dev = None

    n_terms = len(terms)
    kernels = [ct.kernel for ct in terms]

    def _chunked_vals(kern, tb, meta, coeff_vec, bc_row_mask, bc_col_mask, side):
        """Flat element values for one class (ns or sl) of one term,
        computed chunk-by-chunk in a fori_loop (uniform padded chunks)."""
        n_act = meta["n_ns"] if side == "ns" else meta["n_sl"]
        n_chunks = meta["nc_ns"] if side == "ns" else meta["nc_sl"]
        chunk = meta["chunk"] if side == "ns" else meta["chunk_sl"]
        t = tb[side]
        if n_act == 0:
            width = meta["ndt"] * meta["nds"] if side == "ns" else meta["W_r"] * meta["W_c"]
            return jnp.zeros((0,), _result_dtype(dtype))
        width = meta["ndt"] * meta["nds"] if side == "ns" else meta["W_r"] * meta["W_c"]

        def body(i, flat):
            c0 = i * chunk
            cs = jax.lax.dynamic_slice_in_dim(t["coords"], c0, chunk, 0)
            lf = jax.lax.dynamic_slice_in_dim(t["lf"], c0, chunk, 0)
            dmr_c = jax.lax.dynamic_slice_in_dim(t["dmr"], c0, chunk, 0)
            dmc_c = jax.lax.dynamic_slice_in_dim(t["dmc"], c0, chunk, 0)
            wl = {
                n_: coeff_vec[n_][jax.lax.dynamic_slice_in_dim(t["wdofmaps"][n_], c0, chunk, 0)]
                for n_ in coeff_vec
            }
            Ae = kern(cs, lf, wl)  # (chunk, ndt, nds)
            mr = 1.0 - bc_row_mask[dmr_c]
            mc = 1.0 - bc_col_mask[dmc_c]
            Ae = Ae * mr[:, :, None] * mc[:, None, :]
            if side == "sl":
                Tr_c = jax.lax.dynamic_slice_in_dim(t["Tr"], c0, chunk, 0)
                Tc_c = jax.lax.dynamic_slice_in_dim(t["Tc"], c0, chunk, 0)
                Ae = jnp.einsum(
                    "ciw,cij,cjv->cwv", jnp.conj(Tr_c), Ae, Tc_c,
                    preferred_element_type=Ae.dtype,
                )
            return jax.lax.dynamic_update_slice_in_dim(
                flat, Ae.reshape(-1).astype(flat.dtype), c0 * width, 0
            )

        flat0 = jnp.zeros((n_chunks * chunk * width,), _result_dtype(dtype))
        if n_chunks == 1:
            flat = body(0, flat0)
        else:
            flat = jax.lax.fori_loop(0, n_chunks, body, flat0)
        return flat[: n_act * width]

    def _vals_blocks(tabs, coeff_vecs, bc_row_mask, bc_col_mask, bc_diag_vals, diagval):
        """Per-entry value blocks in slot-table order: for each term the
        non-slave and slave-cell classes, then the slave diagval fill, then
        the bc-diagonal passthrough."""
        vals_out = []
        for ti in range(n_terms):
            tb = tabs["terms"][ti]
            meta = term_meta[ti]
            vals_out.append(_chunked_vals(
                kernels[ti], tb, meta, coeff_vecs[ti], bc_row_mask, bc_col_mask, "ns"
            ))
            vals_out.append(_chunked_vals(
                kernels[ti], tb, meta, coeff_vecs[ti], bc_row_mask, bc_col_mask, "sl"
            ))
        out_dtype = vals_out[0].dtype if vals_out else jnp.asarray(diagval).dtype
        dv = jnp.real(diagval) if (jnp.iscomplexobj(diagval) and not jnp.issubdtype(out_dtype, jnp.complexfloating)) else diagval
        vals_out.append(jnp.full((slaves_row.shape[0],), dv, dtype=out_dtype))
        vals_out.append(bc_diag_vals[: all_dofs.shape[0]].astype(out_dtype))
        return vals_out

    def values_fn(tabs, coeff_vecs, bc_row_mask, bc_col_mask, bc_diag_vals, diagval):
        """Flat per-entry values, concatenated in slot-table order (no
        scatter) — separated from assemble_fn so the scatter stage can be
        probed/bisected independently of the value computation.

        DIAGNOSTIC-ONLY on TPU at large sizes: XLA:TPU miscompiles this
        concatenate at ~22M f32 total entries — the final (bc-diag
        passthrough) operand's output region receives data aliased from the
        sl-term block instead of bc_diag_vals (r4, NB=24/NT=20 contact:
        15519/74658 wrong tail entries; clean at ~6.5M and on CPU, and an
        optimization_barrier does NOT help).  assemble_fn therefore scatters
        each block separately and never builds this concatenate.
        Repro: scripts/probe_vals_dump.py + scripts/probe_concat_variants.py."""
        vals_out = _vals_blocks(tabs, coeff_vecs, bc_row_mask, bc_col_mask,
                                bc_diag_vals, diagval)
        return jnp.concatenate(vals_out) if vals_out else jnp.zeros(0)

    def assemble_fn(tabs, coeff_vecs, bc_row_mask, bc_col_mask, bc_diag_vals, diagval):
        blocks = _vals_blocks(tabs, coeff_vecs, bc_row_mask, bc_col_mask,
                              bc_diag_vals, diagval)
        slots = tabs["slots"]
        out_dtype = blocks[0].dtype if blocks else _result_dtype(dtype)
        data = jnp.zeros((nnz + 1,), out_dtype)
        ofs = 0
        for blk in blocks:
            n = blk.shape[0]
            if n == 0:
                continue
            sl_ids = jax.lax.slice_in_dim(slots, ofs, ofs + n, axis=0)
            if n > 4 * nnz:
                # the big term blocks: one segment-sum pass each
                data = data + jax.ops.segment_sum(blk, sl_ids, num_segments=nnz + 1)
            else:
                # small blocks (slave diagval fill, bc diagonal): scatter-add
                data = data.at[sl_ids].add(blk)
            ofs += n
        return data[:nnz]

    cmf = CompiledMatrixForm(
        form, terms, tr_row, tr_col, pattern, slots_dev, tables, slaves_row, jax.jit(assemble_fn)
    )
    cmf.values_fn = jax.jit(values_fn)
    return cmf


def _result_dtype(dtype):
    return np.dtype(dtype)


def _ext_or_identity(tr: CellTransforms, pos, dm_sub):
    """ext dof rows for cells that are slave on this side, else the plain
    dofs padded to width W."""
    W = tr.ext_dofs.shape[1] if tr.ext_dofs.size else dm_sub.shape[1]
    W = max(W, dm_sub.shape[1])
    out = -np.ones((len(pos), W), dtype=np.int64)
    for k, p in enumerate(pos):
        if p >= 0:
            out[k, : tr.ext_dofs.shape[1]] = tr.ext_dofs[p]
        else:
            out[k, : dm_sub.shape[1]] = dm_sub[k]
    return out


def _T_or_identity(tr: CellTransforms, pos, nd, W, dtype):
    out = np.zeros((len(pos), nd, W), dtype=dtype)
    eye = np.eye(nd, dtype=dtype)
    for k, p in enumerate(pos):
        if p >= 0:
            out[k, :, : tr.T.shape[2]] = tr.T[p]
        else:
            out[k, :, :nd] = eye
    return out


def _real_dtype(dtype):
    dt = np.dtype(dtype)
    return np.float32 if dt in (np.dtype(np.float32), np.dtype(np.complex64)) else np.float64


def _bc_applies(bc, V) -> bool:
    """Does this bc act on (a field view of) V?  bcs on other spaces are
    ignored (nest blocks pass mixed-space bc lists, reference
    assemble_matrix.py:119-146)."""
    if bc.V is V or getattr(bc.V, "mixed_parent", None) is V:
        return True
    # size fallback for rebuilt-but-equivalent spaces: equal size alone
    # cross-applied BCs between distinct equal-sized nest blocks / mixed
    # field views (a view carries parent-global dofs) — demand the same
    # field view offset, block structure, and element degree too
    return (
        bc.V.num_dofs == V.num_dofs
        and bc.V.mesh is V.mesh
        and getattr(bc.V, "dof_offset", 0) == getattr(V, "dof_offset", 0)
        and getattr(bc.V, "block_size", 1) == getattr(V, "block_size", 1)
        and getattr(getattr(bc.V, "element", None), "degree", None)
        == getattr(getattr(V, "element", None), "degree", None)
    )


def _bc_masks(V: FunctionSpace, bcs, dtype):
    """BC row/col indicator; bcs on other spaces are ignored (nest blocks
    pass mixed-space bc lists, reference assemble_matrix.py:119-146)."""
    mask = np.zeros(V.num_dofs, dtype=_real_dtype(dtype))
    for bc in bcs:
        if _bc_applies(bc, V):
            mask[bc.dofs] = 1.0
    return mask


def _bc_values(V: FunctionSpace, bcs, dtype):
    g = np.zeros(V.num_dofs, dtype=dtype)
    for bc in bcs:
        if _bc_applies(bc, V):
            g[bc.dofs] = bc.dof_values(dtype)
    return g


# ---------------------------------------------------------------------------
# public API (mirrors reference python/src/dolfinx_mpc/assemble_matrix.py)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class MPCMatrix(CSRMatrix):
    """Assembled constrained matrix; CSR with the K^H A K structure plus
    diagval on slave/bc diagonals.  Registered as its own pytree (the base
    class registration does not cover subclasses) so it can be a jit
    argument."""


def _form_cache(form) -> dict:
    """Compiled-kernel cache attached to the Form itself — a global dict
    keyed by id(form) breaks when CPython reuses the id of a collected Form
    (stale tables for a brand-new form)."""
    return form.__dict__.setdefault("_compiled_cache", {})


def _constraint_key(constraint):
    if isinstance(constraint, (list, tuple)):
        return tuple(id(m) for m in constraint), tuple(constraint)
    return (id(constraint),), (constraint,)


def _get_compiled_matrix(form, constraint, dtype):
    ids, refs = _constraint_key(constraint)
    key = ("mat", ids, np.dtype(dtype).str)
    cache = _form_cache(form)
    cm = cache.get(key)
    if cm is None:
        cm = _compile_matrix(form, constraint, dtype)
        cache[key] = cm
        cache.setdefault("_refs", []).append(refs)  # pin constraint lifetimes
    return cm


def assemble_matrix(form: Form, constraint=None, bcs=None, diagval=1.0, dtype=None) -> MPCMatrix:
    """Assemble a bilinear form with MPC elimination and Dirichlet handling
    (reference assemble_matrix.py:21-65).  `constraint` may be one MPC or a
    pair (row, col) for rectangular assembly (:44-46)."""
    from ..utils.timing import timed

    bcs = bcs or []
    mpc_r, mpc_c = _mpc_pair(constraint)
    if dtype is None:
        dtype = mpc_r.dtype if mpc_r is not None else np.float64
    with timed("~MPC: Assemble matrix"):
        cm = _get_compiled_matrix(form, constraint, dtype)
        Vt, Vs = form.test_space, form.trial_space
        bc_row = jnp.asarray(_bc_masks(Vt, bcs, dtype))
        bc_col = jnp.asarray(_bc_masks(Vs, bcs, dtype)) if Vs is not Vt else bc_row
        # diagonal: diagval where bc (square forms only)
        bc_diag = np.zeros(Vt.num_dofs, dtype=dtype)
        if Vt.num_dofs == Vs.num_dofs:
            for bc in bcs:
                bc_diag[bc.dofs] = diagval
        coeff_vecs = [_coeff_vectors(t.term) for t in cm.terms]
        data = cm.assemble_fn(
            cm.tables, coeff_vecs, bc_row, bc_col, jnp.asarray(bc_diag),
            jnp.asarray(diagval, dtype=dtype),
        )
        return MPCMatrix(
            data,
            jnp.asarray(cm.pattern.indices),
            jnp.asarray(cm.pattern.indptr),
            jnp.asarray(cm.pattern.row_ids),
            cm.pattern.shape,
        )


def create_sparsity_pattern(form: Form, mpc) -> SlotPattern:
    """Reference create_sparsity_pattern (cpp/utils.h:382-496)."""
    mpc_r, _ = _mpc_pair(mpc)
    dtype = mpc_r.dtype if mpc_r is not None else np.float64
    return _get_compiled_matrix(form, mpc, dtype).pattern


# ---------------------------------------------------------------------------
# vectors
# ---------------------------------------------------------------------------


@dataclass
class CompiledVectorForm:
    form: Form
    terms: list
    tr_row: CellTransforms
    tables: dict
    assemble_fn: object





def _compile_vector(form: Form, constraint, dtype) -> CompiledVectorForm:
    mpc_r, _ = _mpc_pair(constraint)
    Vt = form.test_space
    tr_row = _build_cell_transforms(Vt, mpc_r, dtype)
    terms = [compile_term(t, Vt, None) for t in form.terms]
    mesh = Vt.mesh
    points = mesh.points
    tables = {"terms": []}
    ndofs = Vt.num_dofs
    for ct in terms:
        cells = ct.cells
        sl = tr_row.slave_cell_mask[cells]
        idx_ns = np.flatnonzero(~sl)
        idx_sl = np.flatnonzero(sl)
        dmr = Vt.dofmap[cells]
        pr = tr_row.cell_pos[cells[idx_sl]]
        er = _ext_or_identity(tr_row, pr, dmr[idx_sl])
        Tr = _T_or_identity(tr_row, pr, dmr.shape[1], er.shape[1], dtype)
        lf = ct.local_facets if ct.local_facets is not None else np.zeros(len(cells), np.int32)
        # scatter targets: invalid (-1) -> trash slot ndofs
        tgt_ns = dmr[idx_ns].astype(np.int64)
        tgt_sl = np.where(er >= 0, er, ndofs)
        tables["terms"].append(
            dict(
                coords=jnp.asarray(points[mesh.cells[cells]], dtype=_real_dtype(dtype)),
                lf=jnp.asarray(lf),
                idx_ns=jnp.asarray(idx_ns, jnp.int32),
                idx_sl=jnp.asarray(idx_sl, jnp.int32),
                Tr=jnp.asarray(Tr),
                tgt_ns=jnp.asarray(tgt_ns, jnp.int32),
                tgt_sl=jnp.asarray(tgt_sl, jnp.int32),
                wdofmaps={
                    n: jnp.asarray(W.dofmap[cells], jnp.int32)
                    for n, W in zip(ct.coeff_names, ct.coeff_spaces)
                },
            )
        )
    kernels = [ct.kernel for ct in terms]
    n_terms = len(terms)

    def assemble_fn(tabs, coeff_vecs):
        b = jnp.zeros(ndofs + 1, dtype=dtype)
        for ti in range(n_terms):
            tb = tabs["terms"][ti]
            wlocals = {n: coeff_vecs[ti][n][tb["wdofmaps"][n]] for n in coeff_vecs[ti]}
            be = kernels[ti](tb["coords"], tb["lf"], wlocals)  # (n_act, ndt)
            be_ns = be[tb["idx_ns"]]
            be_sl = be[tb["idx_sl"]]
            bep = jnp.einsum("ciw,ci->cw", jnp.conj(tb["Tr"]), be_sl)
            b = b.at[tb["tgt_ns"].reshape(-1)].add(be_ns.reshape(-1))
            b = b.at[tb["tgt_sl"].reshape(-1)].add(bep.reshape(-1))
        return b[:ndofs]

    return CompiledVectorForm(form, terms, tr_row, tables, jax.jit(assemble_fn))


def _get_compiled_vector(form, constraint, dtype):
    key = ("vec", id(constraint), np.dtype(dtype).str)
    cache = _form_cache(form)
    cv = cache.get(key)
    if cv is None:
        cv = _compile_vector(form, constraint, dtype)
        cache[key] = cv
        cache.setdefault("_refs", []).append((constraint,))
    return cv


def assemble_vector(form: Form, constraint=None, b=None, dtype=None):
    """Assemble a linear form with the K^H b MPC redistribution
    (reference assemble_vector.py:79-104)."""
    from ..utils.timing import timed

    if dtype is None:
        dtype = constraint.dtype if constraint is not None else np.float64
    with timed("~MPC: Assemble vector"):
        cv = _get_compiled_vector(form, constraint, dtype)
        coeff_vecs = [_coeff_vectors(t.term) for t in cv.terms]
        out = cv.assemble_fn(cv.tables, coeff_vecs)
    if b is not None:
        return b + out
    return out


# ---------------------------------------------------------------------------
# lifting + set_bc
# ---------------------------------------------------------------------------





def _compile_lifting(form: Form, constraint, dtype, bcs=None):
    """Per-cell: be = -Ae @ g_cell (raw Ae, no bc zeroing), then conj(T)^T be
    (reference lifting.h:250-301 + modify_mpc_vec at :117-128).

    Only cells with at least one BC COLUMN dof are processed — the
    reference's entity skip (lifting.h:93-109); the tables are O(bc-surface)
    instead of O(cells) (the full-mesh version materialized 5.1GB of kernel
    intermediates at a 1M-dof contact problem)."""
    mpc_r, mpc_c = _mpc_pair(constraint)
    Vt, Vs = form.test_space, form.trial_space
    tr_row = _build_cell_transforms(Vt, mpc_r, dtype)
    terms = [compile_term(t, Vt, Vs) for t in form.terms]
    mesh = Vt.mesh
    points = mesh.points
    ndofs = Vt.num_dofs
    bc_col = np.zeros(Vs.num_dofs, bool)
    if bcs:
        for bc in bcs:
            if _bc_applies(bc, Vs):
                bc_col[bc.dofs] = True
    tables = {"terms": []}
    for ct in terms:
        cells = ct.cells
        if bcs is not None:
            has_bc = bc_col[Vs.dofmap[cells]].any(axis=1)
            keep = np.flatnonzero(has_bc)
            cells = cells[keep]
            lf_src = ct.local_facets[keep] if ct.local_facets is not None else None
        else:
            lf_src = ct.local_facets
        sl = tr_row.slave_cell_mask[cells]
        idx_ns = np.flatnonzero(~sl)
        idx_sl = np.flatnonzero(sl)
        dmr = Vt.dofmap[cells]
        dmc = Vs.dofmap[cells]
        pr = tr_row.cell_pos[cells[idx_sl]]
        er = _ext_or_identity(tr_row, pr, dmr[idx_sl])
        Tr = _T_or_identity(tr_row, pr, dmr.shape[1], er.shape[1], dtype)
        lf = lf_src if lf_src is not None else np.zeros(len(cells), np.int32)
        tables["terms"].append(
            dict(
                coords=jnp.asarray(points[mesh.cells[cells]], dtype=_real_dtype(dtype)),
                lf=jnp.asarray(lf),
                idx_ns=jnp.asarray(idx_ns, jnp.int32),
                idx_sl=jnp.asarray(idx_sl, jnp.int32),
                Tr=jnp.asarray(Tr),
                dmr=jnp.asarray(dmr, jnp.int32),
                dmc=jnp.asarray(dmc, jnp.int32),
                tgt_ns=jnp.asarray(dmr[idx_ns].astype(np.int64), jnp.int32),
                tgt_sl=jnp.asarray(np.where(er >= 0, er, ndofs), jnp.int32),
                wdofmaps={
                    n: jnp.asarray(W.dofmap[cells], jnp.int32)
                    for n, W in zip(ct.coeff_names, ct.coeff_spaces)
                },
            )
        )
    kernels = [ct.kernel for ct in terms]
    n_terms = len(terms)

    def lift_fn(tabs, coeff_vecs, gvec, bc_col_mask, x0, scale):
        b = jnp.zeros(ndofs + 1, dtype=dtype)
        for ti in range(n_terms):
            tb = tabs["terms"][ti]
            wlocals = {n: coeff_vecs[ti][n][tb["wdofmaps"][n]] for n in coeff_vecs[ti]}
            Ae = kernels[ti](tb["coords"], tb["lf"], wlocals)
            gcell = (gvec - x0)[tb["dmc"]] * bc_col_mask[tb["dmc"]].astype(gvec.dtype)
            be = -scale * jnp.einsum("cij,cj->ci", Ae, gcell)
            be_ns = be[tb["idx_ns"]]
            bep = jnp.einsum("ciw,ci->cw", jnp.conj(tb["Tr"]), be[tb["idx_sl"]])
            b = b.at[tb["tgt_ns"].reshape(-1)].add(be_ns.reshape(-1))
            b = b.at[tb["tgt_sl"].reshape(-1)].add(bep.reshape(-1))
        return b[:ndofs]

    return terms, tables, jax.jit(lift_fn)


def apply_lifting(b, forms, bcs_list, constraint=None, x0=None, scale=1.0, dtype=None):
    """b <- b - scale * K^H A (g - x0): reference assemble_vector.py:25-76 /
    cpp/lifting.h:441-670.  `forms` is a list of bilinear forms, `bcs_list` a
    list of bc-lists (one per form)."""
    if dtype is None:
        dtype = constraint.dtype if constraint is not None else np.asarray(b).dtype
    b = jnp.asarray(b)
    for form, bcs in zip(forms, bcs_list):
        if not bcs:
            continue
        key = ("lift", id(constraint), np.dtype(dtype).str,
               tuple(sorted(id(bc) for bc in bcs)))
        cache = _form_cache(form)
        ct = cache.get(key)
        if ct is None:
            ct = _compile_lifting(form, constraint, dtype, bcs=bcs)
            cache[key] = ct
            cache.setdefault("_refs", []).append((constraint, tuple(bcs)))
        terms, tables, lift_fn = ct
        Vs = form.trial_space
        gvec = jnp.asarray(_bc_values(Vs, bcs, dtype))
        bc_col = jnp.asarray(_bc_masks(Vs, bcs, dtype))
        x0v = jnp.zeros_like(gvec) if x0 is None else jnp.asarray(x0, dtype=dtype)
        coeff_vecs = [_coeff_vectors(t.term) for t in terms]
        b = b + lift_fn(tables, coeff_vecs, gvec, bc_col, x0v, jnp.asarray(scale, dtype=dtype))
    return b


def set_bc(b, bcs, x0=None, scale=1.0):
    """b[bc] = scale * (g - x0)[bc] (PETSc set_bc semantics used at
    reference problem.py:576-581)."""
    b = jnp.asarray(b)
    if not bcs:
        return b
    V = bcs[0].V
    g = _bc_values(V, bcs, np.asarray(b).dtype)
    dofs = np.concatenate([bc.dofs for bc in bcs])
    gd = jnp.asarray(g)[dofs]
    if x0 is not None:
        gd = gd - jnp.asarray(x0)[dofs]
    return b.at[jnp.asarray(dofs)].set(scale * gd)
