"""Pallas TPU kernel for the lean fold assembly (P1 tets, scalar space).

The XLA lean path is element-kernel-bound: the SoA kernel materializes
(nd, nd, n_cells) element tensors and ~60 per-(offset, corner) grid
intermediates in HBM (measured 1.9 ms of the 1.96 ms total at n=64 — the
DIA data write-roofline is 0.02 ms).  This kernel fuses the whole pipeline —
coordinate synthesis -> per-cell Jacobian/cofactor pullback -> element
tensor -> stencil accumulation -> BC row/col masking — into ONE pass that
only writes the final DIA data: one grid program per output x-plane, all
per-cell work as (ny, nz) VPU lane arithmetic in VMEM.

Plane p of the DIA data receives contributions from box planes p-1 (moves
with corner delta da_x = 1) and p (da_x = 0); both are recomputed locally so
programs write DISJOINT output blocks (recompute is ~600 flop/box — free on
the VPU next to the HBM write).

Mirrors the semantics of ops/lattice.py:_assemble_fold_lean exactly
(verified entry-identical in tests/test_pallas_lattice.py); the reference
behavior being replaced is the per-cell assembly loop of
/root/reference/cpp/assemble_matrix.cpp:488-547.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_lean_fold_pallas", "make_lean_blocked_pallas",
           "make_blocked_matvec_pallas", "pallas_supported"]


def _matvec_budget(n1, n2, n_resident_planes):
    """Data rows of one (1, n1, n2) f32 plane that fit VMEM next to
    `n_resident_planes` always-resident planes (x halo blocks + y block,
    both double-buffered by the pipeline), with double buffering on the
    data block itself.  Direct accounting — the assembler's calibrated
    26-bytes/point heuristic over-reserves ~8x for matvecs, splitting them
    into O(10) pallas calls whose partial-y sums dominate the runtime."""
    padded = (-(-n1 // 8) * 8) * (-(-n2 // 128) * 128) * 4
    avail = 14e6 - n_resident_planes * padded * 2
    return max(1, int(avail / (2 * padded)))


def _plane_budget(n1, n2, reserve=0):
    """How many (1, n1, n2) f32 plane blocks fit the ~16MB scoped-VMEM
    budget, counting the Mosaic (8, 128) TILE PADDING (dominant for small
    planes: 55x55 pads 2.4x to 56x128) and double buffering.  The 26-bytes
    per padded point constant is calibrated from a measured 17.78MB
    footprint for 15 offsets at 217x217; `reserve` subtracts always-resident
    extra planes (kernel inputs/outputs)."""
    padded = (-(-n1 // 8) * 8) * (-(-n2 // 128) * 128)
    return max(1, int(13e6 / (26 * padded)) - reserve)


def _probe_constant_M(term, gdim, bs=1):
    """Constant feature matrix of a bilinear integrand: features per
    component k are [value_k, d/dx_k, d/dy_k, d/dz_k] (the soa_kernels
    layout alpha = k*(1+g) + {0, 1+t}); integrand(u, v, ctx) must be
    bilinear with x-independent coefficients and no FEM coefficients.
    Returns (bs*(1+gdim), bs*(1+gdim)) numpy M or None."""
    if term.coefficients:
        return None
    from ..fem.forms import Ctx

    from .soa_kernels import _unit_features

    nFb = bs * (1 + gdim)
    probes = _unit_features(bs, gdim)
    consts = {k: np.asarray(v) for k, v in term.constants.items()}

    def mat(x):
        out = np.zeros((nFb, nFb))
        ctx = Ctx(np.asarray(x), None, dict(consts))
        for f in range(nFb):
            for g in range(nFb):
                try:
                    v = complex(np.asarray(term.integrand(probes[f], probes[g], ctx)))
                except Exception:
                    return None
                if v.imag != 0:
                    return None
                out[f, g] = v.real
        return out

    rng = np.random.default_rng(11)
    M1 = mat(rng.random(gdim))
    if M1 is None:
        return None
    M2 = mat(rng.random(gdim))
    if M2 is None or not np.allclose(M1, M2, rtol=1e-12, atol=1e-14):
        return None  # x-dependent coefficients
    return M1


def pallas_supported(clf) -> bool:
    """Covers 3D lean-fold forms with constant coefficients: scalar at
    degrees 1-2 (flagship + the reference's canonical --degree 2) and
    block size <= 3 (vector elasticity, bench_elasticity_edge) at
    degree 1."""
    if not (
        clf._lean
        and clf.refine in (1, 2)
        and (clf.bs == 1 or (clf.bs <= 3 and clf.refine == 1))
        and clf.mesh.tdim == 3
        and np.dtype(clf.dtype) == np.float32
    ):
        return False
    return _probe_constant_M(clf.term, clf.mesh.gdim, clf.bs) is not None


def make_lean_fold_pallas(clf, interpret=False, max_off=None, fuse_mask=False):
    """Build assemble(jitter[, kb]) -> data (n_off * bs * bs, n0, n1, n2)
    with plane order (offset, test component ci, trial component cj) —
    reshape to DIAMatrix's (n_off, bs, bs, n0, n1, n2).

    fuse_mask=False (default): UNMASKED data; BC row/col masking + diagval
    stay in XLA.  That is ~0.08 ms at P1 n=64 but the BLOCKED degree-2
    masking is 230 sequential .at[m].multiply passes — measured 4.5 ms of
    the 4.53 ms assembly (scripts/probe_p2_asm_phases.py, r4).

    fuse_mask=True (r == 1 only): assemble(jitter, kb) applies the BC
    row/col masks INSIDE the kernel.  kb is the keep stack
    (n_stack, n0, n1, n2) — keep_blocked (class-major) for the blocked
    degree-2 view, keep_grid (component-major) otherwise; it is halo-padded
    by 1 here (XLA pad, one cheap pass over ~10 MB) so every shifted column
    mask is a static in-VMEM slice (the jnp.pad that Mosaic could not lower
    is gone).  Entry (r, r+off) dies iff either end is a bc dof — exactly
    _zero_bc_blocked / _zero_bc_on_grid; diagval stays in XLA (touches only
    the diagonal planes).

    The output plane block is double-buffered by the pallas pipeline; when
    2 * n_off * n1 * n2 * 4B would blow the ~16MB VMEM budget (n >= ~200),
    the offsets are SPLIT across several pallas calls (each recomputes the
    cheap per-cell geometry; outputs are concatenated)."""
    n0, n1, n2 = clf.vshape
    offsets = clf.offsets
    n_off = len(offsets)
    if fuse_mask:
        assert clf.refine == 1, "fused masking is an r==1 feature"
    n_stack = len(clf._classes) if _is_blocked_view(clf) else clf.bs
    fuse_mode = None
    if fuse_mask:
        fuse_mode = _detect_factored_masks(clf)
        if fuse_mode is None:
            # non-separable masks: the 2D-plane mask kernel keeps 4 full
            # stacks resident — only viable while they fit VMEM
            padded2 = (-(-(n1 + 2) // 8) * 8) * (-(-(n2 + 2) // 128) * 128) * 4
            if 13e6 - 4 * n_stack * padded2 * 2 > 8 * 2 * padded2:
                fuse_mode = "2d"
        if fuse_mode is None:
            fuse_mask = False  # fall back to unfused + XLA masking
    if max_off is None:
        if fuse_mode == "2d":
            # direct accounting (the assembler's 26-bytes/point heuristic
            # was calibrated on the r=2 upsampling kernel and over-reserves
            # ~4x here): double-buffered out planes next to 3 mask stacks +
            # 1 bc-indicator stack
            padded = (-(-(n1 + 2) // 8) * 8) * (-(-(n2 + 2) // 128) * 128) * 4
            avail = 13e6 - 4 * n_stack * padded * 2
            max_off = max(1, int(avail / (2 * padded)) // (clf.bs * clf.bs))
        elif fuse_mode == "factored":
            # factored masks cost ~KBs of VMEM: out planes are the budget
            padded = (-(-n1 // 8) * 8) * (-(-n2 // 128) * 128) * 4
            max_off = max(1, int(13e6 / (2 * padded)) // (clf.bs * clf.bs))
        else:
            # offsets per call bounded by the 16MB scoped-VMEM limit
            # (tile-padded); each offset owns bs^2 output planes
            max_off = max(1, _plane_budget(n1, n2) // (clf.bs * clf.bs))
    groups = [list(range(i, min(i + max_off, n_off)))
              for i in range(0, n_off, max_off)]
    calls = [_make_lean_fold_pallas_group(clf, g, interpret, fuse_mode)
             for g in groups]

    if not fuse_mask:
        if len(calls) == 1:
            return calls[0]

        def assemble(jitter):
            return jnp.concatenate([c(jitter) for c in calls], axis=0)

        return assemble

    if fuse_mode == "factored":
        # mask factors are baked constants (KBs); the traced kb/bc_ind args
        # are accepted for interface parity and ignored (they are constant
        # by contract — the factors came from the same concrete arrays)
        def assemble_factored(jitter, kb, diagval, bc_ind):
            dv = jnp.asarray(diagval, jnp.float32)
            outs = [c(jitter, dv) for c in calls]
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

        return assemble_factored

    def assemble_masked(jitter, kb, diagval, bc_ind):
        kbp = jnp.pad(kb.astype(jnp.float32),
                      ((0, 0), (1, 1), (1, 1), (1, 1)))
        dv = jnp.asarray(diagval, jnp.float32)
        outs = [c(jitter, kbp, dv, bc_ind) for c in calls]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    return assemble_masked


def _detect_factored_masks(clf):
    """Return "factored" when the keep stack separates into per-axis
    factors (keep[c] == ki[c] ⊗ kj[c] ⊗ kk[c] exactly — true for
    axis-aligned Dirichlet planes, the overwhelmingly common box-mesh case)
    AND the bc indicator equals pad - keep (multiplicity 1 everywhere, with
    pad the separable real-slot indicator).  The factored kernel's masks
    cost KBs of VMEM instead of 4 full plane stacks, so fused masking then
    scales to any n (the 2D variant stops fitting at n ≈ 80 for the
    8-class blocked layout).  Stores the factors on the clf."""
    kb = np.asarray(clf._keep_blocked if _is_blocked_view(clf)
                    else clf._keep_grid, np.float64)
    ind = np.asarray(clf._bc_ind_blocked if _is_blocked_view(clf)
                     else clf._bc_ind_grid, np.float64)
    ki = kb.max(axis=(2, 3))
    kj = kb.max(axis=(1, 3))
    kk = kb.max(axis=(1, 2))
    if not np.array_equal(
            kb, ki[:, :, None, None] * kj[:, None, :, None] * kk[:, None, None, :]):
        return None
    # pad (real-slot) indicator factors: blocked classes pad per axis; the
    # grid layout has no padding
    if _is_blocked_view(clf):
        r3 = clf.r3
        fine = clf._clf.vshape
        S = kb.shape[1:]
        pi = np.zeros((kb.shape[0], S[0]))
        pj = np.zeros((kb.shape[0], S[1]))
        pk = np.zeros((kb.shape[0], S[2]))
        for c, pc in enumerate(clf._classes):
            pi[c, : -(-(fine[0] - pc[0]) // r3[0])] = 1.0
            pj[c, : -(-(fine[1] - pc[1]) // r3[1])] = 1.0
            pk[c, : -(-(fine[2] - pc[2]) // r3[2])] = 1.0
    else:
        pi = np.ones_like(ki)
        pj = np.ones_like(kj)
        pk = np.ones_like(kk)
    if not np.array_equal(
            ind,
            pi[:, :, None, None] * pj[:, None, :, None] * pk[:, None, None, :]
            - kb):
        return None  # multiplicity > 1 or keep zeros beyond bc+pad
    # halo-pad the axis factors by 1 (shifted column-mask reads)
    clf._mask_factors = tuple(
        jnp.asarray(np.pad(f, ((0, 0), (1, 1))).astype(np.float32))
        for f in (ki, kj, kk, pi, pj, pk))
    return "factored"


def _is_blocked_view(clf):
    return isinstance(clf, _BlockedView)


def _make_lean_fold_pallas_group(clf, oid_group, interpret=False,
                                 fuse_mode=None):
    """Pallas call computing the DIA planes for the offset ids in
    `oid_group` (a contiguous range).  fuse_mode: None (unmasked raw
    output), "2d" (BC masks as plane stacks in VMEM), or "factored"
    (separable per-axis mask factors — KBs of VMEM, scales to any n).

    General scalar constant-coefficient forms via the probed feature matrix
    M (features [value, dx, dy, dz]): Ae[a][b] = sum_qp w |det| sum_{f,g}
    M[f,g] F_f(a) F_g(b), with the basis value/reference-gradient tables of
    the space's element at the term's quadrature rule — the same integral
    the XLA SoA kernel computes, fused into plane programs.

    Degree 2: box-lane contributions land on the refined grid at
    (r j + day, r k + daz) — placed by pltpu.repeat upsampling + an
    even-parity mask + one slice-add per (offset, corner) group."""
    lat = clf.lat
    nx, ny, nz = lat.dims
    n0, n1, n2 = clf.vshape
    r = clf.refine
    oid_set = set(oid_group)
    oid_local = {oid: i for i, oid in enumerate(oid_group)}
    offsets = [clf.offsets[o] for o in oid_group]
    n_off = len(offsets)
    geo = clf._geo_deltas  # (T, 4, 3) vertex deltas
    T = geo.shape[0]
    origin = tuple(float(v) for v in clf._origin)
    spacing = tuple(float(v) for v in clf._spacing)

    # quadrature + basis tables (match the XLA kernel's rule exactly)
    from ..fem.quadrature import quadrature_rule

    el = clf.V.element
    qdeg = clf.term.quad_degree
    if qdeg is None:
        qdeg = 2 * el.degree
    qpts, qw = quadrature_rule(clf.mesh.ref_cell, qdeg)
    phi = el.tabulate(qpts)  # (nq, nd) scalar nodes
    dref = el.tabulate_grad(qpts)  # (nq, nd, 3)
    nq = len(qw)
    bs = clf.bs
    nF = 1 + clf.mesh.gdim  # per-component features [value, dx, dy, dz]
    M = _probe_constant_M(clf.term, clf.mesh.gdim, bs)
    assert M is not None
    # nonzero (f, g) feature pairs per (test ci, trial cj) component block:
    # u = trial lives at rows cj*nF + f, v = test at cols ci*nF + g
    nzM = {
        (ci, cj): [
            (f, g)
            for f in range(nF)
            for g in range(nF)
            if abs(M[cj * nF + f, ci * nF + g]) > 0.0
        ]
        for ci in range(bs)
        for cj in range(bs)
    }

    # group moves by the x component of the corner delta
    by_dax = {d: [] for d in range(r + 1)}
    for t, a, b, oid, (dax, day, daz) in clf.moves:
        if oid in oid_set:
            by_dax[dax].append((t, a, b, oid_local[oid], day, daz))

    # fused BC masking (r == 1): per flat output plane, which mask-stack
    # rows multiply it — (row_idx, col_idx, spatial offset).  The stack is
    # class-major (blocked degree-2 view) or component-major (keep_grid).
    if fuse_mode is not None:
        assert r == 1
        if _is_blocked_view(clf):
            cid = {c: i for i, c in enumerate(clf._classes)}
            mask_info = [(cid[cr], cid[cc], off)
                         for oid in oid_group
                         for (cr, cc, off) in [clf.offsets[oid]]]
            # planes receiving the diagval bc-diagonal add
            is_diag = [cr == cc and off == (0, 0, 0)
                       for oid in oid_group
                       for (cr, cc, off) in [clf.offsets[oid]]]
            n_stack = len(clf._classes)
        else:
            mask_info = [(ci, cj, clf.offsets[oid])
                         for oid in oid_group
                         for ci in range(bs) for cj in range(bs)]
            is_diag = [ci == cj and clf.offsets[oid] == (0, 0, 0)
                       for oid in oid_group
                       for ci in range(bs) for cj in range(bs)]
            n_stack = bs

    # ---- trace-time scalar reduction -----------------------------------
    # The lean contract is a UNIFORM lattice whose only runtime input is the
    # scalar jitter s = 1 + jit: every vertex coordinate is s * (const), so
    # det scales as s^3 and each physical-gradient feature as 1/s.  A move's
    # element value is therefore the closed form
    #     ae(s) = c0 * s^3 + c1 * s^2 + c2 * s     (c_k = sum of M-pairs
    # with k gradient features, evaluated on the s=1 geometry).  The c_k are
    # reduced here with numpy and summed over every move sharing an output
    # window, collapsing the kernel to ~10^2 broadcast window-adds per plane
    # — write-bound instead of VPU-bound (measured 957 MDoF/s lane version
    # at n=64 was ~95% VPU-limited).
    det1 = np.zeros(T)
    gX1 = np.zeros((T, 3, 3))  # [t, i, d]
    for t in range(T):
        J = np.array(
            [[spacing[d] * (geo[t, v + 1, d] - geo[t, 0, d]) for v in range(3)]
             for d in range(3)]
        )
        det1[t] = np.linalg.det(J)
        gX1[t] = np.linalg.inv(J)  # [i, d]: ref coord i -> phys coord d
    # scalar_groups[dax]: {(flat_oid, day, daz): np.array([c0, c1, c2])}
    scalar_groups = [dict() for _ in range(r + 1)]
    for dax in range(r + 1):
        for t, a_, b_, oid, day, daz in by_dax[dax]:
            absdet = abs(det1[t])
            for ci in range(bs):
                for cj in range(bs):
                    pairs = nzM[(ci, cj)]
                    if not pairs:
                        continue
                    c = np.zeros(3)
                    for iq in range(nq):
                        ga = {}
                        for nd_ in (a_, b_):
                            ga[nd_] = dref[iq, nd_] @ gX1[t]  # (3,) physical
                        for f, g_ in pairs:
                            fu = phi[iq, b_] if f == 0 else ga[b_][f - 1]
                            fv = phi[iq, a_] if g_ == 0 else ga[a_][g_ - 1]
                            k = (f > 0) + (g_ > 0)
                            c[k] += (float(qw[iq]) * absdet
                                     * M[cj * nF + f, ci * nF + g_] * fu * fv)
                    keyg = ((oid * bs + ci) * bs + cj, day, daz)
                    acc = scalar_groups[dax].setdefault(keyg, np.zeros(3))
                    acc += c

    if fuse_mode is not None:
        # regroup per flat output plane: [(dax, day, daz, c), ...]
        per_plane = {}
        for dax in range(r + 1):
            for (foid, day, daz), c in scalar_groups[dax].items():
                per_plane.setdefault(foid, []).append((dax, day, daz, c))

    if fuse_mode == "factored":
        ki, kj, kk, pi, pj, pk = clf._mask_factors  # halo-padded (n_stack, S+2)
        # j-axis factors: for n1 > 128 lanes they go in TRANSPOSED
        # ((S+2, n_stack)) so every kernel slice is already 2-D — Mosaic
        # cannot lower the (n,) -> (n, 1) tpu.reshape for unaligned n past
        # one lane register (first hit at n1=217, the 10.2M-dof n=216
        # config, r4d chain log).  For n1 <= 128 the ORIGINAL row-major
        # layout stays: its lane-contiguous 1-D slices are ~19% faster
        # (P2 n=64 measured 0.953 ms pre-fix vs 1.14 ms all-transposed,
        # r5b), and the reshape lowers fine within one register.
        wide_j = n1 > 128
        kjT, pjT = (kj.T, pj.T) if wide_j else (kj, pj)

        def kernel_factored(jit_ref, dv_ref, ki_ref, pi_ref,
                            kj_ref, kk_ref, pj_ref, pk_ref, out_ref):
            p = pl.program_id(0)
            s_ = 1.0 + jit_ref[0, 0]
            dv = dv_ref[0, 0]
            pw = (s_ * s_ * s_, s_ * s_, s_)
            jj = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
            kk_i = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
            wins = {}
            for entries in per_plane.values():
                for _, day, daz, _c in entries:
                    if (day, daz) not in wins:
                        wins[(day, daz)] = (
                            (jj >= day) & (jj < day + ny)
                            & (kk_i >= daz) & (kk_i < daz + nz)
                        ).astype(jnp.float32)
            wdax = [jnp.where((p - dax >= 0) & (p - dax < nx), 1.0, 0.0)
                    for dax in range(r + 1)]
            zero = jnp.zeros((n1, n2), jnp.float32)
            # shared per-(row, col, shift) 1D mask products
            jprods, kprods = {}, {}
            for mi in range(len(mask_info)):
                acc = None
                for dax, day, daz, c in per_plane.get(mi, ()):
                    val = None
                    for k in range(3):
                        if c[k] == 0.0:
                            continue
                        t = jnp.float32(c[k]) * pw[k]
                        val = t if val is None else val + t
                    if val is None:
                        continue
                    t = (wdax[dax] * val) * wins[(day, daz)]
                    acc = t if acc is None else acc + t
                ri, ci_, (di, dj, dk) = mask_info[mi]
                if acc is None:
                    out_ref[mi, 0] = zero
                    continue
                # j factors: transposed ((S+2, n_stack)) column slices
                # (n1, 1) when n1 > 128 (Mosaic can't reshape (n,) ->
                # (n, 1) for unaligned n past one register, e.g. 217 at
                # n=216); lane-contiguous row slices + in-register reshape
                # otherwise (faster).  k factors are (1, n2) row slices —
                # never a problematic reshape either way.
                jkey = (ri, ci_, dj)
                if jkey not in jprods:
                    if wide_j:
                        jprods[jkey] = (kj_ref[1:1 + n1, ri:ri + 1]
                                        * kj_ref[1 + dj:1 + dj + n1, ci_:ci_ + 1])
                    else:
                        jprods[jkey] = (kj_ref[ri, 1:1 + n1]
                                        * kj_ref[ci_, 1 + dj:1 + dj + n1])[:, None]
                kkey = (ri, ci_, dk)
                if kkey not in kprods:
                    kprods[kkey] = (kk_ref[ri:ri + 1, 1:1 + n2]
                                    * kk_ref[ci_:ci_ + 1, 1 + dk:1 + dk + n2])
                # x factors live whole in SMEM ((n_stack, n0+2) f32 scalars,
                # ~2 KB) and are indexed dynamically by the grid plane p —
                # Mosaic rejects rank-2 SMEM *blocks* whose lane dim is
                # neither 128-divisible nor the full array (r4 TPU run)
                ix = ki_ref[ri, p + 1] * ki_ref[ci_, p + 1 + di]
                res = (acc * ix) * (jprods[jkey] * kprods[kkey])
                if is_diag[mi]:
                    # diagval * (pad - keep) on the diagonal: both separable
                    if wide_j:
                        pj_col = pj_ref[1:1 + n1, ri:ri + 1]
                        kj_col = kj_ref[1:1 + n1, ri:ri + 1]
                    else:
                        pj_col = pj_ref[ri, 1:1 + n1][:, None]
                        kj_col = kj_ref[ri, 1:1 + n1][:, None]
                    res = res + dv * (
                        pi_ref[ri, p + 1] * (pj_col
                                             * pk_ref[ri:ri + 1, 1:1 + n2])
                        - ki_ref[ri, p + 1] * (kj_col
                                               * kk_ref[ri:ri + 1, 1:1 + n2]))
                out_ref[mi, 0] = res

        n_pl = len(mask_info)
        grid_spec = pl.GridSpec(
            grid=(n0,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda p: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda p: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + [
                # x-axis factors: whole (n_stack, n0+2) scalar tables in SMEM,
                # indexed dynamically by plane p inside the kernel
                pl.BlockSpec(f.shape, lambda p: (0, 0),
                             memory_space=pltpu.SMEM)
                for f in (ki, pi)
            ] + [
                pl.BlockSpec(f.shape, lambda p: (0, 0),
                             memory_space=pltpu.VMEM)
                for f in (kjT, kk, pjT, pk)
            ],
            out_specs=pl.BlockSpec(
                (n_pl, 1, n1, n2), lambda p: (0, p, 0, 0),
                memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            kernel_factored,
            out_shape=jax.ShapeDtypeStruct((n_pl, n0, n1, n2), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )

        def assemble_factored(jitter, dv):
            j = jnp.asarray(jitter, jnp.float32).reshape(1, 1)
            return call(j, dv.reshape(1, 1), ki, pi, kjT, kk, pjT, pk)

        return assemble_factored

    if fuse_mode == "2d":

        def kernel_masked(jit_ref, dv_ref, kb_m, kb_0, kb_p, ind_ref, out_ref):
            p = pl.program_id(0)
            s_ = 1.0 + jit_ref[0, 0]
            dv = dv_ref[0, 0]
            pw = (s_ * s_ * s_, s_ * s_, s_)
            kb_refs = (kb_m, kb_0, kb_p)  # fine x-planes p-1, p, p+1
            jj = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
            kk = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
            # distinct (day, daz) window masks and dax plane validity,
            # hoisted (shared across the ~n_pl planes)
            wins = {}
            for entries in per_plane.values():
                for _, day, daz, _c in entries:
                    if (day, daz) not in wins:
                        wins[(day, daz)] = (
                            (jj >= day) & (jj < day + ny)
                            & (kk >= daz) & (kk < daz + nz)
                        ).astype(jnp.float32)
            wdax = [jnp.where((p - dax >= 0) & (p - dax < nx), 1.0, 0.0)
                    for dax in range(r + 1)]
            zero = jnp.zeros((n1, n2), jnp.float32)
            for mi in range(len(mask_info)):
                acc = None
                for dax, day, daz, c in per_plane.get(mi, ()):
                    val = None
                    for k in range(3):
                        if c[k] == 0.0:
                            continue
                        t = jnp.float32(c[k]) * pw[k]
                        val = t if val is None else val + t
                    if val is None:
                        continue
                    t = (wdax[dax] * val) * wins[(day, daz)]
                    acc = t if acc is None else acc + t
                ri, ci_, (di, dj, dk) = mask_info[mi]
                if acc is None:
                    out_ref[mi, 0] = zero
                    continue
                row = kb_refs[1][ri, 0, 1:1 + n1, 1:1 + n2]
                col = kb_refs[1 + di][ci_, 0,
                                      1 + dj:1 + dj + n1,
                                      1 + dk:1 + dk + n2]
                res = acc * row * col
                if is_diag[mi]:
                    # diagval on bc diagonals, fused (the XLA .at[m].add on
                    # a multi-call concat output cost ~2.3 ms at n=64)
                    res = res + dv * ind_ref[ri, 0]
                out_ref[mi, 0] = res

        n_pl = len(mask_info)
        grid_spec = pl.GridSpec(
            grid=(n0,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda p: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda p: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + [
                pl.BlockSpec((n_stack, 1, n1 + 2, n2 + 2),
                             (lambda p, s=s: (0, p + s, 0, 0)),
                             memory_space=pltpu.VMEM)
                for s in range(3)
            ] + [
                pl.BlockSpec((n_stack, 1, n1, n2), lambda p: (0, p, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (n_pl, 1, n1, n2), lambda p: (0, p, 0, 0),
                memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            kernel_masked,
            out_shape=jax.ShapeDtypeStruct((n_pl, n0, n1, n2), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )

        def assemble_masked(jitter, kbp, dv, bc_ind):
            # kbp: halo-padded keep stack (n_stack, n0+2, n1+2, n2+2);
            # bc_ind: bc-dof multiplicity stack (n_stack, n0, n1, n2)
            j = jnp.asarray(jitter, jnp.float32).reshape(1, 1)
            return call(j, dv.reshape(1, 1), kbp, kbp, kbp, bc_ind)

        return assemble_masked

    def kernel(jit_ref, out_ref):
        p = pl.program_id(0)
        s_ = 1.0 + jit_ref[0, 0]
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
        pw = (s_ * s_ * s_, s_ * s_, s_)  # s^(3-k) for k gradient features
        if r > 1:
            ju = jax.lax.broadcasted_iota(jnp.int32, (r * ny, r * nz), 0)
            ku = jax.lax.broadcasted_iota(jnp.int32, (r * ny, r * nz), 1)
            parity = ((ju % r == 0) & (ku % r == 0)).astype(jnp.float32)

        def place(oid, day, daz, ae):
            if r == 1:
                out_ref[oid, 0, day : day + ny, daz : daz + nz] += ae
                return
            # NOTE: pltpu.repeat is TILE semantics (not element-repeat).
            # This upsample is correct ONLY because the lean path implies a
            # uniform lattice: every box is geometrically identical, so `ae`
            # is lane-CONSTANT and tile == element-repeat.  An x-dependent
            # coefficient extension must not reuse this placement.
            up = pltpu.repeat(pltpu.repeat(ae, r, axis=0), r, axis=1) * parity
            w1 = min(r * ny, n1 - day)
            w2 = min(r * nz, n2 - daz)
            out_ref[oid, 0, day : day + w1, daz : daz + w2] += up[:w1, :w2]

        # plane p = r*q + dax: for each dax class, the contributing box plane
        # exists when (p - dax) is a valid multiple of r (weight 0 otherwise);
        # every surviving move is a precomputed closed-form scalar in s_
        for dax in range(r + 1):
            groups = scalar_groups[dax]
            if not groups:
                continue
            qnum = p - dax
            ok = (qnum >= 0) & (qnum < r * nx)
            if r > 1:
                ok = ok & (qnum % r == 0)
            w = jnp.where(ok, 1.0, 0.0)
            for (oid, day, daz), c in groups.items():
                val = None
                for k in range(3):
                    if c[k] == 0.0:
                        continue
                    term = jnp.float32(c[k]) * pw[k]
                    val = term if val is None else val + term
                if val is None:
                    continue
                ae = jnp.broadcast_to((w * val).astype(jnp.float32), (ny, nz))
                place(oid, day, daz, ae)

    n_pl = n_off * bs * bs  # output planes: (offset, test ci, trial cj)
    grid_spec = pl.GridSpec(
        grid=(n0,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda p: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_pl, 1, n1, n2), lambda p: (0, p, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pl, n0, n1, n2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    def assemble(jitter):
        return call(jnp.asarray(jitter, jnp.float32).reshape(1, 1))

    return assemble


# ---------------------------------------------------------------------------
# parity-blocked (degree-2) assembler: the blocked layout turns the refined
# placement into r=1 placement on the coarse class grids, so the existing
# plane-program kernel applies verbatim through a view that swaps
# (vshape, offsets, moves, refine) -> (cdims, trips, bmoves, 1).  No
# pltpu.repeat upsampling, no parity masks, 2.26x fewer output bytes than
# the refined 65-diagonal DIA (see lattice.BlockDIAMatrix).
# ---------------------------------------------------------------------------


class _BlockedView:
    """Adapter presenting a blocked CompiledLatticeForm as an r=1 lean form
    over the padded class grids."""

    def __init__(self, clf):
        self._clf = clf
        self.vshape = clf._cdims
        self.offsets = clf.trips  # ids only: the kernel places via move shifts
        self.moves = clf._bmoves  # (t, a, b, trip_id, (sx, sy, sz))
        self.refine = 1

    def __getattr__(self, k):
        return getattr(self._clf, k)


def make_lean_blocked_pallas(clf, interpret=False, max_off=None,
                             fuse_mask=False):
    return make_lean_fold_pallas(_BlockedView(clf), interpret, max_off,
                                 fuse_mask)


# ---------------------------------------------------------------------------
# DIA matvec kernel: y[p] = sum_d data[d, p] * shift_{dj,dk}( x[p + di] )
# ---------------------------------------------------------------------------

_matvec_cache = {}


def dia_matvec_supported(offsets, vshape, bs) -> bool:
    return bs == 1 and vshape[2] > 1 and all(abs(di) <= 2 for di, _, _ in offsets)


def make_dia_matvec_pallas(offsets, vshape, interpret=False, max_off=None):
    """Entry point: splits the offsets across several pallas calls when the
    double-buffered (n_off, 1, n1, n2) data block would blow the 16MB VMEM
    budget (P2's 65 diagonals at 217^2 planes needed 30MB); partial y's
    sum."""
    n0, n1, n2 = vshape
    if max_off is None:
        W_ = max(abs(d[0]) for d in offsets)
        max_off = _matvec_budget(n1, n2, 2 * W_ + 2)
    n_off = len(offsets)
    if max_off >= n_off:
        return _make_dia_matvec_group(offsets, vshape, interpret)
    groups = [list(range(i, min(i + max_off, n_off))) for i in range(0, n_off, max_off)]
    calls = [
        ( _make_dia_matvec_group([offsets[o] for o in g], vshape, interpret), g[0], g[-1] + 1 )
        for g in groups
    ]

    def matvec(data, x):
        y = None
        for call, g0, g1 in calls:
            yg = call(data[g0:g1], x)
            y = yg if y is None else y + yg
        return y

    return matvec


def _make_dia_matvec_group(offsets, vshape, interpret=False):
    """Pallas DIA SpMV for scalar 3D stencils (the solve-side analogue of the
    assembly kernel): one program per x-plane, each offset applied as a
    circular roll + iota edge mask on (n1, n2) lane arrays — no y scatter,
    no per-offset full-grid temporaries.  Replaces the XLA chain of 15
    read-modify-write slice-adds (measured ~10x off roofline)."""
    key = (tuple(offsets), tuple(vshape), interpret)
    if key in _matvec_cache:
        return _matvec_cache[key]
    n0, n1, n2 = vshape
    n_off = len(offsets)
    W = max(abs(di) for di, _, _ in offsets)  # x-halo width (1 for P1, 2 for P2)

    def kernel(*refs):
        x_refs = refs[: 2 * W + 1]
        d_ref, y_ref = refs[2 * W + 1], refs[2 * W + 2]
        xpl = {di: x_refs[di + W] for di in range(-W, W + 1)}
        jj = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
        acc = jnp.zeros((n1, n2), jnp.float32)
        for d, (di, dj, dk) in enumerate(offsets):
            sh = xpl[di][0]
            if dj:
                sh = pltpu.roll(sh, -dj % n1, 0)
            if dk:
                sh = pltpu.roll(sh, -dk % n2, 1)
            valid = (jj + dj >= 0) & (jj + dj < n1) & (kk + dk >= 0) & (kk + dk < n2)
            acc = acc + d_ref[d, 0] * jnp.where(valid, sh, 0.0)
        y_ref[0] = acc

    plane = lambda: pl.BlockSpec((1, n1, n2), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(n0,),
        in_specs=[plane() for _ in range(2 * W + 1)] + [
            pl.BlockSpec((n_off, 1, n1, n2), lambda p: (0, p, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n1, n2), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n0, n1, n2), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    def matvec(data, x):
        # data: (n_off, bs=1, bs=1, n0, n1, n2); x flat (n0*n1*n2,)
        xg = x.reshape(n0, n1, n2)
        xp = jnp.pad(xg, ((W, W), (0, 0), (0, 0)))
        planes = [xp[s : s + n0] for s in range(2 * W + 1)]
        y = call(*planes, data[:, 0, 0])
        return y.reshape(-1)

    _matvec_cache[key] = matvec
    return matvec


# ---------------------------------------------------------------------------
# blocked (bs > 1) DIA matvec: component-major vector grids, one plane
# program per x-plane; each (offset, ci, cj) row is a roll+mask FMA from
# trial-component grid cj into test-component accumulator ci — the vector
# (elasticity) counterpart of the scalar kernel above.
# ---------------------------------------------------------------------------


def make_dia_matvec_bs_pallas(offsets, vshape, bs, interpret=False, max_rows=None):
    """y[(v, ci)] = sum_{d, cj} data[d, ci, cj, v] * x[(v + off_d, cj)].
    Splits the flattened (offset, ci, cj) data rows across pallas calls when
    the double-buffered row block exceeds the VMEM budget."""
    key = ("bsmv", tuple(offsets), tuple(vshape), bs, interpret)
    if key in _matvec_cache:
        return _matvec_cache[key]
    n0, n1, n2 = vshape
    W = max(abs(di) for di, _, _ in offsets)
    rows = [(d, off, ci, cj) for d, off in enumerate(offsets)
            for ci in range(bs) for cj in range(bs)]
    if max_rows is None:
        max_rows = _matvec_budget(n1, n2, (2 * W + 2) * bs)

    def make_call(sub):
        n_r = len(sub)

        def kernel(*refs):
            x_refs = refs[: 2 * W + 1]
            d_ref, y_ref = refs[2 * W + 1], refs[2 * W + 2]
            jj = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
            kk = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
            # the rolled+masked source plane depends only on (cj, offset) —
            # shared across the bs test components (3x fewer rolls at bs=3)
            srcs = {}
            acc = [None] * bs
            for ri, (d, (di, dj, dk), ci, cj) in enumerate(sub):
                skey = (cj, di, dj, dk)
                if skey not in srcs:
                    sh = x_refs[di + W][cj, 0]
                    if dj:
                        sh = pltpu.roll(sh, -dj % n1, 0)
                    if dk:
                        sh = pltpu.roll(sh, -dk % n2, 1)
                    valid = ((jj + dj >= 0) & (jj + dj < n1)
                             & (kk + dk >= 0) & (kk + dk < n2))
                    srcs[skey] = jnp.where(valid, sh, 0.0)
                term = d_ref[ri, 0] * srcs[skey]
                acc[ci] = term if acc[ci] is None else acc[ci] + term
            zero = jnp.zeros((n1, n2), jnp.float32)
            y_ref[:, 0] = jnp.stack([a if a is not None else zero for a in acc])

        xspec = [
            pl.BlockSpec((bs, 1, n1, n2), (lambda p, s=s: (0, p + s, 0, 0)),
                         memory_space=pltpu.VMEM)
            for s in range(2 * W + 1)
        ]
        grid_spec = pl.GridSpec(
            grid=(n0,),
            in_specs=xspec + [
                pl.BlockSpec((n_r, 1, n1, n2), lambda p: (0, p, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bs, 1, n1, n2), lambda p: (0, p, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bs, n0, n1, n2), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    subs = [rows[i: i + max_rows] for i in range(0, len(rows), max_rows)]
    calls = [make_call(sub) for sub in subs]
    bounds = []
    i0 = 0
    for sub in subs:
        bounds.append((i0, i0 + len(sub)))
        i0 += len(sub)

    def matvec(data, x):
        # data: (n_off, bs, bs, n0, n1, n2); x flat interleaved (n*bs,)
        xg = jnp.moveaxis(x.reshape(n0, n1, n2, bs), -1, 0)
        xp = jnp.pad(xg, ((0, 0), (W, W), (0, 0), (0, 0)))
        flat = data.reshape(-1, n0, n1, n2)  # rows in (d, ci, cj) order
        y = None
        for call, (g0, g1) in zip(calls, bounds):
            yg = call(*([xp] * (2 * W + 1)), flat[g0:g1])
            y = yg if y is None else y + yg
        return jnp.moveaxis(y, 0, -1).reshape(-1)

    _matvec_cache[key] = matvec
    return matvec


# ---------------------------------------------------------------------------
# parity-blocked SpMV: BLOCKED vectors, compressed (per-triple) data.
# Vectors are split into padded parity-class grids OUTSIDE the kernel
# (BlockDIAMatrix._to_blocked, plain XLA); every lane in the kernel is a
# COARSE class-grid point, so each triple is one roll+mask+FMA with NO
# upsampling.  (pltpu.repeat is TILE semantics, so upsampling non-constant
# data planes in-kernel is not expressible — and unnecessary here.)  HBM
# data traffic is the compressed 230-triple volume: 2.26x less than the
# refined 65-diagonal DIA SpMV this replaces.
# ---------------------------------------------------------------------------


def make_blocked_matvec_pallas(trips, vshape, r3, interpret=False, max_m=None):
    """Build matvec(data, xb) -> yb on PADDED BLOCKED grids
    (n_classes, s0, s1, s2); returns None when unsupported (2D)."""
    key = ("blk", tuple(trips), tuple(vshape), tuple(r3), interpret)
    if key in _matvec_cache:
        return _matvec_cache[key]
    n0, n1, n2 = vshape
    r0, r1, r2 = r3
    if n2 <= 1 or r0 != 2:
        return None
    s0, s1, s2 = (-(-n // r) for n, r in zip(vshape, r3))
    import itertools

    classes = tuple(itertools.product(range(r0), range(r1), range(r2)))
    cls_id = {c: i for i, c in enumerate(classes)}
    n_cls = len(classes)
    W = max(abs(off[0]) for _, _, off in trips)  # coarse x halo (1)
    if max_m is None:
        max_m = _matvec_budget(s1, s2, (2 * W + 2) * n_cls)

    def make_call(sub):
        """sub: list of (global_m, trip); data rows sliced contiguously."""
        n_m = len(sub)

        def kernel(*refs):
            x_refs = refs[: 2 * W + 1]
            d_ref, y_ref = refs[2 * W + 1], refs[2 * W + 2]
            jj = jax.lax.broadcasted_iota(jnp.int32, (s1, s2), 0)
            kk = jax.lax.broadcasted_iota(jnp.int32, (s1, s2), 1)
            # rolled+masked source planes depend only on (src class, offset)
            # and are SHARED across triples (230 triples -> ~70 unique
            # sources): hoisting the rolls/masks cuts the per-step op count
            # ~3x — the kernel is roll/permute-bound, not FMA-bound.
            # The VALIDITY masks depend only on (dj, dk) — at most 9
            # distinct — so they are hoisted one level further still.
            valids = {}
            for _, (_, _, off) in sub:
                vkey = (off[1], off[2])
                if vkey not in valids:
                    valids[vkey] = ((jj + off[1] >= 0) & (jj + off[1] < s1)
                                    & (kk + off[2] >= 0)
                                    & (kk + off[2] < s2)).astype(jnp.float32)
            srcs = {}
            acc = [None] * n_cls
            for mi, (gm, (cr, cc, off)) in enumerate(sub):
                ci, cj = cls_id[cr], cls_id[cc]
                skey = (cj, off)
                if skey not in srcs:
                    sh = x_refs[off[0] + W][cj, 0]
                    if off[1]:
                        sh = pltpu.roll(sh, -off[1] % s1, 0)
                    if off[2]:
                        sh = pltpu.roll(sh, -off[2] % s2, 1)
                    srcs[skey] = valids[(off[1], off[2])] * sh
                term = d_ref[mi, 0] * srcs[skey]
                acc[ci] = term if acc[ci] is None else acc[ci] + term
            zero = jnp.zeros((s1, s2), jnp.float32)
            y_ref[:, 0] = jnp.stack([a if a is not None else zero for a in acc])

        xspec = [
            pl.BlockSpec((n_cls, 1, s1, s2), (lambda p, s=s: (0, p + s, 0, 0)),
                         memory_space=pltpu.VMEM)
            for s in range(2 * W + 1)
        ]
        grid_spec = pl.GridSpec(
            grid=(s0,),
            in_specs=xspec + [
                pl.BlockSpec((n_m, 1, s1, s2), lambda p: (0, p, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_cls, 1, s1, s2), lambda p: (0, p, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_cls, s0, s1, s2), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    subs = [list(enumerate(trips))[i: i + max_m]
            for i in range(0, len(trips), max_m)]
    calls = [(make_call(sub), sub[0][0], sub[-1][0] + 1) for sub in subs if sub]

    def matvec(data, xb):
        # data: (n_trip, s0, s1, s2); xb: (n_cls, s0, s1, s2) padded blocked
        xp = jnp.pad(xb, ((0, 0), (W, W), (0, 0), (0, 0)))
        y = None
        for call, g0, g1 in calls:
            yg = call(*([xp] * (2 * W + 1)), data[g0:g1])
            y = yg if y is None else y + yg
        return y

    _matvec_cache[key] = matvec
    return matvec
