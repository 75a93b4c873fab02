"""Geometric multigrid preconditioner for lattice operators.

The reference's solver recipe is CG + BoomerAMG/GAMG (bench_periodic.py:
115-133).  On structured lattices the TPU-native equivalent is geometric
multigrid by re-discretization: every level is a `LatticeOperator` assembled
on the coarsened box mesh (the assembly is a jitted stencil accumulation, so
building the hierarchy is cheap), smoothing is weighted Jacobi, and the
transfer operators are linear interpolation / full-weighting implemented as
strided slicing on the vertex grid — no gather, no scatter, memory-roofline
ops throughout.  The V-cycle is symmetric (equal pre/post smoothing), making
it a valid SPD preconditioner for CG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LatticeGMG", "build_gmg_hierarchy"]


def _restrict1(x, axis):
    """Full-weighting along one axis: size 2m+1 -> m+1."""
    sl = lambda s: tuple(s if a == axis else slice(None) for a in range(x.ndim))
    e = x[sl(slice(0, None, 2))]  # (m+1,)
    o = x[sl(slice(1, None, 2))]  # (m,)
    pad_lo = [(0, 0)] * x.ndim
    pad_lo[axis] = (1, 0)
    pad_hi = [(0, 0)] * x.ndim
    pad_hi[axis] = (0, 1)
    return 0.5 * e + 0.25 * (jnp.pad(o, pad_lo) + jnp.pad(o, pad_hi))


def _prolong1(c, axis):
    """Linear interpolation along one axis: size m+1 -> 2m+1."""
    nd = c.ndim
    sl = lambda s: tuple(s if a == axis else slice(None) for a in range(nd))
    lo = c[sl(slice(0, -1))]
    hi = c[sl(slice(1, None))]
    mid = 0.5 * (lo + hi)
    m1 = c.shape[axis]
    out_shape = list(c.shape)
    out_shape[axis] = 2 * m1 - 1
    out = jnp.zeros(out_shape, c.dtype)
    out = out.at[sl(slice(0, None, 2))].set(c)
    out = out.at[sl(slice(1, None, 2))].set(mid)
    return out


def _abs_dia(dia):
    if hasattr(dia, "trips"):
        return type(dia)(jnp.abs(dia.data), dia.trips, dia.vshape, dia.r3,
                         dia.bs)
    return type(dia)(jnp.abs(dia.data), dia.offsets, dia.vshape, dia.bs)


def _abs_rowsum(A):
    """Upper bound on |A| . 1 per row (the Gershgorin numerator), computed by
    running the operator's own matvec on all-ones with |data|.  Accepts a
    LatticeOperator (fold-plane identification and MPC/BC side blocks are
    included — all its matvec paths are additive gathers, so abs-ing every
    data leaf yields entrywise >= |K^H A K| and the result bounds the true
    row sum) or a bare DIAMatrix/BlockDIAMatrix.  The inv-diagonal used
    against this comes from A.diagonal(), which carries the same fold/side
    corrections — keeping numerator and denominator consistent (a dia-only
    numerator under-estimated fold-plane rows by up to 2x, eroding the
    omega*lmax < 2 smoother-stability margin)."""
    if not hasattr(A, "dia"):
        ones = jnp.ones((A.shape[0],), jnp.real(A.data).dtype)
        return _abs_dia(A).matvec(ones)
    _maybe_abs = lambda v: None if v is None else jnp.abs(v)
    B = type(A)(
        _abs_dia(A.dia), _maybe_abs(A.side_data), A.side_cols, A.side_rows,
        A.side_nrows, side_Aep=_maybe_abs(A.side_Aep), side_er=A.side_er,
        slaves=A.slaves, diagval=_maybe_abs(A.diagval),
        fold_axis=A.fold_axis, fold_mask=A.fold_mask, fold_pairs=A.fold_pairs)
    ones = jnp.ones((A.shape[0],), jnp.real(A.dia.data).dtype)
    return B.matvec(ones)


def _gershgorin_bounds(ops, inv_diags):
    """lmax(D^-1 A) upper bounds for every level, computed in ONE jitted
    program (len(ops) matvecs + reductions).  Per-level EAGER computation
    dispatched one tiny op at a time through the remote-compile tunnel and
    dominated hierarchy setup (~40-60 s of compile chatter per level)."""

    @jax.jit
    def prog(ops_, invs_):
        return jnp.stack([
            jnp.max(jnp.abs(_abs_rowsum(A) * inv))
            for A, inv in zip(ops_, invs_)
        ])

    return [float(v) for v in np.asarray(prog(tuple(ops), tuple(inv_diags)))]


def dense_coarse_inverse(A, dtype=None):
    """Materialize the coarsest operator densely (one jitted vmap-matvec
    over the identity) and invert it in f64 on the host.  The result makes
    the coarse solve a single dense matvec — exact, LINEAR, and symmetric,
    which an inner fixed-iteration CG is NOT (a Krylov inner solve is a
    nonlinear, slightly nonsymmetric preconditioner; measured V-cycle
    asymmetry 1.5e-05 in f64 was survivable on CPU but stalled the bs=3
    elasticity CG outright in f32 on TPU: 3000 its, rnorm 5e-2)."""
    nd = A.shape[0]
    dt = dtype or jnp.real(A.diagonal()).dtype

    @jax.jit
    def dense(A_):
        return jax.vmap(A_.matvec)(jnp.eye(nd, dtype=dt))

    C = np.asarray(dense(A), np.float64)
    C = 0.5 * (C + C.T)  # exact symmetrization (f32 matvec roundoff)
    try:
        import scipy.linalg as sla

        cf = sla.cho_factor(C)
        inv = sla.cho_solve(cf, np.eye(nd))
    except Exception:
        # indefinite numerical noise: clip the spectrum instead of failing
        w, Q = np.linalg.eigh(C)
        w = np.maximum(w, 1e-12 * np.abs(w).max())
        inv = (Q / w) @ Q.T
    inv = 0.5 * (inv + inv.T)
    return jnp.asarray(inv, dt)


@jax.tree_util.register_pytree_node_class
class LatticeGMG:
    """Symmetric V-cycle over a list of LatticeOperators (fine -> coarse).

    Registered as a pytree so it can be passed as a jit ARGUMENT: closing
    over it would embed the full multi-GB operator hierarchy as compile-time
    constants (the remote-compile tunnel rejects such payloads at 10M-dof
    scale with HTTP 413).

    The whole cycle is a FIXED LINEAR SYMMETRIC operator — required for
    plain CG.  Smoothing is weighted Jacobi with equal pre/post sweeps,
    transfers satisfy R = P^T exactly, and the coarse solve is either a
    precomputed dense inverse (coarsest <= dense_max dofs; one MXU matmul
    per apply) or a fixed-degree Chebyshev polynomial — never an inner
    Krylov iteration, which would make the preconditioner nonlinear and
    break the outer CG (the round-3 bs=3 stall)."""

    def __init__(self, ops, n_pre=2, n_post=2, omega="auto", coarse_iters=30,
                 free_masks=None, coarse="auto", coarse_inv=None,
                 dense_max=8192, cheb_degree=40, bounds=None,
                 blocked_io=False, smoother="jacobi"):
        self.ops = ops
        self.n_pre, self.n_post = n_pre, n_post
        self.coarse_iters = coarse_iters
        # blocked_io: the FINE level works on the padded class-major stack
        # (n_cls, s0, s1, s2) of its BlockDIAMatrix — __call__ takes/returns
        # that layout.  The interleave<->blocked transposes cost 4.8 ms per
        # matvec at 2.1M dofs (probe r4); in this mode they happen once per
        # V-cycle at the level-0/1 transfer instead of once per smoothing
        # sweep, and the outer CG never pays them.
        if blocked_io:
            assert ops[0].supports_blocked(), "fine op has no blocked layout"
            assert len(ops) > 1, "blocked_io needs a coarse level"
        self.blocked_io = blocked_io
        # free_masks[l]: 1.0 on unconstrained dofs, 0.0 on bc/slave rows —
        # residuals/corrections are projected onto the free subspace around
        # each transfer so constrained rows don't pollute coarse levels
        if blocked_io and free_masks is not None:
            free_masks = [ops[0].dia._to_blocked(free_masks[0])] + list(free_masks[1:])
        self.free_masks = free_masks
        # inverse diagonals for EVERY level in ONE jitted program: the eager
        # per-level form dispatched ~10 tiny ops per level through the
        # remote-compile tunnel (~40+ ms each) and dominated warm-cache
        # hierarchy setup (r5: 35 s with everything else cached)
        @jax.jit
        def _inv_diags(ops_):
            flat = tuple(
                jnp.where(d != 0, 1.0 / d, 0.0)
                for d in (A.diagonal() for A in ops_))
            blk = None
            if blocked_io:
                db = ops_[0].diagonal_blocked()
                blk = jnp.where(db != 0, 1.0 / db, 0.0)
            return flat, blk

        flat_inv, blk_inv = _inv_diags(tuple(ops))
        flat_inv = list(flat_inv)
        self._inv_diag = list(flat_inv)
        if blocked_io:
            self._inv_diag[0] = blk_inv
        # omega="auto": weighted-Jacobi damping from the per-level Gershgorin
        # bound lmax(D^-1 A) <= max_i sum_j |a_ij| / d_i.  omega must keep
        # omega*lmax < 2 or the smoother DIVERGES and the V-cycle stops
        # being an SPD preconditioner (CG stalls): Poisson has lmax = 2
        # (-> the classic 0.8), but P1 elasticity measures lmax = 3.71 and
        # a fixed 0.8 broke the bs=3 bench solve (3000 its, rnorm 1e-1).
        need_bounds = (omega == "auto" or coarse in ("auto", "chebyshev")
                       or smoother == "chebyshev")
        if bounds is None and need_bounds:
            bounds = _gershgorin_bounds(ops, flat_inv)
        self._bounds = bounds
        if omega == "auto":
            self.omegas = tuple(1.6 / max(l, 2.0) for l in bounds)
        else:
            self.omegas = (float(omega),) * len(ops)
        # smoother="chebyshev": degree-(n_sweeps+1) Chebyshev-Jacobi
        # polynomial on [lmax/4, lmax] of D^-1 A per level — GAMG/hypre's
        # default smoother and MUCH stronger than fixed-omega Jacobi on
        # elasticity (the bs=3 V-cycle was the r3 weak #1: 51 its).  The
        # polynomial p(D^-1 A) D^-1 is symmetric, so pre==post keeps the
        # V-cycle an SPD preconditioner for plain CG.
        if smoother not in ("jacobi", "chebyshev"):
            raise ValueError(f"unknown smoother {smoother!r}")
        self.smoother = smoother
        self._cheb_sm = None
        if smoother == "chebyshev":
            prs = []
            for l in bounds:
                lmax = 1.05 * max(l, 1e-30)
                lmin = lmax / 4.0
                prs.append(((lmax + lmin) / 2.0, (lmax - lmin) / 2.0))
            self._cheb_sm = tuple(prs)
        # coarse solve selection (see class docstring)
        nc = ops[-1].shape[0]
        if coarse == "auto":
            coarse = "dense" if nc <= dense_max else "chebyshev"
        self.coarse_mode = coarse
        self.coarse_inv = None
        self._cheb = None
        if coarse == "dense":
            self.coarse_inv = (coarse_inv if coarse_inv is not None
                               else dense_coarse_inverse(ops[-1]))
        elif coarse == "chebyshev":
            # fixed-degree Chebyshev on [lmax/64, lmax] of D^-1 A: the
            # residual polynomial is <= 1 on (0, lmin) so untargeted low
            # modes are never amplified — the outer CG just works harder
            lmax = 1.05 * max(bounds[-1], 1e-30)
            lmin = lmax / 64.0
            self._cheb = ((lmax + lmin) / 2.0, (lmax - lmin) / 2.0,
                          int(cheb_degree))
        elif coarse != "cg":
            raise ValueError(f"unknown coarse mode {coarse!r}")
        # transfer shapes: grid dims between levels must satisfy n_f = 2*n_c
        for Af, Ac in zip(ops[:-1], ops[1:]):
            for nf, nc in zip(Af.dia.vshape, Ac.dia.vshape):
                assert nf == nc or nf == 2 * nc - 1, (Af.dia.vshape, Ac.dia.vshape)

    def _to_grid(self, A, x):
        n0, n1, n2 = A.dia.vshape
        return x.reshape(n0, n1, n2, A.dia.bs)

    def _smooth(self, lvl, x, b, n_sweeps):
        # fori_loop, not Python unroll: each unrolled sweep inlines another
        # full SpMV program instance per level — at 10.2M-dof P2 the
        # resulting HLO crashed the remote compiler helper (round-2 open
        # item); the rolled loop compiles ONE SpMV instance per level
        A = self.ops[lvl]
        inv = self._inv_diag[lvl]
        om = self.omegas[lvl]
        mv = (A.matvec_blocked if lvl == 0 and self.blocked_io
              else A.matvec)
        if self.smoother == "chebyshev":
            # degree-(n_sweeps+1) Chebyshev on [lmax/4, lmax] of D^-1 A,
            # applied to the residual (supports a nonzero incoming x)
            theta, delta = self._cheb_sm[lvl]
            r0 = b - mv(x)
            rr = inv * r0
            z = rr / theta
            res = rr - inv * mv(z)
            d = res / theta
            sigma = theta / delta
            rho = 1.0 / sigma
            for _ in range(n_sweeps):
                rho_new = 1.0 / (2 * sigma - rho)
                d = rho_new * rho * d + 2 * rho_new / delta * res
                z = z + d
                res = res - inv * mv(d)
                rho = rho_new
            return x + z

        def body(_, xi):
            return xi + om * inv * (b - mv(xi))

        return jax.lax.fori_loop(0, n_sweeps, body, x)

    def _fine_mv(self, x):
        A = self.ops[0]
        return A.matvec_blocked(x) if self.blocked_io else A.matvec(x)

    def _restrict(self, lvl, r):
        # R = P^T exactly (x2 per coarsened axis on top of full weighting):
        # with re-discretized coarse stiffness this gives near-textbook
        # V-cycle rates, measured ~3x fewer CG iterations than the
        # unit-row-sum weighting
        Af, Ac = self.ops[lvl], self.ops[lvl + 1]
        if lvl == 0 and self.blocked_io:
            r = Af.dia._from_blocked(r)  # class stack -> fine nodal flat
        g = self._to_grid(Af, r)
        for ax in range(3):
            if Af.dia.vshape[ax] != Ac.dia.vshape[ax]:
                g = 2.0 * _restrict1(g, ax)
        return g.reshape(-1)

    def _prolong(self, lvl, xc):
        Af, Ac = self.ops[lvl], self.ops[lvl + 1]
        g = self._to_grid(Ac, xc)
        for ax in range(3):
            if Af.dia.vshape[ax] != Ac.dia.vshape[ax]:
                g = _prolong1(g, ax)
        g = g.reshape(-1)
        if lvl == 0 and self.blocked_io:
            g = Af.dia._to_blocked(g)  # fine nodal flat -> class stack
        return g

    def _coarse_solve(self, b):
        A = self.ops[-1]
        inv = self._inv_diag[-1]
        if self.coarse_mode == "dense":
            # HIGHEST precision: the TPU MXU's default bf16 multiplies put
            # ~4e-3 relative noise into the coarse solve, which breaks the
            # preconditioner's symmetry/PD-ness and NaN'd the bs=3
            # elasticity CG at iteration 220 (chain r3d)
            return jnp.matmul(self.coarse_inv, b,
                              precision=jax.lax.Precision.HIGHEST)
        if self.coarse_mode == "chebyshev":
            # fixed polynomial in D^-1 A: linear + symmetric (wrt the D inner
            # product composed with the Jacobi scaling), unlike inner CG
            theta, delta, degree = self._cheb

            def DA(x):
                return inv * A.matvec(x)

            rr = inv * b
            x = rr / theta
            res = rr - DA(x)
            d = res / theta
            sigma = theta / delta
            rho = 1.0 / sigma

            def body(_, s):
                x, res, d, rho = s
                rho_new = 1.0 / (2 * sigma - rho)
                d = rho_new * rho * d + 2 * rho_new / delta * res
                x = x + d
                res = res - DA(d)
                return (x, res, d, rho_new)

            x, *_ = jax.lax.fori_loop(0, degree - 1, body, (x, res, d, rho))
            return x
        # legacy inner-CG coarse solve (coarse="cg"): NONLINEAR — only valid
        # under a flexible outer Krylov method
        x = jnp.zeros_like(b)
        r = b
        z = inv * r
        p = z
        rz = jnp.vdot(r, z)

        def body(i, s):
            x, r, z, p, rz = s
            Ap = A.matvec(p)
            alpha = rz / jnp.where(jnp.vdot(p, Ap) == 0, 1.0, jnp.vdot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            z = inv * r
            rzn = jnp.vdot(r, z)
            p = z + (rzn / jnp.where(rz == 0, 1.0, rz)) * p
            return (x, r, z, p, rzn)

        x, *_ = jax.lax.fori_loop(0, self.coarse_iters, body, (x, r, z, p, rz))
        return x

    def _mask(self, lvl, v):
        if self.free_masks is None:
            return v
        return v * self.free_masks[lvl].astype(v.dtype)

    def _vcycle(self, lvl, b):
        if lvl == len(self.ops) - 1:
            return self._coarse_solve(b)
        x = jnp.zeros_like(b)
        x = self._smooth(lvl, x, b, self.n_pre)
        mv = (self._fine_mv if lvl == 0 and self.blocked_io
              else self.ops[lvl].matvec)
        r = self._mask(lvl, b - mv(x))
        rc = self._mask(lvl + 1, self._restrict(lvl, r))
        xc = self._vcycle(lvl + 1, rc)
        x = x + self._mask(lvl, self._prolong(lvl, self._mask(lvl + 1, xc)))
        return self._smooth(lvl, x, b, self.n_post)

    def __call__(self, r):
        return self._vcycle(0, r)

    def tree_flatten(self):
        ch = (self.ops, self.free_masks, self._inv_diag, self.coarse_inv)
        aux = (self.n_pre, self.n_post, self.omegas, self.coarse_iters,
               self.coarse_mode, self._cheb, self.blocked_io,
               self.smoother, self._cheb_sm)
        return ch, aux

    @classmethod
    def tree_unflatten(cls, aux, ch):
        obj = cls.__new__(cls)
        obj.ops, obj.free_masks, obj._inv_diag, obj.coarse_inv = ch
        (obj.n_pre, obj.n_post, obj.omegas, obj.coarse_iters,
         obj.coarse_mode, obj._cheb, obj.blocked_io,
         obj.smoother, obj._cheb_sm) = aux
        obj._bounds = None
        return obj


def build_gmg_hierarchy(make_compiled_form, n, n_levels, min_n=4,
                        coarse_on_cpu=False, levels=None):
    """Build ([finest ... coarsest] LatticeOperators, free-dof masks) by
    re-discretization.

    make_compiled_form(n) must return a CompiledLatticeForm for mesh
    resolution n (same physics, bcs, and constraints regenerated
    geometrically on each level).

    levels: optional explicit list of level descriptors passed verbatim to
    make_compiled_form (finest first) — e.g. p-coarsening for degree 2,
    where level 1 is the P1 operator on the SAME refined nodal grid
    (identity transfer) followed by h-coarsened P1 levels.  When omitted,
    levels are n, n/2, n/4, ... down to min_n.

    coarse_on_cpu assembles levels 1+ under the local CPU backend and
    device_puts the few-MB result: each coarse level otherwise pays a fresh
    accelerator compile of its assembly program (~40-60 s through a remote
    compile service) for an operator that takes seconds to build locally."""
    import os

    if levels is None:
        levels, nl = [], n
        for _ in range(n_levels):
            if nl < min_n:
                break
            levels.append(nl)
            if nl % 2:
                break  # odd level: no further 2:1 coarsening
            nl >>= 1

    ops, masks = [], []
    for l, lv in enumerate(levels):
        if coarse_on_cpu and l > 0:
            # XLA (non-pallas) path on host: Mosaic kernels don't lower on
            # the CPU backend, and the coarse op must be backend-portable
            prev = os.environ.get("DMT_NO_PALLAS")
            os.environ["DMT_NO_PALLAS"] = "1"
            try:
                with jax.default_device(jax.devices("cpu")[0]):
                    clf = make_compiled_form(lv)
                    op = clf.assemble()
            finally:
                if prev is None:
                    del os.environ["DMT_NO_PALLAS"]
                else:
                    os.environ["DMT_NO_PALLAS"] = prev
            op = jax.device_put(op, jax.devices()[0])
        else:
            clf = make_compiled_form(lv)
            op = clf.assemble()
        ops.append(op)
        m = np.ones(clf.V.num_dofs, np.float32)
        m[np.asarray(clf._bc_dofs_grid)] = 0.0
        if clf.mpc is not None and clf.mpc.num_local_slaves:
            m[np.asarray(clf.mpc.slaves)] = 0.0
        masks.append(jnp.asarray(m))
    return ops, masks
