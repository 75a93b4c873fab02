"""Krylov solvers: jitted CG / BiCGStab / GMRES with Jacobi & Chebyshev
preconditioning.

TPU-native replacement of the PETSc KSP surface the reference drives through
petsc_options (/root/reference/python/src/dolfinx_mpc/problem.py:506-530,
python/benchmarks/bench_periodic.py:115-133).  Everything is
`lax.while_loop`-based with static shapes; dot products are the only
reductions (they become XLA all-reduces when sharded).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SolverOptions", "cg", "bicgstab", "gmres", "jacobi_preconditioner", "chebyshev_preconditioner", "solve"]


@dataclass
class SolverOptions:
    """Mirror of the PETSc options dict surface (ksp_type/pc_type/rtol...)."""

    ksp_type: str = "cg"
    # "none" | "jacobi" | "chebyshev" | "gamg" (aliases amg/hypre/boomeramg
    # — the reference's BoomerAMG/GAMG configs map onto la/amg.py smoothed
    # aggregation, bench_periodic.py:115-133)
    pc_type: str = "jacobi"
    rtol: float = 1e-8
    atol: float = 1e-12
    max_it: int = 10000
    cheb_degree: int = 3

    @classmethod
    def from_petsc(cls, opts: Optional[dict]):
        if opts is None:
            return cls()
        return cls(
            ksp_type=opts.get("ksp_type", "cg"),
            pc_type=opts.get("pc_type", "jacobi"),
            rtol=float(opts.get("ksp_rtol", 1e-8)),
            atol=float(opts.get("ksp_atol", 1e-12)),
            max_it=int(opts.get("ksp_max_it", 10000)),
        )


def _vdot(a, b):
    return jnp.vdot(a, b)


def cg(A: Callable, b, M: Callable = None, x0=None, rtol=1e-8, atol=1e-12, max_it=10000):
    """Preconditioned conjugate gradient.  A and M are linear operators
    (callables).  Returns (x, iterations, residual_norm)."""
    if M is None:
        M = lambda r: r
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    z = M(r)
    p = z
    rz = _vdot(r, z)
    bnorm = jnp.linalg.norm(b)
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    def cond(state):
        x, r, z, p, rz, k = state
        return (jnp.real(_vdot(r, r)) > tol2) & (k < max_it)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = A(p)
        alpha = rz / _vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, k + 1)

    x, r, _, _, _, k = jax.lax.while_loop(cond, body, (x, r, z, p, rz, 0))
    return x, k, jnp.linalg.norm(r)


def bicgstab(A: Callable, b, M: Callable = None, x0=None, rtol=1e-8, atol=1e-12, max_it=10000):
    if M is None:
        M = lambda r: r
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    rhat = r
    rho = alpha = omega = jnp.ones((), dtype=b.dtype)
    v = p = jnp.zeros_like(b)
    bnorm = jnp.linalg.norm(b)
    tol2 = jnp.maximum(rtol * bnorm, atol) ** 2

    def cond(s):
        x, r, p, v, rho, alpha, omega, k = s
        return (jnp.real(_vdot(r, r)) > tol2) & (k < max_it)

    def body(s):
        x, r, p, v, rho, alpha, omega, k = s
        rho_new = _vdot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = A(phat)
        alpha = rho_new / _vdot(rhat, v)
        s_vec = r - alpha * v
        shat = M(s_vec)
        t = A(shat)
        omega = _vdot(t, s_vec) / _vdot(t, t)
        x = x + alpha * phat + omega * shat
        r = s_vec - omega * t
        return (x, r, p, v, rho_new, alpha, omega, k + 1)

    x, r, _, _, _, _, _, k = jax.lax.while_loop(cond, body, (x, r, p, v, rho, alpha, omega, 0))
    return x, k, jnp.linalg.norm(r)


def gmres(A: Callable, b, M: Callable = None, x0=None, rtol=1e-8, atol=1e-12, max_it=1000, restart=30):
    """Left-preconditioned restarted GMRES(m) with Givens rotations — one
    jitted while_loop, counted iterations and a true convergence check
    (parity with the reference KSP surface, which reports its/rnorm for
    every solver).  Returns (x, iterations, ||b - A x||)."""
    if M is None:
        M = lambda r: r
    n = b.shape[0]
    m = int(min(restart, max_it, n))
    dt = b.dtype
    x = jnp.zeros_like(b) if x0 is None else x0
    r0 = M(b - A(x))
    bnorm = jnp.linalg.norm(M(b))
    tol = jnp.maximum(rtol * bnorm, atol).astype(jnp.real(r0).dtype)

    def arnoldi_cycle(x):
        """One GMRES(m) cycle from x: returns (x_new, res_est, n_inner)."""
        r = M(b - A(x))
        beta = jnp.linalg.norm(r)
        V0 = jnp.zeros((m + 1, n), dt).at[0].set(
            jnp.where(beta > 0, r / beta, r)
        )
        H0 = jnp.zeros((m + 1, m), dt)
        cs0 = jnp.ones((m,), dt)
        sn0 = jnp.zeros((m,), dt)
        g0 = jnp.zeros((m + 1,), dt).at[0].set(beta.astype(dt))

        def inner_cond(s):
            V, H, cs, sn, g, j, res = s
            return (j < m) & (res > tol)

        def inner_body(s):
            V, H, cs, sn, g, j, res = s
            w = M(A(V[j]))
            # modified Gram-Schmidt against rows 0..j (mask the rest)
            mask = (jnp.arange(m + 1) <= j).astype(jnp.real(w).dtype)

            def mgs(i, carry):
                w, h = carry
                hi = jnp.vdot(V[i], w) * mask[i]
                return (w - hi * V[i], h.at[i].set(hi))

            w, h = jax.lax.fori_loop(0, m + 1, mgs, (w, jnp.zeros((m + 1,), dt)))
            hj1 = jnp.linalg.norm(w).astype(dt)
            h = h.at[jnp.minimum(j + 1, m)].set(hj1)
            V = V.at[jnp.minimum(j + 1, m)].set(
                jnp.where(jnp.abs(hj1) > 0, w / hj1, w)
            )
            # apply existing Givens rotations to the new column
            def rot(i, hcol):
                use = (i < j).astype(jnp.real(w).dtype)
                hi = hcol[i]
                hi1 = hcol[i + 1]
                new_i = cs[i] * hi + sn[i] * hi1
                new_i1 = -jnp.conj(sn[i]) * hi + cs[i] * hi1
                hcol = hcol.at[i].set(use * new_i + (1 - use) * hi)
                hcol = hcol.at[i + 1].set(use * new_i1 + (1 - use) * hi1)
                return hcol

            h = jax.lax.fori_loop(0, m, rot, h)
            # new rotation annihilating h[j+1]
            hjj = h[j]
            hj1v = h[jnp.minimum(j + 1, m)]
            denom = jnp.sqrt(jnp.abs(hjj) ** 2 + jnp.abs(hj1v) ** 2)
            c_new = jnp.where(denom > 0, jnp.abs(hjj) / denom, 1.0).astype(dt)
            phase = jnp.where(jnp.abs(hjj) > 0, hjj / jnp.abs(hjj), 1.0).astype(dt)
            s_new = jnp.where(denom > 0, phase * jnp.conj(hj1v) / denom, 0.0).astype(dt)
            h = h.at[j].set(c_new * hjj + s_new * hj1v)
            h = h.at[jnp.minimum(j + 1, m)].set(0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            H = H.at[:, j].set(h)
            gj = g[j]
            g = g.at[j].set(c_new * gj)
            g = g.at[jnp.minimum(j + 1, m)].set(-jnp.conj(s_new) * gj)
            res = jnp.abs(g[jnp.minimum(j + 1, m)]).astype(jnp.real(w).dtype)
            return (V, H, cs, sn, g, j + 1, res)

        res0 = beta.astype(jnp.real(r0).dtype)
        V, H, cs, sn, g, j, res = jax.lax.while_loop(
            inner_cond, inner_body, (V0, H0, cs0, sn0, g0, 0, res0)
        )
        # back-substitution on the leading j x j triangular block (mask the
        # inactive tail so the static m x m solve is exact for the active part)
        act = jnp.arange(m) < j
        Hm = jnp.where(act[None, :] & act[:, None], H[:m, :], 0.0)
        Hm = Hm + jnp.diag(jnp.where(act, 0.0, 1.0).astype(dt))
        y = jax.scipy.linalg.solve_triangular(Hm, jnp.where(act, g[:m], 0.0), lower=False)
        x = x + V[:m].T @ y
        return x, res, j

    def outer_cond(s):
        x, res, it = s
        return (res > tol) & (it < max_it)

    def outer_body(s):
        x, res, it = s
        x, res, j = arnoldi_cycle(x)
        return (x, res, it + j)

    res_init = jnp.linalg.norm(r0).astype(jnp.real(r0).dtype)
    x, res, it = jax.lax.while_loop(outer_cond, outer_body, (x, res_init, 0))
    return x, it, jnp.linalg.norm(b - A(x))


@jax.tree_util.register_pytree_node_class
class JacobiPC:
    """Jacobi preconditioner as a CALLABLE PYTREE — usable as a jit
    argument (a bare closure can only be captured as a constant)."""

    def __init__(self, inv):
        self.inv = inv

    def __call__(self, r):
        return self.inv * r

    def tree_flatten(self):
        return (self.inv,), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(ch[0])


def jacobi_preconditioner(diag):
    return JacobiPC(jnp.where(diag != 0, 1.0 / diag, 1.0))


def chebyshev_preconditioner(A: Callable, diag, lmin_frac=0.06, lmax_safety=1.1, degree=3, n_power=20, probe=None):
    """Chebyshev-Jacobi: Chebyshev polynomial of degree `degree` on the
    Jacobi-preconditioned operator, with lambda_max from power iteration.
    The AMG-lite stand-in for BoomerAMG (see SURVEY.md §7 hard part (e))."""
    inv = jnp.where(diag != 0, 1.0 / diag, 1.0)

    def DA(x):
        return inv * A(x)

    if probe is None:
        # randomized start: a constant vector is often (near-)orthogonal to
        # the top eigenmode of D^-1 A (oscillatory), stalling power iteration
        # at a gross lambda_max underestimate — which makes the Chebyshev
        # polynomial blow up on the untargeted top modes
        import jax.random

        probe = jax.random.normal(jax.random.PRNGKey(0), diag.shape, dtype=jnp.result_type(diag, float))
    v = probe
    for _ in range(n_power):
        v = DA(v)
        v = v / jnp.linalg.norm(v)
    lmax = jnp.real(_vdot(v, DA(v))) * lmax_safety
    lmin = lmin_frac * lmax
    theta = (lmax + lmin) / 2
    delta = (lmax - lmin) / 2

    def M(r):
        # Chebyshev iteration solving DA x = inv*r
        rr = inv * r
        x = rr / theta
        if degree == 1:
            return x
        res = rr - DA(x)
        d = res / theta
        sigma = theta / delta
        rho = 1.0 / sigma
        for _ in range(degree - 1):
            rho_new = 1.0 / (2 * sigma - rho)
            d = rho_new * rho * d + 2 * rho_new / delta * res
            x = x + d
            res = res - DA(d)
            rho = rho_new
        return x

    return M


def cg_segmented(Aop, b, M=None, rtol=1e-8, atol=1e-12, max_it=10000, seg=150):
    """Preconditioned CG executed in bounded-iteration device segments with
    the FULL Krylov state carried between dispatches (exact continuation, no
    restart penalty).  Needed where a single long execution is killed by the
    runtime (this environment's TPU tunnel kills executions beyond ~30-60s)
    and useful for convergence monitoring.  Aop must be a pytree operator
    with .matvec (CSRMatrix/MPCMatrix/LatticeOperator); M a pytree callable
    (JacobiPC/LatticeGMG) or None for Jacobi."""
    if M is None:
        M = jacobi_preconditioner(Aop.diagonal())

    @jax.jit
    def init(Ao, Mo, b):
        x = jnp.zeros_like(b)
        r = b - Ao.matvec(x)
        z = Mo(r)
        rz = _vdot(r, z)
        return (x, r, z, z, rz), jnp.real(_vdot(r, r))

    @jax.jit
    def run_seg(Ao, Mo, state, tol2):
        def cond(s):
            (x, r, z, p, rz), k = s
            return (jnp.real(_vdot(r, r)) > tol2) & (k < seg)

        def body(s):
            (x, r, z, p, rz), k = s
            Ap = Ao.matvec(p)
            alpha = rz / _vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = Mo(r)
            rzn = _vdot(r, z)
            p = z + (rzn / rz) * p
            return (x, r, z, p, rzn), k + 1

        (state, k) = jax.lax.while_loop(cond, body, (state, 0))
        x, r, z, p, rz = state
        return state, k, jnp.real(_vdot(r, r))

    bnorm = float(jnp.linalg.norm(b))
    tol2 = jnp.asarray(max(rtol * bnorm, atol) ** 2, jnp.real(b).dtype)
    state, rr = init(Aop, M, b)
    total = 0
    rr = float(rr)
    while rr > float(tol2) and total < max_it:
        state, k, rr_d = run_seg(Aop, M, state, tol2)
        total += int(k)
        rr = float(rr_d)
        if int(k) == 0:
            break
    x = state[0]
    return x, total, float(np.sqrt(max(rr, 0.0)))


def solve(A: Callable, b, options: SolverOptions, diag=None, x0=None,
          Aop=None, bs=1, Pop=None, nullspace=None):
    """Dispatch on SolverOptions; returns (x, its, rnorm).

    Aop: the assembled operator (anything with .to_scipy()) — required for
    the algebraic-multigrid pc types; bs is its dof block size.

    Pop: optional separate PRECONDITIONER operator (the assembled `P` form
    of the reference's LinearProblem, problem.py:539-558): when given, the
    jacobi/chebyshev/amg preconditioners are built from Pop instead of the
    system operator — A is still the operator CG/GMRES iterates on.

    nullspace: optional (n, k) near-nullspace candidates for the amg pc
    (rigid-body modes for elasticity — the reference attaches these to
    GAMG, utils/mpc_utils.py:163-215)."""
    if Pop is not None:
        pc_src, pc_diag, pc_mv = Pop, Pop.diagonal(), Pop.matvec
    else:
        pc_src, pc_diag, pc_mv = Aop, diag, A
    M = None
    if options.pc_type == "jacobi" and pc_diag is not None:
        M = jacobi_preconditioner(pc_diag)
    elif options.pc_type == "chebyshev" and pc_diag is not None:
        M = chebyshev_preconditioner(pc_mv, pc_diag, degree=options.cheb_degree)
    elif options.pc_type in ("gamg", "amg", "hypre", "boomeramg"):
        if pc_src is not None:
            from .amg import smoothed_aggregation_amg

            M = smoothed_aggregation_amg(pc_src, bs=bs,
                                         dtype=np.asarray(b).dtype,
                                         nullspace=nullspace)
        elif diag is not None:
            # AMG needs the assembled operator; fall back loudly to Jacobi
            # rather than silently running unpreconditioned CG
            import warnings

            warnings.warn(
                f"pc_type={options.pc_type!r} requires the assembled operator "
                "(Aop); falling back to Jacobi", stacklevel=2)
            M = jacobi_preconditioner(diag)
        else:
            raise ValueError(
                f"pc_type={options.pc_type!r} requires the assembled operator "
                "(pass Aop=...)")
    kw = dict(M=M, x0=x0, rtol=options.rtol, atol=options.atol, max_it=options.max_it)
    if options.ksp_type == "cg":
        return cg(A, b, **kw)
    if options.ksp_type == "bcgs":
        return bicgstab(A, b, **kw)
    if options.ksp_type == "gmres":
        return gmres(A, b, **kw)
    if options.ksp_type == "preonly":
        # direct dense solve (small systems / tests)
        raise ValueError("preonly requires an assembled matrix; use solve_dense")
    raise ValueError(f"unknown ksp_type {options.ksp_type}")
