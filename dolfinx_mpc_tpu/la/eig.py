"""Symmetric generalized eigensolver: shift-and-invert subspace iteration.

TPU-native replacement for the SLEPc EPS shift-and-invert surface the
reference demo drives (/root/reference/python/demos/demo_periodic_gep.py:
EPS with ST type sinvert, target magnitude).  SLEPc factorizes (A - sigma*M)
with a direct solver; here the inverse is applied by a *batched, jitted,
preconditioned CG* over the whole search block at once — the inner solves
are the hot path and they run as one fused XLA program per outer iteration,
so the MXU/VPU see (n, m) blocks instead of m separate solves.

Algorithm (block inverse iteration with Rayleigh-Ritz, the subspace form of
shift-and-invert):

    X <- M-orthonormal block of size m = nev + guard
    repeat:
        Y   <- (A - sigma*M)^{-1} (M X)        batched CG, jitted
        Y   <- M-orthonormalize(Y)             block Cholesky in the M metric
        Hp  <- Y^H A Y,  (identity in M)       Rayleigh-Ritz on the pencil
        X   <- Y @ eigvecs(Hp)
    until residuals ||A x - lam M x|| small for the nev wanted pairs

Convergence is linear with ratio |lam_i - sigma| / |lam_{m+1} - sigma| —
with sigma at 0 and a small guard block this reaches 1e-8 residuals in a
handful of outer iterations for the smallest Laplace eigenvalues, vs
hundreds of un-shifted LOBPCG steps.  The small (m, m) Ritz problem is
solved on the host with numpy (m ~ 2*nev << n).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["eigsh_shift_invert"]


def _as_matvec(A) -> Callable:
    return A.matvec if hasattr(A, "matvec") else A


def _block_cg(A: Callable, B, M: Callable = None, rtol=1e-10, atol=1e-14,
              max_it=5000):
    """Batched preconditioned CG: solve A x_j = b_j for every column of
    B (n, m) in ONE lax.while_loop with per-column step lengths.  Converged
    columns freeze (alpha masked to 0) so a hard column cannot destabilize
    an easy one."""
    if M is None:
        M = lambda r: r
    Ab = jax.vmap(A, in_axes=1, out_axes=1)
    Mb = jax.vmap(M, in_axes=1, out_axes=1)

    def cdot(u, v):  # per-column <u, v>: (m,)
        return jnp.sum(jnp.conj(u) * v, axis=0)

    X = jnp.zeros_like(B)
    R = B
    Z = Mb(R)
    P = Z
    rz = cdot(R, Z)
    tol2 = jnp.maximum(rtol * jnp.sqrt(jnp.real(cdot(B, B))), atol) ** 2

    def active(R):
        return jnp.real(cdot(R, R)) > tol2

    def cond(s):
        X, R, Z, P, rz, k = s
        return jnp.any(active(R)) & (k < max_it)

    def body(s):
        X, R, Z, P, rz, k = s
        act = active(R)
        AP = Ab(P)
        pAp = cdot(P, AP)
        alpha = jnp.where(act, rz / jnp.where(act, pAp, 1.0), 0.0)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = Mb(R)
        rz_new = cdot(R, Z)
        beta = jnp.where(act, rz_new / jnp.where(act, rz, 1.0), 0.0)
        P = Z + beta[None, :] * P
        return (X, R, Z, P, rz_new, k + 1)

    X, R, _, _, _, k = jax.lax.while_loop(cond, body, (X, R, Z, P, rz, 0))
    return X, k


def _m_orthonormalize(X, Mb):
    """Block Gram-Schmidt in the M inner product via Cholesky of the Gram
    matrix (one (n,m)x(m,m) GEMM — MXU work, no per-vector loop)."""
    G = X.conj().T @ Mb(X)
    # jitter for near-rank-deficient blocks (random X0 never needs it; Ritz
    # rotations after convergence can)
    eps = 1e-14 * jnp.real(jnp.trace(G)) / G.shape[0]
    L = jnp.linalg.cholesky(G + eps * jnp.eye(G.shape[0], dtype=G.dtype))
    return jax.scipy.linalg.solve_triangular(L, X.conj().T, lower=True).conj().T


def eigsh_shift_invert(A, M, nev: int, sigma: float = 0.0, X0=None,
                       pc: Optional[Callable] = None, tol: Optional[float] = None,
                       max_outer: int = 40, inner_rtol: Optional[float] = None,
                       inner_max_it: int = 5000, guard: Optional[int] = None,
                       seed: int = 0):
    """Smallest-|lam - sigma| eigenpairs of the symmetric pencil
    A x = lam M x (A - sigma*M SPD-definite near sigma; M SPD).

    A, M: matvec callables or objects with .matvec.
    pc: optional preconditioner callable for the inner (A - sigma M) solves
        (e.g. jacobi/chebyshev/GMG from la.solvers — the same object the
        outer linear problems use).
    Returns (lam (nev,), U (n, nev), info dict with outer iterations,
    total inner CG iterations and final residuals).
    """
    Amv, Mmv = _as_matvec(A), _as_matvec(M)
    if sigma != 0.0:
        Kmv = lambda x: Amv(x) - sigma * Mmv(x)
    else:
        Kmv = Amv
    m = nev + (guard if guard is not None else max(2, nev))
    # dtype-aware default tolerances: under f32 (e.g. the TPU backend, where
    # enable_x64 silently truncates) 1e-10 inner residuals are unreachable
    # and the inner CG would spin to inner_max_it every outer iteration
    f64 = jax.config.jax_enable_x64 and jax.default_backend() not in (
        "tpu", "axon")
    if tol is None:
        tol = 1e-8 if f64 else 2e-4
    if inner_rtol is None:
        inner_rtol = 1e-10 if f64 else 1e-6

    # probe for n and dtype
    if X0 is not None:
        X = jnp.asarray(X0)
        n = X.shape[0]
        if X.shape[1] < m:
            m = X.shape[1]
    else:
        shape = getattr(A, "shape", None) or getattr(M, "shape", None)
        if shape is None:
            raise ValueError("pass X0 or operators with .shape")
        n = shape[0]
        rng = np.random.default_rng(seed)
        X = jnp.asarray(rng.standard_normal((n, m)))

    Mb = jax.vmap(Mmv, in_axes=1, out_axes=1)
    Ab = jax.vmap(Amv, in_axes=1, out_axes=1)
    ortho = jax.jit(lambda X: _m_orthonormalize(X, Mb))
    solve_block = jax.jit(lambda B: _block_cg(Kmv, B, M=pc, rtol=inner_rtol,
                                              max_it=inner_max_it))
    rayleigh = jax.jit(lambda Y: (Y.conj().T @ Ab(Y), Ab(Y), Mb(Y)))

    X = ortho(X)
    lam = None
    inner_total = 0
    for outer in range(max_outer):
        Y, k_in = solve_block(Mb(X))
        inner_total += int(k_in)
        Y = ortho(Y)
        Hp, AY, MY = rayleigh(Y)
        # Ritz on the host: (m, m) symmetric dense
        w, c = np.linalg.eigh(np.asarray((Hp + Hp.conj().T) / 2.0))
        order = np.argsort(np.abs(w - sigma))
        w, c = w[order], c[:, order]
        X = Y @ jnp.asarray(c)
        lam = w
        # residuals of the nev wanted pairs: ||A x - lam M x|| relative
        Rn = np.asarray(AY @ c[:, :nev]) - np.asarray(MY @ c[:, :nev]) * w[:nev]
        num = np.linalg.norm(Rn, axis=0)
        den = np.abs(w[:nev]) * np.linalg.norm(np.asarray(MY @ c[:, :nev]),
                                               axis=0) + 1e-30
        res = num / den
        if (res < tol).all():
            break
    info = dict(outer=outer + 1, inner=inner_total, res=res)
    return lam[:nev], X[:, :nev], info
