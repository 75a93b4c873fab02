"""Structure-of-arrays (cells-LAST) element kernels via bilinearity probing.

The generic traced kernels (kernels.py) produce per-cell small tensors with
the cell axis FIRST — on TPU every (c, 4, 3)-ish intermediate tiles as
(..., 8, 128) so >95% of each tile is padding, which makes the element loop
memory-bound at ~3% efficiency.  This module exploits that a bilinear form's
integrand is, by definition, a quadratic form in the basis features
F(u) = [value, physical-gradient components]:

    f(u, v, ctx) = F(u)^T · M(x, w) · F(v)

so the kernel factors into (a) probing the user integrand ONCE per quadrature
point with unit features to recover M (vmapped over cells, so x- and
coefficient-dependent entries come out as (c,) arrays), and (b) a fully
unrolled accumulation

    Ae[i, j] = Σ_q w_q |detJ_q| Σ_{s,t} M_q[s,t] · F_i[s] · F_j[t]

in which every run-time array has shape (c,) — cells riding the 128-lane
axis, all small-index loops unrolled at trace time.  Structurally-zero M
entries are detected with concrete random probes and elided, so Poisson
costs g² terms per (i, j, q), not (1+g)².

Replaces the role of FFCx's generated C tabulate_tensor kernels
(/root/reference/cpp/assemble_matrix.cpp:504-506) with a layout actually
suited to the VPU.  Supports rank-2 cell integrals on affine simplices and
multilinear quads/hexes; falls back to the generic kernel otherwise.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..fem.forms import Arg, Ctx, FormTerm
from ..fem.quadrature import quadrature_rule
from .kernels import _basis_args  # noqa: F401  (parity import for tests)

__all__ = ["compile_cell_kernel_soa"]


def _unit_features(bs, g, dtype=np.float64):
    """Probe Args: one per feature (component k, then value + g gradient
    entries).  Feature index layout: alpha = k*(1+g) + (0 for value, 1+t)."""
    probes = []
    for k in range(bs):
        val = np.zeros(bs, dtype)
        val[k] = 1.0
        probes.append(Arg(val[0] if bs == 1 else val, np.zeros((bs, g) if bs > 1 else g, dtype)))
        for t in range(g):
            gr = np.zeros((bs, g), dtype)
            gr[k, t] = 1.0
            probes.append(Arg(np.zeros(bs, dtype)[0] if bs == 1 else np.zeros(bs, dtype), gr[0] if bs == 1 else gr))
    return probes


def compile_cell_kernel_soa(mesh, V_test, V_trial, term: FormTerm, dtype):
    """Build kernel(coords_soa (nv, gdim, c), wl_soa dict) -> Ae (ndt, nds, c),
    or return None when the term shape is unsupported."""
    if term.integral != "cell":
        return None
    if V_trial is None or V_trial is not V_test:
        return None  # rank-2 square forms only (the hot path)
    if getattr(V_test, "is_mixed", False):
        return None  # mixed spaces ride the generic kernel path
    V = V_test
    cell = mesh.ref_cell
    g = mesh.gdim
    if g != cell.tdim:
        return None
    bs = V.block_size
    el = V.element
    deg = el.degree
    qdeg = term.quad_degree
    if qdeg is None:
        qdeg = 2 * deg  # bilinear form of degree-p functions (+geometry headroom)
    q, w = quadrature_rule(cell, qdeg)
    nq = len(w)
    nd_s = el.ndofs
    nF = 1 + g  # per-component features
    # unroll budget: terms = nq * nd_s^2 * bs^2 * nF^2 (pre-elision).  The
    # fully-unrolled trace costs ~1 HLO op per term; past ~10k the XLA-CPU
    # compile time dominates any runtime win, so fall back to the generic
    # kernel (27-point hex rules and P2 tets land there today).
    if nq * nd_s * nd_s * bs * bs * nF * nF > 10_000:
        return None

    from ..fem.elements import lagrange_element

    geo = lagrange_element(mesh.cell_type, 1)
    phi_g = geo.tabulate(q)  # (nq, nv) static
    dphi_g = geo.tabulate_grad(q)  # (nq, nv, tdim) static
    phi_t = el.tabulate(q)  # (nq, nd_s)
    dphi_t = el.tabulate_grad(q)  # (nq, nd_s, tdim)
    nv = phi_g.shape[1]
    probes = _unit_features(bs, g)
    nFb = bs * nF
    constants = {k: jnp.asarray(v) for k, v in term.constants.items()}
    coeff_names = tuple(term.coefficients.keys())
    coeff_spaces = tuple(term.coefficients[n].function_space for n in coeff_names)
    coeff_tabs = [
        (W.element.tabulate(q), W.element.tabulate_grad(q), W.block_size) for W in coeff_spaces
    ]

    # ---- structural-zero detection with concrete random evaluations ------
    rng = np.random.default_rng(1234)

    def concrete_M(xpt, wv):
        ctx = Ctx(xpt, None, {**wv, **{k: np.asarray(v) for k, v in term.constants.items()}})
        out = np.zeros((nFb, nFb), np.complex128)
        for a in range(nFb):
            for b in range(nFb):
                out[a, b] = complex(np.asarray(term.integrand(probes[a], probes[b], ctx)))
        return out

    nonzero = np.zeros((nFb, nFb), bool)
    for _ in range(3):
        xpt = rng.random(g)
        wv = {}
        for n, (pw, dw, bw) in zip(coeff_names, coeff_tabs):
            val = rng.random(bw)
            grd = rng.random((bw, g))
            wv[n] = Arg(val[0] if bw == 1 else val, grd[0] if bw == 1 else grd)
        nonzero |= np.abs(concrete_M(xpt, wv)) > 0
    nz_pairs = [(a, b) for a in range(nFb) for b in range(nFb) if nonzero[a, b]]
    x_dependent = _probe_x_dependence(term, probes, nz_pairs, coeff_names, coeff_tabs, g, rng)
    M_const = None
    if not x_dependent:
        # constant M: evaluate once EAGERLY (outside any trace — inside jit
        # even numpy-only jnp ops stage as tracers) and fold into the unroll
        ctx0 = Ctx(np.zeros(g), None, {k: np.asarray(v) for k, v in term.constants.items()})
        M_const = {}
        for a, b in nz_pairs:
            val = complex(np.asarray(term.integrand(probes[a], probes[b], ctx0)))
            M_const[(a, b)] = val.real if val.imag == 0 else val

    def kernel(coords_soa, wl_soa):
        """coords_soa: (nv, g, c); wl_soa: dict name -> (nd_w, bs_w, c)."""
        c_dt = coords_soa.dtype
        X = [[coords_soa[v, gg] for gg in range(g)] for v in range(nv)]
        Ae = {}
        for iq in range(nq):
            # J[a][b] = dx_a/dX_b as (c,) arrays
            J = [
                [sum(float(dphi_g[iq, v, b]) * X[v][a] for v in range(nv)) for b in range(g)]
                for a in range(g)
            ]
            det, inv = _soa_inv(J)
            scale = float(w[iq]) * jnp.abs(det)
            # physical gradients of test/trial basis: G[i][a] = sum_t inv[t][a] dref[i][t]
            G = [
                [
                    sum(float(dphi_t[iq, i, t]) * inv[t][a] for t in range(g))
                    for a in range(g)
                ]
                for i in range(nd_s)
            ]
            # quadrature-point coordinates (g, c) for probing
            xq = jnp.stack([sum(float(phi_g[iq, v]) * X[v][a] for v in range(nv)) for a in range(g)])
            # coefficient features at this qp
            wv_soa = {}
            for n, (pw, dw, bw) in zip(coeff_names, coeff_tabs):
                wl = wl_soa[n]  # (nd_w, bs_w, c)
                val = sum(float(pw[iq, i]) * wl[i] for i in range(pw.shape[1]))  # (bs_w, c)
                # physical gradient: grd[k][a] = sum_{i,t} dref[i,t] wl[i,k] inv[t][a]
                grd = jnp.stack(
                    [
                        jnp.stack(
                            [
                                sum(
                                    float(dw[iq, i, t]) * wl[i, kb] * inv[t][a]
                                    for i in range(dw.shape[1])
                                    for t in range(g)
                                )
                                for a in range(g)
                            ]
                        )
                        for kb in range(bw)
                    ]
                )  # (bs_w, g, c)
                wv_soa[n] = (val, grd, bw)

            if M_const is not None:
                Mq = M_const
            else:
                Mq = _probe_M(term, probes, nz_pairs, xq, wv_soa, constants, coeff_names)
            # accumulate Ae[i*bs+ki, j*bs+kj]
            contrib = {}
            for (al, be_) in nz_pairs:
                ki, s = divmod(al, nF)
                kj, t = divmod(be_, nF)
                m = Mq[(al, be_)]
                for i in range(nd_s):
                    fi = float(phi_t[iq, i]) if s == 0 else G[i][s - 1]
                    if isinstance(fi, float) and fi == 0.0:
                        continue
                    for j in range(nd_s):
                        fj = float(phi_t[iq, j]) if t == 0 else G[j][t - 1]
                        if isinstance(fj, float) and fj == 0.0:
                            continue
                        key = (i * bs + ki, j * bs + kj)
                        val = m * fi * fj if not (isinstance(m, float) and m == 1.0) else fi * fj
                        contrib[key] = contrib.get(key, 0.0) + val
            for key, val in contrib.items():
                Ae[key] = Ae.get(key, 0.0) + scale * val
        # materialize (ndt, nds, c)
        c_len = coords_soa.shape[-1]
        nd = nd_s * bs
        zero = jnp.zeros((c_len,), dtype if np.dtype(dtype).kind == "c" else c_dt)
        rows = []
        for i in range(nd):
            cols = []
            for j in range(nd):
                v = Ae.get((i, j), None)
                cols.append(zero if v is None else jnp.broadcast_to(v, (c_len,)).astype(zero.dtype))
            rows.append(jnp.stack(cols))
        return jnp.stack(rows)

    return kernel


def _soa_inv(J):
    """det and inverse of a small matrix given as nested lists of (c,) arrays."""
    g = len(J)
    if g == 1:
        det = J[0][0]
        return det, [[1.0 / det]]
    if g == 2:
        det = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        return det, [
            [J[1][1] / det, -J[0][1] / det],
            [-J[1][0] / det, J[0][0] / det],
        ]
    a, b, c = J[0]
    d, e, f = J[1]
    gg, h, i = J[2]
    A = e * i - f * h
    B = f * gg - d * i
    C = d * h - e * gg
    det = a * A + b * B + c * C
    inv = [
        [A / det, (c * h - b * i) / det, (b * f - c * e) / det],
        [B / det, (a * i - c * gg) / det, (c * d - a * f) / det],
        [C / det, (b * gg - a * h) / det, (a * e - b * d) / det],
    ]
    return det, inv


def _probe_x_dependence(term, probes, nz_pairs, coeff_names, coeff_tabs, g, rng):
    """Is any nonzero M entry x- or coefficient-dependent?  If not, entries
    are compile-time constants and the vmapped probe is skipped entirely."""
    if coeff_names:
        return True
    vals = []
    for _ in range(2):
        xpt = rng.random(g)
        ctx = Ctx(xpt, None, {k: np.asarray(v) for k, v in term.constants.items()})
        vals.append(
            np.array([complex(np.asarray(term.integrand(probes[a], probes[b], ctx))) for a, b in nz_pairs])
        )
    return not np.allclose(vals[0], vals[1], rtol=1e-12, atol=1e-14)


def _probe_M(term, probes, nz_pairs, xq, wv_soa, constants, coeff_names):
    """x-/coefficient-dependent M entries as (c,) arrays via a single vmap
    over the cell axis."""
    out = {}

    def all_entries(x_pt, wvals):
        w = {}
        for n in coeff_names:
            val, grd, bw = wvals[n]
            w[n] = Arg(val[0] if bw == 1 else val, grd[0] if bw == 1 else grd)
        ctx = Ctx(x_pt, None, {**w, **constants})
        return jnp.stack([term.integrand(probes[a], probes[b], ctx) for a, b in nz_pairs])

    wv_in = {n: (wv_soa[n][0], wv_soa[n][1], wv_soa[n][2]) for n in coeff_names}
    # vmap over the trailing cell axis of xq (g, c) and coefficient arrays
    in_axes_w = {n: (-1, -1, None) for n in coeff_names}
    vals = jax.vmap(all_entries, in_axes=(-1, in_axes_w), out_axes=-1)(xq, wv_in)
    for k, (a, b) in enumerate(nz_pairs):
        out[(a, b)] = vals[k]
    return out
