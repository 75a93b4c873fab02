"""Quadrature rules on reference cells.

Replaces the quadrature baked into the reference's FFCx-generated kernels
(invoked at /root/reference/cpp/assemble_matrix.cpp:504-506).  Gauss-Legendre
tensor rules everywhere; simplices via the Duffy (collapsed-coordinate)
transform, which stays polynomially exact given enough 1D points.
"""

from __future__ import annotations

import numpy as np

from .cells import CellType, ReferenceCell

__all__ = ["quadrature_rule"]


def _gauss_1d(n: int):
    x, w = np.polynomial.legendre.leggauss(n)
    # map [-1, 1] -> [0, 1]
    return (x + 1.0) / 2.0, w / 2.0


# Minimal symmetric simplex rules (Dunavant triangles, Keast tets) for low
# degrees — the Duffy tensor fallback below needs n^tdim points (27 for a
# degree-2 tet!) where these need 1-8, which directly scales the per-cell
# kernel flops and the SoA unroll budget (ops/soa_kernels.py).
def _tri_rule(degree: int):
    if degree <= 1:
        return np.array([[1 / 3, 1 / 3]]), np.array([0.5])
    if degree == 2:
        a = np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]])
        return a, np.full(3, 1 / 6)
    if degree == 3:  # Dunavant degree-3, 4 points
        p = np.array([[1 / 3, 1 / 3], [0.6, 0.2], [0.2, 0.6], [0.2, 0.2]])
        w = np.array([-27 / 96, 25 / 96, 25 / 96, 25 / 96])
        return p, w
    return None


def _tet_rule(degree: int):
    if degree <= 1:
        return np.array([[0.25, 0.25, 0.25]]), np.array([1 / 6])
    if degree == 2:  # Keast 4-point
        a, b = 0.5854101966249685, 0.1381966011250105
        p = np.array([[b, b, b], [a, b, b], [b, a, b], [b, b, a]])
        return p, np.full(4, 1 / 24)
    if degree == 3:  # Keast 5-point (centroid + 4 symmetric, degree-3 exact)
        c = np.array([[0.25, 0.25, 0.25]])
        a, b = 0.5, 1 / 6
        p = np.array([[b, b, b], [a, b, b], [b, a, b], [b, b, a]])
        return np.vstack([c, p]), np.concatenate([[-2 / 15], np.full(4, 3 / 40)])
    return None


def _grundmann_moller(n: int, s: int):
    """Grundmann-Moller rule on the n-simplex, exact to degree 2s+1
    (Grundmann & Moller 1978) — O(s^n) points for ANY degree, replacing the
    O(m^n) collapsed tensor fallback for simplices beyond the hand-coded
    low-order rules."""
    from itertools import combinations_with_replacement
    from math import factorial

    pts, wts = [], []
    deg = 2 * s + 1
    for i in range(s + 1):
        d = deg + n - 2 * i
        w = (
            (-1) ** i
            * 2.0 ** (-2 * s)
            * float(d) ** deg
            / (factorial(i) * factorial(deg + n - i))
        )
        # all beta with |beta| = s - i over n+1 slots
        m = s - i
        for c in combinations_with_replacement(range(n + 1), m):
            beta = [0] * (n + 1)
            for j in c:
                beta[j] += 1
            bary = [(2 * bj + 1) / d for bj in beta]
            pts.append(bary[1:])  # drop lambda_0: reference coords
            wts.append(w)
    P = np.asarray(pts)
    W = np.asarray(wts)
    # the GM weights integrate over the UNIT-VOLUME simplex scaled by n!;
    # normalize so constants integrate to vol(T_n) = 1/n!
    W = W / W.sum() / factorial(n)
    return P, W


def quadrature_rule(cell: ReferenceCell, degree: int):
    """Return (points (nq, tdim), weights (nq,)) integrating polynomials of
    total degree `degree` exactly on the reference cell."""
    if cell.name == CellType.point:
        return np.zeros((1, 0)), np.ones(1)
    if cell.name == CellType.triangle:
        r = _tri_rule(degree)
        if r is not None:
            return r
        return _grundmann_moller(2, max(0, (degree - 1 + 1) // 2))
    if cell.name == CellType.tetrahedron:
        r = _tet_rule(degree)
        if r is not None:
            return r
        return _grundmann_moller(3, max(0, (degree - 1 + 1) // 2))
    # Duffy transform multiplies the integrand degree by up to +1 per collapsed
    # axis; be safe with n = ceil((degree + tdim) / 2) + 1 points per axis.
    n = max(1, (degree + cell.tdim) // 2 + 1)
    x, w = _gauss_1d(n)
    if cell.name == CellType.interval:
        return x[:, None], w
    if cell.name == CellType.quadrilateral:
        X, Y = np.meshgrid(x, x, indexing="ij")
        W = np.outer(w, w)
        return np.stack([X.ravel(), Y.ravel()], axis=1), W.ravel()
    if cell.name == CellType.hexahedron:
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        W = np.einsum("i,j,k->ijk", w, w, w)
        return np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1), W.ravel()
    if cell.name == CellType.triangle:
        # Duffy: (u, v) in [0,1]^2 -> (u, v(1-u)), |J| = (1-u)
        pts, wts = [], []
        for i in range(n):
            for j in range(n):
                u, v = x[i], x[j]
                pts.append([u, v * (1.0 - u)])
                wts.append(w[i] * w[j] * (1.0 - u))
        return np.asarray(pts), np.asarray(wts)
    if cell.name == CellType.tetrahedron:
        # (u,v,t) -> (u, v(1-u), t(1-u)(1-v(1-u))/(1-... )) — use standard
        # collapsed map: x=u, y=v(1-u), z=t(1-u-v(1-u)) = t(1-u)(1-v)
        pts, wts = [], []
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    u, v, t = x[i], x[j], x[k]
                    X = u
                    Y = v * (1.0 - u)
                    Z = t * (1.0 - u - Y)
                    jac = (1.0 - u) * (1.0 - u - Y)
                    pts.append([X, Y, Z])
                    wts.append(w[i] * w[j] * w[k] * jac)
        return np.asarray(pts), np.asarray(wts)
    raise ValueError(f"no quadrature for cell {cell.name}")
