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


def quadrature_rule(cell: ReferenceCell, degree: int):
    """Return (points (nq, tdim), weights (nq,)) integrating polynomials of
    total degree `degree` exactly on the reference cell."""
    if cell.name == CellType.point:
        return np.zeros((1, 0)), np.ones(1)
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
