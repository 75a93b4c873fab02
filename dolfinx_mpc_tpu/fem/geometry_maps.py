"""Geometry maps: Jacobians, facet measures/normals, point location.

Replaces the DOLFINx geometry surface used by the reference: per-cell
coordinate-dof pullbacks (/root/reference/cpp/assemble_matrix.cpp:495-501),
`evaluate_basis_functions`'s non-affine Newton pullback
(/root/reference/cpp/utils.h:1131-1143), and the BoundingBoxTree/GJK collision
search (/root/reference/cpp/utils.h:1359-1451).  Host-side numpy for the
one-time constraint setup; the assembly path gets its Jacobian tables from
`cell_jacobians_at` which is plain einsum (also traceable under jit).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .cells import get_cell
from .elements import lagrange_element
from .mesh import Mesh

__all__ = [
    "cell_coords",
    "cell_jacobians_at",
    "cell_volumes",
    "reference_facet_normals",
    "facet_reference_points",
    "pull_back",
    "PointLocator",
]


def cell_coords(mesh: Mesh, cells=None) -> np.ndarray:
    """(n_cells, n_verts, gdim) vertex coordinates per cell."""
    c = mesh.cells if cells is None else mesh.cells[cells]
    return mesh.points[c]


@lru_cache(maxsize=None)
def _geom_tabulation(cell_type: str, pts_key):
    """dphi of the P1/Q1 geometry element at reference points (hashable key)."""
    pts = np.asarray(pts_key)
    el = lagrange_element(cell_type, 1)
    return el.tabulate(pts), el.tabulate_grad(pts)


def geom_tabulation(cell_type: str, pts: np.ndarray):
    pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
    key = tuple(map(tuple, pts))
    return _geom_tabulation(cell_type, key)


def cell_jacobians_at(coords, dphi_geom):
    """Batched Jacobians J[c, q] = coords[c]^T dphi[q].

    coords: (n_cells, n_verts, gdim); dphi_geom: (n_q, n_verts, tdim).
    Returns (n_cells, n_q, gdim, tdim).  Works for numpy and jax arrays.
    """
    import jax.numpy as jnp

    xp = jnp if not isinstance(coords, np.ndarray) else np
    return xp.einsum("cvg,qvt->cqgt", coords, dphi_geom)


def _dets(J):
    """Determinant for square (gdim==tdim) Jacobians, batched."""
    return np.linalg.det(J)


def cell_volumes(mesh: Mesh) -> np.ndarray:
    from .quadrature import quadrature_rule

    q, w = quadrature_rule(mesh.ref_cell, 2)
    _, dphi = geom_tabulation(mesh.cell_type, q)
    J = cell_jacobians_at(cell_coords(mesh), dphi)
    return np.einsum("cq,q->c", np.abs(_dets(J)), w)


@lru_cache(maxsize=None)
def reference_facet_normals(cell_type: str) -> np.ndarray:
    """(n_facets, tdim) outward unit normals of the reference cell facets."""
    cell = get_cell(cell_type)
    verts = cell.vertices
    centroid = verts.mean(axis=0)
    normals = []
    for f in cell.facets:
        fv = verts[list(f)]
        fc = fv.mean(axis=0)
        if cell.tdim == 1:
            n = np.array([1.0])
        elif cell.tdim == 2:
            t = fv[1] - fv[0]
            n = np.array([t[1], -t[0]])
        else:
            n = np.cross(fv[1] - fv[0], fv[2] - fv[0])
        n = n / np.linalg.norm(n)
        if np.dot(n, fc - centroid) < 0:
            n = -n
        normals.append(n)
    return np.asarray(normals)


@lru_cache(maxsize=None)
def _facet_embeddings(cell_type: str):
    """Per local facet: (origin (tdim,), tangent matrix (tdim, tdim-1)) mapping
    facet reference coords into cell reference coords (multilinear facets use
    the vertex-order convention of cells.py: (0,0),(1,0),(0,1),(1,1))."""
    cell = get_cell(cell_type)
    out = []
    for f in cell.facets:
        fv = cell.vertices[list(f)]
        origin = fv[0]
        if cell.tdim == 1:
            T = np.zeros((1, 0))
        elif len(f) == 2:
            T = (fv[1] - fv[0])[:, None]
        elif len(f) == 3:
            T = np.stack([fv[1] - fv[0], fv[2] - fv[0]], axis=1)
        else:  # quad facet: verts (0,0),(1,0),(0,1),(1,1) -> bilinear but our
            # hexes are axis-aligned in reference space so affine embedding is exact
            T = np.stack([fv[1] - fv[0], fv[2] - fv[0]], axis=1)
        out.append((origin, T))
    return tuple(out)


def facet_reference_points(cell_type: str, local_facet: int, facet_pts: np.ndarray) -> np.ndarray:
    """Map reference-facet quadrature points into cell reference coordinates."""
    origin, T = _facet_embeddings(cell_type)[local_facet]
    return origin[None, :] + facet_pts @ T.T


def facet_tangent_matrix(cell_type: str, local_facet: int) -> np.ndarray:
    return _facet_embeddings(cell_type)[local_facet][1]


# ---- inverse map / point location ---------------------------------------


def pull_back(cell_type: str, coords: np.ndarray, x: np.ndarray, tol=1e-12, maxit=30):
    """Newton inverse of the geometry map for a batch of (cell, point) pairs.

    coords: (n, n_verts, gdim); x: (n, gdim).  Returns X (n, tdim) reference
    coordinates.  One step suffices for affine cells; multilinear quad/hex
    converge in a few (mirrors the Newton pullback at
    /root/reference/cpp/utils.h:1131-1143).
    """
    cell = get_cell(cell_type)
    n = x.shape[0]
    X = np.full((n, cell.tdim), 1.0 / (cell.tdim + 1))
    el = lagrange_element(cell_type, 1)
    for _ in range(maxit):
        phi = _tabulate_rows(el, X)
        dphi = _tabulate_grad_rows(el, X)
        fx = np.einsum("nv,nvg->ng", phi, coords)
        J = np.einsum("nvg,nvt->ngt", coords, dphi)
        r = x - fx
        if np.abs(r).max() < tol:
            break
        dX = np.linalg.solve(J, r[..., None])[..., 0]
        X = X + dX
    return X


def _tabulate_rows(el, X):
    """Evaluate basis where each row of X is a different point: (n, ndofs)."""
    return el._eval_modal(X).T @ el.coeffs


def _tabulate_grad_rows(el, X):
    dm = el._eval_modal_grads(X)  # (n_modal, n, tdim)
    return np.einsum("mpg,mj->pjg", dm, el.coeffs)


def _inside_reference(cell_type: str, X: np.ndarray, tol=1e-8) -> np.ndarray:
    cell = get_cell(cell_type)
    ok = (X > -tol).all(axis=1)
    if cell.is_simplex:
        ok &= X.sum(axis=1) < 1 + tol
    else:
        ok &= (X < 1 + tol).all(axis=1)
    return ok


class PointLocator:
    """Find cells containing query points.  Replaces BoundingBoxTree +
    GJK-exact `find_local_collisions` (/root/reference/cpp/utils.h:1372-1451)
    with an axis-aligned bbox candidate search + exact Newton pull-back check.
    """

    def __init__(self, mesh: Mesh, cells=None):
        self.mesh = mesh
        self.cells = np.arange(mesh.num_cells) if cells is None else np.asarray(cells)
        cc = cell_coords(mesh, self.cells)
        self.lo = cc.min(axis=1)
        self.hi = cc.max(axis=1)

    def locate(self, x: np.ndarray, tol=1e-8):
        """For each point return (cell_index, X_ref); cell_index == -1 if the
        point is in no cell of this locator.

        Vectorized: all (point, bbox-candidate) pairs go through ONE batched
        Newton pull-back instead of a per-point Python loop (the reference's
        BB-tree + per-point GJK at cpp/utils.h:1372-1451 is inherently
        sequential; this is the batched equivalent)."""
        x = np.atleast_2d(x)
        n = x.shape[0]
        found = np.full(n, -1, dtype=np.int64)
        Xref = np.zeros((n, self.mesh.tdim))
        if n == 0:
            return found, Xref
        # native grid-hash path (csrc/native.cpp) when built
        from ..native import locate_points as _native_locate

        res = _native_locate(
            x, self.mesh.cells, self.mesh.points, self.mesh.cell_type,
            cells=None if len(self.cells) == self.mesh.num_cells else self.cells,
            tol=tol,
        )
        if res is not None:
            return res
        # candidate mask via broadcasting in chunks (memory: n_chunk * n_cells)
        chunk = max(1, int(4e7) // max(len(self.cells), 1))
        for c0 in range(0, n, chunk):
            xs = x[c0 : c0 + chunk]
            inb = (xs[:, None, :] >= self.lo[None] - tol).all(-1) & (
                xs[:, None, :] <= self.hi[None] + tol
            ).all(-1)
            pi, ci = np.nonzero(inb)
            if len(pi) == 0:
                continue
            cand_cells = self.cells[ci]
            cc = cell_coords(self.mesh, cand_cells)
            X = pull_back(self.mesh.cell_type, cc, xs[pi])
            ok = _inside_reference(self.mesh.cell_type, X, tol)
            # first hit per point wins (matches the loop semantics)
            for k in np.flatnonzero(ok):
                gi = c0 + pi[k]
                if found[gi] < 0:
                    found[gi] = cand_cells[k]
                    Xref[gi] = X[k]
        return found, Xref
