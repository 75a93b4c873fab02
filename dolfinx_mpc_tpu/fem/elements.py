"""Lagrange finite elements: nodal basis tabulation at arbitrary points.

Replaces the Basix tabulation surface the reference consumes
(`evaluate_basis_functions`, /root/reference/cpp/utils.h:963-1200).  The basis
is built once on the host via a Vandermonde inverse against a monomial basis
(well-conditioned for degree <= 3, which covers everything the reference's
demos/tests use); tabulation tables at quadrature points are baked as static
arrays into the jitted assembly path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from .cells import ReferenceCell, get_cell, lattice_points, monomial_exponents

__all__ = ["LagrangeElement", "lagrange_element"]


def _eval_monomials(exps: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """(n_mono, n_pts) monomial values."""
    # pts: (n_pts, tdim); exps: (n_mono, tdim)
    n_pts = pts.shape[0]
    out = np.ones((exps.shape[0], n_pts))
    for d in range(exps.shape[1]):
        out *= pts[:, d][None, :] ** exps[:, d][:, None]
    return out


def _eval_monomial_grads(exps: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """(n_mono, n_pts, tdim) monomial gradients."""
    n_mono, tdim = exps.shape
    n_pts = pts.shape[0]
    out = np.empty((n_mono, n_pts, tdim))
    for g in range(tdim):
        vals = np.ones((n_mono, n_pts))
        for d in range(tdim):
            e = exps[:, d][:, None].astype(float)
            if d == g:
                # d/dx x^e = e x^(e-1); handle e == 0 -> 0
                with np.errstate(divide="ignore", invalid="ignore"):
                    p = np.where(e >= 1, pts[:, d][None, :] ** np.maximum(e - 1, 0), 0.0)
                vals *= e * p
            else:
                vals *= pts[:, d][None, :] ** e
        out[:, :, g] = vals
    return out


@dataclass(frozen=True)
class LagrangeElement:
    """Scalar Lagrange element on a reference cell.

    ndofs: number of scalar basis functions (= number of lattice nodes).
    coeffs: (n_mono, ndofs) monomial coefficients so that
        phi_j(x) = sum_k coeffs[k, j] * mono_k(x).
    """

    cell: ReferenceCell
    degree: int
    nodes: np.ndarray  # (ndofs, tdim) nodal points, entity-ordered
    coeffs: np.ndarray  # (n_mono, ndofs)
    exps: np.ndarray  # (n_mono, tdim)

    @property
    def ndofs(self) -> int:
        return self.nodes.shape[0]

    def tabulate(self, pts: np.ndarray) -> np.ndarray:
        """Basis values, shape (n_pts, ndofs)."""
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        mono = _eval_monomials(self.exps, pts)  # (n_mono, n_pts)
        return mono.T @ self.coeffs  # (n_pts, ndofs)

    def tabulate_grad(self, pts: np.ndarray) -> np.ndarray:
        """Reference-coordinate basis gradients, shape (n_pts, ndofs, tdim)."""
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        dm = _eval_monomial_grads(self.exps, pts)  # (n_mono, n_pts, tdim)
        return np.einsum("mpg,mj->pjg", dm, self.coeffs)

    def entity_dofs(self, dim: int) -> list:
        """Local dof indices attached to each sub-entity of dimension `dim`,
        in the lattice ordering of cells.lattice_points."""
        cell, d = self.cell, self.degree
        nv = cell.num_vertices
        counts = _entity_dof_counts(cell, d)
        out = []
        if dim == 0:
            return [[i] for i in range(nv)]
        offset = nv
        # edges
        n_edges = len(cell.sub_entities(1)) if cell.tdim > 1 else 1
        per_edge = counts[1]
        if dim == 1:
            for e in range(n_edges):
                out.append(list(range(offset + e * per_edge, offset + (e + 1) * per_edge)))
            return out
        offset += n_edges * per_edge
        if cell.tdim >= 2:
            n_faces = len(cell.sub_entities(2)) if cell.tdim > 2 else 1
            per_face = counts[2]
            if dim == 2:
                for f in range(n_faces):
                    out.append(list(range(offset + f * per_face, offset + (f + 1) * per_face)))
                return out
            offset += n_faces * per_face
        if dim == 3:
            return [list(range(offset, self.ndofs))]
        raise ValueError(f"bad dim {dim}")


def _entity_dof_counts(cell: ReferenceCell, d: int) -> dict:
    """Number of interior dofs per entity of each dimension."""
    counts = {0: 1, 1: max(0, d - 1)}
    if cell.is_simplex:
        counts[2] = max(0, (d - 1) * (d - 2) // 2)
        counts[3] = max(0, (d - 1) * (d - 2) * (d - 3) // 6)
    else:
        counts[2] = (d - 1) ** 2
        counts[3] = (d - 1) ** 3
    return counts


@lru_cache(maxsize=None)
def lagrange_element(cell_name: str, degree: int) -> LagrangeElement:
    cell = get_cell(cell_name)
    nodes = lattice_points(cell, degree)
    exps = monomial_exponents(cell, degree)
    if exps.shape[0] != nodes.shape[0]:
        raise RuntimeError(
            f"dim mismatch: {exps.shape[0]} monomials vs {nodes.shape[0]} nodes"
        )
    V = _eval_monomials(exps, nodes).T  # (ndofs, n_mono): V[i,k] = mono_k(node_i)
    coeffs = np.linalg.inv(V)  # phi_j = sum_k inv(V)[k,j] mono_k ; check: phi_j(node_i)=delta_ij
    # inv(V) @ ... : we need C s.t. V @ C = I -> C = inv(V). coeffs[k, j].
    return LagrangeElement(cell, degree, nodes, coeffs, exps)
