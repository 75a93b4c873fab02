"""Lagrange finite elements: nodal basis tabulation at arbitrary points.

Replaces the Basix tabulation surface the reference consumes
(`evaluate_basis_functions`, /root/reference/cpp/utils.h:963-1200).  The basis
is built once on the host via a Vandermonde inverse against a modal basis,
then tabulation tables at quadrature points are baked as static arrays into
the jitted assembly path.

Modal basis choice (conditioning, measured on the nodal Vandermonde):
 - simplices: plain monomials — cond <= 2.5e6 through degree 6 (f64 keeps
   ~1e-12 of the nodal delta property), and the monomial exponent table is
   what the fast paths already bake in.
 - tensor-product cells (quad/hex): tensor products of SHIFTED LEGENDRE
   polynomials on [0,1] — the raw-monomial Vandermonde hits cond 3e8 at Q4
   and 5e13 at Q6 (unusable), while the Legendre one stays <= ~1e4.
This is how the package gets arbitrary-order Lagrange without basix
(reference gets it from basix.create_element).
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


def _legendre_1d(maxdeg: int, x: np.ndarray):
    """Shifted Legendre on [0,1]: values and d/dx, shapes (maxdeg+1, n).

    Three-term recurrence in t = 2x - 1 (numerically stable at any degree):
        (k+1) P_{k+1} = (2k+1) t P_k - k P_{k-1}
        (k+1) P'_{k+1} = (2k+1) (P_k + t P'_k) - k P'_{k-1},   d/dx = 2 d/dt.
    """
    t = 2.0 * np.asarray(x, np.float64) - 1.0
    n = t.shape[0]
    P = np.zeros((maxdeg + 1, n))
    D = np.zeros((maxdeg + 1, n))
    P[0] = 1.0
    if maxdeg >= 1:
        P[1] = t
        D[1] = 1.0
    for k in range(1, maxdeg):
        P[k + 1] = ((2 * k + 1) * t * P[k] - k * P[k - 1]) / (k + 1)
        D[k + 1] = ((2 * k + 1) * (P[k] + t * D[k]) - k * D[k - 1]) / (k + 1)
    return P, 2.0 * D


def _eval_tensor_legendre(exps: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """(n_basis, n_pts) tensor-Legendre values: prod_d L_{e_d}(x_d)."""
    maxdeg = int(exps.max())
    out = np.ones((exps.shape[0], pts.shape[0]))
    for d in range(exps.shape[1]):
        P, _ = _legendre_1d(maxdeg, pts[:, d])
        out *= P[exps[:, d]]
    return out


def _eval_tensor_legendre_grads(exps: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """(n_basis, n_pts, tdim) tensor-Legendre gradients."""
    maxdeg = int(exps.max())
    tdim = exps.shape[1]
    P1d, D1d = [], []
    for d in range(tdim):
        P, D = _legendre_1d(maxdeg, pts[:, d])
        P1d.append(P)
        D1d.append(D)
    out = np.empty((exps.shape[0], pts.shape[0], tdim))
    for g in range(tdim):
        vals = np.ones((exps.shape[0], pts.shape[0]))
        for d in range(tdim):
            tab = D1d[d] if d == g else P1d[d]
            vals *= tab[exps[:, d]]
        out[:, :, g] = vals
    return out


@dataclass(frozen=True)
class LagrangeElement:
    """Scalar Lagrange element on a reference cell.

    ndofs: number of scalar basis functions (= number of lattice nodes).
    coeffs: (n_modal, ndofs) modal coefficients so that
        phi_j(x) = sum_k coeffs[k, j] * modal_k(x),
    where modal_k is mono_k (simplices) or the tensor-Legendre product with
    per-axis degrees exps[k] (quad/hex) — see the module docstring.
    """

    cell: ReferenceCell
    degree: int
    nodes: np.ndarray  # (ndofs, tdim) nodal points, entity-ordered
    coeffs: np.ndarray  # (n_modal, ndofs)
    exps: np.ndarray  # (n_modal, tdim)
    modal: str = "monomial"  # "monomial" | "legendre"

    @property
    def ndofs(self) -> int:
        return self.nodes.shape[0]

    def _eval_modal(self, pts: np.ndarray) -> np.ndarray:
        if self.modal == "legendre":
            return _eval_tensor_legendre(self.exps, pts)
        return _eval_monomials(self.exps, pts)

    def _eval_modal_grads(self, pts: np.ndarray) -> np.ndarray:
        if self.modal == "legendre":
            return _eval_tensor_legendre_grads(self.exps, pts)
        return _eval_monomial_grads(self.exps, pts)

    def tabulate(self, pts: np.ndarray) -> np.ndarray:
        """Basis values, shape (n_pts, ndofs)."""
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        return self._eval_modal(pts).T @ self.coeffs  # (n_pts, ndofs)

    def tabulate_grad(self, pts: np.ndarray) -> np.ndarray:
        """Reference-coordinate basis gradients, shape (n_pts, ndofs, tdim)."""
        pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
        dm = self._eval_modal_grads(pts)  # (n_modal, n_pts, tdim)
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
    # modal basis: monomials on simplices (cond fine through degree 6),
    # tensor Legendre on quad/hex (monomial cond is 3e8 at Q4)
    modal = "monomial" if cell.is_simplex else "legendre"
    if modal == "legendre":
        V = _eval_tensor_legendre(exps, nodes).T  # (ndofs, n_modal)
    else:
        V = _eval_monomials(exps, nodes).T  # V[i,k] = modal_k(node_i)
    coeffs = np.linalg.inv(V)  # phi_j = sum_k inv(V)[k,j] modal_k
    return LagrangeElement(cell, degree, nodes, coeffs, exps, modal)
