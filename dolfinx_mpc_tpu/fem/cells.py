"""Reference cell definitions: geometry, topology and dof-entity layout.

TPU-native rebuild of the cell/topology surface the reference consumes from
DOLFINx (see SURVEY.md L0; e.g. /root/reference/cpp/assemble_matrix.cpp:461-470
uses mesh topology/geometry connectivities).  Everything here is static host-side
metadata used to build the integer tables that the jitted compute path gathers
through.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "CellType",
    "ReferenceCell",
    "get_cell",
    "POINT",
    "INTERVAL",
    "TRIANGLE",
    "QUADRILATERAL",
    "TETRAHEDRON",
    "HEXAHEDRON",
]


class CellType:
    point = "point"
    interval = "interval"
    triangle = "triangle"
    quadrilateral = "quadrilateral"
    tetrahedron = "tetrahedron"
    hexahedron = "hexahedron"


@dataclass(frozen=True)
class ReferenceCell:
    """Static description of a reference cell.

    vertices: (n_verts, tdim) reference coordinates.
    edges / faces: tuples of local vertex indices per sub-entity.
    facets: the (tdim-1)-dimensional sub-entities (edges in 2D, faces in 3D,
        vertices in 1D).
    """

    name: str
    tdim: int
    vertices: np.ndarray
    edges: tuple = field(default_factory=tuple)
    faces: tuple = field(default_factory=tuple)
    is_simplex: bool = True

    @property
    def num_vertices(self) -> int:
        return len(self.vertices)

    @property
    def facets(self) -> tuple:
        if self.tdim == 1:
            return tuple((i,) for i in range(self.num_vertices))
        if self.tdim == 2:
            return self.edges
        return self.faces

    @property
    def facet_cell(self) -> "ReferenceCell":
        """Reference cell of a facet of this cell."""
        if self.tdim == 1:
            return POINT
        if self.tdim == 2:
            return INTERVAL
        if self.name == CellType.tetrahedron:
            return TRIANGLE
        return QUADRILATERAL

    def sub_entities(self, dim: int) -> tuple:
        """Local vertex indices of each sub-entity of dimension `dim`."""
        if dim == 0:
            return tuple((i,) for i in range(self.num_vertices))
        if dim == self.tdim:
            return (tuple(range(self.num_vertices)),)
        if dim == 1:
            return self.edges
        if dim == 2:
            return self.faces
        raise ValueError(f"bad entity dim {dim} for {self.name}")


POINT = ReferenceCell(CellType.point, 0, np.zeros((1, 0)))

INTERVAL = ReferenceCell(
    CellType.interval,
    1,
    np.array([[0.0], [1.0]]),
)

TRIANGLE = ReferenceCell(
    CellType.triangle,
    2,
    np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
    # DOLFINx/basix edge numbering: edge i is opposite vertex... use sorted pairs
    edges=((1, 2), (0, 2), (0, 1)),
)

QUADRILATERAL = ReferenceCell(
    CellType.quadrilateral,
    2,
    # basix ordering: (0,0),(1,0),(0,1),(1,1)
    np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]),
    edges=((0, 1), (0, 2), (1, 3), (2, 3)),
    is_simplex=False,
)

TETRAHEDRON = ReferenceCell(
    CellType.tetrahedron,
    3,
    np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]),
    edges=((2, 3), (1, 3), (1, 2), (0, 3), (0, 2), (0, 1)),
    faces=((1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)),
)

HEXAHEDRON = ReferenceCell(
    CellType.hexahedron,
    3,
    # basix ordering: lexicographic in (x fastest? actually (0,0,0),(1,0,0),(0,1,0),(1,1,0),(0,0,1),...)
    np.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [1.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [1.0, 0.0, 1.0],
            [0.0, 1.0, 1.0],
            [1.0, 1.0, 1.0],
        ]
    ),
    edges=(
        (0, 1),
        (0, 2),
        (0, 4),
        (1, 3),
        (1, 5),
        (2, 3),
        (2, 6),
        (3, 7),
        (4, 5),
        (4, 6),
        (5, 7),
        (6, 7),
    ),
    faces=(
        (0, 1, 2, 3),
        (0, 1, 4, 5),
        (0, 2, 4, 6),
        (1, 3, 5, 7),
        (2, 3, 6, 7),
        (4, 5, 6, 7),
    ),
    is_simplex=False,
)

_CELLS = {
    c.name: c
    for c in (POINT, INTERVAL, TRIANGLE, QUADRILATERAL, TETRAHEDRON, HEXAHEDRON)
}


def get_cell(name: str) -> ReferenceCell:
    return _CELLS[name]


def lattice_points(cell: ReferenceCell, degree: int) -> np.ndarray:
    """Equispaced lattice of nodal points for Lagrange degree `degree`,
    ordered entity-wise: vertices, then per-edge interior nodes (along the
    edge's local direction, low vertex -> high vertex), then per-face interior
    nodes, then cell-interior nodes.  This ordering is what the dofmap
    construction in fem/functionspace.py relies on.
    """
    if degree < 1:
        raise ValueError("degree >= 1 required")
    pts = [cell.vertices[i] for i in range(cell.num_vertices)]
    d = degree
    # edge interior nodes
    if cell.tdim >= 1 and d >= 2:
        for e in cell.sub_entities(1) if cell.tdim > 1 else ((0, 1),):
            v0, v1 = cell.vertices[e[0]], cell.vertices[e[1]]
            for k in range(1, d):
                pts.append(v0 + (v1 - v0) * (k / d))
    # face interior nodes
    if cell.tdim >= 2:
        faces = cell.sub_entities(2) if cell.tdim > 2 else (tuple(range(cell.num_vertices)),)
        for f in faces:
            pts.extend(_entity_interior_points(cell, f, d))
    # interior (3D)
    if cell.tdim == 3:
        pts.extend(_cell_interior_points(cell, d))
    return np.asarray(pts, dtype=np.float64)


def _entity_interior_points(cell: ReferenceCell, f: tuple, d: int) -> list:
    """Interior lattice points of a 2D entity (a face of a 3D cell, or the
    cell itself in 2D), in lexicographic order of the barycentric/tensor
    lattice indices."""
    verts = cell.vertices
    out = []
    if len(f) == 3:  # triangular entity
        v0, v1, v2 = verts[f[0]], verts[f[1]], verts[f[2]]
        for j in range(1, d):
            for i in range(1, d - j):
                out.append(v0 + (v1 - v0) * (i / d) + (v2 - v0) * (j / d))
    else:  # quadrilateral entity: verts ordered (0,0),(1,0),(0,1),(1,1) locally
        v0, v1, v2 = verts[f[0]], verts[f[1]], verts[f[2]]
        for j in range(1, d):
            for i in range(1, d):
                out.append(v0 + (v1 - v0) * (i / d) + (v2 - v0) * (j / d))
    return out


def _cell_interior_points(cell: ReferenceCell, d: int) -> list:
    out = []
    if cell.is_simplex:  # tetrahedron
        for k in range(1, d):
            for j in range(1, d - k):
                for i in range(1, d - k - j):
                    out.append(np.array([i / d, j / d, k / d]))
    else:  # hexahedron
        for k in range(1, d):
            for j in range(1, d):
                for i in range(1, d):
                    out.append(np.array([i / d, j / d, k / d]))
    return out


def monomial_exponents(cell: ReferenceCell, degree: int) -> np.ndarray:
    """Exponent multi-indices of the polynomial space: total-degree space for
    simplices, tensor-degree for quad/hex."""
    td = cell.tdim
    if cell.is_simplex:
        exps = [e for e in itertools.product(range(degree + 1), repeat=td) if sum(e) <= degree]
    else:
        exps = list(itertools.product(range(degree + 1), repeat=td))
    # sort: by total degree then lexicographic, deterministic
    exps.sort(key=lambda e: (sum(e), e))
    return np.asarray(exps, dtype=np.int64)
