"""Meshes: structured generators, topology connectivities, boundary location.

TPU-native replacement for the DOLFINx mesh surface the reference consumes
(topology/geometry connectivities at /root/reference/cpp/assemble_matrix.cpp:461-470,
facet lookups in cpp/SlipConstraint.h:38-64).  Host-side numpy; the jitted
compute path only ever sees the static integer tables derived here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .cells import CellType, ReferenceCell, get_cell

__all__ = [
    "Mesh",
    "MeshTags",
    "create_unit_interval",
    "create_unit_square",
    "create_unit_cube",
    "create_rectangle",
    "create_box",
    "locate_entities_boundary",
    "locate_entities",
    "exterior_facet_indices",
    "meshtags",
]


@dataclass
class Mesh:
    points: np.ndarray  # (n_points, gdim) float64
    cells: np.ndarray  # (n_cells, n_cell_verts) int32
    cell_type: str
    _cache: dict = field(default_factory=dict, repr=False, compare=False)

    @property
    def ref_cell(self) -> ReferenceCell:
        return get_cell(self.cell_type)

    @property
    def tdim(self) -> int:
        return self.ref_cell.tdim

    @property
    def gdim(self) -> int:
        return self.points.shape[1]

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def geometry(self):  # dolfinx-compat shim
        return self

    @property
    def x(self) -> np.ndarray:  # dolfinx-compat: mesh.geometry.x
        return self.points

    # ---- derived topology (cached) -------------------------------------
    def entities(self, dim: int):
        """Unique mesh entities of dimension `dim`.

        Returns (entity_verts (n_ent, k) int32,
                 cell_to_entity (n_cells, n_local_ent) int32,
                 cell_entity_flip) where flip encodes, for dim==1, whether the
                 cell's local edge direction is reversed relative to the
                 global (sorted-vertex) direction; for dim==2 the rotation/
                 reflection code is stored instead (used for face-dof perm).
        """
        if dim == 0:
            nv = self.num_points
            ent = np.arange(nv, dtype=np.int32)[:, None]
            return ent, self.cells.astype(np.int32), None
        key = ("entities", dim)
        if key in self._cache:
            return self._cache[key]
        sub = self.ref_cell.sub_entities(dim)
        n_local = len(sub)
        k = len(sub[0])
        # gather vertex tuples for every (cell, local entity)
        all_verts = np.stack(
            [self.cells[:, list(s)] for s in sub], axis=1
        )  # (n_cells, n_local, k)
        flat = all_verts.reshape(-1, k)
        key_sorted = np.sort(flat, axis=1).astype(np.int64)
        # pack each sorted vertex tuple into one int64 key: 1D unique is ~10x
        # faster than np.unique(axis=0)'s lexicographic row argsort
        nv = int(self.num_points)
        if nv ** k < 2 ** 62:
            packed = key_sorted[:, 0]
            for j in range(1, k):
                packed = packed * nv + key_sorted[:, j]
            from ..native import sort_unique_inverse

            _, first_idx, inv = sort_unique_inverse(packed)
            uniq = key_sorted[first_idx]
        else:
            uniq, inv = np.unique(key_sorted, axis=0, return_inverse=True)
        cell_to_entity = inv.reshape(self.num_cells, n_local).astype(np.int32)
        out = (uniq.astype(np.int32), cell_to_entity, flat)
        self._cache[key] = out
        return out

    def facets(self):
        """(facet_verts, cell_to_facet, facet_to_cells (n_facets, 2; -1 pad))."""
        key = "facets"
        if key in self._cache:
            return self._cache[key]
        fdim = self.tdim - 1
        uniq, cell_to_f, _ = self.entities(fdim)
        n_f = uniq.shape[0]
        f2c = np.full((n_f, 2), -1, dtype=np.int32)
        counts = np.zeros(n_f, dtype=np.int32)
        for c in range(self.num_cells):
            for f in cell_to_f[c]:
                f2c[f, counts[f]] = c
                counts[f] += 1
        out = (uniq, cell_to_f, f2c)
        self._cache[key] = out
        return out

    def exterior_facets(self) -> np.ndarray:
        _, _, f2c = self.facets()
        return np.flatnonzero(f2c[:, 1] < 0).astype(np.int32)

    def midpoints(self, dim: int, entities: np.ndarray) -> np.ndarray:
        if dim == self.tdim:
            verts = self.cells[entities]
        else:
            ent_verts, _, _ = self.entities(dim)
            verts = ent_verts[entities]
        return self.points[verts].mean(axis=1)

    def cell_volumes(self) -> np.ndarray:
        """Per-cell measure (used for diagnostics)."""
        from .geometry_maps import cell_volumes

        return cell_volumes(self)


@dataclass
class MeshTags:
    mesh: Mesh
    dim: int
    indices: np.ndarray
    values: np.ndarray

    def find(self, value: int) -> np.ndarray:
        return self.indices[self.values == value]


def meshtags(mesh: Mesh, dim: int, indices: np.ndarray, values) -> MeshTags:
    indices = np.asarray(indices, dtype=np.int32)
    values = np.broadcast_to(np.asarray(values, dtype=np.int32), indices.shape).copy()
    order = np.argsort(indices)
    return MeshTags(mesh, dim, indices[order], values[order])


# ---- structured generators ---------------------------------------------


def create_unit_interval(n: int) -> Mesh:
    pts = np.linspace(0.0, 1.0, n + 1)[:, None]
    cells = np.stack([np.arange(n), np.arange(1, n + 1)], axis=1).astype(np.int32)
    return Mesh(pts, cells, CellType.interval)


def create_rectangle(p0, p1, n, cell_type: str = CellType.triangle) -> Mesh:
    nx, ny = n
    x = np.linspace(p0[0], p1[0], nx + 1)
    y = np.linspace(p0[1], p1[1], ny + 1)
    X, Y = np.meshgrid(x, y, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(i, j):
        return i * (ny + 1) + j

    cells = []
    for i in range(nx):
        for j in range(ny):
            v00, v10 = vid(i, j), vid(i + 1, j)
            v01, v11 = vid(i, j + 1), vid(i + 1, j + 1)
            if cell_type == CellType.quadrilateral:
                cells.append([v00, v10, v01, v11])
            else:
                cells.append([v00, v10, v11])
                cells.append([v00, v11, v01])
    m = Mesh(pts, np.asarray(cells, dtype=np.int32), cell_type)
    # cells are ordered (i, j, t): mark for the lattice fast path (ops/lattice.py)
    from ..ops.lattice import attach_lattice_info

    attach_lattice_info(m, (nx, ny, 0), 1 if cell_type == CellType.quadrilateral else 2)
    return m


def create_unit_square(nx: int, ny: int, cell_type: str = CellType.triangle) -> Mesh:
    return create_rectangle((0.0, 0.0), (1.0, 1.0), (nx, ny), cell_type)


_KUHN_TETS = [
    # 6-tet Kuhn subdivision of the unit cube with vertices in our hex order;
    # every tet contains the main diagonal (v0, v7) => consistent across cells.
    (0, 1, 3, 7),
    (0, 1, 5, 7),
    (0, 2, 3, 7),
    (0, 2, 6, 7),
    (0, 4, 5, 7),
    (0, 4, 6, 7),
]


def create_box(p0, p1, n, cell_type: str = CellType.tetrahedron) -> Mesh:
    nx, ny, nz = n
    x = np.linspace(p0[0], p1[0], nx + 1)
    y = np.linspace(p0[1], p1[1], ny + 1)
    z = np.linspace(p0[2], p1[2], nz + 1)
    npx, npy, npz = nx + 1, ny + 1, nz + 1
    # points in (i, j, k) lex order via repeat/tile (contiguous writes; a
    # meshgrid+stack costs ~6 full copies and tens of seconds at 10M nodes)
    pts = np.empty((npx * npy * npz, 3), dtype=np.float64)
    pts[:, 0] = np.repeat(x, npy * npz)
    pts[:, 1] = np.tile(np.repeat(y, npz), npx)
    pts[:, 2] = np.tile(z, npx * npy)

    # cells ordered (i, j, k, t) as the lattice fast path expects.  vid is
    # affine in (i, j, k), so every cell row is base_vertex_id + a constant:
    # ONE broadcast add builds the whole connectivity contiguously (strided
    # per-column writes at 60M cells cost ~40s; this is ~1s)
    base = (
        np.repeat(np.arange(nx, dtype=np.int32), ny * nz) * np.int32(npy)
        + np.tile(np.repeat(np.arange(ny, dtype=np.int32), nz), nx)
    ) * np.int32(npz) + np.tile(np.arange(nz, dtype=np.int32), nx * ny)
    corner_deltas = [
        (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
        (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1),
    ]
    cv = np.array(
        [(di * npy + dj) * npz + dk for (di, dj, dk) in corner_deltas], np.int32
    )
    if cell_type == CellType.hexahedron:
        cells_arr = base[:, None] + cv[None, :]
    else:
        consts = cv[np.asarray(_KUHN_TETS, np.int32).ravel()]  # (24,)
        cells_arr = (base[:, None] + consts[None, :]).reshape(-1, 4)
    m = Mesh(pts, cells_arr, cell_type)
    # cells are ordered (i, j, k, t): mark for the lattice fast path
    from ..ops.lattice import attach_lattice_info

    attach_lattice_info(m, (nx, ny, nz), 1 if cell_type == CellType.hexahedron else len(_KUHN_TETS))
    return m


def create_unit_cube(nx: int, ny: int, nz: int, cell_type: str = CellType.tetrahedron) -> Mesh:
    return create_box((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (nx, ny, nz), cell_type)


# ---- entity location ----------------------------------------------------


def _entities_satisfying(mesh: Mesh, dim: int, marker, candidates=None) -> np.ndarray:
    """Entities all of whose vertices satisfy marker(x) (vectorized:
    marker takes (gdim, n) and returns bool (n,), dolfinx convention)."""
    if dim == 0:
        vmask = np.asarray(marker(mesh.points.T))
        idx = np.flatnonzero(vmask)
        if candidates is not None:
            idx = np.intersect1d(idx, candidates)
        return idx.astype(np.int32)
    ent_verts, _, _ = mesh.entities(dim)
    if candidates is not None:
        sel = candidates
        verts = ent_verts[sel]
    else:
        sel = np.arange(ent_verts.shape[0])
        verts = ent_verts
    vmask = np.asarray(marker(mesh.points.T))
    ok = vmask[verts].all(axis=1)
    return np.asarray(sel, dtype=np.int32)[ok]


def locate_entities(mesh: Mesh, dim: int, marker) -> np.ndarray:
    return _entities_satisfying(mesh, dim, marker)


def locate_entities_boundary(mesh: Mesh, dim: int, marker) -> np.ndarray:
    """Boundary entities of dimension `dim` whose vertices all satisfy marker."""
    fdim = mesh.tdim - 1
    ext = mesh.exterior_facets()
    if dim == fdim:
        return _entities_satisfying(mesh, dim, marker, candidates=ext)
    facet_verts, _, _ = mesh.entities(fdim)
    bverts = np.unique(facet_verts[ext])
    if dim == 0:
        vmask = np.asarray(marker(mesh.points.T))
        return bverts[vmask[bverts]].astype(np.int32)
    # other dims: entities whose vertices are all boundary vertices + marker
    ent_verts, _, _ = mesh.entities(dim)
    on_b = np.isin(ent_verts, bverts).all(axis=1)
    cand = np.flatnonzero(on_b)
    return _entities_satisfying(mesh, dim, marker, candidates=cand)


def exterior_facet_indices(mesh: Mesh) -> np.ndarray:
    return mesh.exterior_facets()
