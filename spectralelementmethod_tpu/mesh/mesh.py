"""Finite element mesh container (host side).

Parity target: reference ``sem/discrete.py:777-1127`` (``Mesh``, ``CellBase``,
``Cell``, ``SubCell``) with two deliberate departures for the TPU design:

* **No node permutation mutation.**  The reference's ``_permute_nodes``
  (``sem/discrete.py:1115-1127``) mutates the mesh per-DOFManager, which its
  own FIXME (``sem/discrete.py:119-122``) flags as corrupting; here DOF
  numbering is a pure function of the immutable mesh (see
  ``core/discretization.py``).
* **Batched accessors.**  ``cell_blocks()`` returns struct-of-arrays
  (stacked node maps per geometry) so device code sees one gather index
  array per block instead of a Python cell loop.

Adjacency is discovered from shared face vertices via a hash map — O(E)
instead of the reference's O(E²) centroid-distance scan
(``sem/grid_importers.py:221-270``).
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np

from .geometry import NCube, subface_slice


class Mesh:
    """A mesh of N-cube cells with named regions and boundaries."""

    CellData = namedtuple("CellData", ["geometry_id", "region_id", "node_map"])
    BoundaryData = namedtuple("BoundaryData", ["ndim", "index"])

    def __init__(self, ndim: int):
        self._ndim = ndim
        self.nodes = np.zeros((ndim, 0))
        self._geometries: list[NCube] = []
        self._cell_data: list[Mesh.CellData] = []
        self._adj_map: list[list] = []

        self._region_names: list[str] = []
        self._region_id_lookup: dict[str, int] = {}
        self._boundary_names: list[str] = []
        self._boundary_id_lookup: dict[str, int] = {}
        # cell number -> {boundary_id: [BoundaryData(ndim, face), ...]}
        self._boundary_map: dict[int, dict] = {}
        self._boundary_cells: list[set] = []
        self._centroids = None

    # -- counts ------------------------------------------------------------

    @property
    def ndim(self) -> int:
        return self._ndim

    @property
    def n_nodes(self) -> int:
        return self.nodes.shape[1]

    @property
    def n_cells(self) -> int:
        return len(self._cell_data)

    @property
    def region_names(self):
        return list(self._region_names)

    @property
    def boundary_names(self):
        return list(self._boundary_names)

    # -- construction --------------------------------------------------------

    def add_geometry(self, geometry: NCube) -> int:
        if geometry.ndim > self.ndim:
            raise ValueError("Cell geometry has more dimensions than the mesh.")
        self._geometries.append(geometry)
        return len(self._geometries) - 1

    def new_region(self, name: str) -> int:
        region_id = len(self._region_names)
        self._region_names.append(name)
        self._region_id_lookup[name] = region_id
        return region_id

    def new_boundary(self, name: str) -> int:
        boundary_id = len(self._boundary_names)
        self._boundary_names.append(name)
        self._boundary_id_lookup[name] = boundary_id
        self._boundary_cells.append(set())
        return boundary_id

    def set_nodes(self, nodes) -> None:
        """Set node coordinates, shape (ndim, N)."""
        nodes = np.asarray(nodes, dtype=np.float64)
        if nodes.shape[0] != self.ndim:
            raise ValueError("Points have the wrong number of dimensions.")
        self.nodes = nodes
        self._centroids = None

    def add_cell(self, node_ind, geometry_id: int, region_id: int) -> int:
        """Add a cell; ``node_ind`` is the lexicographic node-index grid."""
        geometry = self._geometries[geometry_id]
        node_ind = np.asarray(node_ind, dtype=np.int64).reshape(geometry.shape)
        self._cell_data.append(Mesh.CellData(geometry_id, region_id, node_ind))
        self._adj_map.append([None] * geometry.n_sub_geometries())
        return len(self._cell_data) - 1

    def add_boundary_cell(self, cell_number: int, bnd_id: int, ndim: int,
                          face: int) -> None:
        """Mark ``face`` of cell ``cell_number`` as lying on boundary ``bnd_id``."""
        per_cell = self._boundary_map.setdefault(cell_number, {})
        per_cell.setdefault(bnd_id, []).append(Mesh.BoundaryData(ndim, face))
        self._boundary_cells[bnd_id].add(cell_number)

    # -- access --------------------------------------------------------------

    def get_geometries(self):
        return list(self._geometries)

    def get_geometry(self, geometry_id: int) -> NCube:
        return self._geometries[geometry_id]

    def get_cell(self, i: int) -> "Cell":
        geometry_id, region_id, node_map = self._cell_data[i]
        return Cell(
            self,
            self._geometries[geometry_id],
            node_map,
            region_id,
            self._adj_map[i],
            self._boundary_map.get(i, {}),
            index=i,
        )

    @property
    def cells(self):
        for i in range(self.n_cells):
            yield self.get_cell(i)

    def region_id(self, name: str) -> int:
        return self._region_id_lookup[name]

    def boundary_id(self, name: str) -> int:
        return self._boundary_id_lookup[name]

    def cells_on_boundary(self, name: str):
        bnd_id = self._boundary_id_lookup[name]
        for cell_num in sorted(self._boundary_cells[bnd_id]):
            yield self.get_cell(cell_num)

    def boundary_faces(self, name: str) -> np.ndarray:
        """(k, 2) int array of (cell_number, face) pairs on boundary ``name``.

        Device-friendly replacement for the reference's per-cell boundary
        iteration (``sem/discrete.py:211-219``).
        """
        bnd_id = self._boundary_id_lookup[name]
        pairs = []
        for cell_num in sorted(self._boundary_cells[bnd_id]):
            for bd in self._boundary_map[cell_num].get(bnd_id, []):
                pairs.append((cell_num, bd.index))
        return np.asarray(pairs, dtype=np.int64).reshape(-1, 2)

    def cells_are_neighbors(self, cell1: "Cell", cell2: "Cell") -> int:
        """Return the face of ``cell1`` shared with ``cell2``, or -1.

        Parity: ``sem/discrete.py:1095-1106`` (vertex-mask matching against
        ``corner_verts``).
        """
        common = np.isin(
            cell1.vertex_node_ind, cell2.vertex_node_ind, assume_unique=True
        )
        for side, vertex_mask in enumerate(cell1.geometry.corner_verts):
            if np.array_equal(common, vertex_mask):
                return side
        return -1

    @property
    def centroids(self) -> np.ndarray:
        """(n_cells, ndim) approximate cell centers (vertex means)."""
        if self._centroids is None:
            c = np.zeros((self.n_cells, self.ndim))
            for i, cell in enumerate(self.cells):
                c[i] = cell.vertex_nodes.reshape(self.ndim, -1).mean(axis=1)
            self._centroids = c
        return self._centroids

    # -- adjacency -----------------------------------------------------------

    def find_neighbors(self) -> None:
        """Populate cell-to-cell adjacency and attach boundary-mesh cells.

        Replaces the reference's centroid-sorted O(E²) scan
        (``sem/grid_importers.py:221-270``) with an O(E) hash on sorted face
        vertex tuples.
        """
        face_table: dict[tuple, list] = {}
        for i, cd in enumerate(self._cell_data):
            geometry = self._geometries[cd.geometry_id]
            flat = cd.node_map.ravel()
            for face in range(geometry.n_faces):
                verts = flat[geometry.face_vertex_local_ind(face)]
                key = tuple(sorted(int(v) for v in verts))
                face_table.setdefault(key, []).append((i, face))
        for key, owners in face_table.items():
            if len(owners) == 2:
                (i, fi), (j, fj) = owners
                self._adj_map[i][fi] = j
                self._adj_map[j][fj] = i
            elif len(owners) > 2:
                raise ValueError(f"face {key} shared by >2 cells")

    def face_pairs(self) -> np.ndarray:
        """(n_pairs, 4) int array of interior face matches (i, fi, j, fj).

        Each conforming interior face appears once; built from the same
        vertex-hash used by :meth:`find_neighbors`.
        """
        face_table: dict[tuple, list] = {}
        for i, cd in enumerate(self._cell_data):
            geometry = self._geometries[cd.geometry_id]
            flat = cd.node_map.ravel()
            for face in range(geometry.n_faces):
                verts = flat[geometry.face_vertex_local_ind(face)]
                key = tuple(sorted(int(v) for v in verts))
                face_table.setdefault(key, []).append((i, face))
        pairs = []
        for owners in face_table.values():
            if len(owners) == 2:
                (i, fi), (j, fj) = owners
                pairs.append((i, fi, j, fj))
        return np.asarray(sorted(pairs), dtype=np.int64).reshape(-1, 4)

    def attach_boundary_mesh(self, bnd_mesh: "Mesh") -> None:
        """Match each boundary-mesh cell to a face of a bulk cell.

        The boundary mesh's *regions* become this mesh's boundaries (the
        Gmsh import convention, ``sem/grid_importers.py:104-133``): boundary
        ``bnd_mesh.region k`` must already exist here with the same name.
        """
        face_table: dict[tuple, tuple] = {}
        for i, cd in enumerate(self._cell_data):
            geometry = self._geometries[cd.geometry_id]
            flat = cd.node_map.ravel()
            for face in range(geometry.n_faces):
                verts = flat[geometry.face_vertex_local_ind(face)]
                key = tuple(sorted(int(v) for v in verts))
                face_table[key] = (i, face)
        for bcd in bnd_mesh._cell_data:
            geometry = bnd_mesh._geometries[bcd.geometry_id]
            flat = bcd.node_map.ravel()
            verts = flat[geometry.hierarchical_node_order[: 2**geometry.ndim]]
            key = tuple(sorted(int(v) for v in verts))
            if key not in face_table:
                raise ValueError(
                    f"boundary cell with vertices {key} matches no bulk face"
                )
            cell_num, face = face_table[key]
            bnd_name = bnd_mesh._region_names[bcd.region_id]
            bnd_id = self._boundary_id_lookup[bnd_name]
            self.add_boundary_cell(cell_num, bnd_id, geometry.ndim, face)

    # -- batched accessors ---------------------------------------------------

    def cell_blocks(self):
        """Group cells by geometry into struct-of-arrays blocks.

        Returns a list of ``(geometry, cell_numbers (E,), node_maps
        (E, *shape))`` — the element-batched representation consumed by the
        device discretization (SURVEY.md §2, "Element-batched data
        parallelism").
        """
        groups: dict[int, list[int]] = {}
        for i, cd in enumerate(self._cell_data):
            groups.setdefault(cd.geometry_id, []).append(i)
        blocks = []
        for gid, cell_nums in sorted(groups.items()):
            geometry = self._geometries[gid]
            node_maps = np.stack(
                [self._cell_data[i].node_map for i in cell_nums]
            )
            blocks.append(
                (geometry, np.asarray(cell_nums, dtype=np.int64), node_maps)
            )
        return blocks


class CellBase:
    """View of one cell's nodes/topology.  Parity: ``sem/discrete.py:777-854``."""

    def __init__(self, mesh: Mesh, geometry: NCube, node_map: np.ndarray):
        self._mesh = mesh
        self._geometry = geometry
        self._node_map = node_map

    @property
    def mesh(self) -> Mesh:
        return self._mesh

    @property
    def geometry(self) -> NCube:
        return self._geometry

    @property
    def ndim(self) -> int:
        return self._geometry.ndim

    @property
    def n_nodes(self) -> int:
        return self._geometry.n_nodes

    @property
    def n_exterior_nodes(self) -> int:
        return self._geometry.n_exterior_nodes

    @property
    def n_interior_nodes(self) -> int:
        return self._geometry.n_interior_nodes

    @property
    def node_ind_lexicographic(self) -> np.ndarray:
        return self._node_map

    @property
    def nodes_lexicographic(self) -> np.ndarray:
        """(mesh.ndim, *shape) coordinates of the cell's nodes."""
        return self._mesh.nodes[:, self._node_map]

    @property
    def node_ind_hierarchical(self) -> np.ndarray:
        return self._node_map.flat[self._geometry.hierarchical_node_order]

    @property
    def nodes_hierarchical(self) -> np.ndarray:
        return self._mesh.nodes[:, self.node_ind_hierarchical]

    @property
    def vertex_node_ind(self) -> np.ndarray:
        return self._node_map.flat[self._geometry.vertex_node_ind]

    @property
    def vertex_nodes(self) -> np.ndarray:
        return self._mesh.nodes[:, self.vertex_node_ind]

    @property
    def exterior_node_ind(self) -> np.ndarray:
        return self._node_map.flat[self._geometry.exterior_node_ind]

    @property
    def interior_node_ind(self) -> np.ndarray:
        return self._node_map.flat[self._geometry.interior_node_ind]

    def sub_cell(self, face: int) -> "SubCell":
        return SubCell(self, face)


class Cell(CellBase):
    """A bulk cell with region/adjacency/boundary context."""

    def __init__(self, mesh, geometry, node_map, region_id, adj_map,
                 boundary_data, index=None):
        super().__init__(mesh, geometry, node_map)
        self._region_id = region_id
        self._adj_map = adj_map
        self._boundary_data = boundary_data
        self._index = index

    @property
    def index(self):
        return self._index

    @property
    def region_id(self) -> int:
        return self._region_id

    @property
    def region_name(self) -> str:
        return self._mesh._region_names[self._region_id]

    def neighbor(self, face: int):
        j = self._adj_map[face]
        return None if j is None else self._mesh.get_cell(j)

    def boundary_faces(self, name: str):
        """Faces of this cell lying on the named boundary."""
        bnd_id = self._mesh._boundary_id_lookup[name]
        return [bd.index for bd in self._boundary_data.get(bnd_id, [])]

    def boundary_cells(self, name: str):
        for face in self.boundary_faces(name):
            yield self.sub_cell(face)


class SubCell(CellBase):
    """A cell on a face of another cell.  Parity: ``sem/discrete.py:885-917``."""

    def __init__(self, parent_cell: CellBase, face: int):
        axis = face // 2
        geometry = parent_cell.geometry.sub_geometry(axis)
        node_map = subface_slice(
            face, parent_cell._node_map, parent_cell.ndim
        )
        super().__init__(parent_cell.mesh, geometry, node_map)
        self._parent_cell = parent_cell
        self._face = face

    @property
    def parent_cell(self) -> CellBase:
        return self._parent_cell

    @property
    def face(self) -> int:
        return self._face
