"""Mesh-layer tests: topology, orientation, adjacency, generators."""

import numpy as np
import pytest

from spectralelementmethod_tpu.mesh import (
    Line,
    Quadrilateral,
    annulus_mesh,
    geometric_progression,
    rectangle_mesh,
    single_cell_mesh,
    subface_index_array,
    subface_slice,
)


class TestQuadrilateralTopology:
    geo = Quadrilateral(5, 5)

    def test_counts(self):
        assert self.geo.n_nodes == 25
        assert self.geo.n_interior_nodes == 9
        assert self.geo.n_exterior_nodes == 16
        assert self.geo.n_sub_geometries(0) == 4   # vertices
        assert self.geo.n_sub_geometries(1) == 4   # edges
        assert self.geo.n_faces == 4

    def test_hierarchical_order_is_permutation(self):
        order = self.geo.hierarchical_node_order
        assert sorted(order) == list(range(25))

    def test_vertices_first(self):
        """Vertex nodes come first: (0,0), (0,-1), (-1,0), (-1,-1)."""
        lin = np.arange(25).reshape(5, 5)
        expected = [lin[0, 0], lin[0, -1], lin[-1, 0], lin[-1, -1]]
        np.testing.assert_array_equal(self.geo.vertex_node_ind, expected)

    def test_exterior_interior_partition(self):
        lin = np.arange(25).reshape(5, 5)
        interior = set(lin[1:-1, 1:-1].ravel().tolist())
        assert set(self.geo.interior_node_ind.tolist()) == interior
        assert (
            set(self.geo.exterior_node_ind.tolist())
            == set(range(25)) - interior
        )

    def test_anisotropic(self):
        geo = Quadrilateral(4, 7)
        assert geo.n_nodes == 28
        assert geo.n_interior_nodes == 2 * 5
        assert sorted(geo.hierarchical_node_order) == list(range(28))

    def test_line(self):
        geo = Line(6)
        assert geo.n_nodes == 6
        assert geo.n_interior_nodes == 4
        np.testing.assert_array_equal(geo.vertex_node_ind, [0, 5])


class TestSubfaceSlice:
    def test_2d_conventions(self):
        arr = np.arange(20).reshape(4, 5)
        np.testing.assert_array_equal(subface_slice(0, arr, 2), arr[0, ::-1])
        np.testing.assert_array_equal(subface_slice(1, arr, 2), arr[-1, :])
        np.testing.assert_array_equal(subface_slice(2, arr, 2), arr[:, 0])
        np.testing.assert_array_equal(subface_slice(3, arr, 2), arr[::-1, -1])

    def test_rank_axes(self):
        arr = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5)
        out = subface_slice(3, arr, 2)
        np.testing.assert_array_equal(out, arr[:, :, ::-1, -1])

    def test_ccw_traversal_is_continuous(self):
        """Faces in order south, east, north, west traverse the boundary CCW
        with matching endpoints (sem/mapping.py:49-76 convention)."""
        arr = np.arange(16).reshape(4, 4)
        path = np.concatenate(
            [subface_slice(f, arr, 2) for f in (2, 1, 3, 0)]
        )
        # consecutive faces share their corner node exactly (inclusive ends)
        for k in range(4):
            a = path[(k + 1) * 4 - 1]
            b = path[((k + 1) * 4) % 16]
            assert a == b, (a, b)
        # and each face's interior steps move one grid node at a time
        for k in range(4):
            seg = path[k * 4:(k + 1) * 4]
            ij = np.stack(divmod(seg, 4))
            steps = np.abs(np.diff(ij, axis=1)).sum(axis=0)
            assert np.all(steps == 1)

    def test_index_array_matches_slice(self):
        arr = np.random.RandomState(0).random_sample((6, 6))
        for f in range(4):
            np.testing.assert_array_equal(
                arr.ravel()[subface_index_array(f, (6, 6))],
                subface_slice(f, arr, 2),
            )


class TestRectangleMesh:
    def test_node_sharing(self):
        p = 4
        mesh = rectangle_mesh(3, 2, p)
        assert mesh.n_cells == 6
        assert mesh.n_nodes == (3 * p + 1) * (2 * p + 1)

    def test_adjacency(self):
        mesh = rectangle_mesh(3, 2, 2)
        # interior cell (1, 0) -> cell index 1*2+0 = 2 touches west/east/north
        cell = mesh.get_cell(2)
        assert cell.neighbor(0).index == 0
        assert cell.neighbor(1).index == 4
        assert cell.neighbor(3).index == 3
        assert cell.neighbor(2) is None  # south boundary

    def test_neighbors_share_face_nodes(self):
        mesh = rectangle_mesh(3, 3, 3)
        for cell in mesh.cells:
            for face in range(4):
                nb = cell.neighbor(face)
                if nb is None:
                    continue
                mine = set(
                    subface_slice(face, cell.node_ind_lexicographic, 2).tolist()
                )
                theirs = set(nb.node_ind_lexicographic.ravel().tolist())
                assert mine <= theirs

    def test_boundaries(self):
        mesh = rectangle_mesh(3, 2, 2)
        assert set(mesh.boundary_names) == {"ebc", "nbc"}
        ebc = mesh.boundary_faces("ebc")
        nbc = mesh.boundary_faces("nbc")
        assert len(ebc) == 3 + 2  # south + west
        assert len(nbc) == 3 + 2  # north + east
        # every boundary face has no neighbor
        for cell_num, face in np.vstack([ebc, nbc]):
            assert mesh.get_cell(cell_num).neighbor(face) is None

    def test_cells_are_neighbors(self):
        mesh = rectangle_mesh(2, 1, 2)
        c0, c1 = mesh.get_cell(0), mesh.get_cell(1)
        assert mesh.cells_are_neighbors(c0, c1) == 1  # east face of c0
        assert mesh.cells_are_neighbors(c1, c0) == 0  # west face of c1

    def test_cell_blocks(self):
        mesh = rectangle_mesh(3, 2, 2)
        blocks = mesh.cell_blocks()
        assert len(blocks) == 1
        geometry, cell_nums, node_maps = blocks[0]
        assert node_maps.shape == (6, 3, 3)
        np.testing.assert_array_equal(cell_nums, np.arange(6))

    def test_coordinates(self):
        mesh = rectangle_mesh(2, 2, 3, x0=(0, 0), x1=(4, 2))
        assert mesh.nodes.shape == (2, 49)
        assert mesh.nodes[0].min() == 0 and mesh.nodes[0].max() == 4
        assert mesh.nodes[1].min() == 0 and mesh.nodes[1].max() == 2


class TestAnnulusMesh:
    def test_structure(self):
        mesh = annulus_mesh(order=4, n_theta=9, n_r=15)
        assert mesh.n_cells == 9 * 15
        assert set(mesh.boundary_names) == {"sphere", "shell", "symaxis"}
        assert len(mesh.boundary_faces("sphere")) == 9
        assert len(mesh.boundary_faces("shell")) == 9
        assert len(mesh.boundary_faces("symaxis")) == 2 * 15

    def test_radii(self):
        mesh = annulus_mesh(order=4)
        r = np.sqrt((mesh.nodes**2).sum(axis=0))
        assert abs(r.min() - 1.0) < 1e-12
        assert abs(r.max() - 100.0) < 1e-9
        assert np.all(mesh.nodes[0] >= -1e-12)  # rho >= 0 half plane

    def test_sphere_nodes_on_unit_circle(self):
        """All nodes of sphere-boundary faces lie exactly on r=1 (curved,
        isoparametric)."""
        mesh = annulus_mesh(order=6)
        for cell_num, face in mesh.boundary_faces("sphere"):
            cell = mesh.get_cell(cell_num)
            sub = cell.sub_cell(face)
            r = np.sqrt((sub.nodes_lexicographic**2).sum(axis=0))
            np.testing.assert_allclose(r, 1.0, atol=1e-13)

    def test_progression(self):
        t = geometric_progression(1.0, 100.0, 15, 1.35)
        d = np.diff(t)
        np.testing.assert_allclose(d[1:] / d[:-1], 1.35, rtol=1e-12)
        assert t[0] == 1.0 and abs(t[-1] - 100.0) < 1e-12


def test_single_cell_mesh():
    mesh = single_cell_mesh(8)
    assert mesh.n_cells == 1
    assert mesh.n_nodes == 81
    cell = mesh.get_cell(0)
    assert cell.n_exterior_nodes == 32
    assert cell.n_interior_nodes == 49
    # all four faces on distinct boundaries
    for name in ("w", "e", "s", "n"):
        assert len(mesh.boundary_faces(name)) == 1


def test_subcell_nodes():
    mesh = rectangle_mesh(1, 1, 3, boundary_names={"south": "b"})
    cell = mesh.get_cell(0)
    sub = cell.sub_cell(2)  # south face
    assert sub.geometry.n_nodes == 4
    # south face nodes have y = min
    np.testing.assert_allclose(sub.nodes_lexicographic[1], -1.0)


class TestMultiPatch:
    def test_tube_mesh_conforming(self):
        from spectralelementmethod_tpu.basis import gll_basis_2d
        from spectralelementmethod_tpu.core.discretization import (
            Discretization)
        from spectralelementmethod_tpu.mesh.generators import tube_mesh

        mesh = tube_mesh(3)
        assert set(mesh.boundary_names) == {"sphere", "symaxis", "shell"}
        disc = Discretization(mesh, gll_basis_2d(3))
        assert np.all(disc.detJ > 0)
        # meridional-plane area: quarter head disc + tail box - half
        # unit-sphere disc (isoparametric arcs converge fast in p)
        area = disc.integrate(np.ones(disc.n_nodes))
        exact = np.pi * 32.0**2 / 4 + 32.0 * 64.0 - np.pi / 2
        assert abs(area - exact) / exact < 1e-6

    def test_tube_mesh_dss_consistent(self):
        """Multi-patch interfaces must behave like any conforming mesh."""
        import jax.numpy as jnp

        from spectralelementmethod_tpu.basis import gll_basis_2d
        from spectralelementmethod_tpu.core.discretization import (
            Discretization)
        from spectralelementmethod_tpu.mesh.generators import tube_mesh
        from spectralelementmethod_tpu.ops.exchange import (
            LocalExchange, RollExchange)

        disc = Discretization(tube_mesh(3, n_theta=8, n_r=3, n_wake=2,
                                        n_outer=3), gll_basis_2d(3))
        exL, exR = LocalExchange(disc), RollExchange(disc)
        v = jnp.asarray(np.random.RandomState(0).standard_normal(
            (disc.E, disc.n_loc)))
        np.testing.assert_allclose(np.asarray(exR.dss(v)),
                                   np.asarray(exL.dss(v)), atol=1e-12)

    def test_coons_patch_reproduces_boundaries(self):
        from spectralelementmethod_tpu.mesh.generators import (
            arc_curve, coons_patch, line_curve)

        s = arc_curve(2.0, 0.0, np.pi / 2)
        n = arc_curve(4.0, 0.0, np.pi / 2)
        w = line_curve(s(0.0), n(0.0))
        e = line_curve(s(1.0), n(1.0))
        cmap = coons_patch(s, n, w, e)
        t = np.linspace(0, 1, 7)
        np.testing.assert_allclose(np.stack(cmap(t, 0 * t)),
                                   np.stack(s(t)), atol=1e-13)
        np.testing.assert_allclose(np.stack(cmap(t, 0 * t + 1)),
                                   np.stack(n(t)), atol=1e-13)
        np.testing.assert_allclose(np.stack(cmap(0 * t, t)),
                                   np.stack(w(t)), atol=1e-13)
