"""mesh_with_order (polynomial-order change) unit tests.

p-multigrid's coarse levels (solver/pmg.py) depend on these invariants:
selected nodes keep fine global ids, shared faces stay shared, boundary
markers copy through, and affine geometry remains exact.
"""

import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d, gll_basis_3d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import box_mesh, rectangle_mesh
from spectralelementmethod_tpu.mesh.porder import mesh_with_order


class TestMeshWithOrder:
    def test_vertices_preserved_2d(self):
        mesh = rectangle_mesh(3, 2, 6)
        coarse = mesh_with_order(mesh, 2)
        for cf, cc in zip(mesh.cells, coarse.cells):
            f = np.asarray(cf.node_ind_lexicographic)
            c = np.asarray(cc.node_ind_lexicographic)
            # cell corners carry identical global ids
            np.testing.assert_array_equal(
                f[::6, ::6], c[::2, ::2])
            # and every selected id is a fine id on the same lattice
            np.testing.assert_array_equal(c, f[::3, ::3])

    def test_shared_faces_stay_shared(self):
        mesh = rectangle_mesh(4, 3, 4)
        coarse = mesh_with_order(mesh, 2)
        disc = Discretization(coarse, gll_basis_2d(2))
        # partition of unity through shared DOFs: integrate(1) == area
        assert abs(disc.integrate(np.ones(coarse.n_nodes)) - 4.0) < 1e-12

    def test_boundary_markers_copied(self):
        mesh = rectangle_mesh(3, 3, 4)
        coarse = mesh_with_order(mesh, 1)
        assert coarse.boundary_names == mesh.boundary_names
        for name in mesh.boundary_names:
            np.testing.assert_array_equal(
                coarse.boundary_faces(name), mesh.boundary_faces(name))

    def test_3d_box(self):
        mesh = box_mesh(2, 2, 2, 4)
        coarse = mesh_with_order(mesh, 2)
        disc = Discretization(coarse, gll_basis_3d(2))
        assert abs(disc.integrate(np.ones(coarse.n_nodes)) - 8.0) < 1e-11

    def test_anisotropic_orders(self):
        mesh = rectangle_mesh(2, 2, 6)
        coarse = mesh_with_order(mesh, (3, 2))
        g = coarse.cell_blocks()[0][0]
        assert tuple(g.shape) == (4, 3)

    def test_indivisible_order_raises(self):
        mesh = rectangle_mesh(2, 2, 5)
        with pytest.raises(ValueError, match="divide"):
            mesh_with_order(mesh, 2)
