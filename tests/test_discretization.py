"""Discretization/geometry tests: mapping Jacobians, DSS, face geometry."""

import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.core import mapping as mp
from spectralelementmethod_tpu.mesh import (
    annulus_mesh,
    rectangle_mesh,
    single_cell_mesh,
)


def make_disc(nx=3, ny=2, p=4, **kw):
    mesh = rectangle_mesh(nx, ny, p, **kw)
    return Discretization(mesh, gll_basis_2d(p))


class TestAffineGeometry:
    """On an axis-aligned rectangle mesh the mapping is affine: exact
    closed-form Jacobians."""

    def test_jacobian_constant(self):
        # [0,4]x[0,2] split 2x2 -> cells are 2x1; J = diag(1, 0.5)
        mesh = rectangle_mesh(2, 2, 3, x0=(0, 0), x1=(4, 2))
        disc = Discretization(mesh, gll_basis_2d(3))
        np.testing.assert_allclose(disc.J[:, 0, 0], 1.0, atol=1e-13)
        np.testing.assert_allclose(disc.J[:, 1, 1], 0.5, atol=1e-13)
        np.testing.assert_allclose(disc.J[:, 0, 1], 0.0, atol=1e-13)
        np.testing.assert_allclose(disc.J[:, 1, 0], 0.0, atol=1e-13)
        np.testing.assert_allclose(disc.detJ, 0.5, atol=1e-13)
        np.testing.assert_allclose(disc.invJ[:, 0, 0], 1.0, atol=1e-13)
        np.testing.assert_allclose(disc.invJ[:, 1, 1], 2.0, atol=1e-13)

    def test_partition_of_unity_area(self):
        """sum detJxW == domain area; integrate(1) == area."""
        disc = make_disc(3, 2, 5, x0=(0, 0), x1=(3, 2))
        assert abs(disc.detJxW.sum() - 6.0) < 1e-12
        one = np.ones(disc.n_nodes)
        assert abs(disc.integrate(one) - 6.0) < 1e-12

    def test_gll_coords_consistency(self):
        """Physical GLL coords are consistent across shared element faces
        and hit the domain corners."""
        disc = make_disc(3, 3, 4)
        xg = disc.global_gll_coords()
        # re-gather and compare with per-element coefficients (overwrite
        # scatter must equal every element's view)
        for e in range(disc.E):
            loc = disc.gather_nodes[e]
            np.testing.assert_allclose(
                xg[:, loc].reshape(2, *disc.shape),
                disc.x_coeffs[e],
                atol=1e-12,
            )

    def test_integrate_polynomial(self):
        """Integrate x^2 y over [0,2]^2 = (8/3)*2 = 16/3."""
        disc = make_disc(2, 3, 6, x0=(0, 0), x1=(2, 2))
        xg = disc.global_gll_coords()
        u = xg[0] ** 2 * xg[1]
        assert abs(disc.integrate(u) - 16 / 3) < 1e-12


class TestCurvedGeometry:
    def test_annulus_area(self):
        """Half annulus area = pi (R^2 - r^2) / 2, to quadrature accuracy."""
        mesh = annulus_mesh(order=8, n_theta=9, n_r=15, r_outer=10.0)
        disc = Discretization(mesh, gll_basis_2d(8))
        exact = np.pi * (10.0**2 - 1.0) / 2
        assert abs(disc.detJxW.sum() - exact) / exact < 1e-9

    def test_positive_jacobian(self):
        mesh = annulus_mesh(order=5)
        disc = Discretization(mesh, gll_basis_2d(5))
        assert np.all(disc.detJ > 0)


class TestDSS:
    def test_multiplicity(self):
        disc = make_disc(2, 2, 2)
        mult = disc.node_multiplicity()
        # corner of the 2x2 cell grid interior meets 4 elements
        assert mult.max() == 4
        assert mult.min() == 1
        assert mult.sum() == disc.E * disc.n_loc

    def test_scatter_gather_adjoint(self):
        """<scatter(v), u> == <v, gather(u)> (DSS is the gather adjoint)."""
        rng = np.random.RandomState(0)
        disc = make_disc(3, 2, 3)
        u = rng.randn(disc.n_nodes)
        v = rng.randn(disc.E, *disc.shape)
        lhs = np.dot(disc.scatter_add(v), u)
        rhs = np.sum(v * disc.gather(u))
        assert abs(lhs - rhs) < 1e-10


class TestFaceGeometry:
    def test_rectangle_normals(self):
        disc = make_disc(3, 2, 4, x0=(0, 0), x1=(3, 2),
                         boundary_names={"south": "s", "north": "n",
                                         "west": "w", "east": "e"})
        for name, normal in (("s", [0, -1]), ("n", [0, 1]),
                             ("w", [-1, 0]), ("e", [1, 0])):
            fg = disc.face_geometry(name)
            np.testing.assert_allclose(
                fg.unit_normal,
                np.broadcast_to(
                    np.asarray(normal, float)[None, :, None],
                    fg.unit_normal.shape,
                ),
                atol=1e-12,
            )

    def test_boundary_length(self):
        """Integrating 1 over each side gives the side length."""
        disc = make_disc(3, 2, 4, x0=(0, 0), x1=(3, 2),
                         boundary_names={"south": "s", "east": "e"})
        s = disc.face_geometry("s")
        assert abs(s.dSxW.sum() - 3.0) < 1e-12
        e = disc.face_geometry("e")
        assert abs(e.dSxW.sum() - 2.0) < 1e-12

    def test_circle_arc_length_and_normals(self):
        """Sphere boundary of the annulus: arc length pi, normals radial."""
        mesh = annulus_mesh(order=8, n_theta=9, n_r=15)
        disc = Discretization(mesh, gll_basis_2d(8))
        fg = disc.face_geometry("sphere")
        assert abs(fg.dSxW.sum() - np.pi) < 1e-10
        # outward normal of the fluid domain at the sphere points INTO the
        # sphere (toward -r_hat): n = -x/|x| on the unit circle
        r = np.linalg.norm(fg.x, axis=1)
        np.testing.assert_allclose(r, 1.0, atol=1e-12)
        np.testing.assert_allclose(fg.unit_normal, -fg.x, atol=1e-10)

    def test_face_global_nodes_match_coords(self):
        disc = make_disc(2, 2, 3, boundary_names={"north": "n"})
        fg = disc.face_geometry("n")
        gidx = disc.face_global_nodes("n")
        xg = disc.global_gll_coords()
        np.testing.assert_allclose(
            xg[:, gidx].transpose(1, 0, 2), fg.x, atol=1e-12
        )


def test_mapping_coeffs_roundtrip():
    """Mapping coefficients reproduce the equispaced cell nodes exactly."""
    from spectralelementmethod_tpu.basis import gll_basis_2d

    basis = gll_basis_2d(6)
    mesh = single_cell_mesh(6)
    disc = Discretization(mesh, basis)
    eq = basis.interpolate_on_grid_eq(disc.x_coeffs[0])
    cell_nodes = mesh.get_cell(0).nodes_lexicographic
    np.testing.assert_allclose(eq, cell_nodes, atol=1e-12)


def test_multi_geometry_rejected():
    from spectralelementmethod_tpu.mesh import Mesh, Quadrilateral

    mesh = Mesh(2)
    mesh.set_nodes(np.zeros((2, 16)))
    g1 = mesh.add_geometry(Quadrilateral(2, 2))
    g2 = mesh.add_geometry(Quadrilateral(3, 3))
    rid = mesh.new_region("r")
    mesh.add_cell(np.arange(4).reshape(2, 2), g1, rid)
    mesh.add_cell(np.arange(9).reshape(3, 3) + 4, g2, rid)
    with pytest.raises(NotImplementedError):
        Discretization(mesh, gll_basis_2d(1))


class TestGeometrySetupCache:
    """On-disk geometry-precompute cache (round-4 setup roofline): the
    setup-side twin of the compilation cache, keyed by mesh bytes +
    mapping basis (reference analogue: the precomputed basis tables,
    sem/basis_data.py:112-129)."""

    def _with_cache(self, tmp_path, fn):
        from spectralelementmethod_tpu import config

        old = config._SETUP_CACHE_DIR
        config._SETUP_CACHE_DIR = str(tmp_path)
        try:
            return fn()
        finally:
            config._SETUP_CACHE_DIR = old

    def test_round_trip_exact(self, tmp_path):
        mesh = rectangle_mesh(4, 3, 4)

        def run():
            d1 = Discretization(mesh, gll_basis_2d(4))
            d2 = Discretization(mesh, gll_basis_2d(4))
            for k in ("x_coeffs", "J", "detJ", "invJ"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(d1, k)),
                    np.asarray(getattr(d2, k)))
            # the second build is a cache hit (memmap-backed)
            assert isinstance(d2.detJ, np.memmap)
            return d2

        d2 = self._with_cache(tmp_path, run)
        # downstream consumers work off the memmap views
        assert abs(float(np.sum(d2.detJxW)) - 4.0) < 1e-12

    def test_different_order_misses(self, tmp_path):
        mesh = rectangle_mesh(3, 3, 4)

        def run():
            from spectralelementmethod_tpu.mesh import mesh_with_order

            Discretization(mesh, gll_basis_2d(4))
            d = Discretization(mesh_with_order(mesh, 2), gll_basis_2d(2))
            assert not isinstance(d.detJ, np.memmap) or \
                d.detJ.shape[1] == 3
            return True

        assert self._with_cache(tmp_path, run)

    def test_disabled_by_default(self):
        from spectralelementmethod_tpu import config

        if config._SETUP_CACHE_DIR is None:
            mesh = rectangle_mesh(3, 2, 3)
            d = Discretization(mesh, gll_basis_2d(3))
            assert not isinstance(d.detJ, np.memmap)


class TestAffineCacheFastPath:
    """Cache-backed affine meshes collapse laplacian_factors to
    a[e, c] * W (rank-1 fast path, round-5: skips the invJ mmap
    page-in that dominated warm 3D setup, BASELINE.md round-4c)."""

    def _with_cache(self, tmp_path, fn):
        from spectralelementmethod_tpu import config

        old = config._SETUP_CACHE_DIR
        config._SETUP_CACHE_DIR = str(tmp_path)
        try:
            return fn()
        finally:
            config._SETUP_CACHE_DIR = old

    def test_fast_path_matches_direct_2d(self, tmp_path):
        mesh = rectangle_mesh(5, 4, 4)

        def run():
            d1 = Discretization(mesh, gll_basis_2d(4))   # cold: saves
            assert d1._affine_a is None                  # in-memory path
            G_direct = d1.laplacian_factors(None)
            d2 = Discretization(mesh, gll_basis_2d(4))   # warm: mmap
            assert d2._affine_a is not None
            assert d2._affine_a.shape == (d2.E, 3)
            G_fast = d2.laplacian_factors(None)
            scale = np.abs(np.asarray(G_direct)).max()
            assert (np.abs(np.asarray(G_fast) - np.asarray(G_direct))
                    .max() <= 1e-12 * scale)
            # the fast path is EXACTLY rank-1: affine_factorization
            # must accept it
            from spectralelementmethod_tpu.ops import sumfac

            W = d2.basis.weight_grid().reshape(-1)
            _, exact = sumfac.affine_factorization(
                np.asarray(G_fast).reshape(d2.E, 3, -1), W)
            assert exact
            return True

        assert self._with_cache(tmp_path, run)

    def test_fast_path_matches_direct_3d(self, tmp_path):
        from spectralelementmethod_tpu.basis import gll_basis_3d
        from spectralelementmethod_tpu.mesh import box_mesh

        mesh = box_mesh(3, 2, 2, 3)

        def run():
            d1 = Discretization(mesh, gll_basis_3d(3))
            G_direct = d1.laplacian_factors(None)
            d2 = Discretization(mesh, gll_basis_3d(3))
            assert d2._affine_a is not None
            assert d2._affine_a.shape == (d2.E, 6)
            G_fast = d2.laplacian_factors(None)
            scale = np.abs(np.asarray(G_direct)).max()
            assert (np.abs(np.asarray(G_fast) - np.asarray(G_direct))
                    .max() <= 1e-12 * scale)
            return True

        assert self._with_cache(tmp_path, run)

    def test_curved_mesh_skips_fast_path(self, tmp_path):
        from spectralelementmethod_tpu.mesh import annulus_mesh

        mesh = annulus_mesh(4, 6, 5)

        def run():
            d1 = Discretization(mesh, gll_basis_2d(4))
            d2 = Discretization(mesh, gll_basis_2d(4))
            assert d2._affine_a is None          # curved: no artifact
            G1 = d1.laplacian_factors(None)
            G2 = d2.laplacian_factors(None)
            assert np.abs(np.asarray(G1) - np.asarray(G2)).max() == 0.0
            return True

        assert self._with_cache(tmp_path, run)

    def test_coefficient_bypasses_fast_path(self, tmp_path):
        mesh = rectangle_mesh(4, 3, 4)

        def run():
            d1 = Discretization(mesh, gll_basis_2d(4))
            c = np.ones((d1.E,) + tuple(d1.shape)) * 2.0
            G_direct = d1.laplacian_factors(c)
            d2 = Discretization(mesh, gll_basis_2d(4))
            G_coeff = d2.laplacian_factors(c)    # variable coefficient
            assert np.allclose(np.asarray(G_coeff),
                               np.asarray(G_direct), rtol=1e-13)
            return True

        assert self._with_cache(tmp_path, run)
