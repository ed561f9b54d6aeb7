"""Point-location and arbitrary-point interpolation tests."""

import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core import pointlocate as pl
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import annulus_mesh, rectangle_mesh
from spectralelementmethod_tpu.solver.rootfind import (
    SolverFailure,
    newton,
    secant,
)


class TestRootfind:
    def test_newton_vector(self):
        # solve x^2 + y^2 = 2, x - y = 0  -> (1, 1)
        def f(x):
            return np.array([x[0] ** 2 + x[1] ** 2 - 2, x[0] - x[1]])

        def jac(x):
            return np.array([[2 * x[0], 2 * x[1]], [1.0, -1.0]])

        root = newton(f, np.array([2.0, 0.5]), jac, it_max=50, tol=1e-14)
        np.testing.assert_allclose(root, [1.0, 1.0], atol=1e-12)

    def test_newton_failure(self):
        # classic Newton 2-cycle of x^3 - 2x + 2 from x0 = 0 (0 -> 1 -> 0)
        with pytest.raises(SolverFailure):
            newton(lambda x: np.array([x[0] ** 3 - 2 * x[0] + 2]),
                   np.array([0.0]),
                   lambda x: np.array([[3 * x[0] ** 2 - 2]]),
                   it_max=8, tol=1e-14)

    def test_secant(self):
        root, hist = secant(lambda x: x**2 - 2, 1.0, 2.0, it_max=20,
                            tol=1e-12)
        assert abs(root - np.sqrt(2)) < 1e-10
        assert len(hist) >= 3


@pytest.fixture(scope="module")
def disc():
    mesh = rectangle_mesh(3, 3, 4, x0=(0, 0), x1=(3, 3))
    return Discretization(mesh, gll_basis_2d(4))


class TestInverseMap:
    def test_roundtrip(self, disc):
        rng = np.random.RandomState(0)
        for e in (0, 4, 8):
            xi = 2 * rng.random_sample(2) - 1
            x = pl.forward_map(disc, e, xi)
            xi_back = pl.inverse_map(disc, e, x)
            np.testing.assert_allclose(xi_back, xi, atol=1e-7)

    def test_outside_raises(self, disc):
        with pytest.raises(pl.OutsideDomain):
            pl.inverse_map(disc, 0, [2.5, 2.5])  # inside cell 8, not cell 0

    def test_find_element(self, disc):
        e, xi = pl.find_element_containing_point(disc, [0.5, 0.5])
        assert e == 0
        e, xi = pl.find_element_containing_point(disc, [2.5, 2.5])
        assert e == 8
        with pytest.raises(pl.OutsideDomain):
            pl.find_element_containing_point(disc, [5.0, 5.0])

    def test_point_on_element_boundary(self, disc):
        e, xi = pl.find_element_containing_point(disc, [1.0, 1.0])
        assert e in (0, 1, 3, 4)


class TestInterpolate:
    def test_polynomial_exact(self, disc):
        xg = disc.global_gll_coords()
        u = xg[0] ** 3 - 2 * xg[1] ** 2
        pts = np.array([[0.3, 0.7], [1.5, 2.9], [2.2, 0.1]])
        vals = pl.interpolate(disc, u, pts)
        exact = pts[:, 0] ** 3 - 2 * pts[:, 1] ** 2
        np.testing.assert_allclose(vals, exact, atol=1e-10)

    def test_single_point_and_rank(self, disc):
        xg = disc.global_gll_coords()
        u = np.stack([xg[0], xg[1]])  # vector field (2, n_nodes)
        val = pl.interpolate(disc, u, [1.25, 2.5])
        np.testing.assert_allclose(val, [1.25, 2.5], atol=1e-10)

    def test_curved_mesh(self):
        mesh = annulus_mesh(order=6, n_theta=6, n_r=5, r_outer=4.0,
                            progression=1.2)
        disc = Discretization(mesh, gll_basis_2d(6))
        xg = disc.global_gll_coords()
        u = xg[0] * xg[1]
        pts = np.array([[1.3, 1.1], [0.2, -2.0], [2.5, 0.5]])
        vals = pl.interpolate(disc, u, pts)
        # accuracy limited by the inverse-map Newton tol (1e-8 on the
        # parametric step, as in the reference: sem/mapping.py:172)
        np.testing.assert_allclose(vals, pts[:, 0] * pts[:, 1], atol=1e-6)


def test_interpolate_3d_box():
    """3D point location + interpolation (generic-ndim Newton path;
    the native fast path is 2D-only and falls back)."""
    from spectralelementmethod_tpu.basis import gll_basis_3d
    from spectralelementmethod_tpu.mesh import box_mesh

    mesh = box_mesh(2, 2, 2, 4, x0=(0, 0, 0), x1=(2, 2, 2))
    disc = Discretization(mesh, gll_basis_3d(4))
    x, y, z = disc.global_gll_coords()
    u = x**2 * y + z                      # in the p=4 space
    pts = np.array([[0.37, 1.21, 0.63], [1.9, 0.11, 1.73],
                    [1.0, 1.0, 1.0]])     # incl. a cell-corner point
    vals = np.asarray(pl.interpolate(disc, u, pts))
    exact = pts[:, 0] ** 2 * pts[:, 1] + pts[:, 2]
    np.testing.assert_allclose(vals, exact, atol=1e-12)
