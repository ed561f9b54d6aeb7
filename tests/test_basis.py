"""Basis-layer tests: identity Vandermonde, analytic round-trips, spectral
differentiation, grid resampling, tensor products.

Rebuilds the reference's (stale) test strategy on the current API
(reference ``tests/test_basis.py``; SURVEY.md §4), plus sharper oracles.
"""

import numpy as np
import pytest

from spectralelementmethod_tpu.basis import (
    LagrangeGaussLobatto,
    TensorProductQS,
    gll_basis_2d,
)


def scalar_func1d(x):
    return np.sin(np.pi * x)


def scalar_func1d_deriv(x):
    return np.pi * np.cos(np.pi * x)


def vector_valued_func1d(x):
    return np.stack([scalar_func1d(x), scalar_func1d(x - 1)])


def vector_valued_func1d_deriv(x):
    return np.stack([scalar_func1d_deriv(x), scalar_func1d_deriv(x - 1)])


class TestLagrangeGaussLobatto:
    basis = LagrangeGaussLobatto(9)

    def test_kronecker_delta_property(self):
        """Basis evaluated at its own nodes is the identity matrix
        (reference tests/test_basis.py:60-66; TODO noted at
        sem/basis_functions.py:242)."""
        B = self.basis(self.basis.nodes)
        np.testing.assert_array_equal(B, np.eye(self.basis.n_coeffs))

    def test_near_node_stability(self):
        """Barycentric form is stable for x within eps of a node."""
        x = self.basis.nodes[3] + 1e-15
        B = self.basis(np.array([x]))
        assert np.all(np.isfinite(B))
        assert abs(B[0, 3] - 1.0) < 1e-10

    def test_interpolation(self):
        xx = np.linspace(-1, 1, 50)
        coeffs = scalar_func1d(self.basis.nodes)
        yy = self.basis.interpolate(coeffs, xx)
        np.testing.assert_allclose(yy, scalar_func1d(xx), rtol=1e-2, atol=1e-4)

    def test_interpolation_vector(self):
        xx = np.linspace(-1, 1, 50)
        coeffs = vector_valued_func1d(self.basis.nodes)
        yy = self.basis.interpolate(coeffs, xx)
        assert yy.shape == (2, 50)
        np.testing.assert_allclose(
            yy, vector_valued_func1d(xx), rtol=1e-2, atol=1e-4
        )

    def test_interpolation_hits_nodes_exactly(self):
        coeffs = np.arange(self.basis.n_nodes, dtype=float)
        vals = self.basis.interpolate(coeffs, self.basis.nodes)
        np.testing.assert_array_equal(vals, coeffs)

    def test_differentiation(self):
        coeffs = scalar_func1d(self.basis.nodes)
        dy = self.basis.deriv(coeffs)
        np.testing.assert_allclose(
            dy, scalar_func1d_deriv(self.basis.nodes), rtol=1e-2, atol=1e-4
        )

    def test_differentiation_exact_for_polynomials(self):
        """D1 differentiates polynomials of the basis degree exactly."""
        x = self.basis.nodes
        p = x**9 - 3 * x**4 + 2 * x
        dp = 9 * x**8 - 12 * x**3 + 2
        np.testing.assert_allclose(self.basis.deriv(p), dp, rtol=1e-11)

    def test_d1_rows_sum_to_zero(self):
        np.testing.assert_allclose(
            self.basis.D1.sum(axis=1), 0.0, atol=1e-12
        )

    def test_integration(self):
        coeffs = self.basis.nodes + 1.0
        assert abs(self.basis.integrate(coeffs) - 2.0) < 1e-14

    def test_eq_grid_roundtrip(self):
        coeffs = scalar_func1d(self.basis.nodes)
        eq_vals = self.basis.interpolate_on_grid_eq(coeffs)
        back = self.basis.compute_coeffs_grid_eq(eq_vals)
        np.testing.assert_allclose(back, coeffs, atol=1e-12)


def scalar_func2d(x, on_grid=False):
    if on_grid:
        x = np.meshgrid(*x, indexing="ij", sparse=True)
    return x[0] * x[1]


def vector_func2d(x, on_grid=False):
    if on_grid:
        xg = np.meshgrid(*x, indexing="ij", sparse=True)
        return np.stack(np.broadcast_arrays(xg[0] * xg[1], xg[0] + xg[1]))
    return np.stack([x[0] * x[1], x[0] + x[1]])


class TestTensorProductQS:
    basis = gll_basis_2d(5, 6)  # anisotropic, as the reference tests use

    def setup_method(self):
        self.quad_grid = [sb.nodes for sb in self.basis.subbases]
        self.support_grid = [
            np.linspace(-1, 1, len(g)) for g in self.quad_grid
        ]

    def test_kronecker_delta_property(self):
        grid = np.meshgrid(*self.quad_grid, indexing="ij", sparse=True)
        V = self.basis.vandermonde_matrix(grid)
        np.testing.assert_allclose(V, np.eye(self.basis.n_coeffs), atol=1e-15)

    def test_interpolation_random_points(self):
        rng = np.random.RandomState(0)
        x = 2 * rng.random_sample((2, 50)) - 1
        coeffs = vector_func2d(self.quad_grid, True)
        y = self.basis.interpolate(coeffs, x)
        np.testing.assert_allclose(y, vector_func2d(x), atol=1e-13)

    def test_interpolation_on_grid(self):
        fine = [np.linspace(-1, 1, 50), np.linspace(-1, 1, 49)]
        for func in (scalar_func2d, vector_func2d):
            coeffs = func(self.quad_grid, on_grid=True)
            y = self.basis.interpolate_on_grid(coeffs, fine)
            np.testing.assert_allclose(y, func(fine, on_grid=True), atol=1e-13)

    def test_coeff_computation(self):
        for func in (scalar_func2d, vector_func2d):
            coeffs = func(self.quad_grid, on_grid=True)
            support_vals = func(self.support_grid, on_grid=True)
            computed = self.basis.compute_coeffs_grid(
                support_vals, self.support_grid
            )
            np.testing.assert_allclose(computed, coeffs, atol=1e-12)

    def test_eq_grid_roundtrip(self):
        coeffs = vector_func2d(self.quad_grid, on_grid=True)
        eq_vals = self.basis.interpolate_on_grid_eq(coeffs)
        support_vals = vector_func2d(self.support_grid, on_grid=True)
        np.testing.assert_allclose(eq_vals, support_vals, atol=1e-12)
        back = self.basis.compute_coeffs_grid_eq(eq_vals)
        np.testing.assert_allclose(back, coeffs, atol=1e-12)

    def test_gradient_exact_for_polynomials(self):
        xg = np.meshgrid(*self.quad_grid, indexing="ij", sparse=True)
        f = xg[0] ** 3 * xg[1] ** 2
        dfdx = 3 * xg[0] ** 2 * xg[1] ** 2
        dfdy = 2 * xg[0] ** 3 * xg[1]
        grad = self.basis.gradient(f)
        np.testing.assert_allclose(grad[0], np.broadcast_to(dfdx, f.shape),
                                   atol=1e-12)
        np.testing.assert_allclose(grad[1], np.broadcast_to(dfdy, f.shape),
                                   atol=1e-12)

    def test_integration(self):
        xg = np.meshgrid(*self.quad_grid, indexing="ij", sparse=True)
        # integral of (x^2 y^2 + 1) over [-1,1]^2 = 4/9 + 4
        f = xg[0] ** 2 * xg[1] ** 2 + 1.0
        val = self.basis.integrate(np.broadcast_to(f, self.basis.coeff_shape))
        assert abs(val - (4 / 9 + 4)) < 1e-13

    def test_get_subbasis(self):
        # face normal to dim 0 -> tangential factor is subbasis 1
        assert self.basis.get_subbasis(0) is self.basis.subbases[1]
        assert self.basis.get_subbasis(1) is self.basis.subbases[0]

    def test_deriv_shapes(self):
        coeffs = np.zeros((3, 4) + self.basis.coeff_shape)
        for d in range(2):
            out = self.basis.deriv(coeffs, d)
            assert out.shape == coeffs.shape


def test_aliases():
    """Reference names resolve (tests/test_basis.py:54,110 of the reference)."""
    from spectralelementmethod_tpu.basis import (
        LagrangeAtGaussLobatto,
        TensorProductSupported,
    )

    assert LagrangeAtGaussLobatto is LagrangeGaussLobatto
    assert TensorProductSupported is TensorProductQS


@pytest.mark.parametrize("order", [12, 16, 20])
def test_high_order_basis(order):
    """Orders past the reference's cap of 10 (sem/basis_functions.py:366-369)."""
    b = LagrangeGaussLobatto(order)
    x = b.nodes
    p = x**order
    dp = order * x ** (order - 1)
    np.testing.assert_allclose(b.deriv(p), dp, rtol=1e-9, atol=1e-10)
