"""Variable-coefficient Helmholtz tests (BASELINE config 3)."""

import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import annulus_mesh, rectangle_mesh
from spectralelementmethod_tpu.models.helmholtz import Helmholtz


def all_dirichlet_rect(nx, ny, p):
    mesh = rectangle_mesh(nx, ny, p, boundary_names={
        "west": "d", "east": "d", "south": "d", "north": "d"})
    return Discretization(mesh, gll_basis_2d(p))


class TestReactionDiffusion:
    def test_constant_reaction_manufactured(self):
        """-lap u + 4 u = f with u = sin(pi x) sin(pi y)."""
        exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)  # noqa
        f = lambda x, y: (2 * np.pi**2 + 4.0) * exact(x, y)  # noqa: E731
        disc = all_dirichlet_rect(3, 3, 8)
        prob = Helmholtz(disc, forcing=f, reaction=4.0)
        prob.set_dirichlet("d", 0.0)
        sol = prob.solve(tol=1e-13, host_loop=True)
        assert prob.l2_error(sol.u, exact) < 1e-8

    def test_variable_coefficient_and_reaction(self):
        """-div(c grad u) + k u = f with c = 2 + sin(xy), k = 1 + x^2,
        u = cos(x) sinh(y/2) (manufactured f via symbolic derivatives)."""
        c = lambda x, y: 2.0 + np.sin(x * y)  # noqa: E731
        k = lambda x, y: 1.0 + x**2  # noqa: E731
        u = lambda x, y: np.cos(x) * np.sinh(y / 2)  # noqa: E731

        def f(x, y):
            ux = -np.sin(x) * np.sinh(y / 2)
            uy = np.cos(x) * np.cosh(y / 2) / 2
            uxx = -np.cos(x) * np.sinh(y / 2)
            uyy = np.cos(x) * np.sinh(y / 2) / 4
            cx = y * np.cos(x * y)
            cy = x * np.cos(x * y)
            return -(cx * ux + cy * uy + c(x, y) * (uxx + uyy)) \
                + k(x, y) * u(x, y)

        disc = all_dirichlet_rect(3, 3, 8)
        prob = Helmholtz(disc, forcing=f, coefficient=c, reaction=k)
        prob.set_dirichlet("d", u)
        sol = prob.solve(tol=1e-13, host_loop=True)
        assert prob.l2_error(sol.u, u) < 1e-8

    def test_reduces_to_poisson(self):
        """reaction = 0 -> identical operator to the Poisson model."""
        from spectralelementmethod_tpu.models.poisson import Poisson

        disc = all_dirichlet_rect(2, 3, 5)
        h = Helmholtz(disc, forcing=1.0)
        p = Poisson(disc, forcing=1.0)
        rng = np.random.RandomState(0)
        v = rng.randn(disc.n_nodes)
        np.testing.assert_allclose(
            np.asarray(h.apply_operator(v)),
            np.asarray(p.apply_operator(v)),
            atol=1e-11,
        )


class TestCurvedHelmholtz:
    def test_curved_isoparametric_manufactured(self):
        """BASELINE config 3: variable-coefficient Helmholtz on the curved
        annulus with exact isoparametric boundaries."""
        c = lambda x, y: 1.0 + 0.1 * (x**2 + y**2) ** 0.5  # noqa: E731
        k = lambda x, y: 2.0 + x**2  # noqa: E731
        u = lambda x, y: np.exp(-((x - 1.5) ** 2 + y**2))  # noqa: E731

        def f(x, y):
            r = np.sqrt(x**2 + y**2)
            ux = -2 * (x - 1.5) * u(x, y)
            uy = -2 * y * u(x, y)
            uxx = (-2 + 4 * (x - 1.5) ** 2) * u(x, y)
            uyy = (-2 + 4 * y**2) * u(x, y)
            cx = 0.1 * x / r
            cy = 0.1 * y / r
            return -(cx * ux + cy * uy + c(x, y) * (uxx + uyy)) \
                + k(x, y) * u(x, y)

        mesh = annulus_mesh(order=10, n_theta=8, n_r=6, r_outer=6.0,
                            progression=1.2)
        disc = Discretization(mesh, gll_basis_2d(10))
        prob = Helmholtz(disc, forcing=f, coefficient=c, reaction=k)
        prob.set_dirichlet("sphere", u)
        prob.set_dirichlet("shell", u)
        # symaxis faces: outward normal (-1, 0); the natural BC of
        # -div(c grad u) is g = c * n.grad u = c * (-ux)
        prob.set_neumann(
            "symaxis", lambda x, y: c(x, y) * 2 * (x - 1.5) * u(x, y)
        )
        sol = prob.solve(tol=1e-13, host_loop=True)
        assert prob.l2_error(sol.u, u) < 2e-6

    def test_mild_indefinite_shift(self):
        """Mildly indefinite Helmholtz (k < 0 below the first eigenvalue)
        still solves with CG + Jacobi."""
        exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)  # noqa
        kk = -1.0  # first Dirichlet eigenvalue of -lap on [-1,1]^2 is pi^2/2
        f = lambda x, y: (2 * np.pi**2 + kk) * exact(x, y)  # noqa: E731
        disc = all_dirichlet_rect(3, 3, 6)
        prob = Helmholtz(disc, forcing=f, reaction=kk)
        prob.set_dirichlet("d", 0.0)
        sol = prob.solve(tol=1e-12, host_loop=True, max_iter=4000)
        assert prob.l2_error(sol.u, exact) < 1e-6


class TestSolveLocal:
    """L-vector (production TPU) Helmholtz path == the global-vector
    solve; fused-interpret backend exercises the general kernel with the
    composed reaction term."""

    def _curved_problem(self):
        c = lambda x, y: 1.0 + 0.1 * (x**2 + y**2) ** 0.5  # noqa: E731
        k = lambda x, y: 2.0 + x**2  # noqa: E731
        mesh = annulus_mesh(order=4, n_theta=8, n_r=16, r_outer=10.0,
                            progression=1.2)
        disc = Discretization(mesh, gll_basis_2d(4))
        prob = Helmholtz(disc, forcing=1.0, coefficient=c, reaction=k)
        prob.set_dirichlet("sphere", 0.0)
        prob.set_dirichlet("shell", 0.0)
        return prob

    def test_matches_global_solve(self):
        prob = self._curved_problem()
        sol_g = prob.solve(tol=1e-12)
        sol_l = prob.solve_local(tol=1e-12)
        assert bool(sol_l.cg.converged)
        np.testing.assert_allclose(sol_l.u, sol_g.u, atol=1e-9)

    def test_manufactured_rect(self):
        exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)  # noqa
        f = lambda x, y: (2 * np.pi**2 + 4.0) * exact(x, y)  # noqa: E731
        disc = all_dirichlet_rect(3, 3, 8)
        prob = Helmholtz(disc, forcing=f, reaction=4.0)
        prob.set_dirichlet("d", 0.0)
        sol = prob.solve_local(tol=1e-13)
        assert prob.l2_error(sol.u, exact) < 1e-8

    def test_fused_interpret_backend(self):
        """backend='fused-interpret' drives the general fused kernel for
        the Laplacian part (f32), reaction composed outside."""
        c = lambda x, y: 1.0 + 0.25 * x * x * y * y  # noqa: E731
        mesh = rectangle_mesh(16, 8, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Helmholtz(disc, forcing=1.0, coefficient=c, reaction=2.0,
                         dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        sol_x = prob.solve_local(tol=1e-5, backend="xla")
        prob2 = Helmholtz(disc, forcing=1.0, coefficient=c, reaction=2.0,
                          dtype=np.float32)
        prob2.set_dirichlet("ebc", 0.0)
        sol_f = prob2.solve_local(tol=1e-5, backend="fused-interpret",
                                  structure="general")
        assert bool(sol_f.cg.converged)
        scale = max(np.abs(sol_x.u).max(), 1e-30)
        assert np.abs(sol_f.u - sol_x.u).max() / scale < 1e-4


class TestSolveLocalBatch:
    def test_matches_individual_solves(self):
        c = lambda x, y: 1.0 + 0.25 * x * x * y * y  # noqa: E731
        disc = all_dirichlet_rect(3, 3, 5)
        fs = [1.0, lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)]
        prob = Helmholtz(disc, forcing=fs[0], coefficient=c, reaction=2.0)
        prob.set_dirichlet("d", 0.0)
        sol_b = prob.solve_local_batch(fs, tol=1e-11)
        assert bool(np.asarray(sol_b.cg.converged).all())
        for j, f in enumerate(fs):
            pj = Helmholtz(disc, forcing=f, coefficient=c, reaction=2.0)
            pj.set_dirichlet("d", 0.0)
            sol_j = pj.solve_local(tol=1e-11)
            np.testing.assert_allclose(sol_b.u[j], sol_j.u, atol=1e-8)

    def test_nodal_forcing_array(self):
        disc = all_dirichlet_rect(2, 2, 4)
        prob = Helmholtz(disc, reaction=1.0)
        prob.set_dirichlet("d", 0.0)
        F = np.stack([np.ones(disc.n_nodes), 3.0 * np.ones(disc.n_nodes)])
        sol = prob.solve_local_batch(F, tol=1e-11)
        np.testing.assert_allclose(sol.u[1], 3 * sol.u[0], atol=1e-9)


class TestBoundaryFluxCoefficient:
    def test_flux_includes_coefficient(self):
        """Helmholtz.boundary_flux must report the flux of (c grad u),
        not grad u (ADVICE round-3: Helmholtz.__init__ didn't set
        _coeff_vals, so a non-unit coefficient was silently dropped)."""
        mesh = rectangle_mesh(3, 3, 3, x0=(0, 0), x1=(1, 1),
                              boundary_names={"west": "b", "east": "b",
                                              "south": "b", "north": "b"})
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Helmholtz(disc, coefficient=3.0, reaction=1.0)
        x = disc.global_gll_coords()
        u = x[0] ** 2 * x[1] + x[1] ** 3      # div(3 grad u) = 3(2y + 6y)
        flux = prob.boundary_flux(u, "b")
        np.testing.assert_allclose(flux, 12.0, rtol=1e-11)

    def test_unit_coefficient_skips_scaling(self):
        disc = all_dirichlet_rect(3, 3, 3)
        prob = Helmholtz(disc, coefficient=1.0)
        assert prob._coeff_vals is None
