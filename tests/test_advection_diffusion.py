"""Steady advection-diffusion model (GMRES path)."""

import numpy as np

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.models.advection_diffusion import (
    AdvectionDiffusion)


def _disc(nx=4, p=5):
    return Discretization(rectangle_mesh(nx, nx, p), gll_basis_2d(p))


def test_reduces_to_poisson_when_velocity_zero():
    from spectralelementmethod_tpu.models.poisson import Poisson

    disc = _disc()
    ue = lambda x, y: np.sin(np.pi * (x + 1) / 2) * np.sin(  # noqa: E731
        np.pi * (y + 1) / 2)
    f = lambda x, y: np.pi**2 / 2 * ue(x, y)  # noqa: E731

    ad = AdvectionDiffusion(disc, velocity=(0.0, 0.0), forcing=f)
    ad.set_dirichlet("ebc", 0.0)
    ad.set_dirichlet("nbc", 0.0)
    sol = ad.solve(tol=1e-11)
    assert bool(sol.gmres.converged)

    po = Poisson(disc, forcing=f)
    po.set_dirichlet("ebc", 0.0)
    po.set_dirichlet("nbc", 0.0)
    su = po.solve_local(tol=1e-12)
    np.testing.assert_allclose(sol.u, su.u, atol=1e-8)


def test_manufactured_solution_with_advection():
    """-eps Lap u + c . grad u = f with u = sin(pi X) sin(pi Y),
    X = (x+1)/2, Y = (y+1)/2, eps = 0.5, c = (1, 0.5)."""
    disc = _disc(nx=5, p=6)
    eps, cx, cy = 0.5, 1.0, 0.5

    def ue(x, y):
        return np.sin(np.pi * (x + 1) / 2) * np.sin(np.pi * (y + 1) / 2)

    def f(x, y):
        X, Y = np.pi * (x + 1) / 2, np.pi * (y + 1) / 2
        lap = -2 * (np.pi / 2) ** 2 * np.sin(X) * np.sin(Y)
        gx = (np.pi / 2) * np.cos(X) * np.sin(Y)
        gy = (np.pi / 2) * np.sin(X) * np.cos(Y)
        return -eps * lap + cx * gx + cy * gy

    ad = AdvectionDiffusion(disc, velocity=(cx, cy), diffusivity=eps,
                            forcing=f)
    ad.set_dirichlet("ebc", 0.0)
    ad.set_dirichlet("nbc", 0.0)
    sol = ad.solve(tol=1e-11)
    assert bool(sol.gmres.converged)
    err = ad.l2_error(sol.u, ue)
    assert err < 1e-8, err


def test_variable_velocity_field():
    disc = _disc(nx=4, p=4)
    ad = AdvectionDiffusion(
        disc,
        velocity=lambda x, y: (np.ones_like(x) * y, -np.ones_like(y) * x),
        diffusivity=1.0,
        forcing=1.0,
    )
    ad.set_dirichlet("ebc", 0.0)
    ad.set_dirichlet("nbc", 0.0)
    sol = ad.solve(tol=1e-9)
    assert bool(sol.gmres.converged)
    assert np.all(np.isfinite(sol.u))
