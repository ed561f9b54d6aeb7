"""Steady advection-diffusion model (GMRES path)."""

import jax.numpy as jnp
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


# ---------------------------------------------------------------------------
# Round-3 depth (VERDICT round-2 item 9): curved meshes, Péclet sweep,
# restart stress, Neumann data, batched solves — mirroring the Helmholtz
# test patterns (tests/test_helmholtz.py).


def test_curved_annulus_manufactured_solution():
    """Manufactured solution on the curved isoparametric half-annulus:
    u = x^2 + y^2, so f = -4 eps + 2 (cx x + cy y)."""
    from spectralelementmethod_tpu.mesh import annulus_mesh

    eps, cx, cy = 1.0, 0.7, -0.4
    mesh = annulus_mesh(order=8, n_theta=6, n_r=8, r_outer=4.0,
                        progression=1.2)
    disc = Discretization(mesh, gll_basis_2d(8))
    ue = lambda x, y: x**2 + y**2  # noqa: E731
    f = lambda x, y: -4.0 * eps + 2 * (cx * x + cy * y)  # noqa: E731

    ad = AdvectionDiffusion(disc, velocity=(cx, cy), diffusivity=eps,
                            forcing=f)
    for b in ("sphere", "shell", "symaxis"):
        ad.set_dirichlet(b, ue)
    sol = ad.solve(tol=1e-11)
    assert bool(sol.gmres.converged)
    assert ad.l2_error(sol.u, ue) < 1e-7


def test_variable_diffusivity_manufactured():
    """eps(x) = 1 + x^2/2: the variable-coefficient branch with an
    analytically expanded forcing."""
    disc = _disc(nx=4, p=6)
    cx, cy = 0.8, 0.3

    def eps(x, y):
        return 1.0 + 0.5 * x * x

    def ue(x, y):
        return np.sin(np.pi * (x + 1) / 2) * np.sin(np.pi * (y + 1) / 2)

    def f(x, y):
        a = np.pi / 2
        X, Y = a * (x + 1), a * (y + 1)
        u = np.sin(X) * np.sin(Y)
        ux = a * np.cos(X) * np.sin(Y)
        uy = a * np.sin(X) * np.cos(Y)
        uxx = -a * a * u
        uyy = -a * a * u
        eps_x = x
        return (-(eps_x * ux + eps(x, y) * (uxx + uyy))
                + cx * ux + cy * uy)

    ad = AdvectionDiffusion(disc, velocity=(cx, cy), diffusivity=eps,
                            forcing=f)
    ad.set_dirichlet("ebc", 0.0)
    ad.set_dirichlet("nbc", 0.0)
    sol = ad.solve(tol=1e-11)
    assert bool(sol.gmres.converged)
    assert ad.l2_error(sol.u, ue) < 1e-7


def test_peclet_sweep_gmres_robustness():
    """eps from 1 to 1e-2 at |c| ~ 1 (cell Péclet up to ~50): GMRES must
    converge across the sweep and keep spectral accuracy while the
    layers stay resolved."""
    def ue(x, y):
        return np.sin(np.pi * (x + 1) / 2) * np.sin(np.pi * (y + 1) / 2)

    cx, cy = 1.0, 0.5
    errs = {}
    for eps in (1.0, 0.1, 0.01):
        def f(x, y, eps=eps):
            a = np.pi / 2
            X, Y = a * (x + 1), a * (y + 1)
            lap = -2 * a * a * np.sin(X) * np.sin(Y)
            gx = a * np.cos(X) * np.sin(Y)
            gy = a * np.sin(X) * np.cos(Y)
            return -eps * lap + cx * gx + cy * gy

        disc = _disc(nx=5, p=6)
        ad = AdvectionDiffusion(disc, velocity=(cx, cy),
                                diffusivity=eps, forcing=f)
        ad.set_dirichlet("ebc", 0.0)
        ad.set_dirichlet("nbc", 0.0)
        sol = ad.solve(tol=1e-10, max_restarts=300)
        assert bool(sol.gmres.converged), f"eps={eps} did not converge"
        errs[eps] = ad.l2_error(sol.u, ue)
    # the manufactured solution is eps-independent and layer-free:
    # accuracy must not collapse as advection dominates
    assert errs[1.0] < 1e-8
    assert errs[0.01] < 1e-6


def test_restart_boundary_stress():
    """Tiny restart lengths force many Arnoldi cycles; every variant
    must reach the same solution (exercises the cycle-boundary
    bookkeeping: Givens state, residual carry, cycle freeze)."""
    disc = _disc(nx=4, p=5)
    f = lambda x, y: np.exp(-2 * (x**2 + y**2))  # noqa: E731

    def make():
        ad = AdvectionDiffusion(disc, velocity=(1.0, 0.5),
                                diffusivity=0.2, forcing=f)
        ad.set_dirichlet("ebc", 0.0)
        ad.set_dirichlet("nbc", 0.0)
        return ad

    ref = make().solve(tol=1e-11, restart=60, max_restarts=10)
    assert bool(ref.gmres.converged)
    for m in (3, 5, 17):
        sol = make().solve(tol=1e-11, restart=m, max_restarts=2000)
        assert bool(sol.gmres.converged), f"restart={m}"
        scale = np.abs(ref.u).max()
        assert np.abs(sol.u - ref.u).max() / scale < 1e-8, f"restart={m}"


def test_neumann_boundary_manufactured():
    """Inhomogeneous natural BC g = eps n.grad u on the east side."""
    from spectralelementmethod_tpu.mesh import rectangle_mesh as rect

    p, eps, cx, cy = 6, 0.7, 0.5, 0.25
    mesh = rect(4, 4, p, boundary_names={
        "west": "d", "south": "d", "north": "d", "east": "neu"})
    disc = Discretization(mesh, gll_basis_2d(p))

    def ue(x, y):
        return np.sin(np.pi * (x + 1) / 2) * np.sin(np.pi * (y + 1) / 2)

    def f(x, y):
        a = np.pi / 2
        X, Y = a * (x + 1), a * (y + 1)
        lap = -2 * a * a * np.sin(X) * np.sin(Y)
        gx = a * np.cos(X) * np.sin(Y)
        gy = a * np.sin(X) * np.cos(Y)
        return -eps * lap + cx * gx + cy * gy

    def g_neu(x, y):
        # east face: n = +e_x; g = eps du/dx at x = 1
        a = np.pi / 2
        return eps * a * np.cos(a * (x + 1)) * np.sin(a * (y + 1))

    ad = AdvectionDiffusion(disc, velocity=(cx, cy), diffusivity=eps,
                            forcing=f)
    ad.set_dirichlet("d", ue)
    ad.set_neumann("neu", g_neu)
    sol = ad.solve(tol=1e-11)
    assert bool(sol.gmres.converged)
    assert ad.l2_error(sol.u, ue) < 1e-7


def test_solve_batch_matches_sequential():
    disc = _disc(nx=4, p=4)
    forcings = [1.0,
                lambda x, y: np.sin(np.pi * x) * y,
                lambda x, y: np.exp(-x**2 - y**2)]

    def make():
        ad = AdvectionDiffusion(disc, velocity=(0.6, -0.3),
                                diffusivity=0.5, forcing=0.0)
        ad.set_dirichlet("ebc", 0.0)
        ad.set_dirichlet("nbc", 0.0)
        return ad

    batch = make().solve_batch(forcings, tol=1e-11)
    assert batch.u.shape[0] == 3
    assert bool(np.all(np.asarray(batch.gmres.converged)))
    ad = make()
    for j, f in enumerate(forcings):
        ad2 = AdvectionDiffusion(disc, velocity=(0.6, -0.3),
                                 diffusivity=0.5, forcing=f)
        ad2.set_dirichlet("ebc", 0.0)
        ad2.set_dirichlet("nbc", 0.0)
        sj = ad2.solve(tol=1e-11)
        scale = max(np.abs(sj.u).max(), 1e-30)
        assert np.abs(batch.u[j] - sj.u).max() / scale < 1e-8


def test_p_convergence_is_spectral():
    """Fixed 3x3 mesh, p = 2..8: error must fall by orders of magnitude
    (the hp-convergence pattern of tests/test_helmholtz.py)."""
    cx, cy, eps = 1.0, 0.5, 0.5

    def ue(x, y):
        return np.sin(np.pi * (x + 1) / 2) * np.sin(np.pi * (y + 1) / 2)

    def f(x, y):
        a = np.pi / 2
        X, Y = a * (x + 1), a * (y + 1)
        lap = -2 * a * a * np.sin(X) * np.sin(Y)
        gx = a * np.cos(X) * np.sin(Y)
        gy = a * np.sin(X) * np.cos(Y)
        return -eps * lap + cx * gx + cy * gy

    errs = []
    for p in (2, 4, 6, 8):
        disc = Discretization(rectangle_mesh(3, 3, p), gll_basis_2d(p))
        ad = AdvectionDiffusion(disc, velocity=(cx, cy),
                                diffusivity=eps, forcing=f)
        ad.set_dirichlet("ebc", 0.0)
        ad.set_dirichlet("nbc", 0.0)
        sol = ad.solve(tol=1e-12)
        errs.append(ad.l2_error(sol.u, ue))
    assert errs[1] < errs[0] * 1e-1
    assert errs[3] < errs[0] * 1e-5
    assert errs[3] < 1e-9


def test_rotating_flow_skew_advection():
    """Divergence-free rotation c = (y, -x): the advection term is
    skew-adjoint in the continuous problem; the solve stays stable and
    reproduces a manufactured solution."""
    disc = _disc(nx=4, p=6)
    eps = 0.5

    def ue(x, y):
        return np.sin(np.pi * (x + 1) / 2) * np.sin(np.pi * (y + 1) / 2)

    def f(x, y):
        a = np.pi / 2
        X, Y = a * (x + 1), a * (y + 1)
        lap = -2 * a * a * np.sin(X) * np.sin(Y)
        gx = a * np.cos(X) * np.sin(Y)
        gy = a * np.sin(X) * np.cos(Y)
        return -eps * lap + y * gx - x * gy

    ad = AdvectionDiffusion(
        disc, velocity=lambda x, y: (y, -x), diffusivity=eps, forcing=f)
    ad.set_dirichlet("ebc", 0.0)
    ad.set_dirichlet("nbc", 0.0)
    sol = ad.solve(tol=1e-11)
    assert bool(sol.gmres.converged)
    assert ad.l2_error(sol.u, ue) < 1e-7


def test_operator_reduces_to_laplacian_plus_advection():
    """Apply-level oracle: the assembled operator equals the Poisson
    weak Laplacian plus the collocated advection quadrature on a random
    field (no solve — direct operator identity)."""
    from spectralelementmethod_tpu.models.poisson import Poisson

    disc = _disc(nx=3, p=4)
    rng = np.random.RandomState(7)
    u = rng.standard_normal(disc.n_nodes)

    cx, cy = 0.9, -0.4
    ad = AdvectionDiffusion(disc, velocity=(cx, cy), diffusivity=1.0)
    ex, apply_raw = ad._build()
    uL = jnp.asarray(ex.local_from_global(u))
    # DSS-summed L-vector -> global (duplicate slots hold equal values)
    AuL = np.asarray(apply_raw(uL))
    Au = np.zeros(disc.n_nodes)
    Au[np.asarray(ex.gather_hier).ravel()] = AuL.ravel()

    po = Poisson(disc)
    lap = np.asarray(po.apply_operator(u))

    # collocated advection quadrature, global assembly (host reference)
    ue = disc.gather(u)
    from spectralelementmethod_tpu.basis.tensor import apply_matrices
    D0 = np.asarray(disc.basis.subbases[0].D1)
    D1 = np.asarray(disc.basis.subbases[1].D1)
    du0 = apply_matrices([D0, None], ue, 2)
    du1 = apply_matrices([None, D1], ue, 2)
    gi = disc.invJ
    gradx = gi[:, 0, 0] * du0 + gi[:, 1, 0] * du1
    grady = gi[:, 0, 1] * du0 + gi[:, 1, 1] * du1
    adv = disc.scatter_add((cx * gradx + cy * grady) * disc.detJxW)

    np.testing.assert_allclose(Au, lap + adv, atol=1e-9 * max(
        1.0, np.abs(lap).max()))
