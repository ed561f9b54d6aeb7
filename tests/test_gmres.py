"""Restarted GMRES: nonsymmetric systems, preconditioning, L-vector dots."""

import jax.numpy as jnp
import numpy as np

from spectralelementmethod_tpu.solver.gmres import gmres


def _random_system(n, seed=0, diag_shift=4.0):
    rng = np.random.RandomState(seed)
    Amat = rng.standard_normal((n, n)) / np.sqrt(n)
    Amat += diag_shift * np.eye(n)          # well-conditioned, nonsymmetric
    b = rng.standard_normal(n)
    return Amat, b


def test_gmres_matches_dense_solve():
    Amat, b = _random_system(60)
    A = lambda x: jnp.asarray(Amat) @ x  # noqa: E731
    res = gmres(A, jnp.asarray(b), tol=1e-12, restart=30)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(Amat, b), atol=1e-8
    )


def test_gmres_restart_cycles():
    """Convergence needing several restarts (restart < n)."""
    Amat, b = _random_system(80, seed=1)
    A = lambda x: jnp.asarray(Amat) @ x  # noqa: E731
    res = gmres(A, jnp.asarray(b), tol=1e-10, restart=10, max_restarts=40)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(Amat, b), atol=1e-6
    )


def test_gmres_preconditioned():
    Amat, b = _random_system(60, seed=2)
    dinv = 1.0 / np.diag(Amat)
    M = lambda r: jnp.asarray(dinv) * r  # noqa: E731
    A = lambda x: jnp.asarray(Amat) @ x  # noqa: E731
    res = gmres(A, jnp.asarray(b), M=M, tol=1e-11, restart=30)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(Amat, b), atol=1e-7
    )


def test_gmres_advection_diffusion_operator():
    """Matrix-free nonsymmetric operator: SEM diffusion + advection.

    -eps Lap(u) + c . grad(u) weak form on L-vectors; GMRES converges
    where CG would not (nonsymmetric), cross-checked against the dense
    assembled matrix.
    """
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange

    p = 3
    disc = Discretization(rectangle_mesh(3, 3, p), gll_basis_2d(p))
    prob = Poisson(disc)
    prob.set_dirichlet("ebc", 0.0)
    prob.set_dirichlet("nbc", 0.0)
    ex = make_exchange(disc)
    Gf = prob._G.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    free = jnp.asarray((~prob._dirichlet_mask)[ex.gather_hier])
    lap = sumfac.make_local_laplacian_operator(ex, Gf, Dhat, None)

    # advection c.grad weighted by detJxW (collocated), c = (1, 0.5)
    invJ = np.asarray(disc.invJ).reshape(disc.E, 2, 2, -1)
    w2d = np.asarray(disc.detJxW).reshape(disc.E, -1)
    Dhat_h = jnp.asarray(Dhat[:, ex.hier])
    n = disc.n_loc
    cx, cy = 1.0, 0.5
    gx = jnp.asarray((cx * invJ[:, 0, 0] + cy * invJ[:, 0, 1]) * w2d)
    gy = jnp.asarray((cx * invJ[:, 1, 0] + cy * invJ[:, 1, 1]) * w2d)
    # grads/advection values are produced on the LEX grid; reorder the
    # columns into the L-vector's local order before the DSS
    hier_d = jnp.asarray(np.asarray(ex.hier))

    def A(uL):
        uL = jnp.where(free, uL, 0.0)
        grads = jnp.einsum("en,mn->em", uL, Dhat_h, precision="highest")
        adv = gx * grads[:, :n] + gy * grads[:, n:]     # (E, n) lex
        v = lap(uL) + ex.dss(adv[:, hier_d])
        return jnp.where(free, v, 0.0)

    rng = np.random.RandomState(3)
    bL = ex.dss(jnp.asarray(
        rng.standard_normal((ex.E, ex.n_loc))))
    bL = jnp.where(free, bL, 0.0)

    res = gmres(A, bL, tol=1e-9, restart=40, max_restarts=30, dot=ex.dot)
    assert bool(res.converged)
    # verify by residual: ||A x - b|| small
    rfinal = np.asarray(A(res.x) - bL)
    assert np.abs(rfinal).max() < 1e-6 * max(np.abs(np.asarray(bL)).max(), 1)


def test_batched_cycles_match_sequential():
    """_gmres_cycles(k) == k sequential _gmres_cycle calls + early freeze."""
    import jax.numpy as jnp
    from spectralelementmethod_tpu.solver.gmres import (
        _euclidean_dot, _gmres_cycle, _gmres_cycles)
    from spectralelementmethod_tpu.utils.hoist import hoist_closure

    rng = np.random.RandomState(0)
    n = 60
    Amat = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)

    def A(v, Ac):
        return Ac @ v

    def M(r):
        return r

    A_c = (jnp.asarray(Amat),)
    bd = jnp.asarray(b)
    stop = jnp.asarray(1e-10 * np.linalg.norm(b))
    m = 10
    M_p, M_c = hoist_closure(M, bd)
    cycle = _gmres_cycle(A, M_p, _euclidean_dot, m)
    cycles = _gmres_cycles(A, M_p, _euclidean_dot, m)

    x_seq = jnp.zeros_like(bd)
    its_seq = 0
    for _ in range(4):
        x_seq, rn_seq, k = cycle(x_seq, bd, stop, A_c, tuple(M_c), ())
        its_seq += int(k)
        if bool(rn_seq <= stop):
            break
    x_bat, rn_bat, its_bat, done = cycles(4, jnp.zeros_like(bd), bd, stop,
                                          A_c, tuple(M_c), ())
    np.testing.assert_allclose(np.asarray(x_bat), np.asarray(x_seq),
                               rtol=1e-10, atol=1e-12)
    assert int(its_bat) == its_seq
    assert bool(done) == bool(rn_seq <= stop)


class TestGMRESBatched:
    def test_matches_per_rhs(self):
        from spectralelementmethod_tpu.solver.gmres import gmres_batched

        rng = np.random.RandomState(5)
        n, k = 30, 3
        A_np = rng.randn(n, n) + n * np.eye(n)    # nonsymmetric, well-posed
        A_d = jnp.asarray(A_np)
        B = jnp.asarray(rng.randn(k, n))

        def A(v):
            return A_d @ v

        res_b = gmres_batched(A, B, tol=1e-11, restart=15,
                              max_restarts=30)
        assert bool(np.asarray(res_b.converged).all())
        for j in range(k):
            res_j = gmres(A, B[j], tol=1e-11, restart=15, max_restarts=30)
            np.testing.assert_allclose(np.asarray(res_b.x[j]),
                                       np.asarray(res_j.x),
                                       rtol=0, atol=1e-9)
            x_ref = np.linalg.solve(A_np, np.asarray(B[j]))
            np.testing.assert_allclose(np.asarray(res_b.x[j]), x_ref,
                                       atol=1e-8)

    def test_advection_diffusion_batch(self):
        from spectralelementmethod_tpu.basis import gll_basis_2d
        from spectralelementmethod_tpu.core.discretization import (
            Discretization)
        from spectralelementmethod_tpu.mesh import rectangle_mesh
        from spectralelementmethod_tpu.models.advection_diffusion import (
            AdvectionDiffusion)

        mesh = rectangle_mesh(3, 3, 4, boundary_names={
            "west": "d", "east": "d", "south": "d", "north": "d"})
        disc = Discretization(mesh, gll_basis_2d(4))
        fs = [1.0, lambda x, y: x + y]
        prob = AdvectionDiffusion(disc, velocity=(1.0, 0.5),
                                  forcing=fs[0])
        prob.set_dirichlet("d", 0.0)
        sol_b = prob.solve_batch(fs, tol=1e-10)
        assert bool(np.asarray(sol_b.gmres.converged).all())
        for j, f in enumerate(fs):
            pj = AdvectionDiffusion(disc, velocity=(1.0, 0.5), forcing=f)
            pj.set_dirichlet("d", 0.0)
            sj = pj.solve(tol=1e-10)
            np.testing.assert_allclose(sol_b.u[j], sj.u, atol=1e-7)


def test_gmres_slow_convergence_keeps_restart_budget():
    """Round-2 review regression: a solve whose restart cycles shrink the
    residual by less than 2x each must NOT be frozen by a stagnation
    heuristic — the stall freeze is opt-in (``stall_ratio``), used only
    by the squirmer's GMRES-IR path."""
    rng = np.random.RandomState(3)
    n = 80
    # small restart on a spread spectrum (kappa ~ 300): each GMRES(6)
    # cycle shrinks the residual by well under 2x but the solve converges
    Amat = (np.diag(np.linspace(1 / 300, 1.0, n))
            + 1e-4 * rng.standard_normal((n, n)))
    b = rng.standard_normal(n)
    A = lambda x: jnp.asarray(Amat) @ x  # noqa: E731
    res = gmres(A, jnp.asarray(b, dtype=np.float64), tol=1e-10,
                restart=6, max_restarts=3000)
    assert bool(res.converged), float(res.residual_norm)
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(Amat, b), atol=1e-6)
    # opt-in freeze reproduces the squirmer path's early exit
    res_frozen = gmres(A, jnp.asarray(b, dtype=np.float64), tol=1e-10,
                       restart=6, max_restarts=3000, stall_ratio=0.5)
    assert not bool(res_frozen.converged)
    assert int(res_frozen.iterations) < int(res.iterations)
