"""Batched multi-RHS CG tests.

The reference has no multi-RHS facility (one ``spsolve`` per system,
``sem/discrete.py:502-528``) — :func:`solver.cg.cg_batched` is net-new
TPU design: one operator, one jitted block ladder, per-RHS convergence
via ``vmap``.  The oracle is the single-RHS :func:`solver.cg.cg` run per
right-hand side: the vmapped block body traces identically per batch
element, so iterates should agree to fp-noise and iteration counts
should agree exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import annulus_mesh, rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.solver import cg, cg_batched


def make_spd(n, seed, scale=1.0):
    rng = np.random.RandomState(seed)
    Q = rng.randn(n, n)
    return scale * (Q @ Q.T + n * np.eye(n))


class TestSolverLevel:
    def test_matches_per_rhs_cg(self):
        n, k = 40, 4
        A_np = make_spd(n, 0)
        A_d = jnp.asarray(A_np)
        B = jnp.asarray(np.random.RandomState(1).randn(k, n))

        def A(v):
            return A_d @ v

        res_b = cg_batched(A, B, tol=1e-12, max_iter=500)
        assert res_b.x.shape == (k, n)
        assert bool(res_b.converged.all())
        for j in range(k):
            res_j = cg(A, B[j], tol=1e-12, max_iter=500)
            assert int(res_b.iterations[j]) == int(res_j.iterations)
            np.testing.assert_allclose(np.asarray(res_b.x[j]),
                                       np.asarray(res_j.x),
                                       rtol=0, atol=1e-12)

    def test_heterogeneous_convergence(self):
        """RHS with very different scales converge at different iteration
        counts; early finishers freeze and stay correct."""
        n = 30
        A_np = make_spd(n, 2)
        A_d = jnp.asarray(A_np)
        rng = np.random.RandomState(3)
        # second RHS lives in a single eigen-direction: converges fast
        w, V = np.linalg.eigh(A_np)
        B = jnp.asarray(np.stack([rng.randn(n), V[:, 0]]))

        def A(v):
            return A_d @ v

        res = cg_batched(A, B, tol=1e-12, max_iter=500, block=8)
        assert bool(res.converged.all())
        its = np.asarray(res.iterations)
        assert its[1] < its[0]
        for j in range(2):
            x_ref = np.linalg.solve(A_np, np.asarray(B[j]))
            np.testing.assert_allclose(np.asarray(res.x[j]), x_ref,
                                       atol=1e-10)

    def test_preconditioned_and_weighted_dot(self):
        n, k = 25, 3
        A_np = make_spd(n, 4)
        d = np.diag(A_np).copy()
        wgt = jnp.asarray(np.random.RandomState(5).rand(n) + 0.5)
        A_d = jnp.asarray(A_np)
        inv = jnp.asarray(1.0 / d)
        B = jnp.asarray(np.random.RandomState(6).randn(k, n))

        def A(v):
            return A_d @ v

        def M(r):
            return inv * r

        res = cg_batched(A, B, M=M, dot_weight=wgt, tol=1e-12,
                         max_iter=500)
        assert bool(res.converged.all())
        for j in range(k):
            x_ref = np.linalg.solve(A_np, np.asarray(B[j]))
            np.testing.assert_allclose(np.asarray(res.x[j]), x_ref,
                                       atol=1e-10)

    def test_whole_batch_matches_vmap_mode(self):
        """whole_batch=True (batched operator) == the vmapped default."""
        n, k = 35, 3
        A_np = make_spd(n, 12)
        A_d = jnp.asarray(A_np)
        B = jnp.asarray(np.random.RandomState(13).randn(k, n))
        inv = jnp.asarray(1.0 / np.diag(A_np))

        def A1(v):
            return A_d @ v

        def Ab(V):                       # (k, n) -> (k, n)
            return V @ A_d.T

        def M1(r):
            return inv * r

        def Mb(R):
            return inv * R

        r_v = cg_batched(A1, B, M=M1, tol=1e-12, max_iter=500)
        r_w = cg_batched(Ab, B, M=Mb, tol=1e-12, max_iter=500,
                         whole_batch=True)
        assert bool(r_w.converged.all())
        np.testing.assert_array_equal(np.asarray(r_v.iterations),
                                      np.asarray(r_w.iterations))
        np.testing.assert_allclose(np.asarray(r_v.x), np.asarray(r_w.x),
                                   rtol=0, atol=1e-11)

    def test_whole_batch_weighted_dot(self):
        n, k = 20, 2
        A_np = make_spd(n, 14)
        A_d = jnp.asarray(A_np)
        wgt = jnp.asarray(np.random.RandomState(15).rand(n) + 0.5)
        B = jnp.asarray(np.random.RandomState(16).randn(k, n))

        res = cg_batched(lambda V: V @ A_d.T, B, dot_weight=wgt,
                         tol=1e-12, max_iter=400, whole_batch=True)
        assert bool(res.converged.all())
        for j in range(k):
            np.testing.assert_allclose(
                np.asarray(res.x[j]),
                np.linalg.solve(A_np, np.asarray(B[j])), atol=1e-10)

    def test_nonfinite_rhs_bails(self):
        """A NaN system must not hang the ladder (isfinite guard)."""
        n = 10
        A_d = jnp.asarray(make_spd(n, 7))
        B = jnp.asarray(np.stack([np.ones(n), np.full(n, np.nan)]))

        def A(v):
            return A_d @ v

        res = cg_batched(A, B, tol=1e-12, max_iter=200, block=4)
        assert bool(res.converged[0])
        assert not bool(res.converged[1])


class TestPoissonBatch:
    def _problem(self, p=5, nx=3, ny=3):
        mesh = rectangle_mesh(nx, ny, p, boundary_names={
            "west": "d", "east": "d", "south": "d", "north": "d"})
        disc = Discretization(mesh, gll_basis_2d(p))
        return disc

    def test_matches_individual_solves(self):
        disc = self._problem()
        fs = [
            lambda x, y: -(6 * x * y + 2),       # u = x^3 y + y^2
            lambda x, y: 2 * np.pi**2 * np.sin(np.pi * x)
            * np.sin(np.pi * y),
            3.0,
        ]
        prob = Poisson(disc, forcing=fs[0])
        prob.set_dirichlet("d", lambda x, y: x**3 * y + y**2)
        sol_b = prob.solve_local_batch(fs, tol=1e-12)
        assert sol_b.u.shape[0] == 3
        assert bool(np.asarray(sol_b.cg.converged).all())
        for j, f in enumerate(fs):
            pj = Poisson(disc, forcing=f)
            pj.set_dirichlet("d", lambda x, y: x**3 * y + y**2)
            sol_j = pj.solve_local(tol=1e-12)
            np.testing.assert_allclose(sol_b.u[j], sol_j.u, atol=1e-9)

    def test_manufactured_accuracy(self):
        """First batched RHS reproduces the in-space polynomial exactly."""
        disc = self._problem(p=4)
        exact = lambda x, y: x**3 * y + y**2  # noqa: E731
        prob = Poisson(disc)
        prob.set_dirichlet("d", exact)
        sol = prob.solve_local_batch(
            [lambda x, y: -(6 * x * y + 2), 1.0], tol=1e-13)
        assert prob.l2_error(sol.u[0], exact) < 1e-11

    def test_nodal_array_forcings(self):
        disc = self._problem(p=4)
        prob = Poisson(disc)
        prob.set_dirichlet("d", 0.0)
        xg = disc.global_gll_coords()
        F = np.stack([np.sin(np.pi * xg[0]) * np.sin(np.pi * xg[1]),
                      np.ones(disc.n_nodes)])
        sol = prob.solve_local_batch(F, tol=1e-11)
        assert bool(np.asarray(sol.cg.converged).all())
        # oracle: same nodal forcing through the callable path
        pj = Poisson(disc, forcing=1.0)
        pj.set_dirichlet("d", 0.0)
        np.testing.assert_allclose(sol.u[1], pj.solve_local(tol=1e-11).u,
                                   atol=1e-9)

    def test_curved_general_structure(self):
        """Curved (non-affine) annulus exercises the general-factor path
        under vmap, with the FDM preconditioner."""
        mesh = annulus_mesh(order=6, n_theta=4, n_r=4, r_outer=4.0)
        disc = Discretization(mesh, gll_basis_2d(6))
        prob = Poisson(disc)
        prob.set_dirichlet("sphere", 0.0)
        prob.set_dirichlet("shell", 1.0)
        sol = prob.solve_local_batch([1.0, lambda x, y: x * y],
                                     tol=1e-11, precond="fdm")
        assert bool(np.asarray(sol.cg.converged).all())
        p1 = Poisson(disc)
        p1.set_dirichlet("sphere", 0.0)
        p1.set_dirichlet("shell", 1.0)
        np.testing.assert_allclose(sol.u[0],
                                   p1.solve_local(tol=1e-11).u, atol=1e-8)

    def test_pmg_batch_matches_individual(self):
        """The vmapped pmg V-cycle (incl. the FDM tensor-grid coarse
        solve) preconditions batched solves identically to per-RHS
        solve_local (round-2 review: the 2D guard was stale — the
        V-cycle is pure jnp and vmap-clean)."""
        disc = self._problem(p=4, nx=4, ny=4)
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("d", 0.0)
        fs = [1.0, lambda x, y: x * y]
        sol = prob.solve_local_batch(fs, tol=1e-5, precond="pmg")
        assert bool(np.asarray(sol.cg.converged).all())
        for j, f in enumerate(fs):
            pj = Poisson(disc, forcing=f, dtype=np.float32)
            pj.set_dirichlet("d", 0.0)
            np.testing.assert_allclose(sol.u[j],
                                       pj.solve_local(tol=1e-5).u,
                                       atol=2e-4)


class TestBatchAutoKernel:
    """cg_kernel='auto' resolution policy (BASELINE.md round-2h)."""

    def _affine(self):
        mesh = rectangle_mesh(4, 4, 4)
        disc = Discretization(mesh, gll_basis_2d(4))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        return prob

    def test_auto_affine_stays_plain(self, monkeypatch):
        # even with kernels nominally supported, an affine mesh must
        # resolve to the whole-batch XLA ladder (the batched fused
        # kernels measured slower there)
        from spectralelementmethod_tpu.models import poisson as mod
        monkeypatch.setattr(mod, "pallas_kernels_supported", lambda: True)
        prob = self._affine()
        sol = prob.solve_local_batch([1.0, 2.0], tol=1e-5,
                                     cg_kernel="auto",
                                     p_dtype=jnp.bfloat16)
        assert bool(np.asarray(sol.cg.converged).all())
        assert not any(k[0] == "cg_fused_batch"
                       for k in prob._op_cache)
        assert prob._op_cache[("affinity", "ne")] is True

    def test_auto_without_p_dtype_stays_plain(self, monkeypatch):
        from spectralelementmethod_tpu.models import poisson as mod
        monkeypatch.setattr(mod, "pallas_kernels_supported", lambda: True)
        prob = self._affine()
        sol = prob.solve_local_batch([1.0, 2.0], tol=1e-5,
                                     cg_kernel="auto")
        assert bool(np.asarray(sol.cg.converged).all())
        assert not any(k[0] == "cg_fused_batch"
                       for k in prob._op_cache)

    def test_auto_matches_explicit_plain(self):
        prob = self._affine()
        sol_a = prob.solve_local_batch([1.0, 2.0], tol=1e-6,
                                       cg_kernel="auto")
        prob2 = self._affine()
        sol_p = prob2.solve_local_batch([1.0, 2.0], tol=1e-6,
                                        cg_kernel="plain")
        np.testing.assert_array_equal(sol_a.u, sol_p.u)


class TestReviewRegressions:
    def test_bc_change_invalidates_cached_operator(self):
        """set_dirichlet after a solve must rebuild the cached masked
        operator/preconditioner (round-2 review finding)."""
        disc = TestPoissonBatch._problem(TestPoissonBatch(), p=4)
        prob = Poisson(disc)
        prob.set_dirichlet("d", 0.0)
        prob.solve_local(tol=1e-11)
        prob.set_dirichlet("d", lambda x, y: x + y)
        sol2 = prob.solve_local(tol=1e-11)
        fresh = Poisson(disc)
        fresh.set_dirichlet("d", lambda x, y: x + y)
        ref = fresh.solve_local(tol=1e-11)
        np.testing.assert_allclose(sol2.u, ref.u, atol=1e-9)

    def test_bc_change_invalidates_helmholtz(self):
        from spectralelementmethod_tpu.models.helmholtz import Helmholtz

        disc = TestPoissonBatch._problem(TestPoissonBatch(), p=4)
        prob = Helmholtz(disc, forcing=1.0, reaction=2.0)
        prob.set_dirichlet("d", 0.0)
        prob.solve_local(tol=1e-11)
        prob.set_dirichlet("d", 1.0)
        sol2 = prob.solve_local(tol=1e-11)
        fresh = Helmholtz(disc, forcing=1.0, reaction=2.0)
        fresh.set_dirichlet("d", 1.0)
        ref = fresh.solve_local(tol=1e-11)
        np.testing.assert_allclose(sol2.u, ref.u, atol=1e-9)

    def test_small_mesh_fused_batch_repads(self):
        """E=288 admits no 128-multiple tiling without the re-pad; the
        batched fused entry point must re-pad like solve_local does."""
        mesh = rectangle_mesh(18, 16, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        sol = prob.solve_local_batch([1.0, 2.0], tol=1e-5,
                                     cg_kernel="fused-interpret")
        assert bool(np.asarray(sol.cg.converged).all())
        # linearity oracle: f=2 gives exactly twice the f=1 solution
        np.testing.assert_allclose(sol.u[1], 2 * sol.u[0], atol=1e-5)

    def test_jax_array_nodal_forcings(self):
        disc = TestPoissonBatch._problem(TestPoissonBatch(), p=4)
        prob = Poisson(disc)
        prob.set_dirichlet("d", 0.0)
        F = jnp.stack([jnp.ones(disc.n_nodes),
                       2.0 * jnp.ones(disc.n_nodes)])
        sol = prob.solve_local_batch(F, tol=1e-11)
        assert bool(np.asarray(sol.cg.converged).all())
        np.testing.assert_allclose(sol.u[1], 2 * sol.u[0], atol=1e-9)

    def test_k1_fused_batch_on_affine_mesh(self):
        mesh = rectangle_mesh(16, 8, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        sol = prob.solve_local_batch([1.0], tol=1e-5,
                                     cg_kernel="fused-interpret")
        assert sol.u.shape[0] == 1 and bool(
            np.asarray(sol.cg.converged).all())


class TestCgRefined:
    def test_matches_plain_cg_when_healthy(self):
        from spectralelementmethod_tpu.solver.cg import cg, cg_refined

        rng = np.random.RandomState(0)
        Amat = rng.standard_normal((40, 40))
        Amat = Amat @ Amat.T + 40 * np.eye(40)
        b = jnp.asarray(rng.standard_normal(40))

        def A(x):
            return jnp.asarray(Amat) @ x

        r1 = cg(A, b, tol=1e-10, max_iter=200)
        r2 = cg_refined(A, b, tol=1e-10, max_iter=200)
        assert bool(r2.converged)
        np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                                   atol=1e-8)

    def test_refinement_beats_single_cycle_floor(self):
        """f32 inner recursions floor; the true-residual re-anchor gets
        past it (the 1M bench stall, round-4)."""
        from spectralelementmethod_tpu.solver.cg import cg, cg_refined

        rng = np.random.RandomState(1)
        n = 120
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.logspace(0, 6, n)            # kappa = 1e6
        Amat = (Q * lam) @ Q.T
        Amat = jnp.asarray((0.5 * (Amat + Amat.T)).astype(np.float32))
        x_true = rng.standard_normal(n).astype(np.float32)
        b = jnp.asarray(Amat @ x_true)

        def A(x):
            return Amat @ x

        res = cg_refined(A, b, tol=1e-6, max_iter=3000, cycles=4)
        rn = float(np.linalg.norm(np.asarray(b - A(res.x))))
        assert rn <= 1.01e-6 * float(np.linalg.norm(np.asarray(b))), rn
