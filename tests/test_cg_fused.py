"""Fused Pallas CG-iteration kernels (interpret mode, CPU backend).

Oracle layers:

1. kernel A (direction update + apply + pre-DSS denominator) and kernel B
   (vector updates + weighted reductions) against the unfused XLA operator
   and plain jnp arithmetic on random consistent data;
2. end-to-end ``Poisson.solve_local(cg_kernel='fused-interpret')`` against
   the plain-CG path and against the exact manufactured solution;
3. the bf16 stored-direction mode still reaches f32-grade solutions.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops import sumfac
from spectralelementmethod_tpu.ops.exchange import RollExchange
from spectralelementmethod_tpu.ops.pallas_kernels import (
    make_fused_cg_kernels)
from spectralelementmethod_tpu.solver.cg import cg, cg_fused


def _setup(nx=16, ny=8, p=3):
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc,
                   forcing=lambda x, y: np.sin(np.pi * x) * np.cos(
                       np.pi * y),
                   dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.1 * x + 0.05 * y)
    return prob


def _fused_pieces(prob, target_win=3072, **kw):
    disc = prob.disc
    ex = RollExchange(disc)
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    kA, kB, G = make_fused_cg_kernels(
        ex, Kcat, a, interpret=True, target_win=target_win, **kw)
    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla")
    return ex, kA, kB, G, A_xla


class TestKernels:
    def test_kernel_a_matches_unfused(self):
        prob = _setup()
        ex, kA, kB, G, A_xla = _fused_pieces(prob)
        rng = np.random.RandomState(3)
        # consistent L-vectors: DSS a random local field
        r = np.asarray(ex.dss_T(jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))))
        p = np.asarray(ex.dss_T(jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))))
        inv = np.asarray(ex.dss_T(jnp.asarray(
            rng.uniform(0.5, 1.5, (ex.n_loc, ex.E)).astype(np.float32))))
        # inv must hold the SAME value on every copy of a shared node
        # (dss gives the sum — consistent, which is all that matters)
        beta = 0.7
        alpha_prev = 0.4
        x = rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32)
        p_new, Ap, x_new, dparts = kA(
            jnp.asarray(r), jnp.asarray(p), jnp.asarray(inv),
            jnp.asarray(x), beta, alpha_prev)
        np.testing.assert_allclose(np.asarray(x_new), x + alpha_prev * p,
                                   rtol=1e-5, atol=1e-5)
        expect_p = inv * r + beta * p
        np.testing.assert_allclose(np.asarray(p_new), expect_p,
                                   rtol=1e-5, atol=1e-5)
        expect_Ap = np.asarray(A_xla(jnp.asarray(expect_p)))
        scale = np.abs(expect_Ap).max()
        assert np.abs(np.asarray(Ap) - expect_Ap).max() / scale < 1e-4
        # pre-DSS denominator identity == weighted global inner product
        expect_denom = float(ex.dot_T(jnp.asarray(expect_p),
                                      jnp.asarray(expect_Ap)))
        got = float(jnp.sum(dparts))
        assert abs(got - expect_denom) / abs(expect_denom) < 1e-4
        assert dparts.shape == (G, 1)

    def test_kernel_b_matches_plain_arithmetic(self):
        prob = _setup()
        ex, kA, kB, G, _ = _fused_pieces(prob)
        rng = np.random.RandomState(5)
        shp = (ex.n_loc, ex.E)
        r, Ap = (rng.standard_normal(shp).astype(np.float32)
                 for _ in range(2))
        inv = rng.uniform(0.5, 1.5, shp).astype(np.float32)
        w = np.asarray(ex.weights.T, dtype=np.float32)
        alpha = 0.3
        rn, rzp, rn2p = kB(*map(jnp.asarray, (r, Ap, inv, w)), alpha)
        r_new = r - alpha * Ap
        np.testing.assert_allclose(np.asarray(rn), r_new,
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            float(jnp.sum(rzp)), float(np.sum(w * r_new * inv * r_new)),
            rtol=1e-4)
        np.testing.assert_allclose(
            float(jnp.sum(rn2p)), float(np.sum(w * r_new * r_new)),
            rtol=1e-4)

    def test_multi_tile_grid(self):
        """Forcing TE=128 over E=512 exercises halo clamping + partials."""
        prob = _setup(32, 16, 2)
        ex, kA, kB, G, A_xla = _fused_pieces(prob, target_win=128)
        assert G > 1
        rng = np.random.RandomState(7)
        r = np.asarray(ex.dss_T(jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))))
        rd = jnp.asarray(r)
        p_new, Ap, x_new, dparts = kA(rd, jnp.zeros_like(rd),
                                      jnp.ones_like(rd),
                                      jnp.zeros_like(rd), 0.0, 0.0)
        expect_Ap = np.asarray(A_xla(rd))
        scale = np.abs(expect_Ap).max()
        assert np.abs(np.asarray(Ap) - expect_Ap).max() / scale < 1e-4

    def test_bf16_direction_requires_high(self):
        prob = _setup()
        with pytest.raises(ValueError, match="high"):
            _fused_pieces(prob, p_dtype=jnp.bfloat16, precision="highest")

    def test_far_split_kernels_match_unfused(self):
        """max_halo=1 forces the row-stride classes through the far path:
        kA returns (Ap_near, far_rows) and kernel B completes the DSS in
        VMEM — recovered here via kB with r=0, alpha=1 (r' = -Ap)."""
        prob = _setup(32, 16, 2)          # stride 16 > max_halo -> far
        ex, kA, kB, G, A_xla = _fused_pieces(prob, max_halo=1)
        prep = kA._prep
        assert prep.has_far and prep.n_far > 0
        rng = np.random.RandomState(11)
        r = jnp.asarray(np.asarray(ex.dss_T(jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32)))))
        zeros = jnp.zeros_like(r)
        # beta=0, inv=1: p' = r, Ap' = A r
        p_new, Ap, x_new, dparts = kA(r, zeros, jnp.ones_like(r), zeros,
                                      0.0, 0.0)
        assert isinstance(Ap, tuple) and Ap[1].shape == (prep.n_far, ex.E)
        expect_Ap = np.asarray(A_xla(r))
        # near-only Ap must NOT equal the full apply (far classes exist
        # on this mesh for real): guards against a silently empty split
        scale = np.abs(expect_Ap).max()
        assert np.abs(np.asarray(Ap[0]) - expect_Ap).max() / scale > 1e-3
        rn, rzp, rn2p = kB(zeros, Ap, jnp.ones_like(r),
                           jnp.asarray(np.asarray(ex.weights.T,
                                                  np.float32)), 1.0)
        assert np.abs(-np.asarray(rn) - expect_Ap).max() / scale < 1e-4
        # pre-DSS denominator identity holds regardless of the split
        expect_denom = float(ex.dot_T(r, jnp.asarray(expect_Ap)))
        assert abs(float(jnp.sum(dparts)) - expect_denom) / abs(
            expect_denom) < 1e-4

    def test_far_split_cg_solves(self):
        """End-to-end cg_fused through far-split kernels == plain CG."""
        prob = _setup(32, 16, 2)
        ex, kA, kB, G, A_xla = _fused_pieces(prob, max_halo=1)
        assert kA._prep.has_far
        free = jnp.asarray(np.ascontiguousarray(
            (~prob._dirichlet_mask)[ex.gather_hier].T))
        diagL = jnp.asarray(np.ascontiguousarray(
            np.asarray(prob.operator_diagonal())[ex.gather_hier]
            .astype(np.float32).T))
        inv = jnp.where(free, 1.0 / jnp.where(diagL != 0, diagL, 1.0), 0.0)
        w = jnp.asarray(np.asarray(ex.weights.T, dtype=np.float32))
        w_free = jnp.where(free, w, 0.0)
        b = np.asarray(prob._b) + prob._neumann
        u_d = np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)
        bL = jnp.asarray(np.ascontiguousarray(
            b[ex.gather_hier].astype(np.float32).T))
        u_dL = jnp.asarray(np.ascontiguousarray(
            u_d[ex.gather_hier].astype(np.float32).T))
        r = jnp.where(free, bL - A_xla(u_dL), 0.0)
        res_f = cg_fused(kA, kB, r, inv=inv, w_free=w_free, tol=1e-6,
                         max_iter=400)
        Gf = prob._G_host.reshape(prob.disc.E, 3, -1).astype(np.float32)
        A_free = sumfac.make_local_laplacian_operator(
            ex, Gf, sumfac.make_stacked_derivative(
                np.asarray(prob._D0), np.asarray(prob._D1)),
            free, vector_layout="ne", backend="xla")
        # baseline: the SAME fused kernels without the far split (full
        # halo window, identical bf16x3 'high' precision) — isolates the
        # far path as the only difference
        kA0, kB0, _ = _fused_pieces(prob, max_halo=None)[1:4]
        assert not kA0._prep.has_far
        res_0 = cg_fused(kA0, kB0, r, inv=inv, w_free=w_free, tol=1e-6,
                         max_iter=400)
        res_p = cg(A_free, r, M=lambda v: inv * v, tol=1e-6, max_iter=400,
                   dot_weight=w)
        assert all(bool(s.converged) for s in (res_f, res_0, res_p))
        # the strong check: the TRUE residual of the far-split solution is
        # in the same fp-drift band as the full-halo fused one (a wrong
        # far contribution would converge the recurrence to a different
        # system's solution — orders of magnitude off, not a rounding
        # factor)
        def true_rn(x):
            rt = r - jnp.where(free, A_xla(x), 0.0)
            return float(jnp.sqrt(jnp.sum(w_free * rt * rt)))
        assert true_rn(res_f.x) < 3 * true_rn(res_0.x) + 1e-12
        xf, xp = np.asarray(res_f.x), np.asarray(res_p.x)
        # x agreement vs plain CG is conditioning-limited (different fp
        # paths and precisions, both stopped at tol=1e-6)
        assert np.abs(xf - xp).max() / np.abs(xp).max() < 1e-2
        assert abs(int(res_f.iterations) - int(res_p.iterations)) <= 5


class TestSolveLocalFused:
    def test_matches_plain_cg_path(self):
        prob = _setup()
        sol_plain = prob.solve_local(tol=1e-6, vector_layout="ne",
                                     cg_kernel="plain")
        sol_fused = prob.solve_local(tol=1e-6, vector_layout="ne",
                                     cg_kernel="fused-interpret")
        assert bool(sol_fused.cg.converged)
        scale = np.abs(sol_plain.u).max()
        assert np.abs(sol_fused.u - sol_plain.u).max() / scale < 1e-4
        # same mathematics: iteration counts agree to fp-noise level
        assert abs(int(sol_fused.cg.iterations)
                   - int(sol_plain.cg.iterations)) <= 3

    def test_manufactured_solution(self):
        """Laplace with u = 0.1(x+y): exact for any p (linear).

        "ebc" covers west+south only; the north/east "nbc" sides carry
        the matching constant Neumann flux n.grad u = 0.1 (equal x/y
        gradients keep the corner flux single-valued).
        """
        mesh = rectangle_mesh(16, 8, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, forcing=0.0, dtype=np.float32)
        prob.set_dirichlet("ebc", lambda x, y: 0.1 * (x + y))
        prob.set_neumann("nbc", 0.1)
        sol = prob.solve_local(tol=1e-7, vector_layout="ne",
                               cg_kernel="fused-interpret")
        x, y = np.asarray(prob.x_nodes)
        exact = 0.1 * (x + y)
        assert np.abs(sol.u - exact).max() < 1e-4

    def test_bf16_direction_mode(self):
        prob = _setup()
        sol_plain = prob.solve_local(tol=1e-5, vector_layout="ne",
                                     cg_kernel="plain")
        sol_bf16 = prob.solve_local(tol=1e-5, vector_layout="ne",
                                    cg_kernel="fused-interpret",
                                    p_dtype=jnp.bfloat16)
        assert bool(sol_bf16.cg.converged)
        scale = np.abs(sol_plain.u).max()
        assert np.abs(sol_bf16.u - sol_plain.u).max() / scale < 1e-3
        # perturbed directions may cost a few extra iterations, not many
        assert (int(sol_bf16.cg.iterations)
                <= int(sol_plain.cg.iterations) + 15)

    def test_fused_requires_ne_jacobi_f32(self):
        prob = _setup()
        with pytest.raises(ValueError, match="fused"):
            prob.solve_local(vector_layout="en",
                             cg_kernel="fused-interpret")

    def test_driver_matches_cg_on_same_operator(self):
        """cg_fused == cg with identical operator/preconditioner/weights."""
        prob = _setup()
        ex, kA, kB, G, A_xla = _fused_pieces(prob)
        free = jnp.asarray(np.ascontiguousarray(
            (~prob._dirichlet_mask)[ex.gather_hier].T))
        diagL = jnp.asarray(np.ascontiguousarray(
            np.asarray(prob.operator_diagonal())[ex.gather_hier]
            .astype(np.float32).T))
        inv = jnp.where(free, 1.0 / jnp.where(diagL != 0, diagL, 1.0), 0.0)
        w = jnp.asarray(np.asarray(ex.weights.T, dtype=np.float32))
        w_free = jnp.where(free, w, 0.0)

        b = np.asarray(prob._b) + prob._neumann
        u_d = np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)
        bL = jnp.asarray(np.ascontiguousarray(
            b[ex.gather_hier].astype(np.float32).T))
        u_dL = jnp.asarray(np.ascontiguousarray(
            u_d[ex.gather_hier].astype(np.float32).T))
        A_free = sumfac.make_local_laplacian_operator(
            ex, prob._G_host.reshape(prob.disc.E, 3, -1).astype(np.float32),
            sumfac.make_stacked_derivative(np.asarray(prob._D0),
                                           np.asarray(prob._D1)),
            free, vector_layout="ne", backend="xla")
        r = jnp.where(free, bL - A_xla(u_dL), 0.0)

        res_f = cg_fused(kA, kB, r, inv=inv, w_free=w_free, tol=1e-6,
                         max_iter=400)
        res_p = cg(A_free, r, M=lambda v: inv * v, tol=1e-6, max_iter=400,
                   dot_weight=w)
        assert bool(res_f.converged) and bool(res_p.converged)
        xf, xp = np.asarray(res_f.x), np.asarray(res_p.x)
        scale = np.abs(xp).max()
        # both stopped at tol=1e-6: iterates agree to the stopping level
        # times a modest conditioning factor (different fp paths)
        assert np.abs(xf - xp).max() / scale < 5e-4
        assert abs(int(res_f.iterations) - int(res_p.iterations)) <= 3


def _restart_pieces(prob, **kw):
    """(kA, kB, r, inv, w_free, w, A_free) for cg_fused restart tests."""
    ex, kA, kB, G, A_xla = _fused_pieces(prob, **kw)
    free = jnp.asarray(np.ascontiguousarray(
        (~prob._dirichlet_mask)[ex.gather_hier].T))
    diagL = jnp.asarray(np.ascontiguousarray(
        np.asarray(prob.operator_diagonal())[ex.gather_hier]
        .astype(np.float32).T))
    inv = jnp.where(free, 1.0 / jnp.where(diagL != 0, diagL, 1.0), 0.0)
    w = jnp.asarray(np.asarray(ex.weights.T, dtype=np.float32))
    w_free = jnp.where(free, w, 0.0)
    b = np.asarray(prob._b) + prob._neumann
    u_d = np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)
    bL = jnp.asarray(np.ascontiguousarray(
        b[ex.gather_hier].astype(np.float32).T))
    u_dL = jnp.asarray(np.ascontiguousarray(
        u_d[ex.gather_hier].astype(np.float32).T))
    A_free = sumfac.make_local_laplacian_operator(
        ex, prob._G_host.reshape(prob.disc.E, 3, -1).astype(np.float32),
        sumfac.make_stacked_derivative(np.asarray(prob._D0),
                                       np.asarray(prob._D1)),
        free, vector_layout="ne", backend="xla")
    r = jnp.where(free, bL - A_xla(u_dL), 0.0)
    return kA, kB, r, inv, w_free, w, A_free


class TestTrueResidualRestart:
    def test_healthy_solve_never_restarts(self):
        """A reachable tol converges without ever invoking A (no spurious
        restarts on the normal path), with the identical result."""
        prob = _setup()
        kA, kB, r, inv, w_free, _w, A_free = _restart_pieces(prob)
        calls = []

        def A_counting(v):
            calls.append(1)
            return A_free(v)

        res = cg_fused(kA, kB, r, inv=inv, w_free=w_free, tol=1e-6,
                       max_iter=400, A=A_counting)
        res0 = cg_fused(kA, kB, r, inv=inv, w_free=w_free, tol=1e-6,
                        max_iter=400)
        assert bool(res.converged)
        assert not calls
        np.testing.assert_array_equal(np.asarray(res.x),
                                      np.asarray(res0.x))

    def test_forced_restart_keeps_solution_exact(self):
        """An unreachable tol stalls at the f32 floor and triggers the
        true-residual restart; the accumulated x must stay as accurate as
        the restart-free run (accounting across legs is lossless)."""
        prob = _setup()
        kA, kB, r, inv, w_free, w, A_free = _restart_pieces(prob)
        calls = []

        def A_counting(v):
            calls.append(1)
            return A_free(v)

        res_A = cg_fused(kA, kB, r, inv=inv, w_free=w_free, tol=1e-12,
                         max_iter=640, A=A_counting)
        res_0 = cg_fused(kA, kB, r, inv=inv, w_free=w_free, tol=1e-12,
                         max_iter=640)
        assert 1 <= len(calls) <= 2           # stalled -> restarted
        assert not bool(res_A.converged)      # 1e-12 is below the floor

        def true_rn(x):
            rt = r - A_free(x)
            return float(jnp.sqrt(jnp.sum(w_free * rt * rt)))

        # the restarted run's true residual is at least as good as (or
        # within noise of) the plain stalled run, and both are at the
        # f32 floor far below the initial residual
        rn_A, rn_0 = true_rn(res_A.x), true_rn(res_0.x)
        rn_b = float(jnp.sqrt(jnp.sum(w_free * r * r)))
        assert rn_A < 1e-5 * rn_b
        assert rn_A <= 3 * rn_0 + 1e-12
        assert int(res_A.iterations) <= 640

    def test_restart_reaches_below_bf16_recurrence_floor(self):
        """bf16-stored directions floor the recurrence well above the f32
        floor; the restart re-anchors and converges a tol the single leg
        cannot reach (the round-1 deferred-x on-device failure mode)."""
        prob = _setup(32, 16, 4)
        kA, kB, r, inv, w_free, w, A_free = _restart_pieces(
            prob, precision="high", p_dtype=jnp.bfloat16)
        res_0 = cg_fused(kA, kB, r, inv=inv, w_free=w_free, tol=2e-7,
                         max_iter=2000, p_dtype=jnp.bfloat16)
        res_A = cg_fused(kA, kB, r, inv=inv, w_free=w_free, tol=2e-7,
                         max_iter=2000, p_dtype=jnp.bfloat16, A=A_free)
        # the restarted run must reach the target the plain run can only
        # reach by luck; it must never be worse
        assert bool(res_A.converged)
        assert float(res_A.residual_norm) <= float(res_0.residual_norm)


def test_panel_order_cg_solves():
    """Fused CG on a panel-ordered mesh: cross-panel classes ride the far
    path (kernel-B add), solution matches the plain path."""
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.parallel.partition import (
        panel_order, reorder_elements)

    mesh = rectangle_mesh(16, 16, 2)
    mesh = reorder_elements(mesh, panel_order(16, 16, 4))
    disc = Discretization(mesh, gll_basis_2d(2))
    prob = Poisson(disc, forcing=lambda x, y: np.sin(np.pi * x),
                   dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.1 * x)
    ex = make_exchange(disc)          # auto-relaxed threshold: no tails
    assert ex.n_edge_tail == 0 and ex.n_vert_tail == 0
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    # max_halo=4 sends the cross-panel classes (delta 61) far
    kA, kB, G = make_fused_cg_kernels(
        ex, Kcat, a, interpret=True, target_win=128, max_halo=4,
        precision="high", p_dtype=jnp.bfloat16)
    assert kA._prep.has_far

    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    diagL = np.asarray(prob.operator_diagonal())[ex.gather_hier]
    diagT = jnp.asarray(np.ascontiguousarray(diagL.T).astype(np.float32))
    b0 = jnp.where(free, jnp.asarray(np.ascontiguousarray(
        prob._b[ex.gather_hier].T).astype(np.float32)), 0.0)
    inv = jnp.where(
        free, 1.0 / jnp.where(diagT != 0, diagT, 1.0), 0.0
    ).astype(jnp.bfloat16)
    wf = jnp.where(
        free, ex._weights_as(np.float32, transposed=True), 0.0
    ).astype(jnp.bfloat16)

    res = cg_fused(kA, kB, b0, inv=inv, w_free=wf, tol=1e-5,
                   max_iter=400, block=50, p_dtype=jnp.bfloat16)
    assert bool(res.converged)

    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla")
    free_f = free.astype(jnp.float32)
    Am = lambda v: jnp.where(free, A_xla(v * free_f), 0.0)  # noqa: E731
    r_end = np.asarray(b0 - Am(res.x))
    assert np.linalg.norm(r_end * np.asarray(wf, np.float32)) < 2e-4 * (
        1 + np.linalg.norm(np.asarray(b0)))


class TestDeferredX:
    """defer_x=m: kernel A without the solution update; the driver
    retains the last m directions and catches x up once per m
    iterations (one fused XLA pass)."""

    def test_kernel_a_deferred_matches_unfused(self):
        prob = _setup()
        ex, kA, kB, G, A_xla = _fused_pieces(prob, defer_x=True)
        rng = np.random.RandomState(3)
        r = np.asarray(ex.dss_T(jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))))
        p = np.asarray(ex.dss_T(jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))))
        inv = np.asarray(ex.dss_T(jnp.asarray(
            rng.uniform(0.5, 1.5, (ex.n_loc, ex.E)).astype(np.float32))))
        beta = 0.7
        p_new, Ap, dparts = kA(jnp.asarray(r), jnp.asarray(p),
                               jnp.asarray(inv), beta)
        expect_p = inv * r + beta * p
        np.testing.assert_allclose(np.asarray(p_new), expect_p,
                                   rtol=1e-5, atol=1e-5)
        expect_Ap = np.asarray(A_xla(jnp.asarray(expect_p)))
        scale = np.abs(expect_Ap).max()
        assert np.abs(np.asarray(Ap) - expect_Ap).max() / scale < 1e-4
        expect_denom = float(ex.dot_T(jnp.asarray(expect_p),
                                      jnp.asarray(expect_Ap)))
        assert abs(float(jnp.sum(dparts))
                   - expect_denom) / abs(expect_denom) < 1e-4

    def test_deferred_solve_matches_plain(self):
        prob = _setup()
        sol_plain = prob.solve_local(tol=1e-6, vector_layout="ne",
                                     cg_kernel="plain")
        sol_d = prob.solve_local(tol=1e-6, vector_layout="ne",
                                 cg_kernel="fused-interpret", defer_x=4)
        assert bool(sol_d.cg.converged)
        scale = np.abs(sol_plain.u).max()
        assert np.abs(sol_d.u - sol_plain.u).max() / scale < 1e-4
        assert abs(int(sol_d.cg.iterations)
                   - int(sol_plain.cg.iterations)) <= 3

    def test_defer_x_auto_small_mesh(self):
        # "auto" resolves by iterate size: far below the ~100 MB HBM
        # threshold it must pick 0 (kernels built without deferral)
        prob = _setup()
        sol = prob.solve_local(tol=1e-6, vector_layout="ne",
                               cg_kernel="fused-interpret",
                               defer_x="auto")
        assert bool(sol.cg.converged)
        sol_plain = prob.solve_local(tol=1e-6, vector_layout="ne",
                                     cg_kernel="plain")
        scale = np.abs(sol_plain.u).max()
        assert np.abs(sol.u - sol_plain.u).max() / scale < 1e-4

    def test_deferred_bf16_direction(self):
        prob = _setup()
        sol_plain = prob.solve_local(tol=1e-5, vector_layout="ne",
                                     cg_kernel="plain")
        sol_d = prob.solve_local(tol=1e-5, vector_layout="ne",
                                 cg_kernel="fused-interpret",
                                 p_dtype=jnp.bfloat16, defer_x=8)
        assert bool(sol_d.cg.converged)
        scale = np.abs(sol_plain.u).max()
        assert np.abs(sol_d.u - sol_plain.u).max() / scale < 1e-3
        assert (int(sol_d.cg.iterations)
                <= int(sol_plain.cg.iterations) + 15)

    def test_deferred_far_split_cg_solves(self):
        """defer_x composes with the far-class kernel split."""
        prob = _setup(32, 16, 2)
        ex, kA, kB, G, A_xla = _fused_pieces(prob, max_halo=1,
                                             defer_x=True)
        assert kA._prep.has_far
        free = jnp.asarray(np.ascontiguousarray(
            (~prob._dirichlet_mask)[ex.gather_hier].T))
        diagL = jnp.asarray(np.ascontiguousarray(
            np.asarray(prob.operator_diagonal())[ex.gather_hier]
            .astype(np.float32).T))
        inv = jnp.where(free, 1.0 / jnp.where(diagL != 0, diagL, 1.0),
                        0.0)
        w = jnp.asarray(np.asarray(ex.weights.T, dtype=np.float32))
        w_free = jnp.where(free, w, 0.0)
        b = np.asarray(prob._b) + prob._neumann
        u_d = np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)
        bL = jnp.asarray(np.ascontiguousarray(
            b[ex.gather_hier].astype(np.float32).T))
        u_dL = jnp.asarray(np.ascontiguousarray(
            u_d[ex.gather_hier].astype(np.float32).T))
        r = jnp.where(free, bL - A_xla(u_dL), 0.0)
        res_d = cg_fused(kA, kB, r, inv=inv, w_free=w_free, tol=1e-6,
                         max_iter=400, defer_x=4)
        Gf = prob._G_host.reshape(prob.disc.E, 3, -1).astype(np.float32)
        A_free = sumfac.make_local_laplacian_operator(
            ex, Gf, sumfac.make_stacked_derivative(
                np.asarray(prob._D0), np.asarray(prob._D1)),
            free, vector_layout="ne", backend="xla")
        res_p = cg(A_free, r, M=lambda v: inv * v, tol=1e-6,
                   max_iter=400, dot_weight=w)
        assert bool(res_d.converged) and bool(res_p.converged)
        xd, xp = np.asarray(res_d.x), np.asarray(res_p.x)
        assert np.abs(xd - xp).max() / np.abs(xp).max() < 1e-2
        assert abs(int(res_d.iterations) - int(res_p.iterations)) <= 5

    def test_mismatched_kernels_raise(self):
        prob = _setup()
        _, kA_d, kB, _, _ = _fused_pieces(prob, defer_x=True)
        _, kA_0, _, _, _ = _fused_pieces(prob)
        r = jnp.zeros((kA_d._prep.n, kA_d._prep.E), jnp.float32)
        one = jnp.ones_like(r)
        with pytest.raises(ValueError, match="defer_x"):
            cg_fused(kA_d, kB, r, inv=one, w_free=one)     # missing m
        with pytest.raises(ValueError, match="defer_x"):
            cg_fused(kA_0, kB, r, inv=one, w_free=one, defer_x=4)
        with pytest.raises(ValueError, match="divide"):
            cg_fused(kA_d, kB, r, inv=one, w_free=one, defer_x=7)


def _single_pieces(prob, target_win=3072, **kw):
    """(ex, kAB, G, A_xla) for the single-kernel CG iteration."""
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_cg_kernel_single)

    disc = prob.disc
    ex = RollExchange(disc)
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    kAB, G = make_fused_cg_kernel_single(
        ex, Kcat, a, interpret=True, target_win=target_win, **kw)
    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla")
    return ex, kAB, G, A_xla


class TestSingleKernelCG:
    """ONE Pallas kernel per PCG iteration: the residual update is
    deferred into the next kernel and the tail reductions come from
    quadratic-in-alpha recurrences (make_fused_cg_kernel_single)."""

    def test_kernel_matches_unfused(self):
        prob = _setup()
        ex, kAB, G, A_xla = _single_pieces(prob)
        rng = np.random.RandomState(3)
        shp = (ex.n_loc, ex.E)

        def consistent(scale=1.0, lo=None):
            if lo is None:
                return np.asarray(ex.dss_T(jnp.asarray(
                    rng.standard_normal(shp).astype(np.float32)))) * scale
            return np.asarray(ex.dss_T(jnp.asarray(
                rng.uniform(lo, lo + 1.0, shp).astype(np.float32))))

        r = consistent()
        Ap = consistent()
        p = consistent()
        inv = consistent(lo=0.5)
        x = rng.standard_normal(shp).astype(np.float32)
        w = np.asarray(ex.weights.T, dtype=np.float32)
        alpha_prev, beta = 0.4, 0.7

        r_n, p_n, Ap_n, x_n, parts = kAB(
            jnp.asarray(r), jnp.asarray(Ap), jnp.asarray(p),
            jnp.asarray(x), jnp.asarray(inv), jnp.asarray(w),
            alpha_prev, beta)
        assert parts.shape == (G, 5)

        exp_r = r - alpha_prev * Ap
        np.testing.assert_allclose(np.asarray(r_n), exp_r,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(x_n), x + alpha_prev * p,
                                   rtol=1e-5, atol=1e-5)
        exp_p = inv * exp_r + beta * p
        np.testing.assert_allclose(np.asarray(p_n), exp_p,
                                   rtol=1e-4, atol=1e-4)
        exp_Ap = np.asarray(A_xla(jnp.asarray(exp_p)))
        scale = np.abs(exp_Ap).max()
        assert np.abs(np.asarray(Ap_n) - exp_Ap).max() / scale < 1e-4

        d = np.asarray(jnp.sum(parts, axis=0))
        exp = [
            float(ex.dot_T(jnp.asarray(exp_p), jnp.asarray(exp_Ap))),
            float(np.sum(w * exp_r * (inv * exp_Ap))),
            float(np.sum(w * exp_Ap * (inv * exp_Ap))),
            float(np.sum(w * exp_r * (inv * exp_r))),
            float(np.sum(w * exp_r * exp_r)),
        ]
        for j, e in enumerate(exp):
            assert abs(d[j] - e) / max(abs(e), 1e-6) < 1e-3, (j, d[j], e)

    def test_solve_local_matches_plain(self):
        prob = _setup()
        sol_plain = prob.solve_local(tol=1e-6, vector_layout="ne",
                                     cg_kernel="plain")
        sol_1 = prob.solve_local(tol=1e-6, vector_layout="ne",
                                 cg_kernel="fused1-interpret")
        assert bool(sol_1.cg.converged)
        scale = np.abs(sol_plain.u).max()
        assert np.abs(sol_1.u - sol_plain.u).max() / scale < 1e-4
        assert abs(int(sol_1.cg.iterations)
                   - int(sol_plain.cg.iterations)) <= 3

    def test_bf16_direction_mode(self):
        prob = _setup()
        sol_plain = prob.solve_local(tol=1e-5, vector_layout="ne",
                                     cg_kernel="plain")
        sol_1 = prob.solve_local(tol=1e-5, vector_layout="ne",
                                 cg_kernel="fused1-interpret",
                                 p_dtype=jnp.bfloat16)
        assert bool(sol_1.cg.converged)
        scale = np.abs(sol_plain.u).max()
        assert np.abs(sol_1.u - sol_plain.u).max() / scale < 1e-3
        assert (int(sol_1.cg.iterations)
                <= int(sol_plain.cg.iterations) + 15)

    def test_deferred_solve_matches_plain(self):
        prob = _setup()
        sol_plain = prob.solve_local(tol=1e-6, vector_layout="ne",
                                     cg_kernel="plain")
        sol_d = prob.solve_local(tol=1e-6, vector_layout="ne",
                                 cg_kernel="fused1-interpret", defer_x=4)
        assert bool(sol_d.cg.converged)
        scale = np.abs(sol_plain.u).max()
        assert np.abs(sol_d.u - sol_plain.u).max() / scale < 1e-4
        assert abs(int(sol_d.cg.iterations)
                   - int(sol_plain.cg.iterations)) <= 3

    def test_recurrence_dots_track_direct(self):
        """rz/rn2 recurrences stay within f32 drift of direct dots."""
        from spectralelementmethod_tpu.solver.cg import (
            _cg_fused_kernels_single)

        prob = _setup()
        ex, kAB, G, A_xla = _single_pieces(prob)
        free = jnp.asarray(np.ascontiguousarray(
            (~prob._dirichlet_mask)[ex.gather_hier].T))
        diagL = jnp.asarray(np.ascontiguousarray(
            np.asarray(prob.operator_diagonal())[ex.gather_hier]
            .astype(np.float32).T))
        inv = jnp.where(free, 1.0 / jnp.where(diagL != 0, diagL, 1.0),
                        0.0)
        w = jnp.asarray(np.asarray(ex.weights.T, dtype=np.float32))
        w_free = jnp.where(free, w, 0.0)
        b = np.asarray(prob._b) + prob._neumann
        bL = jnp.asarray(np.ascontiguousarray(
            b[ex.gather_hier].astype(np.float32).T))
        r0 = jnp.where(free, bL, 0.0)

        init_k, block_k = _cg_fused_kernels_single(kAB)
        state = init_k(r0, inv, w_free, jnp.asarray(0.0, jnp.float32),
                       jnp.asarray(0.0, jnp.float32),
                       jnp.asarray(50, jnp.int32))
        state = block_k(20, state, inv, w_free)
        # the carried rn2/rz_exact are DIRECT dots of the carried r
        # (computed in-kernel); only summation order differs
        r_cur = state[1]
        rn2_direct = float(jnp.sum(w_free.astype(jnp.float32)
                                   * r_cur * r_cur))
        rz_direct = float(jnp.sum(w_free.astype(jnp.float32) * r_cur
                                  * (inv.astype(jnp.float32) * r_cur)))
        assert abs(float(state[8]) - rn2_direct) <= 1e-5 * rn2_direct \
            + 1e-30
        assert abs(float(state[5]) - rz_direct) <= 1e-5 * abs(rz_direct) \
            + 1e-30
        # the one-step rz prediction (state[4], feeds the next beta):
        # within fp noise of the direct dot on the predicted residual
        r_nxt = state[1] - state[6] * state[3]
        rz_nxt = float(jnp.sum(w_free.astype(jnp.float32) * r_nxt
                               * (inv.astype(jnp.float32) * r_nxt)))
        assert abs(float(state[4]) - rz_nxt) <= 1e-4 * abs(rz_nxt) \
            + 1e-3 * float(state[5])

    def test_single_takes_no_kb(self):
        prob = _setup()
        ex, kAB, G, _ = _single_pieces(prob)
        _, _, kB, _, _ = _fused_pieces(prob)
        r = jnp.zeros((kAB._prep.n, kAB._prep.E), jnp.float32)
        one = jnp.ones_like(r)
        with pytest.raises(ValueError, match="kB=None"):
            cg_fused(kAB, kB, r, inv=one, w_free=one)
