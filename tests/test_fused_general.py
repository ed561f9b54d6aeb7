"""General-path (curved/variable-coefficient) fused kernel tests.

The affine fused kernel compresses the geometric factors to 3 scalars
per element; general meshes carry full (3, n, E) slabs.
:func:`ops.pallas_kernels.make_fused_general_laplacian_T` fuses the two
derivative dots + factor weighting + roll-class DSS in VMEM and sublane-
stacks ``n_rhs`` right-hand sides so the factor slabs stream once per
element tile.  Oracle: the unfused XLA general transposed path
(``sumfac._make_local_laplacian_operator_T`` with structure='general'),
itself validated against the reference assembly in test_poisson.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import annulus_mesh, rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops import sumfac
from spectralelementmethod_tpu.ops.exchange import RollExchange
from spectralelementmethod_tpu.ops.pallas_kernels import (
    make_fused_general_laplacian_T)


def general_problem(nx=16, ny=8, p=3):
    """Structured mesh + variable coefficient: roll-class exchange with
    genuinely non-affine factors."""
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, coefficient=lambda x, y: 1 + x**2 * y**2,
                   dtype=np.float32)
    ex = RollExchange(disc)
    Gf = prob._G_host.reshape(disc.E, 3, -1)
    W = disc.basis.weight_grid().reshape(-1)
    _a, exact = sumfac.affine_factorization(Gf, W)
    assert not exact, "coefficient should make the factors non-affine"
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    return ex, Gf, Dhat


class TestFusedGeneralT:
    def _compare(self, target_win, n_rhs=1, precision="highest",
                 tol=1e-5):
        ex, Gf, Dhat = general_problem()
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla",
            structure="general")
        fused = make_fused_general_laplacian_T(
            ex, Gf, Dhat, n_rhs=n_rhs, precision=precision,
            target_win=target_win, interpret=True)
        rng = np.random.RandomState(7)
        n, E = ex.n_loc, ex.E
        U = jnp.asarray(
            rng.standard_normal((n_rhs * n, E)).astype(np.float32))
        got = np.asarray(fused(U))
        expected = np.concatenate(
            [np.asarray(A_xla(U[j * n:(j + 1) * n]))
             for j in range(n_rhs)], axis=0)
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < tol

    def test_single_block(self):
        self._compare(target_win=3840)             # E=128 -> one block

    def test_multi_block_halo(self):
        self._compare(target_win=128)              # 2-block halo windows

    def test_multi_rhs_slices_match_single(self):
        self._compare(target_win=256, n_rhs=3)

    def test_multi_rhs_one_block(self):
        self._compare(target_win=3840, n_rhs=2)

    def test_high_precision_bf16x3(self):
        self._compare(target_win=128, precision="high", tol=5e-4)

    def test_auto_window_fits(self):
        """Default target_win admits the tiling and stays correct."""
        self._compare(target_win=None, n_rhs=4)

    def test_curved_annulus(self):
        """Genuinely curved isoparametric mapping (not just a variable
        coefficient)."""
        mesh = annulus_mesh(order=4, n_theta=8, n_r=16, r_outer=10.0,
                            progression=1.2)
        disc = Discretization(mesh, gll_basis_2d(4))
        prob = Poisson(disc, dtype=np.float32)
        ex = RollExchange(disc)
        if ex.E % 128:
            pytest.skip("annulus element count not 128-divisible")
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla",
            structure="general")
        fused = make_fused_general_laplacian_T(ex, Gf, Dhat,
                                               interpret=True)
        rng = np.random.RandomState(8)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        got = np.asarray(fused(uT))
        expected = np.asarray(A_xla(uT))
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < 1e-5

    def test_bad_shape_raises(self):
        ex, Gf, Dhat = general_problem()
        fused = make_fused_general_laplacian_T(ex, Gf, Dhat, n_rhs=2,
                                               interpret=True)
        with pytest.raises(ValueError, match="sublane-stacked"):
            fused(jnp.zeros((ex.n_loc, ex.E), jnp.float32))

    def test_far_split_matches_full_halo(self):
        """Forced far split (max_halo below the vertical row stride) on
        the general kernel == the full-halo kernel == the XLA path, in
        both far transports (aliased update kernel / XLA epilogue)."""
        ex, Gf, Dhat = general_problem(16, 16, 3)
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla",
            structure="general")
        fk = make_fused_general_laplacian_T(
            ex, Gf, Dhat, target_win=128, max_halo=8,
            far_mode="kernel", interpret=True)
        fx = make_fused_general_laplacian_T(
            ex, Gf, Dhat, target_win=128, max_halo=8,
            far_mode="xla", interpret=True)
        assert fk._prep.has_far and fk._far_update is not None
        assert fx._far_update is None
        rng = np.random.RandomState(31)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        vk, vx = np.asarray(fk(uT)), np.asarray(fx(uT))
        np.testing.assert_array_equal(vk, vx)
        expected = np.asarray(A_xla(uT))
        scale = np.abs(expected).max()
        assert np.abs(vk - expected).max() / scale < 1e-5

    def test_multi_rhs_stays_full_halo(self):
        """n_rhs > 1 disables the far split (same rule as the affine
        kernel): the batched kernel carries no aux plumbing."""
        ex, Gf, Dhat = general_problem(16, 16, 3)
        fused = make_fused_general_laplacian_T(
            ex, Gf, Dhat, n_rhs=2, target_win=128, max_halo=8,
            interpret=True)
        assert not fused._prep.has_far


class TestGeneralFusedCG:
    """Fused CG iteration kernels on general (full-factor) meshes."""

    def _prob(self):
        mesh = rectangle_mesh(16, 8, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, coefficient=lambda x, y: 1 + x**2 * y**2,
                       dtype=np.float32)
        prob.set_dirichlet("ebc", lambda x, y: 0.0)
        return prob

    def test_kernel_a_matches_xla_apply(self):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels_general)

        ex, Gf, Dhat = general_problem()
        kA, kB, G = make_fused_cg_kernels_general(ex, Gf, Dhat,
                                                  precision="highest",
                                                  interpret=True)
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla",
            structure="general")
        n, E = ex.n_loc, ex.E
        rng = np.random.RandomState(21)
        r = ex.dss_T(jnp.asarray(
            rng.standard_normal((n, E)).astype(np.float32)))
        p = ex.dss_T(jnp.asarray(
            rng.standard_normal((n, E)).astype(np.float32)))
        inv = ex.dss_T(jnp.asarray(
            rng.rand(n, E).astype(np.float32))) * 0.1
        x = jnp.zeros((n, E), jnp.float32)
        beta, alpha_prev = 0.7, 0.0
        p_new, Ap, x_new, dparts = kA(r, p, inv, x, beta, alpha_prev)
        p_ref = inv * r + beta * p
        np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_ref),
                                   rtol=1e-6, atol=1e-6)
        Ap_ref = np.asarray(A_xla(p_ref))
        scale = np.abs(Ap_ref).max()
        assert np.abs(np.asarray(Ap) - Ap_ref).max() / scale < 1e-5
        # pre-DSS denominator identity == multiplicity-weighted <p, Ap>
        denom = float(jnp.sum(dparts))
        denom_ref = float(ex.dot_T(p_ref, jnp.asarray(Ap_ref)))
        assert abs(denom - denom_ref) / abs(denom_ref) < 1e-5

    def test_solve_local_fused_matches_plain(self):
        prob = self._prob()
        sol_p = prob.solve_local(tol=1e-5, cg_kernel="plain",
                                 vector_layout="ne")
        sol_f = prob.solve_local(tol=1e-5, cg_kernel="fused-interpret",
                                 vector_layout="ne")
        assert bool(sol_f.cg.converged)
        scale = max(np.abs(sol_p.u).max(), 1e-30)
        assert np.abs(sol_f.u - sol_p.u).max() / scale < 1e-4

    def test_solve_local_fused_bf16p(self):
        prob = self._prob()
        sol_p = prob.solve_local(tol=1e-5, cg_kernel="plain",
                                 vector_layout="ne")
        sol_f = prob.solve_local(tol=1e-5, cg_kernel="fused-interpret",
                                 p_dtype=jnp.bfloat16, vector_layout="ne")
        assert bool(sol_f.cg.converged)
        scale = max(np.abs(sol_p.u).max(), 1e-30)
        assert np.abs(sol_f.u - sol_p.u).max() / scale < 1e-3

    def test_defer_x_rejected(self):
        prob = self._prob()
        with pytest.raises(ValueError, match="defer_x"):
            prob.solve_local(tol=1e-5, cg_kernel="fused-interpret",
                             defer_x=8, vector_layout="ne")


class TestBatchedFusedCG:
    """Multi-RHS fused CG: k solves per kernel invocation, shared
    factor/diagonal/weight/mask streams, per-RHS scalars."""

    def _prob(self):
        mesh = rectangle_mesh(16, 8, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, coefficient=lambda x, y: 1 + x**2 * y**2,
                       dtype=np.float32)
        prob.set_dirichlet("ebc", lambda x, y: 0.0)
        return prob

    def test_kernels_match_single_rhs(self):
        """One batched iteration == k independent single-RHS fused
        iterations (identical kernels, stacked operands)."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels_general)

        ex, Gf, Dhat = general_problem()
        n, E = ex.n_loc, ex.E
        k = 3
        kA1, kB1, _ = make_fused_cg_kernels_general(
            ex, Gf, Dhat, precision="highest", interpret=True)
        kAb, kBb, _ = make_fused_cg_kernels_general(
            ex, Gf, Dhat, n_rhs=k, precision="highest", interpret=True)
        rng = np.random.RandomState(31)
        R = ex.dss_T(jnp.asarray(
            rng.standard_normal((n, E)).astype(np.float32)))
        Rs = [jnp.roll(R, j, axis=1) for j in range(k)]
        P = [ex.dss_T(jnp.asarray(
            rng.standard_normal((n, E)).astype(np.float32)))
            for _ in range(k)]
        inv = ex.dss_T(jnp.asarray(
            rng.rand(n, E).astype(np.float32))) * 0.1
        x0 = jnp.zeros((n, E), jnp.float32)
        betas = np.array([0.3, 0.0, 1.2], np.float32)
        alphas = np.array([0.5, 0.9, 0.0], np.float32)

        Rb = jnp.concatenate(Rs, axis=0)
        Pb = jnp.concatenate(P, axis=0)
        Xb = jnp.zeros((k * n, E), jnp.float32)
        pb, apb, xb, db = kAb(Rb, Pb, inv, Xb,
                              jnp.asarray(betas), jnp.asarray(alphas))
        for j in range(k):
            p1, ap1, x1, d1 = kA1(Rs[j], P[j], inv, x0,
                                  float(betas[j]), float(alphas[j]))
            sl = slice(j * n, (j + 1) * n)
            np.testing.assert_allclose(np.asarray(pb[sl]),
                                       np.asarray(p1), atol=1e-6)
            np.testing.assert_allclose(np.asarray(apb[sl]),
                                       np.asarray(ap1), rtol=2e-6,
                                       atol=1e-4)
            np.testing.assert_allclose(float(jnp.sum(db[:, j])),
                                       float(jnp.sum(d1)), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(xb[sl]),
                                       np.asarray(x1), atol=1e-6)

    def test_solve_local_batch_fused_matches_plain(self):
        prob = self._prob()
        fs = [1.0, lambda x, y: x + y, lambda x, y: np.sin(x) * y]
        sol_p = prob.solve_local_batch(fs, tol=1e-5,
                                       structure="general")
        sol_f = prob.solve_local_batch(fs, tol=1e-5,
                                       cg_kernel="fused-interpret")
        assert bool(np.asarray(sol_f.cg.converged).all())
        scale = max(np.abs(sol_p.u).max(), 1e-30)
        assert np.abs(sol_f.u - sol_p.u).max() / scale < 1e-4

    def test_solve_local_batch_fused_bf16p(self):
        prob = self._prob()
        fs = [1.0, lambda x, y: x + y]
        sol_p = prob.solve_local_batch(fs, tol=1e-5,
                                       structure="general")
        sol_f = prob.solve_local_batch(fs, tol=1e-5,
                                       cg_kernel="fused-interpret",
                                       p_dtype=jnp.bfloat16)
        assert bool(np.asarray(sol_f.cg.converged).all())
        scale = max(np.abs(sol_p.u).max(), 1e-30)
        assert np.abs(sol_f.u - sol_p.u).max() / scale < 1e-3

    def test_affine_batched_kernels_match_single(self):
        """Affine batched kernel A == k single-RHS affine kernels."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels, make_fused_cg_kernels_batched)
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        mesh = rectangle_mesh(16, 8, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, dtype=np.float32)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
        W = disc.basis.weight_grid().reshape(-1)
        a, exact = sumfac.affine_factorization(Gf, W)
        assert exact
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        kA1, kB1, _ = make_fused_cg_kernels(
            ex, Kcat, a, precision="highest", max_halo=None,
            interpret=True)
        kAb, kBb, _ = make_fused_cg_kernels_batched(
            ex, Kcat, a, n_rhs=2, precision="highest", interpret=True)
        n, E = ex.n_loc, ex.E
        rng = np.random.RandomState(41)
        Rs = [ex.dss_T(jnp.asarray(
            rng.standard_normal((n, E)).astype(np.float32)))
            for _ in range(2)]
        Ps = [ex.dss_T(jnp.asarray(
            rng.standard_normal((n, E)).astype(np.float32)))
            for _ in range(2)]
        inv = ex.dss_T(jnp.asarray(
            rng.rand(n, E).astype(np.float32))) * 0.1
        x0 = jnp.zeros((n, E), jnp.float32)
        betas = np.array([0.4, 1.1], np.float32)
        alphas = np.array([0.0, 0.7], np.float32)
        pb, apb, xb, db = kAb(
            jnp.concatenate(Rs, axis=0), jnp.concatenate(Ps, axis=0),
            inv, jnp.zeros((2 * n, E), jnp.float32),
            jnp.asarray(betas), jnp.asarray(alphas))
        for j in range(2):
            p1, ap1, x1, d1 = kA1(Rs[j], Ps[j], inv, x0,
                                  float(betas[j]), float(alphas[j]))
            sl = slice(j * n, (j + 1) * n)
            np.testing.assert_allclose(np.asarray(apb[sl]),
                                       np.asarray(ap1), rtol=2e-6,
                                       atol=1e-4)
            np.testing.assert_allclose(float(jnp.sum(db[:, j])),
                                       float(jnp.sum(d1)), rtol=1e-5)

    def test_affine_mesh_batched_solve_routes_to_affine_kernels(self):
        mesh = rectangle_mesh(16, 8, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        fs = [1.0, lambda x, y: x + y]
        sol_p = prob.solve_local_batch(fs, tol=1e-5)
        sol_f = prob.solve_local_batch(fs, tol=1e-5,
                                       cg_kernel="fused-interpret")
        assert bool(np.asarray(sol_f.cg.converged).all())
        kA = prob._op_cache[("cg_fused_batch", 2, "fused-interpret",
                             "None", False)][0]
        assert kA._prep.KT is not None      # affine kernels engaged
        scale = max(np.abs(sol_p.u).max(), 1e-30)
        assert np.abs(sol_f.u - sol_p.u).max() / scale < 1e-4

    def test_fused_requires_f32(self):
        mesh = rectangle_mesh(16, 8, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, dtype=np.float64)
        prob.set_dirichlet("ebc", 0.0)
        with pytest.raises(ValueError, match="float32"):
            prob.solve_local_batch([1.0, 2.0],
                                   cg_kernel="fused-interpret")


class TestBatchedFarSplit:
    """Far-class halo split in the BATCHED CG kernels: kernel A emits
    per-RHS aux rows, Ap travels as (Ap_near, (k*n_far, E) far rows),
    kernel B adds each RHS's rows in VMEM.  The k-fold-shrunk batched
    windows make the split matter more than in the single-RHS kernels."""

    def _affine_pieces(self, max_halo):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels_batched)

        mesh = rectangle_mesh(32, 16, 2)  # row stride 16 > max_halo=1
        disc = Discretization(mesh, gll_basis_2d(2))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
        W = disc.basis.weight_grid().reshape(-1)
        a, exact = sumfac.affine_factorization(Gf, W)
        assert exact
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        kA, kB, _ = make_fused_cg_kernels_batched(
            ex, Kcat, a, n_rhs=2, precision="highest",
            max_halo=max_halo, interpret=True)
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        return ex, kA, kB, A_xla, prob

    def _apply_roundtrip(self, ex, kA, kB, A_xla, k=2):
        """Per-RHS apply through kA+kB (r=0, inv=1, alpha=1 makes
        r' = -Ap) against the XLA operator."""
        n, E = ex.n_loc, ex.E
        rng = np.random.RandomState(17)
        Rs = [ex.dss_T(jnp.asarray(
            rng.standard_normal((n, E)).astype(np.float32)))
            for _ in range(k)]
        Rb = jnp.concatenate(Rs, axis=0)
        zeros = jnp.zeros((k * n, E), jnp.float32)
        ones = jnp.ones((n, E), jnp.float32)
        p_new, Ap, x_new, dparts = kA(
            Rb, zeros, ones, zeros, jnp.zeros(k), jnp.zeros(k))
        rn, rzp, rn2p = kB(zeros, Ap, ones,
                           jnp.asarray(np.asarray(ex.weights.T,
                                                  np.float32)),
                           jnp.ones(k))
        for j in range(k):
            expect = np.asarray(A_xla(Rs[j]))
            scale = np.abs(expect).max()
            got = -np.asarray(rn[j * n:(j + 1) * n])
            assert np.abs(got - expect).max() / scale < 1e-4
            expect_denom = float(ex.dot_T(Rs[j], jnp.asarray(expect)))
            assert abs(float(jnp.sum(dparts[:, j])) - expect_denom) \
                / abs(expect_denom) < 1e-4

    def test_affine_batched_far_split_matches_xla(self):
        ex, kA, kB, A_xla, _ = self._affine_pieces(max_halo=1)
        prep = kA._prep
        assert prep.has_far and prep.n_far > 0
        self._apply_roundtrip(ex, kA, kB, A_xla)

    def test_affine_batched_full_halo_control(self):
        ex, kA, kB, A_xla, _ = self._affine_pieces(max_halo=None)
        assert not kA._prep.has_far
        self._apply_roundtrip(ex, kA, kB, A_xla)

    def test_general_batched_far_split_matches_xla(self):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels_general)

        ex, Gf, Dhat = general_problem(32, 16, 2)
        kA, kB, _ = make_fused_cg_kernels_general(
            ex, Gf, Dhat, n_rhs=2, precision="highest",
            max_halo=1, interpret=True)
        prep = kA._prep
        assert prep.has_far and prep.n_far > 0
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla",
            structure="general")
        self._apply_roundtrip(ex, kA, kB, A_xla)

    def test_batched_far_split_cg_solves(self):
        """End-to-end cg_fused_batched through far-split kernels matches
        the full-halo batched solve (Dirichlet-masked Poisson system,
        two forcings)."""
        from spectralelementmethod_tpu.solver.cg import cg_fused_batched

        ex, kA, kB, A_xla, prob = self._affine_pieces(max_halo=1)
        kA0, kB0 = self._affine_pieces(max_halo=None)[1:3]
        assert kA._prep.has_far and not kA0._prep.has_far
        n, E = ex.n_loc, ex.E
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
        B = jnp.stack([jnp.where(free, bL, 0.0),
                       jnp.where(free, 2.5 * bL, 0.0)])
        res_f = cg_fused_batched(kA, kB, B, inv=inv, w_free=w_free,
                                 tol=1e-5, max_iter=600)
        res_0 = cg_fused_batched(kA0, kB0, B, inv=inv, w_free=w_free,
                                 tol=1e-5, max_iter=600)
        assert bool(np.asarray(res_f.converged).all())
        assert bool(np.asarray(res_0.converged).all())
        xf, x0 = np.asarray(res_f.x), np.asarray(res_0.x)
        assert np.abs(xf - x0).max() / np.abs(x0).max() < 1e-2


class TestOperatorWiring:
    def test_explicit_fused_backend_on_general_mesh(self):
        """backend='fused-interpret' + non-affine factors routes to the
        general kernel through make_local_laplacian_operator."""
        ex, Gf, Dhat = general_problem()
        A_f = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne",
            backend="fused-interpret", structure="general")
        A_x = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla",
            structure="general")
        rng = np.random.RandomState(9)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        got, expected = np.asarray(A_f(uT)), np.asarray(A_x(uT))
        assert np.abs(got - expected).max() / np.abs(expected).max() < 1e-5

    def test_multi_rhs_factory_fused_and_mask(self):
        ex, Gf, Dhat = general_problem()
        n, E = ex.n_loc, ex.E
        rng = np.random.RandomState(10)
        free = jnp.asarray(rng.rand(n, E) > 0.1)
        A_b = sumfac.make_multi_rhs_laplacian_T(
            ex, Gf, Dhat, 2, free_local=free, backend="fused-interpret")
        A_1 = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, free, vector_layout="ne", backend="xla",
            structure="general")
        U = jnp.asarray(rng.standard_normal((2, n, E)).astype(np.float32))
        got = np.asarray(A_b(U))
        for j in range(2):
            expected = np.asarray(A_1(U[j]))
            scale = np.abs(expected).max()
            assert np.abs(got[j] - expected).max() / scale < 1e-5

    def test_multi_rhs_factory_xla_fallback(self):
        """backend='xla' vmaps the single-RHS general path."""
        ex, Gf, Dhat = general_problem(nx=4, ny=2)
        n, E = ex.n_loc, ex.E
        A_b = sumfac.make_multi_rhs_laplacian_T(ex, Gf, Dhat, 3,
                                                backend="xla")
        A_1 = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla",
            structure="general")
        rng = np.random.RandomState(11)
        U = jnp.asarray(rng.standard_normal((3, n, E)).astype(np.float32))
        got = np.asarray(A_b(U))
        for j in range(3):
            np.testing.assert_allclose(got[j], np.asarray(A_1(U[j])),
                                       rtol=0, atol=1e-4)


def test_panel_order_batched_fused_cg():
    """Panel element order + batched fused CG (the 1M-scale recipe:
    the batched kernels are full-halo only, panel ordering keeps the
    halo small enough for the k-fold-shrunk VMEM window)."""
    from spectralelementmethod_tpu.parallel.partition import (
        panel_order, reorder_elements)

    mesh = rectangle_mesh(16, 16, 2)
    mesh = reorder_elements(mesh, panel_order(16, 16, 4))
    disc = Discretization(mesh, gll_basis_2d(2))
    prob = Poisson(disc, coefficient=lambda x, y: 1 + 0.2 * x * x,
                   dtype=np.float32)
    prob.set_dirichlet("ebc", 0.0)
    fs = [1.0, lambda x, y: x + y]
    sol_p = prob.solve_local_batch(fs, tol=1e-5, structure="general")
    sol_f = prob.solve_local_batch(fs, tol=1e-5,
                                   cg_kernel="fused-interpret",
                                   p_dtype=jnp.bfloat16)
    assert bool(np.asarray(sol_f.cg.converged).all())
    scale = max(np.abs(sol_p.u).max(), 1e-30)
    assert np.abs(sol_f.u - sol_p.u).max() / scale < 1e-3


class TestBatchedDeferredX:
    """defer_x on the BATCHED fused CG kernels: kernel A drops the
    solution update; the driver catches each RHS's x up once per m
    iterations with per-RHS alpha vectors."""

    def _pieces(self, max_halo=None):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels_batched)

        mesh = rectangle_mesh(32, 16, 2)
        disc = Discretization(mesh, gll_basis_2d(2))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
        W = disc.basis.weight_grid().reshape(-1)
        a, exact = sumfac.affine_factorization(Gf, W)
        assert exact
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        kA, kB, _ = make_fused_cg_kernels_batched(
            ex, Kcat, a, n_rhs=2, precision="highest",
            max_halo=max_halo, defer_x=True, interpret=True)
        kA0, kB0, _ = make_fused_cg_kernels_batched(
            ex, Kcat, a, n_rhs=2, precision="highest",
            max_halo=max_halo, interpret=True)
        return prob, ex, kA, kB, kA0, kB0

    def _operands(self, prob, ex):
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
        B = jnp.stack([jnp.where(free, bL, 0.0),
                       jnp.where(free, 2.5 * bL, 0.0)])
        return B, inv, w_free

    def test_deferred_solve_matches_plain_batched(self):
        from spectralelementmethod_tpu.solver.cg import cg_fused_batched

        prob, ex, kA, kB, kA0, kB0 = self._pieces()
        B, inv, w_free = self._operands(prob, ex)
        res_d = cg_fused_batched(kA, kB, B, inv=inv, w_free=w_free,
                                 tol=1e-5, max_iter=600, defer_x=4)
        res_0 = cg_fused_batched(kA0, kB0, B, inv=inv, w_free=w_free,
                                 tol=1e-5, max_iter=600)
        assert bool(np.asarray(res_d.converged).all())
        assert bool(np.asarray(res_0.converged).all())
        xd, x0 = np.asarray(res_d.x), np.asarray(res_0.x)
        assert np.abs(xd - x0).max() / np.abs(x0).max() < 1e-2

    def test_deferred_composes_with_far_split(self):
        from spectralelementmethod_tpu.solver.cg import cg_fused_batched

        prob, ex, kA, kB, kA0, kB0 = self._pieces(max_halo=1)
        assert kA._prep.has_far
        B, inv, w_free = self._operands(prob, ex)
        res_d = cg_fused_batched(kA, kB, B, inv=inv, w_free=w_free,
                                 tol=1e-5, max_iter=600, defer_x=2)
        res_0 = cg_fused_batched(kA0, kB0, B, inv=inv, w_free=w_free,
                                 tol=1e-5, max_iter=600)
        assert bool(np.asarray(res_d.converged).all())
        xd, x0 = np.asarray(res_d.x), np.asarray(res_0.x)
        assert np.abs(xd - x0).max() / np.abs(x0).max() < 1e-2

    def test_mismatched_kernels_raise(self):
        from spectralelementmethod_tpu.solver.cg import cg_fused_batched

        prob, ex, kA, kB, kA0, kB0 = self._pieces()
        B, inv, w_free = self._operands(prob, ex)
        with pytest.raises(ValueError, match="defer_x"):
            cg_fused_batched(kA, kB, B, inv=inv, w_free=w_free,
                             max_iter=64)       # built deferred, m=0
        with pytest.raises(ValueError, match="defer_x"):
            cg_fused_batched(kA0, kB0, B, inv=inv, w_free=w_free,
                             max_iter=64, defer_x=4)

    def test_solve_local_batch_defer_x(self):
        """Model-level wiring: solve_local_batch(defer_x=m) routes
        through the deferred batched kernels on an affine mesh."""
        mesh = rectangle_mesh(16, 16, 2)
        disc = Discretization(mesh, gll_basis_2d(2))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        fs = [1.0, lambda x, y: x + y]
        sol_p = prob.solve_local_batch(fs, tol=1e-5)
        sol_d = prob.solve_local_batch(fs, tol=1e-5,
                                       cg_kernel="fused-interpret",
                                       p_dtype=jnp.bfloat16, defer_x=4)
        assert bool(np.asarray(sol_d.cg.converged).all())
        scale = max(np.abs(sol_p.u).max(), 1e-30)
        assert np.abs(sol_d.u - sol_p.u).max() / scale < 1e-3
        # 'auto' on a small mesh resolves to no deferral and still solves
        sol_a = prob.solve_local_batch(fs, tol=1e-5,
                                       cg_kernel="fused-interpret",
                                       p_dtype=jnp.bfloat16,
                                       defer_x="auto")
        assert np.abs(sol_a.u - sol_p.u).max() / scale < 1e-3

    def test_solve_local_batch_defer_x_general_raises(self):
        """Explicit defer_x on a curved (general) mesh surfaces the
        no-deferred-mode error instead of silently degrading."""
        mesh = rectangle_mesh(16, 16, 2)
        disc = Discretization(mesh, gll_basis_2d(2))
        prob = Poisson(disc, coefficient=lambda x, y: 1 + 0.2 * x * x,
                       dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        fs = [1.0, lambda x, y: x + y]
        with pytest.raises(ValueError, match="defer_x"):
            prob.solve_local_batch(fs, tol=1e-5,
                                   cg_kernel="fused-interpret",
                                   p_dtype=jnp.bfloat16, defer_x=4)
        # auto-resolved deferral drops silently and still solves
        sol = prob.solve_local_batch(fs, tol=1e-5,
                                     cg_kernel="fused-interpret",
                                     p_dtype=jnp.bfloat16,
                                     defer_x="auto")
        assert bool(np.asarray(sol.cg.converged).all())
