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
                             "None")][0]
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
