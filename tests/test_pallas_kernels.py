"""Pallas fused element-apply kernels vs. the XLA einsum reference path.

Runs the kernels in Pallas interpreter mode on the CPU backend (the suite's
TPU-free analogue of on-device testing); the same code path compiles with
Mosaic on real TPU hardware (exercised by bench.py --kernel pallas).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops import pallas_kernels, sumfac
from spectralelementmethod_tpu.ops.exchange import LocalExchange


@pytest.fixture(scope="module")
def problem():
    p = 4
    mesh = rectangle_mesh(3, 3, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = LocalExchange(disc)
    Gf = jnp.asarray(np.asarray(prob._G), dtype=jnp.float32).reshape(
        disc.E, 3, -1
    )
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1)
    ).astype(np.float32)
    return disc, ex, Gf, Dhat


def test_fused_kernel_matches_xla(problem):
    disc, ex, Gf, Dhat = problem
    rng = np.random.RandomState(3)
    uL = jnp.asarray(
        rng.standard_normal((disc.E, disc.n_loc)).astype(np.float32)
    )

    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, backend="xla"
    )
    A_pl = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, backend="pallas-interpret"
    )
    np.testing.assert_allclose(
        np.asarray(A_pl(uL)), np.asarray(A_xla(uL)), rtol=2e-5, atol=2e-5
    )


def test_fused_kernel_partial_block(problem):
    """E not divisible by block_e: padded rows must not corrupt results."""
    disc, ex, Gf, Dhat = problem
    Dhat_h = jnp.asarray(Dhat[:, ex.hier], dtype=jnp.float32)
    rng = np.random.RandomState(4)
    uL = jnp.asarray(
        rng.standard_normal((disc.E, disc.n_loc)).astype(np.float32)
    )
    g0, g1, g2 = Gf[:, 0], Gf[:, 1], Gf[:, 2]

    full = pallas_kernels.fused_laplacian_local(
        uL, g0, g1, g2, Dhat_h, block_e=disc.E, interpret=True
    )
    # block of 8 does not divide E=9: exercises the final partial block
    assert disc.E % 8 != 0
    part = pallas_kernels.fused_laplacian_local(
        uL, g0, g1, g2, Dhat_h, block_e=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(part), np.asarray(full), rtol=1e-6, atol=1e-6
    )


def test_vector_kernel_matches_scalar(problem):
    """k-component kernel == scalar kernel applied per component."""
    disc, ex, Gf, Dhat = problem
    Dhat_h = jnp.asarray(Dhat[:, ex.hier], dtype=jnp.float32)
    rng = np.random.RandomState(5)
    k = 2
    comps = [
        jnp.asarray(
            rng.standard_normal((disc.E, disc.n_loc)).astype(np.float32)
        )
        for _ in range(k)
    ]
    g0, g1, g2 = Gf[:, 0], Gf[:, 1], Gf[:, 2]

    packed = jnp.concatenate(comps, axis=1)
    out = pallas_kernels.fused_vector_laplacian_local(
        packed, g0, g1, g2, Dhat_h, interpret=True
    )
    for c in range(k):
        ref = pallas_kernels.fused_laplacian_local(
            comps[c], g0, g1, g2, Dhat_h, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out[:, c * disc.n_loc:(c + 1) * disc.n_loc]),
            np.asarray(ref), rtol=1e-6, atol=1e-6,
        )


def test_auto_backend_on_cpu_is_xla(problem):
    """auto must not select Pallas off-TPU; solve still works end to end."""
    assert not pallas_kernels.supported()
    p = 3
    mesh = rectangle_mesh(2, 2, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    sol = prob.solve_local(tol=1e-6)
    assert np.all(np.isfinite(sol.u))


class TestFusedAffineT:
    """Fused transposed apply+DSS kernel == XLA transposed path."""

    def _compare(self, nx, ny, p, target_win):
        from spectralelementmethod_tpu.ops.exchange import RollExchange
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        mesh = rectangle_mesh(nx, ny, p)
        disc = Discretization(mesh, gll_basis_2d(p))
        prob = Poisson(disc, dtype=np.float32)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")

        W = disc.basis.weight_grid().reshape(-1)
        a, exact = sumfac.affine_factorization(Gf, W)
        assert exact
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        fused = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=target_win, interpret=True)

        rng = np.random.RandomState(11)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        expected = np.asarray(A_xla(uT))
        got = np.asarray(fused(uT))
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < 1e-5

    def test_single_block(self):
        self._compare(16, 8, 3, target_win=3840)   # E=128 -> one block

    def test_multi_block_halo(self):
        self._compare(16, 16, 3, target_win=128)   # E=256 -> 2 blocks, k=1

    def test_four_blocks(self):
        self._compare(32, 16, 3, target_win=128)   # E=512 -> 4 blocks

    def test_inadmissible_tiling_raises(self):
        from spectralelementmethod_tpu.ops.exchange import RollExchange
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        mesh = rectangle_mesh(5, 5, 2)            # E=25: no 128-multiple
        disc = Discretization(mesh, gll_basis_2d(2))
        prob = Poisson(disc, dtype=np.float32)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        W = disc.basis.weight_grid().reshape(-1)
        a, _ = sumfac.affine_factorization(Gf, W)
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        with pytest.raises(ValueError, match="tiling"):
            make_fused_affine_laplacian_T(ex, Kcat, a)

    def test_auto_backend_falls_back_on_cpu(self):
        """backend='auto' on CPU must return the XLA path (supported()
        is False), still correct end to end."""
        mesh = rectangle_mesh(4, 4, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc)
        prob.set_dirichlet("ebc", 0.0)
        sol = prob.solve_local(tol=1e-10, host_loop=True,
                               vector_layout="ne")
        assert bool(sol.cg.converged)

    def _affine_pieces(self, nx, ny, p):
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        mesh = rectangle_mesh(nx, ny, p)
        disc = Discretization(mesh, gll_basis_2d(p))
        prob = Poisson(disc, dtype=np.float32)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        W = disc.basis.weight_grid().reshape(-1)
        a, exact = sumfac.affine_factorization(Gf, W)
        assert exact
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        return ex, Gf, Dhat, Kcat, a

    def test_multi_rhs_slices_match_single(self):
        """Batched (k*n, E) apply == k independent single-RHS applies."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        ex, _Gf, _Dhat, Kcat, a = self._affine_pieces(16, 16, 3)
        n, E = ex.n_loc, ex.E
        one = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=128, interpret=True)
        batched = make_fused_affine_laplacian_T(
            ex, Kcat, a, n_rhs=3, target_win=128, interpret=True)
        rng = np.random.RandomState(17)
        U = jnp.asarray(rng.standard_normal((3 * n, E)).astype(np.float32))
        got = np.asarray(batched(U))
        expected = np.concatenate(
            [np.asarray(one(U[j * n:(j + 1) * n])) for j in range(3)],
            axis=0)
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < 1e-6

    def test_multi_rhs_auto_window(self):
        """Default target_win (affine_tile_window) admits the tiling."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        ex, _Gf, _Dhat, Kcat, a = self._affine_pieces(32, 16, 3)
        n, E = ex.n_loc, ex.E
        batched = make_fused_affine_laplacian_T(
            ex, Kcat, a, n_rhs=4, interpret=True)
        one = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=3840, interpret=True)
        rng = np.random.RandomState(18)
        U = jnp.asarray(rng.standard_normal((4 * n, E)).astype(np.float32))
        got = np.asarray(batched(U))
        for j in range(4):
            expected = np.asarray(one(U[j * n:(j + 1) * n]))
            sl = got[j * n:(j + 1) * n]
            assert (np.abs(sl - expected).max()
                    / np.abs(expected).max()) < 1e-6

    def test_multi_rhs_bad_shape_raises(self):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        ex, _Gf, _Dhat, Kcat, a = self._affine_pieces(16, 8, 3)
        fused = make_fused_affine_laplacian_T(ex, Kcat, a, n_rhs=2,
                                              interpret=True)
        with pytest.raises(ValueError, match="sublane-stacked"):
            fused(jnp.zeros((ex.n_loc, ex.E), jnp.float32))

    def test_multi_rhs_dispatcher_routes_affine(self):
        """make_multi_rhs_laplacian_T(structure='auto') on an affine mesh
        engages the batched AFFINE fused kernel and matches the vmapped
        XLA path."""
        ex, Gf, Dhat, _Kcat, _a = self._affine_pieces(16, 16, 3)
        n, E = ex.n_loc, ex.E
        A_b = sumfac.make_multi_rhs_laplacian_T(
            ex, Gf, Dhat, 2, backend="fused-interpret", structure="auto")
        assert getattr(A_b, "_fused", None) is not None
        assert A_b._fused._n_rhs == 2
        A_1 = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        rng = np.random.RandomState(19)
        U = jnp.asarray(rng.standard_normal((2, n, E)).astype(np.float32))
        got = np.asarray(A_b(U))
        for j in range(2):
            expected = np.asarray(A_1(U[j]))
            scale = np.abs(expected).max()
            assert np.abs(got[j] - expected).max() / scale < 1e-5

    def test_multi_rhs_dispatcher_chunks_large_batches(self):
        """At multi-pass dot precisions the dispatcher chunks the batch
        at k=2 (measured: window shrink beats mask amortization past
        k=2) — a 5-RHS batch runs as 2+2+1 kernels and still matches the
        XLA path."""
        ex, Gf, Dhat, _Kcat, _a = self._affine_pieces(16, 16, 3)
        n, E = ex.n_loc, ex.E
        A_b = sumfac.make_multi_rhs_laplacian_T(
            ex, Gf, Dhat, 5, backend="fused-interpret", structure="auto")
        assert A_b._fused._n_rhs == 5
        assert A_b._fused._chunk == 2
        A_1 = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        rng = np.random.RandomState(23)
        U = jnp.asarray(rng.standard_normal((5, n, E)).astype(np.float32))
        got = np.asarray(A_b(U))
        for j in range(5):
            expected = np.asarray(A_1(U[j]))
            scale = np.abs(expected).max()
            assert np.abs(got[j] - expected).max() / scale < 1e-5

    def test_high_precision_bf16x3(self):
        """'high' = in-kernel bf16x3 decomposition: ~1e-6 relative error
        vs the f32 'highest' result."""
        from spectralelementmethod_tpu.ops.exchange import RollExchange
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        mesh = rectangle_mesh(16, 16, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, dtype=np.float32)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        W = disc.basis.weight_grid().reshape(-1)
        a, _ = sumfac.affine_factorization(Gf, W)
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        hi = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=128, precision="highest", interpret=True)
        h3 = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=128, precision="high", interpret=True)
        rng = np.random.RandomState(13)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        v_hi = np.asarray(hi(uT))
        v_h3 = np.asarray(h3(uT))
        scale = np.abs(v_hi).max()
        rel = np.abs(v_h3 - v_hi).max() / scale
        assert rel < 5e-5, rel


class TestFarClassSplit:
    """max_halo splits large-offset roll classes out of the kernel window
    into the aux raw-row epilogue; results must match the XLA path."""

    def _pieces(self, nx, ny, p):
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        mesh = rectangle_mesh(nx, ny, p)
        disc = Discretization(mesh, gll_basis_2d(p))
        prob = Poisson(disc, dtype=np.float32)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        W = disc.basis.weight_grid().reshape(-1)
        a, exact = sumfac.affine_factorization(Gf, W)
        assert exact
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        return ex, Kcat, a, A_xla

    def test_forced_far_split_matches_xla(self):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        ex, Kcat, a, A_xla = self._pieces(16, 16, 3)
        # max_halo below the vertical row stride forces those classes far
        fused = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=128, max_halo=8, interpret=True)
        prep = fused._prep
        assert prep.has_far and prep._far_edge and prep._far_vert
        assert prep.Hb == 128 and prep.n_aux > 0
        rng = np.random.RandomState(11)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        expected = np.asarray(A_xla(uT))
        got = np.asarray(fused(uT))
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < 1e-5

    def test_far_update_kernel_matches_xla_epilogue(self):
        """far_mode='kernel' (aliased in-place far-row update, shifted
        window reads) == far_mode='xla' (apply_far concat rebuild),
        bit-for-bit: both consume the same (out, aux) kernel results and
        apply the same masked class sums, only the transport differs."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        ex, Kcat, a, A_xla = self._pieces(16, 16, 3)
        fk = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=128, max_halo=8,
            far_mode="kernel", interpret=True)
        fx = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=128, max_halo=8,
            far_mode="xla", interpret=True)
        assert fk._far_update is not None and fx._far_update is None
        # p=3: oi = 4*ne + 4 = 12 < rows_t = 16 — the kernel's
        # interior-row passthrough branch is exercised
        assert fk._far_update._rows_t == 16
        rng = np.random.RandomState(23)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        vk, vx = np.asarray(fk(uT)), np.asarray(fx(uT))
        np.testing.assert_array_equal(vk, vx)
        expected = np.asarray(A_xla(uT))
        scale = np.abs(expected).max()
        assert np.abs(vk - expected).max() / scale < 1e-5

    def test_far_update_preserves_interior_rows(self):
        """Rows past rows_t are never covered by the update kernel's
        grid — with the aliased output they must retain the near-kernel
        values exactly (the trick the kernel relies on)."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T, make_far_update_kernel)

        ex, Kcat, a, _ = self._pieces(16, 16, 3)
        fused = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=128, max_halo=8,
            far_mode="kernel", interpret=True)
        prep, upd = fused._prep, fused._far_update
        rows_t = upd._rows_t
        rng = np.random.RandomState(29)
        out = jnp.asarray(rng.standard_normal(
            (ex.n_loc, ex.E)).astype(np.float32))
        aux = jnp.asarray(rng.standard_normal(
            (prep.n_aux, ex.E)).astype(np.float32))
        got = np.asarray(upd(out, aux))
        np.testing.assert_array_equal(got[rows_t:], np.asarray(out)[rows_t:])
        # and the touched rows match the XLA epilogue on the same inputs
        ref = np.asarray(prep.apply_far(out, aux))
        np.testing.assert_allclose(got[:rows_t], ref[:rows_t],
                                   rtol=1e-6, atol=1e-6)

    def test_auto_keeps_small_meshes_unsplit(self):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        ex, Kcat, a, _ = self._pieces(16, 8, 3)
        fused = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=3840, interpret=True)
        # H = row stride 16 -> Hb 128 anyway: nothing to gain from a split
        assert not fused._prep.has_far

    def test_cg_kernel_a_with_far_split(self):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels)

        ex, Kcat, a, A_xla = self._pieces(16, 16, 3)
        kA, kB, G = make_fused_cg_kernels(
            ex, Kcat, a, target_win=128, max_halo=8, interpret=True)
        assert kA._prep.has_far
        rng = np.random.RandomState(13)
        r = ex.dss_T(jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32)))
        ones = jnp.ones_like(r)
        p_new, Ap, x_new, dparts = kA(r, jnp.zeros_like(r), ones,
                                      jnp.zeros_like(r), 0.0, 0.0)
        # far-split kA returns (Ap_near, far_rows); kernel B adds the far
        # rows in VMEM — prep.add_far is that same (pure-jnp) addition
        assert isinstance(Ap, tuple)
        Ap_full = kA._prep.add_far(Ap[0], Ap[1])
        expect_Ap = np.asarray(A_xla(r))     # p' = 1*r + 0 = r
        scale = np.abs(expect_Ap).max()
        assert np.abs(np.asarray(Ap_full) - expect_Ap).max() / scale < 1e-4
        # denominator is unaffected by the split (pre-DSS identity)
        expect_denom = float(ex.dot_T(r, jnp.asarray(expect_Ap)))
        assert abs(float(jnp.sum(dparts)) - expect_denom) / abs(
            expect_denom) < 1e-4

    def test_auto_split_rule_scales(self):
        """Measured auto rules (BASELINE round-2d/2m A/Bs, v5e p=8):
        plain apply kernels split once the full-halo window is degenerate
        (cost_full >= 0.75) now that the far rows go through the aliased
        far-row update kernel (1M: split 4.47 ms vs full 5.82; 100k
        cost_full=0.18: full 0.20 vs split 0.25); the CG kernels' far
        rows ride into kernel B (cheap_far) with the same threshold."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            _AffineFusedPrep)

        ex, Kcat, a, _ = self._pieces(16, 16, 3)
        # H=16 fits one 128-lane block: no far-splittable classes exist
        prep = _AffineFusedPrep(ex, Kcat, a, "highest", 3840, "auto")
        assert not prep.has_far
        # degenerate window (TE=128=Hb) but still no class beyond 128
        prep2 = _AffineFusedPrep(ex, Kcat, a, "highest", 256, "auto")
        assert prep2.Hb == 128 and not prep2.has_far

        # row stride 160 > NEAR_HB: splittable classes exist (the 1M-like
        # regime, scaled down).  E=1280, Hb_full=256.
        ex2, Kcat2, a2, _ = self._pieces(8, 160, 2)
        # degenerate full window (TE=256=Hb_full, cost_full=2): the
        # plain kernel now splits too (aliased far-update transport)
        prep3 = _AffineFusedPrep(ex2, Kcat2, a2, "highest", 768, "auto")
        assert prep3.has_far and prep3.Hb == 128
        # ...and the CG kernels (cheap_far) split there as before
        prep4 = _AffineFusedPrep(ex2, Kcat2, a2, "highest", 768, "auto",
                                 cheap_far=True)
        assert prep4.has_far and prep4.Hb == 128
        # moderate window (cost_full = 0.4 < 0.75) -> full halo, both
        prep5 = _AffineFusedPrep(ex2, Kcat2, a2, "highest", 3840, "auto",
                                 cheap_far=True)
        assert not prep5.has_far
        prep6 = _AffineFusedPrep(ex2, Kcat2, a2, "highest", 3840, "auto")
        assert not prep6.has_far


class TestProceduralMasks:
    """Roll-class masks synthesized from in-kernel iota predicates."""

    def test_pattern_detection(self):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            _periodic_mask_params)

        E = 40
        m = np.ones(E, bool)
        assert _periodic_mask_params(m) == ("all",)
        m = np.ones(E, bool); m[:8] = False
        assert _periodic_mask_params(m) == ("run", 0, 8)
        m = np.ones(E, bool); m[32:] = False
        assert _periodic_mask_params(m) == ("run", 32, 8)
        m = np.ones(E, bool); m[7::8] = False
        assert _periodic_mask_params(m) == ("iota", 7, 8, 1)
        m = np.ones(E, bool); m[0::8] = False; m[1::8] = False
        assert _periodic_mask_params(m) == ("iota", 0, 8, 2)
        # irregular: falls back
        m = np.ones(E, bool); m[[3, 11, 13]] = False
        assert _periodic_mask_params(m) is None
        # verify reconstruction rejects near-misses
        m = np.ones(E, bool); m[7::8] = False; m[15] = True
        assert _periodic_mask_params(m) is None

    def test_rectangle_masks_all_procedural(self):
        """On a structured rectangle mesh every near-class mask should
        be synthesized (no mask rows streamed)."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)
        from spectralelementmethod_tpu.ops import sumfac
        from spectralelementmethod_tpu.ops.exchange import RollExchange
        from spectralelementmethod_tpu.basis import gll_basis_2d
        from spectralelementmethod_tpu.core.discretization import (
            Discretization)
        from spectralelementmethod_tpu.mesh import rectangle_mesh
        from spectralelementmethod_tpu.models.poisson import Poisson

        mesh = rectangle_mesh(16, 8, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", lambda x, y: 0.0)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        W = disc.basis.weight_grid().reshape(-1)
        a, exact = sumfac.affine_factorization(Gf, W)
        assert exact
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        fused = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=3840, interpret=True)
        kinds = fused._prep.mask_kinds
        assert kinds and all(k[0] != "row" for k in kinds), kinds
        # and the kernel still matches the XLA path exactly
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        rng = np.random.RandomState(5)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        expected = np.asarray(A_xla(uT))
        got = np.asarray(fused(uT))
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < 1e-5

    def test_padded_exchange_cut(self):
        """Pad-tail lanes must stay excluded when masks go procedural."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T, fused_affine_pad)
        from spectralelementmethod_tpu.ops import sumfac
        from spectralelementmethod_tpu.ops.exchange import make_exchange
        from spectralelementmethod_tpu.basis import gll_basis_2d
        from spectralelementmethod_tpu.core.discretization import (
            Discretization)
        from spectralelementmethod_tpu.mesh import rectangle_mesh
        from spectralelementmethod_tpu.models.poisson import Poisson

        mesh = rectangle_mesh(18, 9, 3)    # E=162: needs padding
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", lambda x, y: 0.0)
        ex = make_exchange(disc, fused_pad=True, fused_pad_min_e=0)
        assert ex.E > ex.E_real
        Gf = np.zeros((ex.E, 3, disc.n_loc), np.float32)
        Gf[:disc.E] = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        W = disc.basis.weight_grid().reshape(-1)
        a, _ = sumfac.affine_factorization(Gf, W)
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        fused = make_fused_affine_laplacian_T(
            ex, Kcat, a, interpret=True)
        assert fused._prep.pad_cut == ex.E_real
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        rng = np.random.RandomState(6)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        expected = np.asarray(A_xla(uT))
        got = np.asarray(fused(uT))
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < 1e-5


class TestAnisotropicFused:
    """Anisotropic node grids (p0 != p1 — the reference's tensor bases
    are anisotropic throughout, ``sem/basis_functions.py:683-697``) on
    the fused Pallas kernel path: per-slot edge lengths replace the
    uniform ``ne`` in every DSS/far row-bookkeeping structure."""

    def _pieces(self, nx, ny, p0, p1):
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        mesh = rectangle_mesh(nx, ny, (p0, p1))
        disc = Discretization(mesh, gll_basis_2d(p0, p1))
        prob = Poisson(disc, dtype=np.float32)
        ex = RollExchange(disc)
        Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
        W = disc.basis.weight_grid().reshape(-1)
        a, exact = sumfac.affine_factorization(Gf, W)
        assert exact
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        return ex, Kcat, a, A_xla

    def test_full_halo_apply_matches_xla(self):
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        ex, Kcat, a, A_xla = self._pieces(16, 8, 3, 4)
        assert ex.ne is None            # genuinely anisotropic
        fused = make_fused_affine_laplacian_T(ex, Kcat, a,
                                              interpret=True)
        rng = np.random.RandomState(3)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        expected = np.asarray(A_xla(uT))
        scale = np.abs(expected).max()
        assert np.abs(np.asarray(fused(uT))
                      - expected).max() / scale < 1e-5

    def test_far_split_both_transports(self):
        """Forced far split on an anisotropic mesh: the aliased update
        kernel and the XLA epilogue agree with each other and the XLA
        operator (per-slot aux/far row offsets)."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        ex, Kcat, a, A_xla = self._pieces(32, 16, 3, 4)
        fk = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=256, max_halo=1,
            far_mode="kernel", interpret=True)
        fx = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=256, max_halo=1,
            far_mode="xla", interpret=True)
        assert fk._prep.has_far and fk._far_update is not None
        rng = np.random.RandomState(5)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        vk, vx = np.asarray(fk(uT)), np.asarray(fx(uT))
        np.testing.assert_array_equal(vk, vx)
        expected = np.asarray(A_xla(uT))
        scale = np.abs(expected).max()
        assert np.abs(vk - expected).max() / scale < 1e-5

    def test_fused_cg_kernels(self):
        """kA/kB CG kernel pair on an anisotropic mesh (auto halo may
        split): Ap recovered through kB (r=0, alpha=1) == XLA apply."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels)

        ex, Kcat, a, A_xla = self._pieces(32, 16, 3, 4)
        kA, kB, _ = make_fused_cg_kernels(ex, Kcat, a,
                                          precision="highest",
                                          interpret=True)
        rng = np.random.RandomState(7)
        r = ex.dss_T(jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32)))
        z = jnp.zeros_like(r)
        ones = jnp.ones_like(r)
        p_new, Ap, x_new, dparts = kA(r, z, ones, z, 0.0, 0.0)
        w = jnp.asarray(np.asarray(ex.weights.T, np.float32))
        rn, _, _ = kB(z, Ap, ones, w, 1.0)
        expected = np.asarray(A_xla(r))
        scale = np.abs(expected).max()
        assert np.abs(-np.asarray(rn) - expected).max() / scale < 1e-4
        expect_denom = float(ex.dot_T(r, jnp.asarray(expected)))
        assert abs(float(jnp.sum(dparts)) - expect_denom) / abs(
            expect_denom) < 1e-4

    def test_solve_local_auto_routes_fused(self):
        """The sumfac fused_ok gate admits anisotropic roll exchanges:
        an explicit fused-interpret backend build works end-to-end."""
        ex, Kcat, a, A_xla = self._pieces(16, 8, 3, 4)
        mesh = rectangle_mesh(16, 8, (3, 4))
        disc = Discretization(mesh, gll_basis_2d(3, 4))
        prob = Poisson(disc, dtype=np.float32)
        Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        A_f = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne",
            backend="fused-interpret")
        rng = np.random.RandomState(9)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        expected = np.asarray(A_xla(uT))
        scale = np.abs(expected).max()
        assert np.abs(np.asarray(A_f(uT))
                      - expected).max() / scale < 1e-5
