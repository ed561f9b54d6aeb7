"""Guard-rail tests: CG breakdown bail-out, condensation scale limit,
fused-backend dtype validation (ADVICE round-1 items)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.solver import condensation as sc
from spectralelementmethod_tpu.solver.cg import cg, cg_host


def _nan_operator(x):
    return jnp.full_like(x, jnp.nan)


class TestCGBreakdownBail:
    def test_nan_operator_terminates_unconverged(self):
        b = jnp.ones(16)
        res = cg(_nan_operator, b, max_iter=100000, block=8)
        assert not bool(res.converged)
        assert int(res.iterations) == 0

    def test_nan_operator_host_loop(self):
        b = jnp.ones(16)
        res = cg_host(_nan_operator, b, max_iter=1000)
        assert not bool(res.converged)

    def test_healthy_solve_unaffected(self):
        d = jnp.arange(1.0, 17.0)
        res = cg(lambda x: d * x, jnp.ones(16), tol=1e-12, max_iter=200)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x), 1.0 / np.asarray(d),
                                   rtol=1e-10)


class TestCondensationScaleGuard:
    def test_small_mesh_ok(self):
        mesh = rectangle_mesh(2, 2, 4)
        disc = Discretization(mesh, gll_basis_2d(4))
        csys = sc.build_condensed_indexing(disc, 1)
        assert csys.n_ext_dofs > 0

    def test_budget_exceeded_raises(self):
        mesh = rectangle_mesh(4, 4, 4)
        disc = Discretization(mesh, gll_basis_2d(4))
        with pytest.raises(ValueError, match="matrix-free"):
            sc.build_condensed_indexing(disc, 1, max_dense_bytes=64)

    def test_explicit_budget_overrides(self):
        mesh = rectangle_mesh(4, 4, 4)
        disc = Discretization(mesh, gll_basis_2d(4))
        csys = sc.build_condensed_indexing(disc, 1,
                                           max_dense_bytes=1 << 30)
        assert csys.n_ext_dofs > 0


class TestFusedBackendDtypeGuard:
    def test_f64_factors_rejected(self):
        from spectralelementmethod_tpu.ops import sumfac
        from spectralelementmethod_tpu.ops.exchange import make_exchange

        mesh = rectangle_mesh(2, 2, 4)
        disc = Discretization(mesh, gll_basis_2d(4))
        ex = make_exchange(disc, fused_pad=True)
        Gf = jnp.asarray(disc.laplacian_factors().reshape(disc.E, 3, -1),
                         dtype=jnp.float64)
        D = disc.basis.get_D1_matrices()
        Dhat = sumfac.make_stacked_derivative(np.asarray(D[0]),
                                              np.asarray(D[1]))
        with pytest.raises(ValueError, match="float32"):
            sumfac._make_local_laplacian_operator_T(
                ex, Gf, Dhat, backend="fused-interpret")

    def test_compute_dtype_override_rejected(self):
        from spectralelementmethod_tpu.ops import sumfac
        from spectralelementmethod_tpu.ops.exchange import make_exchange

        mesh = rectangle_mesh(2, 2, 4)
        disc = Discretization(mesh, gll_basis_2d(4))
        ex = make_exchange(disc, fused_pad=True)
        Gf = jnp.asarray(disc.laplacian_factors().reshape(disc.E, 3, -1),
                         dtype=jnp.float32)
        D = disc.basis.get_D1_matrices()
        Dhat = sumfac.make_stacked_derivative(np.asarray(D[0]),
                                              np.asarray(D[1]))
        with pytest.raises(ValueError, match="compute_dtype"):
            sumfac._make_local_laplacian_operator_T(
                ex, Gf, Dhat, backend="fused-interpret",
                compute_dtype=jnp.bfloat16)


class TestCGStallCut:
    """stall_cut: an f32 recursion at its rounding floor stops after one
    no-progress ladder block instead of burning max_iter (the plain-CG
    twin of cg_fused's stall detector; VERDICT round-4 item 3)."""

    def _floored_solve(self, stall_cut):
        # f32 CG on the Hilbert matrix (kappa >> 1/eps32) driven to an
        # unreachable absolute tolerance: floors at ~1.4e-3 relative
        # within the first ladder block, then plateaus
        n = 64
        H = 1.0 / (np.arange(n)[:, None] + np.arange(n)[None, :] + 1.0)
        Hd = jnp.asarray(H.astype(np.float32))
        b = jnp.ones(n, jnp.float32)
        return cg(lambda x: Hd @ x, b, tol=0.0, atol=1e-20,
                  max_iter=4096, block=64, stall_cut=stall_cut)

    def test_stall_cut_bounds_issued(self):
        res = self._floored_solve(stall_cut=4.0)
        assert res.stalled
        assert not bool(res.converged)
        # one plateaued block after the floor is reached, then cut
        assert res.issued <= 256
        # the returned iterate is still the floor-accurate solution
        assert float(res.residual_norm) < 0.1

    def test_no_stall_cut_keeps_running(self):
        # without the cut the ladder keeps issuing plateau blocks until
        # a different guard (budget or the 1e6x divergence bail) ends it
        res_cut = self._floored_solve(stall_cut=4.0)
        res = self._floored_solve(stall_cut=None)
        assert not res.stalled
        assert res.issued > res_cut.issued

    def test_converging_solve_not_cut(self):
        d = jnp.arange(1.0, 17.0, dtype=jnp.float32)
        res = cg(lambda x: d * x, jnp.ones(16, jnp.float32), tol=1e-6,
                 max_iter=400, block=64, stall_cut=4.0)
        assert bool(res.converged)
        assert not res.stalled


class TestCGRefinedDiagnostics:
    def test_healthy_solve_one_cycle(self):
        from spectralelementmethod_tpu.solver.cg import cg_refined

        d = jnp.arange(1.0, 65.0, dtype=jnp.float32)
        res = cg_refined(lambda x: d * x, jnp.ones(64, jnp.float32),
                         tol=1e-6, max_iter=400, block=64, cycles=3)
        assert bool(res.converged)
        assert not res.stalled
        assert len(res.cycle_resnorms) == 1
        assert res.cycle_resnorms[0] == pytest.approx(
            float(res.residual_norm))

    def test_floored_solve_reports_stall(self):
        from spectralelementmethod_tpu.solver.cg import cg_refined

        rng = np.random.RandomState(1)
        d = jnp.asarray(
            np.linspace(1.0, 1e5, 512).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(512).astype(np.float32))
        res = cg_refined(lambda x: d * x, b, tol=1e-12, max_iter=4096,
                         block=64, cycles=3)
        assert not bool(res.converged)
        assert res.stalled
        # each cycle's true resnorm recorded; budget bounded by the
        # stall cut, not 3 * max_iter
        assert 1 <= len(res.cycle_resnorms) <= 3
        assert res.issued < 3 * 4096
