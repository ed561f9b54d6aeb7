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
