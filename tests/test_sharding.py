"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.parallel import sharding as sh
from spectralelementmethod_tpu.solver.cg import cg


@pytest.fixture(scope="module")
def problem():
    mesh = rectangle_mesh(5, 3, 4)  # E=15, not divisible by 8 -> padding
    disc = Discretization(mesh, gll_basis_2d(4))
    prob = Poisson(disc)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
    return prob


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_padding():
    assert sh.pad_elements(15, 8) == 16
    assert sh.pad_elements(16, 8) == 16
    g = np.arange(6).reshape(3, 2).astype(np.int32)
    a = np.ones((3, 4))
    gp, ap = sh.pad_element_arrays(g, a, n_shards=4)
    assert gp.shape == (4, 2) and ap.shape == (4, 4)
    assert np.all(gp[3] == 0) and np.all(ap[3] == 0.0)


def test_sharded_operator_matches_single_device(problem):
    mesh = sh.device_mesh(8)
    gix, G = sh.pad_element_arrays(
        np.asarray(problem._gix), np.asarray(problem._G), n_shards=8
    )
    gix, G = sh.shard_element_arrays(mesh, gix, G)
    free = jnp.asarray(~problem._dirichlet_mask)
    A = sh.make_sharded_poisson_operator(
        mesh, gix, G, problem._D0, problem._D1, problem.disc.n_nodes, free
    )
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(problem.disc.n_nodes))
    v_sharded = np.asarray(A(u))
    # single-device masked apply
    from spectralelementmethod_tpu.ops import sumfac

    v_single = np.asarray(
        sumfac.masked(
            problem.apply_operator(sumfac.masked(u, free)), free
        )
    )
    np.testing.assert_allclose(v_sharded, v_single, atol=1e-12)


def test_sharded_cg_solve_matches(problem):
    """Full sharded CG solve == single-device solve to solver tolerance."""
    sol_single = problem.solve(tol=1e-13, host_loop=True)

    A, r, M, u_d, mesh = sh.sharded_poisson_problem(problem)
    res = cg(A, r, M=M, tol=1e-13, max_iter=2000)
    u_sharded = np.asarray(u_d + res.x)
    assert bool(res.converged)
    np.testing.assert_allclose(u_sharded, sol_single.u, atol=1e-10)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_various_mesh_sizes(problem, n_dev):
    mesh = sh.device_mesh(n_dev)
    A, r, M, u_d, _ = sh.sharded_poisson_problem(problem, mesh)
    v = np.asarray(A(r))
    assert np.all(np.isfinite(v))


def test_sharded_local_cg_matches(problem):
    """Element-sharded L-vector CG == single-device solve (production path)."""
    sol_single = problem.solve(tol=1e-13, host_loop=True)

    mesh = sh.device_mesh(8)
    A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(problem, mesh)
    assert ex.E % 8 == 0            # padded to the shard count
    res = cg(A, r, M=M, tol=1e-13, max_iter=2000, dot=ex.dot)
    assert bool(res.converged)
    u = ex.global_from_local(np.asarray(u_dL + res.x))
    np.testing.assert_allclose(u, sol_single.u, atol=1e-9)


def test_padded_exchange_matches_unpadded(problem):
    """pad_to adds inert elements: dss and dot results are unchanged."""
    from spectralelementmethod_tpu.ops.exchange import LocalExchange

    disc = problem.disc
    ex0 = LocalExchange(disc)
    exp = LocalExchange(disc, pad_to=disc.E + 5)
    rng = np.random.RandomState(0)
    v = rng.standard_normal((disc.E, disc.n_loc))
    vp = np.concatenate([v, np.zeros((5, disc.n_loc))])
    a = np.asarray(ex0.dss(jnp.asarray(v)))
    b = np.asarray(exp.dss(jnp.asarray(vp)))
    np.testing.assert_allclose(b[:disc.E], a, atol=1e-13)
    d0 = float(ex0.dot(jnp.asarray(v), jnp.asarray(v)))
    dp = float(exp.dot(jnp.asarray(vp), jnp.asarray(vp)))
    assert abs(d0 - dp) < 1e-10 * max(abs(d0), 1.0)


class TestShardedFusedOperator:
    """shard_map(ppermute halo + fused Pallas block kernel) == single-device
    fused/XLA transposed apply (``parallel.halo.make_sharded_fused_operator``,
    interpret mode)."""

    def _build(self, nx, ny, p):
        from spectralelementmethod_tpu.ops import sumfac
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
        A_ref = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        return ex, Kcat, a, A_ref

    @pytest.mark.parametrize("n_dev", [1, 2, 8])
    def test_matches_single_device(self, n_dev):
        from spectralelementmethod_tpu.parallel import halo

        ex, Kcat, a, A_ref = self._build(32, 32, 3)   # E=1024
        mesh = sh.device_mesh(n_dev)
        A = halo.make_sharded_fused_operator(
            ex, Kcat, a, mesh, interpret=True)
        rng = np.random.RandomState(3)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        got = np.asarray(jax.jit(A)(uT))
        expected = np.asarray(A_ref(uT))
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < 1e-5

    def test_too_many_shards_raises(self):
        from spectralelementmethod_tpu.parallel import halo

        ex, Kcat, a, _ = self._build(16, 16, 3)       # E=256 -> Eb=32
        mesh = sh.device_mesh(8)
        with pytest.raises(ValueError, match="halo|shards"):
            halo.make_sharded_fused_operator(ex, Kcat, a, mesh,
                                             interpret=True)

    def test_ppermute_in_hlo(self):
        """The sharded fused apply lowers to collective-permute (and no
        all-gather of the element axis)."""
        from spectralelementmethod_tpu.parallel import halo

        ex, Kcat, a, _ = self._build(32, 32, 3)
        mesh = sh.device_mesh(8)
        A = halo.make_sharded_fused_operator(
            ex, Kcat, a, mesh, interpret=True)
        uT = jnp.zeros((ex.n_loc, ex.E), jnp.float32)
        txt = jax.jit(A).lower(uT).compile().as_text()
        assert "collective-permute" in txt
        assert "all-gather" not in txt

    def test_full_cg_solve_shardmap_fused(self):
        """comm='shardmap-fused' CG solve == single-device solve (f32)."""
        mesh2d = rectangle_mesh(16, 16, 3)
        disc = Discretization(mesh2d, gll_basis_2d(3))
        prob = Poisson(disc, dtype=np.float32)
        prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
        sol_single = prob.solve(tol=1e-6, host_loop=True)

        mesh = sh.device_mesh(2)                    # Eb=128 >= Hpad
        A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(
            prob, mesh, comm="shardmap-fused")
        res = cg(A, r, M=M, tol=1e-6, max_iter=2000, dot=ex.dot_T)
        assert bool(res.converged)
        u = ex.global_from_local_T(np.asarray(u_dL + res.x))
        np.testing.assert_allclose(u, sol_single.u, atol=5e-4)


class TestSharded3D:
    """Element-sharded 3D L-vector CG: plane-roll DSS over the sharded
    element axis lowers to collective-permutes."""

    def _problem(self):
        from spectralelementmethod_tpu.basis import gll_basis_3d
        from spectralelementmethod_tpu.mesh import box_mesh

        mesh3 = box_mesh(4, 3, 3, 3)            # E=36 -> pads to 40
        disc = Discretization(mesh3, gll_basis_3d(3))
        prob = Poisson(disc)
        prob.set_dirichlet("ebc",
                           lambda x, y, z: 0.1 * (x + y) - 0.05 * z)
        return prob

    def test_solve_matches_single_device(self):
        prob = self._problem()
        sol_single = prob.solve(tol=1e-12, host_loop=True)

        mesh = sh.device_mesh(8)
        A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem_3d(
            prob, mesh)
        res = cg(A, r, M=M, tol=1e-12, max_iter=2000, dot=ex.dot)
        assert bool(res.converged)
        u = ex.global_from_local(np.asarray(u_dL + res.x))
        np.testing.assert_allclose(u, sol_single.u, atol=1e-9)

    def test_hlo_has_collective_permute(self):
        prob = self._problem()
        mesh = sh.device_mesh(8)
        A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem_3d(
            prob, mesh)
        txt = jax.jit(A).lower(r).compile().as_text()
        assert "collective-permute" in txt
        assert "all-gather" not in txt


class TestHybridMeshAndWrapElision:
    """Multi-slice (ICI x DCN) tier: slice-major hybrid mesh + elision of
    the ring's wrap-around ppermute for non-periodic element orders."""

    def test_hybrid_mesh_pseudo_slices(self):
        mesh = sh.hybrid_device_mesh(n_slices=2)
        assert mesh.devices.size == 8
        np.testing.assert_array_equal(
            mesh.shard_slice_ids, [0, 0, 0, 0, 1, 1, 1, 1])
        with pytest.raises(ValueError):
            sh.hybrid_device_mesh(n_slices=3)

    @staticmethod
    def _wide_problem():
        # wide enough that every roll delta fits an 8-shard block
        m = rectangle_mesh(16, 8, 3)                      # E = 128
        problem = Poisson(Discretization(m, gll_basis_2d(3)))
        problem.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
        return problem

    def test_hybrid_mesh_solve_matches(self):
        problem = self._wide_problem()
        sol_single = problem.solve(tol=1e-13, host_loop=True)
        mesh = sh.hybrid_device_mesh(n_slices=2)
        A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(
            problem, mesh, comm="shardmap")
        res = cg(A, r, M=M, tol=1e-13, max_iter=2000, dot=ex.dot_T)
        assert bool(res.converged)
        u = ex.global_from_local_T(np.asarray(u_dL + res.x))
        np.testing.assert_allclose(u, sol_single.u, atol=1e-9)

    def test_wrap_elided_for_nonperiodic_order(self):
        """A rectangle mesh's element order never wraps: every roll class
        elides the ring's wrap pair, so the lowered HLO contains
        collective-permutes but neither {0,S-1} nor {S-1,0}."""
        from spectralelementmethod_tpu.utils.hoist import hoist_closure

        problem = self._wide_problem()
        mesh = sh.hybrid_device_mesh(n_slices=2)
        A, r, *_rest = sh.sharded_local_poisson_problem(
            problem, mesh, comm="shardmap")
        assert not any(A._dss._edge_wrap) and not any(A._dss._vert_wrap)

        A_pure, A_c = hoist_closure(A, r)
        hlo = jax.jit(lambda u, *c: A_pure(u, *c)).lower(
            r, *A_c).compile().as_text()
        assert "collective-permute" in hlo
        # wrap pairs: source 0 -> dest 7 (delta > 0) and 7 -> 0 (delta < 0)
        pairs = set()
        for m in re.finditer(r"source_target_pairs=\{([^}]*(?:\},\{[^}]*)*)\}\}",
                             hlo):
            for a, b in re.findall(r"\{(\d+),(\d+)\}", m.group(0)):
                pairs.add((int(a), int(b)))
        assert pairs, "no source_target_pairs parsed from HLO"
        assert (0, 7) not in pairs and (7, 0) not in pairs
        assert (1, 0) in pairs or (0, 1) in pairs

    def test_wrap_kept_when_order_is_periodic(self, problem):
        """Force a synthetic periodic class mask: the wrap pair must stay
        and global_roll must reproduce jnp.roll exactly."""
        from spectralelementmethod_tpu.parallel import halo

        # wrap=True reproduces jnp.roll over shards; wrap=False zero-fills
        # exactly the wrapped lanes
        mesh = sh.device_mesh(8)
        x = np.arange(32, dtype=np.float64)[None, :] + 1.0
        for delta in (3, -3):
            for wrap in (True, False):
                f = jax.shard_map(
                    lambda blk, d=delta, w=wrap: halo.global_roll(
                        blk, d, sh.ELEM_AXIS, 8, wrap=w),
                    mesh=mesh,
                    in_specs=(jax.sharding.PartitionSpec(None, "elements"),),
                    out_specs=jax.sharding.PartitionSpec(None, "elements"))
                got = np.asarray(f(jnp.asarray(x)))
                want = np.roll(x, -delta, axis=-1)
                if not wrap:
                    if delta > 0:
                        want[..., -delta:] = 0.0
                    else:
                        want[..., :-delta] = 0.0
                np.testing.assert_allclose(got, want, atol=0)

    def test_class_uses_wrap_detection(self):
        from spectralelementmethod_tpu.parallel.halo import _class_uses_wrap

        m = np.zeros(16, bool)
        assert not _class_uses_wrap(m, 3)
        m[15] = True
        assert _class_uses_wrap(m, 3)
        assert not _class_uses_wrap(m, -3)
        m2 = np.zeros(16, bool)
        m2[1] = True
        assert _class_uses_wrap(m2, -3)
        assert not _class_uses_wrap(m2, 3)


class TestShardedSquirmerResidual:
    """Multi-chip x squirmer composition (VERDICT round-2 missing #4,
    first slice): the Newton path's per-element residual and autodiff
    Jacobian tensor ops are element-batched vmaps over (E, ...) operand
    arrays, so they shard transparently over the element axis.  This
    pins that composition: element-sharded residual/Jacobian match the
    single-device values bitwise and keep the element sharding on their
    outputs.  (The condensed dense assembly/solve stays replicated —
    fine at reference scale E=135; full distribution is future work,
    TODO.md.)"""

    def _build(self):
        import numpy as np

        from spectralelementmethod_tpu.mesh import annulus_mesh
        from spectralelementmethod_tpu.models import squirmer as sqm

        mesh = annulus_mesh(order=4, n_theta=4, n_r=4, r_outer=10.0,
                            progression=1.2)   # E = 16 = 8 shards x 2
        sq = sqm.Squirmer(mesh, order=4)
        sq.set_initial_guess()
        sq.set_boundary_conditions(speed=1.0, beta=1.0)
        sq.compute_operators(1.0)
        return sq

    def test_element_sharded_residual_and_jacobian(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from spectralelementmethod_tpu.parallel import sharding as sh

        sq = self._build()
        disc = sq.disc
        p1 = sq.p1
        nd = 2 * disc.n_loc
        local_residual, jac_fn = sq._local_system_fns()

        xe = np.asarray(sq.soln)[np.asarray(disc.gather_nodes)]
        x_flat = jnp.asarray(xe.reshape(-1, p1, p1, 2).reshape(-1, nd),
                             dtype=sq.dtype)
        rho_sq_JxW = sq._rho * sq._rho * sq._JxW
        ops = (x_flat, sq._Grho, sq._JxW, sq._inv_rho, sq._invJ,
               rho_sq_JxW)

        res_fn = jax.jit(jax.vmap(local_residual,
                                  in_axes=(0, 0, 0, 0, 0, 0, None)))
        jfn = jax.jit(jax.vmap(jac_fn,
                               in_axes=(0, 0, 0, 0, 0, 0, None)))
        n_rey = jnp.asarray(1.0, sq.dtype)
        res_1 = np.asarray(res_fn(*ops, n_rey))
        jac_1 = np.asarray(jfn(*ops, n_rey))

        mesh8 = sh.device_mesh(8)
        spec = NamedSharding(mesh8, P("elements"))
        ops_sh = tuple(jax.device_put(o, spec) for o in ops)
        res_s = res_fn(*ops_sh, n_rey)
        jac_s = jfn(*ops_sh, n_rey)
        # outputs stay element-sharded (no implicit gather)
        assert "elements" in str(res_s.sharding.spec)
        # element-parallel math: per-shard results equal the
        # single-device ones up to reduction-order roundoff
        scale = np.abs(res_1).max()
        assert np.abs(np.asarray(res_s) - res_1).max() < 1e-12 * scale
        jscale = np.abs(jac_1).max()
        assert np.abs(np.asarray(jac_s) - jac_1).max() < 1e-12 * jscale


class TestShardedPmg:
    """p-multigrid composed with the sharded operator (VERDICT round-3
    item 2): the config-5 solve role is the reference's always-converging
    direct solve (/root/reference/sem/discrete.py:502-528) — at scale
    that means an h-independent preconditioner under sharding, not
    Jacobi throughput."""

    def _solve(self, nx, ny, p, tol=1e-12):
        mesh = rectangle_mesh(nx, ny, p)
        disc = Discretization(mesh, gll_basis_2d(p))
        prob = Poisson(disc, dtype=np.float64)
        prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
        jmesh = sh.device_mesh(8)
        A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(
            prob, jmesh, comm="shardmap", precond="pmg")
        w = ex._weights_as(np.float64, transposed=True)
        res = cg(A, r, M=M, tol=tol, max_iter=400, dot_weight=w, block=25)
        u = ex.global_from_local_T(np.asarray(u_dL + res.x))
        return prob, A, r, M, u_dL, ex, w, res, u

    def test_matches_single_device_1e10(self):
        prob, A, r, M, u_dL, ex, w, res, u_sh = self._solve(12, 10, 4)
        assert bool(res.converged)
        # identical math single-device: unsharded XLA operator, same M
        from spectralelementmethod_tpu.ops import sumfac

        disc = prob.disc
        Gf = np.zeros((ex.E, 3, disc.n_loc))
        Gf[:disc.E] = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        free = ((~prob._dirichlet_mask)[ex.gather_hier])
        free[disc.E:] = False
        A1 = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, jnp.asarray(np.ascontiguousarray(free.T)),
            vector_layout="ne", backend="xla")
        res1 = cg(A1, r, M=M, tol=1e-12, max_iter=400, dot_weight=w,
                  block=25)
        u1 = ex.global_from_local_T(np.asarray(u_dL + res1.x))
        agree = float(np.abs(u_sh - u1).max() / np.abs(u1).max())
        assert agree < 1e-10, agree

    def test_h_independent_iterations(self):
        *_, res_s, _ = self._solve(12, 10, 4)
        *_, res_l, _ = self._solve(24, 20, 4)
        its_s, its_l = int(res_s.iterations), int(res_l.iterations)
        # 4x the elements: pmg iteration counts must not grow like the
        # Jacobi count (~2x per refinement); allow a small drift
        assert its_l <= its_s + 5, (its_s, its_l)
        assert its_l <= 40, its_l

    def test_exact_coarse_engages_on_tensor_mesh(self):
        *_, M, _, _, _, _, _ = self._solve(12, 10, 4)
        assert M._coarse_kind == "fdm"
        assert M._levels == (4, 1)

    def test_pmg_requires_transposed_comm(self):
        mesh = rectangle_mesh(5, 3, 4)
        disc = Discretization(mesh, gll_basis_2d(4))
        prob = Poisson(disc, dtype=np.float64)
        prob.set_dirichlet("ebc", 0.0)
        with pytest.raises(ValueError, match="transposed"):
            sh.sharded_local_poisson_problem(
                prob, sh.device_mesh(8), comm="propagation",
                precond="pmg")


class TestShardedSquirmerEndToEnd:
    """Full sharded Newton -> secant composition (VERDICT round-3 item
    4): element-shard the whole Newton iteration over the 8-device
    virtual mesh — sharded residual/Jacobian + per-element Schur
    condensation, replicated condensed dense solve — and reproduce the
    reference's golden swimming speed.  Reference role: the serial
    per-element Newton loop, examples/squirmer-axisymmetric.py:389-457."""

    def test_golden_speed_on_virtual_mesh(self):
        from spectralelementmethod_tpu.mesh import annulus_mesh
        from spectralelementmethod_tpu.models import squirmer as sqm

        mesh = annulus_mesh(order=8, n_theta=9, n_r=15, r_outer=100.0,
                            progression=1.35, node_placement="gmsh")
        sq = sqm.Squirmer(mesh, order=8)
        sq.shard_elements(sh.device_mesh(8))
        # element operands really are sharded (uneven 135 over 8)
        assert "elements" in str(sq._Grho.sharding.spec)
        sq.set_initial_guess()
        speed = sq.calc_speed([0.99, 1.01], n_rey=1.0, beta=1.0,
                              verbose=False)
        assert abs(speed - 0.92571156681483957) < 2e-6
