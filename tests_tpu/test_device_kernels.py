"""Real-Mosaic kernel equivalence tests (TPU hardware only).

Mirrors the interpret-mode tests in tests/test_pallas_kernels.py and
tests/test_cg_fused.py on the actual device — Mosaic-specific lowering
regressions (layouts, SMEM scalar outputs, VMEM budgets) do not reproduce
in the interpreter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops import sumfac
from spectralelementmethod_tpu.ops.exchange import RollExchange


@pytest.fixture(scope="module")
def pieces():
    p = 8
    mesh = rectangle_mesh(16, 8, p)          # E=128: one lane tile
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = RollExchange(disc)
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla")
    rng = np.random.RandomState(0)
    u = ex.dss_T(jnp.asarray(
        rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32)))
    return ex, Kcat, a, A_xla, u, prob


def test_fused_apply_matches_xla_on_device(pieces):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_affine_laplacian_T)

    ex, Kcat, a, A_xla, u, _ = pieces
    fused = make_fused_affine_laplacian_T(ex, Kcat, a)
    got = np.asarray(fused(u))
    expect = np.asarray(A_xla(u))
    scale = np.abs(expect).max()
    assert np.abs(got - expect).max() / scale < 1e-5


def test_fused_apply_high_precision_on_device(pieces):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_affine_laplacian_T)

    ex, Kcat, a, A_xla, u, _ = pieces
    h3 = make_fused_affine_laplacian_T(ex, Kcat, a, precision="high")
    expect = np.asarray(A_xla(u))
    scale = np.abs(expect).max()
    assert np.abs(np.asarray(h3(u)) - expect).max() / scale < 1e-4


def test_fused_cg_kernels_on_device(pieces):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_cg_kernels)

    ex, Kcat, a, A_xla, u, _ = pieces
    kA, kB, G = make_fused_cg_kernels(ex, Kcat, a, precision="highest")
    inv = jnp.ones_like(u)
    p_new, Ap, x_new, dparts = kA(u, jnp.zeros_like(u), inv,
                                  jnp.zeros_like(u), 0.0, 0.0)
    expect = np.asarray(A_xla(u))            # p' = 1*u + 0
    scale = np.abs(expect).max()
    assert np.abs(np.asarray(Ap) - expect).max() / scale < 1e-5
    denom = float(jnp.sum(dparts))
    expect_denom = float(ex.dot_T(u, jnp.asarray(expect)))
    assert abs(denom - expect_denom) / abs(expect_denom) < 1e-4

    w = jnp.ones_like(u)
    rn, rzp, rn2p = kB(u, Ap, inv, w, 0.25)
    np.testing.assert_allclose(np.asarray(rn),
                               np.asarray(u) - 0.25 * np.asarray(Ap),
                               rtol=1e-5, atol=1e-5)


def test_solve_local_fused_cg_on_device(pieces):
    *_rest, prob = pieces
    sol_plain = prob.solve_local(tol=1e-6, vector_layout="ne",
                                 cg_kernel="plain")
    sol_fused = prob.solve_local(tol=1e-6, vector_layout="ne",
                                 cg_kernel="fused")
    assert bool(sol_fused.cg.converged)
    scale = np.abs(sol_plain.u).max()
    assert np.abs(sol_fused.u - sol_plain.u).max() / scale < 5e-4


def test_sharded_fused_block_kernel_matches(pieces):
    """The per-shard block kernel (external masks/factors) compiles under
    real Mosaic and matches the XLA path on a 1-device mesh."""
    from spectralelementmethod_tpu.parallel import halo, sharding as sh

    ex, Kcat, a, A_xla, _u, _prob = pieces
    mesh = sh.device_mesh(1)
    A = halo.make_sharded_fused_operator(ex, Kcat, a, mesh)
    rng = np.random.RandomState(5)
    uT = jnp.asarray(
        rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
    got = np.asarray(A(uT))
    expected = np.asarray(A_xla(uT))
    scale = np.abs(expected).max()
    assert np.abs(got - expected).max() / scale < 1e-5


def test_panel_order_fused_apply_matches():
    """Fused apply on a panel-ordered mesh (far classes through the
    epilogue) compiles under real Mosaic and matches the XLA path."""
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_affine_laplacian_T)
    from spectralelementmethod_tpu.parallel.partition import (
        panel_order, reorder_elements)

    p = 8
    mesh = rectangle_mesh(16, 16, p)
    mesh = reorder_elements(mesh, panel_order(16, 16, 4))
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = make_exchange(disc)
    assert ex.n_edge_tail == 0 and ex.n_vert_tail == 0
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    fused = make_fused_affine_laplacian_T(ex, Kcat, a, target_win=128,
                                          max_halo=4)
    assert fused._prep.has_far
    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla")
    rng = np.random.RandomState(2)
    uT = jnp.asarray(
        rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
    got = np.asarray(fused(uT))
    expected = np.asarray(A_xla(uT))
    scale = np.abs(expected).max()
    assert np.abs(got - expected).max() / scale < 1e-5


def test_deferred_x_fused_cg_on_device(pieces):
    """defer_x kernels compile under real Mosaic and solve end-to-end."""
    *_rest, prob = pieces
    sol_plain = prob.solve_local(tol=1e-6, vector_layout="ne",
                                 cg_kernel="plain")
    sol_d = prob.solve_local(tol=1e-6, vector_layout="ne",
                             cg_kernel="fused", p_dtype=jnp.bfloat16,
                             defer_x=8)
    assert bool(sol_d.cg.converged)
    scale = np.abs(sol_plain.u).max()
    assert np.abs(sol_d.u - sol_plain.u).max() / scale < 1e-3


def test_fused_general_multirhs_on_device():
    """General-path (full-factor) fused kernel under real Mosaic:
    k sublane-stacked RHS match k single XLA general applies."""
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_general_laplacian_T)

    p = 8
    mesh = rectangle_mesh(16, 8, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, coefficient=lambda x, y: 1 + x * x * y * y,
                   dtype=np.float32)
    ex = RollExchange(disc)
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla",
        structure="general")
    n, E = ex.n_loc, ex.E
    rng = np.random.RandomState(3)
    for k in (1, 4):
        fused = make_fused_general_laplacian_T(ex, Gf, Dhat, n_rhs=k)
        U = jnp.asarray(rng.standard_normal((k * n, E)).astype(np.float32))
        got = np.asarray(fused(U))
        expected = np.concatenate(
            [np.asarray(A_xla(U[j * n:(j + 1) * n])) for j in range(k)],
            axis=0)
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < 1e-5, k


def test_solve_local_batch_whole_batch_on_device():
    """Batched Poisson solve through the whole-batch CG + fused
    multi-RHS kernel (general factors, f32) on hardware."""
    p = 8
    mesh = rectangle_mesh(16, 8, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, coefficient=lambda x, y: 1 + x * x * y * y,
                   dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    sol = prob.solve_local_batch(
        [1.0, lambda x, y: x + y], tol=1e-5, structure="general")
    assert bool(np.asarray(sol.cg.converged).all())
    one = Poisson(disc, coefficient=lambda x, y: 1 + x * x * y * y,
                  dtype=np.float32)
    one.set_dirichlet("ebc", lambda x, y: 0.0)
    ref = one.solve_local(tol=1e-5, structure="general")
    scale = max(np.abs(ref.u).max(), 1e-30)
    assert np.abs(sol.u[0] - ref.u).max() / scale < 1e-3


def test_general_fused_cg_on_device():
    """General fused CG kernels compile under real Mosaic and solve a
    variable-coefficient problem end-to-end."""
    p = 8
    mesh = rectangle_mesh(16, 8, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, coefficient=lambda x, y: 1 + x * x * y * y,
                   dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    sol_p = prob.solve_local(tol=1e-5, cg_kernel="plain",
                             vector_layout="ne")
    sol_f = prob.solve_local(tol=1e-5, cg_kernel="fused",
                             p_dtype=jnp.bfloat16, vector_layout="ne")
    assert bool(sol_f.cg.converged)
    scale = max(np.abs(sol_p.u).max(), 1e-30)
    assert np.abs(sol_f.u - sol_p.u).max() / scale < 1e-3


def test_batched_fused_cg_on_device():
    """k-RHS fused CG kernels compile under real Mosaic and solve a
    batched variable-coefficient problem end-to-end."""
    p = 8
    mesh = rectangle_mesh(16, 8, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, coefficient=lambda x, y: 1 + x * x * y * y,
                   dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    fs = [1.0, lambda x, y: x + y]
    sol_p = prob.solve_local_batch(fs, tol=1e-5, structure="general")
    sol_f = prob.solve_local_batch(fs, tol=1e-5, cg_kernel="fused",
                                   p_dtype=jnp.bfloat16)
    assert bool(np.asarray(sol_f.cg.converged).all())
    scale = max(np.abs(sol_p.u).max(), 1e-30)
    assert np.abs(sol_f.u - sol_p.u).max() / scale < 1e-3


def test_batched_affine_fused_cg_on_device():
    """Affine-routed batched fused CG under real Mosaic."""
    p = 8
    mesh = rectangle_mesh(16, 8, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    fs = [1.0, lambda x, y: x + y]
    sol_p = prob.solve_local_batch(fs, tol=1e-5)
    sol_f = prob.solve_local_batch(fs, tol=1e-5, cg_kernel="fused",
                                   p_dtype=jnp.bfloat16)
    kA = prob._op_cache[("cg_fused_batch", 2, "fused",
                         str(jnp.bfloat16), False)][0]
    assert kA._prep.KT is not None          # affine kernels engaged
    assert bool(np.asarray(sol_f.cg.converged).all())
    scale = max(np.abs(sol_p.u).max(), 1e-30)
    assert np.abs(sol_f.u - sol_p.u).max() / scale < 1e-3


def test_anisotropic_fused_apply_on_device():
    """Anisotropic (p0 != p1) fused apply compiles under real Mosaic:
    per-slot edge lengths in the roll DSS."""
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_affine_laplacian_T)

    mesh = rectangle_mesh(16, 8, (7, 8))
    disc = Discretization(mesh, gll_basis_2d(7, 8))
    prob = Poisson(disc, dtype=np.float32)
    ex = RollExchange(disc)
    assert ex.ne is None
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    fused = make_fused_affine_laplacian_T(ex, Kcat, a)
    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla")
    rng = np.random.RandomState(4)
    uT = jnp.asarray(
        rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
    got, expect = np.asarray(fused(uT)), np.asarray(A_xla(uT))
    scale = np.abs(expect).max()
    assert np.abs(got - expect).max() / scale < 1e-5


def test_general_far_split_apply_on_device():
    """General (curved-mesh) fused apply with the aliased far-row update
    kernel compiles under real Mosaic and matches XLA."""
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_general_laplacian_T)

    p = 8
    mesh = rectangle_mesh(8, 16, p)          # row stride 8
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, coefficient=lambda x, y: 1 + x * x * y * y,
                   dtype=np.float32)
    ex = RollExchange(disc)
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    fused = make_fused_general_laplacian_T(
        ex, Gf, Dhat, target_win=256, max_halo=4, far_mode="kernel")
    assert fused._prep.has_far and fused._far_update is not None
    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla",
        structure="general")
    rng = np.random.RandomState(5)
    uT = jnp.asarray(
        rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
    got, expect = np.asarray(fused(uT)), np.asarray(A_xla(uT))
    scale = np.abs(expect).max()
    assert np.abs(got - expect).max() / scale < 1e-4


def test_batched_far_split_cg_on_device():
    """Batched fused CG kernels with the far split (per-RHS aux/far
    rows through kernel B) compile under real Mosaic and solve."""
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_cg_kernels_batched)
    from spectralelementmethod_tpu.solver.cg import cg_fused_batched

    p = 8
    mesh = rectangle_mesh(8, 16, p)          # row stride 8
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = RollExchange(disc)
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    kA, kB, _ = make_fused_cg_kernels_batched(
        ex, Kcat, a, n_rhs=2, precision="highest", max_halo=4)
    assert kA._prep.has_far
    kA0, kB0, _ = make_fused_cg_kernels_batched(
        ex, Kcat, a, n_rhs=2, precision="highest", max_halo=None)
    n, E = ex.n_loc, ex.E
    free = jnp.asarray(np.ascontiguousarray(
        (~prob._dirichlet_mask)[ex.gather_hier].T))
    diagL = jnp.asarray(np.ascontiguousarray(
        np.asarray(prob.operator_diagonal())[ex.gather_hier]
        .astype(np.float32).T))
    inv = jnp.where(free, 1.0 / jnp.where(diagL != 0, diagL, 1.0), 0.0)
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
