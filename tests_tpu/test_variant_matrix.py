"""Hardware kernel-variant matrix (VERDICT round-3 item 7).

Both real Mosaic lowering bugs of rounds 2-3 (i64 convert recursion;
unaligned sublane offset concat) were caught only on hardware, after
landing — interpret mode does not model layouts, SMEM scalar plumbing,
or VMEM budgets.  This file compiles and oracle-checks the production
kernel family across its variant axes ON THE CHIP:

    {affine, general} x {full-halo, far-split} x {defer 0, 8}
        x {k = 1, 2, 4} x {iso, aniso} x precision tiers

Every case checks numerics against the unfused XLA operator (not just
"it compiled").  Small meshes (E=128) keep per-case compile cost at
tens of seconds; the persistent compilation cache (enabled in conftest)
makes re-runs cheap.
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

# far-split forcing: row stride is 8 on these meshes, so max_halo=4
# sends the {7, 8, 9} roll classes through the far path
FAR = dict(max_halo=4)


def _build(order):
    """(ex, Gf, a, Kcat, Dhat, A_xla_affine, A_xla_general, uT, prob)."""
    mesh = rectangle_mesh(8, 16, order)      # row stride 8; E = 128
    basis = gll_basis_2d(*order) if isinstance(order, tuple) \
        else gll_basis_2d(order)
    disc = Discretization(mesh, basis)
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
    A_aff = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla",
        structure="affine")
    A_gen = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla",
        structure="general")
    rng = np.random.RandomState(7)
    uT = ex.dss_T(jnp.asarray(
        rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32)))
    return ex, Gf, a, Kcat, Dhat, A_aff, A_gen, uT, prob


@pytest.fixture(scope="module")
def iso():
    return _build(8)


@pytest.fixture(scope="module")
def aniso():
    return _build((7, 8))


def _grid(name, iso, aniso):
    return iso if name == "iso" else aniso


def _check_apply(fused, A_xla, uT, k, tol):
    n, E = uT.shape
    if k == 1:
        got = np.asarray(fused(uT))
        expect = np.asarray(A_xla(uT))
    else:
        # multi-RHS kernels take sublane-stacked (k*n, E) inputs
        U = jnp.concatenate([uT * (1.0 + 0.25 * j) for j in range(k)],
                            axis=0)
        got = np.asarray(fused(U)).reshape(k, n, E)
        expect = np.stack([np.asarray(A_xla(uT)) * (1.0 + 0.25 * j)
                           for j in range(k)])
    scale = np.abs(expect).max()
    assert np.abs(got - expect).max() / scale < tol


# ---------------------------------------------------------------------------
# Apply kernels
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("grid", ["iso", "aniso"])
@pytest.mark.parametrize("k", [1, 2, 4])
def test_affine_apply_full_halo(grid, k, iso, aniso):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_affine_laplacian_T)

    ex, Gf, a, Kcat, Dhat, A_aff, _, uT, _ = _grid(grid, iso, aniso)
    fused = make_fused_affine_laplacian_T(ex, Kcat, a, n_rhs=k)
    _check_apply(fused, A_aff, uT, k, 1e-5)


@pytest.mark.parametrize("grid", ["iso", "aniso"])
def test_affine_apply_far_split(grid, iso, aniso):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_affine_laplacian_T)

    ex, Gf, a, Kcat, Dhat, A_aff, _, uT, _ = _grid(grid, iso, aniso)
    fused = make_fused_affine_laplacian_T(ex, Kcat, a, far_mode="kernel",
                                          **FAR)
    assert fused._prep.has_far
    _check_apply(fused, A_aff, uT, 1, 1e-5)


@pytest.mark.parametrize("precision,tol",
                         [("highest", 1e-5), ("high", 1e-4),
                          ("default", 2e-2)])
def test_affine_apply_precision_tiers(precision, tol, iso):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_affine_laplacian_T)

    ex, Gf, a, Kcat, Dhat, A_aff, _, uT, _ = iso
    fused = make_fused_affine_laplacian_T(ex, Kcat, a,
                                          precision=precision)
    _check_apply(fused, A_aff, uT, 1, tol)


@pytest.mark.parametrize("grid", ["iso", "aniso"])
@pytest.mark.parametrize("k", [1, 2, 4])
def test_general_apply_full_halo(grid, k, iso, aniso):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_general_laplacian_T)

    ex, Gf, a, Kcat, Dhat, _, A_gen, uT, _ = _grid(grid, iso, aniso)
    fused = make_fused_general_laplacian_T(ex, Gf, Dhat, n_rhs=k)
    _check_apply(fused, A_gen, uT, k, 1e-4)


def test_general_apply_far_split(iso):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_general_laplacian_T)

    ex, Gf, a, Kcat, Dhat, _, A_gen, uT, _ = iso
    fused = make_fused_general_laplacian_T(
        ex, Gf, Dhat, target_win=256, far_mode="kernel", **FAR)
    assert fused._prep.has_far and fused._far_update is not None
    _check_apply(fused, A_gen, uT, 1, 1e-4)


# ---------------------------------------------------------------------------
# CG kernels — one-invocation oracle: with beta=0, inv=1, alpha_prev=0,
# kernel A returns p' = r and Ap' = A r, checked against the XLA apply
# ---------------------------------------------------------------------------


def _check_kA(kA, A_xla, ex, uT, defer, tol):
    """Full-halo single-RHS kernels: beta=0, inv=1 => Ap' = A r."""
    zeros = jnp.zeros_like(uT)
    inv = jnp.ones_like(uT)
    if defer:
        p_new, Ap, dparts = kA(uT, zeros, inv, 0.0)
    else:
        p_new, Ap, x_new, dparts = kA(uT, zeros, inv, zeros, 0.0, 0.0)
    assert not isinstance(Ap, tuple)
    expect = np.asarray(A_xla(uT))
    got = np.asarray(Ap, dtype=np.float32)
    scale = np.abs(expect).max()
    assert np.abs(got - expect).max() / scale < tol
    denom = float(jnp.sum(dparts))
    expect_d = float(ex.dot_T(uT, jnp.asarray(expect)))
    assert abs(denom - expect_d) / abs(expect_d) < tol * 10


def _solve_oracle(pieces, kA, kB, k, defer, p_dtype, tol=2e-3):
    """Split/batched kernels use internal far-row contracts the kA
    oracle cannot see — verify them through a full Poisson solve
    against the plain-CG solution."""
    from spectralelementmethod_tpu.solver.cg import (cg_fused,
                                                     cg_fused_batched)

    ex, Gf, a, Kcat, Dhat, A_aff, _, uT, prob = pieces
    fnp = (~prob._dirichlet_mask)[ex.gather_hier]
    freeT = jnp.asarray(np.ascontiguousarray(fnp.T))
    diagL = jnp.asarray(np.ascontiguousarray(
        np.asarray(prob.operator_diagonal())[ex.gather_hier]
        .astype(np.float32).T))
    aux_dt = jnp.bfloat16 if p_dtype is not None else jnp.float32
    inv = jnp.where(freeT, 1.0 / jnp.where(diagL != 0, diagL, 1.0),
                    0.0).astype(aux_dt)
    w = jnp.asarray(np.asarray(ex.weights.T, dtype=np.float32))
    w_free = jnp.where(freeT, w, 0.0).astype(aux_dt)
    b = np.asarray(prob._b) + prob._neumann
    bL = jnp.asarray(np.ascontiguousarray(
        b[ex.gather_hier].astype(np.float32).T))
    r0 = jnp.where(freeT, bL, 0.0)
    sol_plain = prob.solve_local(tol=1e-6, vector_layout="ne",
                                 cg_kernel="plain")
    # tol 1e-5: bf16 direction storage floors the attainable relative
    # residual near 1e-6 at this size (the production paths re-anchor
    # via the true-residual restart; this oracle checks kernels, not
    # the restart)
    if k == 1:
        res = cg_fused(kA, kB, r0, inv=inv, w_free=w_free, tol=1e-5,
                       max_iter=1500, block=750, p_dtype=p_dtype,
                       defer_x=defer)
        assert bool(res.converged)
        u = ex.global_from_local_T(np.asarray(res.x))
    else:
        R = jnp.stack([r0 * (1.0 + 0.25 * j) for j in range(k)])
        res = cg_fused_batched(kA, kB, R, inv=inv, w_free=w_free,
                               tol=1e-5, max_iter=1500, block=750,
                               p_dtype=p_dtype, defer_x=defer)
        assert bool(np.asarray(res.converged).all())
        u = ex.global_from_local_T(np.asarray(res.x[0]))
    scale = np.abs(sol_plain.u).max()
    assert np.abs(u - sol_plain.u).max() / scale < tol


@pytest.mark.parametrize("grid", ["iso", "aniso"])
@pytest.mark.parametrize("halo", ["full", "split"])
@pytest.mark.parametrize("defer", [0, 8])
def test_affine_cg_kernel_matrix(grid, halo, defer, iso, aniso):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_cg_kernels)

    ex, Gf, a, Kcat, Dhat, A_aff, _, uT, _ = _grid(grid, iso, aniso)
    kw = dict(FAR) if halo == "split" else {}
    kA, kB, _ = make_fused_cg_kernels(ex, Kcat, a, precision="highest",
                                      defer_x=bool(defer), **kw)
    if halo == "split":
        assert kA._prep.has_far
        _solve_oracle(_grid(grid, iso, aniso), kA, kB, 1, defer, None)
    else:
        _check_kA(kA, A_aff, ex, uT, bool(defer), 1e-4)


@pytest.mark.parametrize("halo", ["full", "split"])
@pytest.mark.parametrize("defer", [0, 8])
def test_affine_cg_kernel_bf16p(halo, defer, iso):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_cg_kernels)

    ex, Gf, a, Kcat, Dhat, A_aff, _, uT, _ = iso
    kw = dict(FAR) if halo == "split" else {}
    kA, kB, _ = make_fused_cg_kernels(ex, Kcat, a, precision="high",
                                      p_dtype=jnp.bfloat16,
                                      defer_x=bool(defer), **kw)
    # solution error ~ tol * kappa: 1e-5 residual on this ~1e3-cond
    # system puts the solution ~1e-2 from the 1e-6 plain solve
    _solve_oracle(iso, kA, kB, 1, defer, jnp.bfloat16, tol=3e-2)


@pytest.mark.parametrize("k", [2, 4])
@pytest.mark.parametrize("halo", ["full", "split"])
@pytest.mark.parametrize("defer", [0, 8])
def test_batched_cg_kernel_matrix(k, halo, defer, iso):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_cg_kernels_batched)

    ex, Gf, a, Kcat, Dhat, A_aff, _, uT, _ = iso
    kw = dict(FAR) if halo == "split" else {}
    kA, kB, _ = make_fused_cg_kernels_batched(
        ex, Kcat, a, n_rhs=k, precision="highest",
        defer_x=bool(defer), **kw)
    if halo == "split":
        assert kA._prep.has_far
    _solve_oracle(iso, kA, kB, k, defer, None)


@pytest.mark.parametrize("halo", ["full", "split"])
def test_general_cg_kernel(halo, iso):
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_cg_kernels_general)

    ex, Gf, a, Kcat, Dhat, _, A_gen, uT, _ = iso
    kw = dict(FAR) if halo == "split" else {}
    kA, kB, _ = make_fused_cg_kernels_general(
        ex, Gf, Dhat, precision="high", p_dtype=jnp.bfloat16, **kw)
    _solve_oracle(iso, kA, kB, 1, 0, jnp.bfloat16, tol=3e-2)


@pytest.mark.parametrize("defer", [0, 8])
def test_single_kernel_cg(defer, iso):
    """The one-kernel-per-iteration mode (deferred residual update):
    full Poisson solve converges on hardware."""
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_cg_kernel_single)
    from spectralelementmethod_tpu.solver.cg import cg_fused

    ex, Gf, a, Kcat, Dhat, A_aff, _, uT, prob = iso
    kA, _ = make_fused_cg_kernel_single(ex, Kcat, a, precision="high",
                                        p_dtype=jnp.bfloat16,
                                        defer_x=bool(defer))
    fnp = (~prob._dirichlet_mask)[ex.gather_hier]
    freeT = jnp.asarray(np.ascontiguousarray(fnp.T))
    diagL = jnp.asarray(np.ascontiguousarray(
        np.asarray(prob.operator_diagonal())[ex.gather_hier]
        .astype(np.float32).T))
    inv = jnp.where(freeT, 1.0 / jnp.where(diagL != 0, diagL, 1.0),
                    0.0).astype(jnp.bfloat16)
    w = jnp.asarray(np.asarray(ex.weights.T, dtype=np.float32))
    w_free = jnp.where(freeT, w, 0.0).astype(jnp.bfloat16)
    b = np.asarray(prob._b) + prob._neumann
    bL = jnp.asarray(np.ascontiguousarray(
        b[ex.gather_hier].astype(np.float32).T))
    r0 = jnp.where(freeT, bL, 0.0)
    res = cg_fused(kA, None, r0, inv=inv, w_free=w_free, tol=1e-5,
                   max_iter=800, p_dtype=jnp.bfloat16, defer_x=defer)
    assert bool(res.converged)
