"""Element ordering / partitioning for shard locality."""

import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.parallel import partition as pt


@pytest.fixture(scope="module")
def mesh16():
    return rectangle_mesh(16, 16, 2)


def test_morton_is_permutation(mesh16):
    perm = pt.morton_order(mesh16.centroids)
    assert sorted(perm.tolist()) == list(range(mesh16.n_cells))


def test_rcm_is_permutation(mesh16):
    perm = pt.rcm_order(mesh16)
    assert sorted(perm.tolist()) == list(range(mesh16.n_cells))


def test_morton_reduces_cuts_vs_random(mesh16):
    rng = np.random.RandomState(0)
    shuffled = pt.reorder_elements(mesh16, rng.permutation(mesh16.n_cells))
    morton = pt.reorder_elements(
        shuffled, pt.morton_order(shuffled.centroids))
    assert pt.cut_faces(morton, 8) < pt.cut_faces(shuffled, 8)


def test_reorder_preserves_solution(mesh16):
    """The Poisson solution is invariant under element reordering."""
    def solve(mesh):
        disc = Discretization(mesh, gll_basis_2d(2))
        prob = Poisson(disc)
        prob.set_dirichlet("ebc", 0.0)
        prob.set_dirichlet("nbc", 0.0)
        return prob.solve(tol=1e-12).u

    u0 = solve(mesh16)
    perm = pt.morton_order(mesh16.centroids)
    u1 = solve(pt.reorder_elements(mesh16, perm))
    np.testing.assert_allclose(u1, u0, atol=1e-9)


def test_reorder_preserves_boundaries(mesh16):
    perm = pt.rcm_order(mesh16)
    re = pt.reorder_elements(mesh16, perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    for name in mesh16.boundary_names:
        a = {(int(inv[c]), int(f))
             for c, f in mesh16.boundary_faces(name)}
        b = {tuple(p) for p in re.boundary_faces(name).tolist()}
        assert a == b


class TestPanelOrder:
    """Panel reorder: shrinks roll-class offsets to the panel width, with
    cross-panel boundaries as small uniform far classes (zero tails)."""

    def test_is_permutation(self):
        perm = pt.panel_order(16, 16, 4)
        assert sorted(perm.tolist()) == list(range(256))
        with pytest.raises(ValueError, match="divide"):
            pt.panel_order(10, 16, 4)

    def test_roll_classes(self, mesh16):
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        panel = 4
        re = pt.reorder_elements(mesh16, pt.panel_order(16, 16, panel))
        disc = Discretization(re, gll_basis_2d(2))
        ex = RollExchange(disc, min_class_fraction=0.0)
        assert ex.n_edge_tail == 0 and ex.n_vert_tail == 0
        deltas = sorted({abs(int(c[2])) for c in ex.edge_classes})
        # near: 1 (fast in-panel), panel (slow); far: the cross-panel
        # offset panel*(n_slow-1)+1
        cross = panel * 15 + 1
        assert deltas == [1, panel, cross]

    def test_fused_kernel_matches_on_panel_order(self, mesh16):
        import jax.numpy as jnp

        from spectralelementmethod_tpu.ops import sumfac
        from spectralelementmethod_tpu.ops.exchange import RollExchange
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_affine_laplacian_T)

        re = pt.reorder_elements(mesh16, pt.panel_order(16, 16, 4))
        disc = Discretization(re, gll_basis_2d(2))
        prob = Poisson(disc, dtype=np.float32)
        ex = RollExchange(disc, min_class_fraction=0.0)
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(prob._D0), np.asarray(prob._D1))
        A_xla = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        W = disc.basis.weight_grid().reshape(-1)
        a, exact = sumfac.affine_factorization(Gf, W)
        assert exact
        Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
        # max_halo=1 forces the cross-panel classes through the far
        # epilogue (the 1M production configuration, scaled down)
        fused = make_fused_affine_laplacian_T(
            ex, Kcat, a, target_win=128, max_halo=4, interpret=True)
        assert fused._prep.has_far
        rng = np.random.RandomState(7)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
        expected = np.asarray(A_xla(uT))
        got = np.asarray(fused(uT))
        scale = np.abs(expected).max()
        assert np.abs(got - expected).max() / scale < 1e-5


def test_make_exchange_keeps_zero_tails_on_degenerate_panel_halo():
    """Round-2 review regression: when a panel-ordered mesh's cross-panel
    offset makes the FULL-halo fused tiling inadmissible, make_exchange
    must not rebuild with the default min_class_fraction (which drops the
    small cross-panel classes back to tails and locks out the fused
    kernels) — the kernels far-split |delta| > 128 classes themselves, so
    an admissible 128-lane near tiling is enough."""
    from spectralelementmethod_tpu.ops.exchange import (RollExchange,
                                                        make_exchange)
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        _AffineFusedPrep, fused_affine_tile_shape)
    from spectralelementmethod_tpu.ops import sumfac

    n_fast, n_slow, panel = 64, 6, 32
    mesh = pt.reorder_elements(
        rectangle_mesh(n_fast, n_slow, 2),
        pt.panel_order(n_fast, n_slow, panel))
    disc = Discretization(mesh, gll_basis_2d(2))

    # scenario preconditions: tails at the default class threshold, a
    # cross-panel delta whose full-halo tiling is inadmissible, and an
    # admissible near tiling
    ex_def = RollExchange(disc)
    assert ex_def.n_edge_tail or ex_def.n_vert_tail
    ex0 = RollExchange(disc, min_class_fraction=0.0)
    H = max(abs(int(c[2])) for c in ex0.edge_classes)
    assert H > 128
    assert fused_affine_tile_shape(ex0.E, H) is None
    assert fused_affine_tile_shape(ex0.E, 128) is not None

    ex = make_exchange(disc, fused_pad=True, fused_pad_min_e=0)
    assert isinstance(ex, RollExchange)
    assert ex.n_edge_tail == 0 and ex.n_vert_tail == 0

    # and the fused prep accepts it: make_exchange now pads the element
    # axis so the FULL-halo tiling is admissible (the measured-fastest
    # plain-apply mode, and the only one the general/batched kernels
    # support); the plain prep then keeps the whole halo in-window
    prob = Poisson(Discretization(mesh, gll_basis_2d(2)), dtype=np.float32)
    Gf = prob._G_host.reshape(disc.E, 3, -1)
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(
        sumfac._pad_factors_to_exchange(Gf, ex), W)
    assert exact
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    prep = _AffineFusedPrep(ex, Kcat, a, "highest", 4608, "auto",
                            cheap_far=False)
    assert prep.has_far or fused_affine_tile_shape(ex.E, H) is not None
