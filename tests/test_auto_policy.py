"""Auto-policy regression table (VERDICT round-2 item 10).

The backend/kernel auto policies span {layout, structure, precision,
far-split, defer_x, batched-k, 3D factor path}.  Each decision below was
MEASURED on TPU v5e (BASELINE.md rounds 1-2); this table pins the policy
outcomes so future tuning cannot silently regress a measured-optimal
cell.  If a change here is intentional, update the expectation together
with the new measurement in BASELINE.md.
"""

import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d, gll_basis_3d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import (annulus_mesh, box_mesh,
                                            rectangle_mesh)
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops import pallas_kernels as pk
from spectralelementmethod_tpu.ops import sumfac
from spectralelementmethod_tpu.parallel import partition as pt
from spectralelementmethod_tpu.solver.cg import (auto_defer_x,
                                                 hbm_residency_regime)


# ---------------------------------------------------------------------------
# defer_x / HBM-residency thresholds (BASELINE.md round-2j/2n)

DEFER_TABLE = [
    # (E, n_loc, expected_m)  -- measured: 1M wins with m=8, 100k loses
    (101_376, 81, 0),          # 100k p=8: 0.498 (m0) vs 0.611 (m8)
    (1_050_624, 81, 8),        # 1M p=8: 6.24 (m8) vs 9.35 (m0)
    (1_007_616, 81, 8),        # 1M batched pad variant
    (300_000, 81, 0),          # ~97 MB: still VMEM-residency side
    (320_000, 81, 8),          # ~104 MB: HBM side
]


@pytest.mark.parametrize("E,n_loc,m", DEFER_TABLE)
def test_auto_defer_x(E, n_loc, m):
    assert auto_defer_x(E, n_loc) == m
    assert hbm_residency_regime(E, n_loc) == (m > 0)


# ---------------------------------------------------------------------------
# far-split halo rules (_AffineFusedPrep._pick_max_halo;
# BASELINE.md round-2m/2n)


class _Dummy:
    NEAR_HB = pk._AffineFusedPrep.NEAR_HB

    def __init__(self, cheap_far):
        self.cheap_far = cheap_far


def _pick(E, deltas, cheap_far, target_win):
    edges = [(0, 0, d, False, None) for d in deltas]
    verts = []
    H_full = max(abs(d) for d in deltas)
    return pk._AffineFusedPrep._pick_max_halo(
        _Dummy(cheap_far), E, H_full, edges, verts, target_win)


# deltas of the padded production exchanges: 100k p=8 (rectangle 316^2,
# E_pad 101376, row stride 317) and 1M (1024^2ish, E_pad 1050624)
D_100K = (1, -1, 315, -315, 316, -316, 317, -317)
D_1M = (1, -1, 1023, -1023, 1024, -1024, 1025, -1025)

FAR_TABLE = [
    # (name, E, deltas, cheap_far, target_win, expected max_halo)
    # plain apply kernels: split at cost_full >= 0.75 (round-2m:
    # 1M split 4.47 ms vs full 5.82; 100k full 0.20 vs split 0.25)
    ("apply-100k", 101_376, D_100K, False, 4608, None),
    ("apply-1M", 1_050_624, D_1M, False, 4608, 128),
    # fused-CG kernels: split at cost_full >= 1.5 (round-2n:
    # 100k full 0.746 vs 0.754; 1M split 9.81 vs 10.90)
    ("cg-100k", 101_376, D_100K, True, 3072, None),
    ("cg-1M", 1_050_624, D_1M, True, 1152, 128),
    # batched CG k=2 at 100k: cost 1.0 -> full wins (0.716 vs 0.783)
    ("cg-batch2-100k", 101_376, D_100K, True, 1792, None),
    # batched CG k=4 at 100k: degenerate window -> split (0.775 vs 0.816)
    ("cg-batch4-100k", 101_376, D_100K, True, 960, 128),
]


@pytest.mark.parametrize("name,E,deltas,cheap,win,expect", FAR_TABLE)
def test_far_split_rule(name, E, deltas, cheap, win, expect):
    assert _pick(E, deltas, cheap, win) == expect, name


def test_measured_optimal_tilings():
    """The measured-record (TE, Hb) tilings of BASELINE.md."""
    # 100k apply record 0.246 ms used (4224, 384) full halo
    assert pk.fused_affine_tile_shape(101_376, 317, 4608) == (4224, 384)
    # 1M full-halo apply record 5.59-5.68 ms used (2304, 1152)
    assert pk.fused_affine_tile_shape(1_050_624, 1025, 4608) == (2304, 1152)
    # near-128 windows exist at both scales (the far-split kernels)
    assert pk.fused_affine_tile_shape(101_376, 128, 4608) is not None
    assert pk.fused_affine_tile_shape(1_050_624, 128, 4608) is not None


def test_vmem_window_defaults():
    """Production lane-window budgets (calibrated p=8, scaled by n)."""
    assert pk._scale_win(4608, 81) == 4608     # plain apply
    assert pk._scale_win(3072, 81) == 3072     # CG pair, bf16p state
    assert pk._scale_win(1536, 81) == 1536     # CG pair, f32 state
    # higher order shrinks the window proportionally (p=12: n=169)
    assert pk._scale_win(4608, 169) < 4608 // 2 + 384
    assert pk.affine_tile_window(81, 1) >= 384
    assert pk.general_tile_window(81, 1) >= 384
    # multi-RHS shrinks the budget monotonically
    assert pk.affine_tile_window(81, 4) < pk.affine_tile_window(81, 1)


# ---------------------------------------------------------------------------
# layout / structure / exchange selection (end-to-end, small meshes)


def _solve_ctx(mesh, p, **solve_kw):
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float64)
    prob.set_dirichlet(mesh.boundary_names[0], 0.0)
    prob.solve_local(tol=1e-6, host_loop=True, **solve_kw)
    return prob


class TestStructureAndLayout:
    def test_affine_rectangle_picks_ne_and_affine(self):
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        prob = _solve_ctx(rectangle_mesh(4, 4, 4), 4)
        assert isinstance(prob._exchange, RollExchange)
        keys = [k for k in prob._op_cache if k[0] == "A"]
        assert keys and all(k[3] == "ne" for k in keys)
        A = prob._op_cache[keys[0]]
        assert A._structure == "affine"
        assert A._backend == "xla"    # CPU: no Pallas -> XLA

    def test_curved_annulus_picks_general(self):
        mesh = annulus_mesh(order=4, n_theta=4, n_r=4, r_outer=3.0,
                            progression=1.1)
        disc = Discretization(mesh, gll_basis_2d(4))
        prob = Poisson(disc, dtype=np.float64)
        prob.set_dirichlet("sphere", 0.0)
        prob.set_dirichlet("shell", 0.0)
        prob.solve_local(tol=1e-6, host_loop=True)
        keys = [k for k in prob._op_cache if k[0] == "A"]
        A = prob._op_cache[keys[0]]
        assert A._structure == "general"

    def test_morton_order_keeps_rolls_but_gains_tails(self):
        """Morton order still builds a RollExchange ('ne' layout), but
        with nonzero tails — which is exactly what bars it from the
        fused kernels and the ppermute halo (the enforced pairing tested
        in tests/test_pipeline.py); panel order exists to avoid this."""
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        mesh = rectangle_mesh(8, 8, 3)
        mesh = pt.reorder_elements(mesh, pt.morton_order(mesh.centroids))
        prob = _solve_ctx(mesh, 3)
        ex = prob._exchange
        assert isinstance(ex, RollExchange)
        assert ex.n_edge_tail or ex.n_vert_tail
        keys = [k for k in prob._op_cache if k[0] == "A"]
        assert keys and all(k[3] == "ne" for k in keys)

    def test_panel_order_is_tail_free(self):
        """Panel order preserves uniform offsets: zero tails, fused-
        kernel/halo admissible (its design goal, round-2f)."""
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        mesh = rectangle_mesh(8, 8, 3)
        mesh = pt.reorder_elements(
            mesh, pt.panel_order(n_fast=8, n_slow=8, panel=4))
        prob = _solve_ctx(mesh, 3)
        ex = prob._exchange
        assert isinstance(ex, RollExchange)
        assert not (ex.n_edge_tail or ex.n_vert_tail)

    def test_anisotropic_grid_keeps_roll_exchange(self):
        """(p0 != p1) node grids ride the anisotropic roll fast path
        (round-2f) instead of dropping to the gather exchange."""
        from spectralelementmethod_tpu.basis import gll_basis_2d as g2
        from spectralelementmethod_tpu.ops.exchange import RollExchange

        mesh = rectangle_mesh(4, 3, (3, 4))
        disc = Discretization(mesh, g2(3, 4))
        prob = Poisson(disc, dtype=np.float64)
        prob.set_dirichlet("ebc", 0.0)
        prob.solve_local(tol=1e-6, host_loop=True)
        assert isinstance(prob._exchange, RollExchange)


class Test3DFactorPath:
    def _solve(self, mesh):
        disc = Discretization(mesh, gll_basis_3d(2))
        prob = Poisson(disc, dtype=np.float64)
        prob.set_dirichlet("ebc", 0.0)
        prob.solve_local(tol=1e-5, host_loop=True)
        return prob._op_cache[("A3d",)][0]._structure

    def test_axis_aligned_box_uses_separable(self):
        # diagonal-mass tensor factorization: measured 2.2x the 6-matmul
        # affine pipeline (BASELINE round-2h "3D apply, affine factor
        # collapse" -> round-2l en-sep 2.02 ms record)
        assert self._solve(box_mesh(2, 2, 2, 2)) == "separable"

    def test_sheared_box_uses_affine(self):
        mesh = box_mesh(2, 2, 2, 2)
        nodes = np.asarray(mesh.nodes).copy()
        shear = np.array([[1.0, 0.3, 0.0], [0.0, 1.0, 0.2],
                          [0.0, 0.0, 1.0]])
        mesh.set_nodes(shear @ nodes)
        assert self._solve(mesh) == "affine"

    def test_perturbed_box_uses_general(self):
        mesh = box_mesh(2, 2, 2, 2)
        nodes = np.asarray(mesh.nodes).copy()
        rng = np.random.RandomState(3)
        interior = np.all(np.abs(nodes) < 0.999, axis=0)
        nodes[:, interior] += 0.03 * rng.standard_normal(
            (3, int(interior.sum())))
        mesh.set_nodes(nodes)
        assert self._solve(mesh) == "general"


class TestAffineDetection:
    def test_rectangle_is_exactly_affine(self):
        disc = Discretization(rectangle_mesh(3, 3, 4), gll_basis_2d(4))
        G = disc.laplacian_factors(None).reshape(disc.E, 3, -1)
        W = disc.basis.weight_grid().reshape(-1)
        _, exact = sumfac.affine_factorization(np.asarray(G), W)
        assert exact

    def test_variable_coefficient_breaks_affinity(self):
        disc = Discretization(rectangle_mesh(3, 3, 4), gll_basis_2d(4))
        c = 1.0 + 0.5 * disc.x_coeffs[:, 0] ** 2
        G = disc.laplacian_factors(
            np.broadcast_to(c, disc.detJxW.shape)).reshape(disc.E, 3, -1)
        W = disc.basis.weight_grid().reshape(-1)
        _, exact = sumfac.affine_factorization(np.asarray(G), W)
        assert not exact

    def test_annulus_is_not_affine(self):
        mesh = annulus_mesh(order=3, n_theta=4, n_r=4, r_outer=3.0)
        disc = Discretization(mesh, gll_basis_2d(3))
        G = disc.laplacian_factors(None).reshape(disc.E, 3, -1)
        W = disc.basis.weight_grid().reshape(-1)
        _, exact = sumfac.affine_factorization(np.asarray(G), W)
        assert not exact


class TestProceduralMaskFit:
    """_periodic_mask_params: procedural roll-class mask recognition.

    The round-3 rewrite replaced a recursive union-peel that was
    O(runs^2) (one 1M-element panel-order mask took ~45 minutes of
    kernel BUILD time) with bounded vectorized candidate fits."""

    def test_single_patterns(self):
        E = 4096
        e = np.arange(E)
        assert pk._periodic_mask_params(np.ones(E, bool)) == ("all",)
        mb = np.ones(E, bool)
        mb[100:150] = False
        assert pk._periodic_mask_params(mb) == ("run", 100, 50)
        mb = ~(((e - 3) % 64) < 2)
        assert pk._periodic_mask_params(mb) == ("iota", 3, 64, 2)

    def test_run_union_iota(self):
        # lexicographic diagonal class: last row U last column
        E, P = 4096, 64
        e = np.arange(E)
        zeros = (e >= E - P) | ((e % P) == P - 1)
        k = pk._periodic_mask_params(~zeros)
        assert k is not None and k[0] == "and"
        assert np.array_equal(
            pk._mask_zeros_of(k[1], E) | pk._mask_zeros_of(k[2], E),
            zeros)

    def test_iota_union_iota_panel_shape(self):
        # panel-order diagonal class: panel-boundary columns U
        # slow-boundary rows (iota U iota — the shape that blew up the
        # old recursive fit)
        E, Pf, Ps = 1 << 15, 128, 128 * 16
        e = np.arange(E)
        zeros = ((e % Pf) == Pf - 1) | ((e % Ps) < Pf)
        k = pk._periodic_mask_params(~zeros)
        assert k is not None and k[0] == "and"
        assert np.array_equal(
            pk._mask_zeros_of(k[1], E) | pk._mask_zeros_of(k[2], E),
            zeros)

    def test_large_mask_fits_fast(self):
        import time

        E = 1 << 20
        e = np.arange(E)
        zeros = ((e % 128) == 127) | ((e % (128 * 1024)) < 128)
        t0 = time.perf_counter()
        k = pk._periodic_mask_params(~zeros)
        dt = time.perf_counter() - t0
        assert k is not None and k[0] == "and"
        assert dt < 10.0, f"mask fit took {dt:.1f}s (quadratic again?)"

    def test_unrecognizable_mask_streams_as_row(self):
        rng = np.random.RandomState(0)
        mb = rng.random_sample(4096) > 0.3
        assert pk._periodic_mask_params(mb) is None


BATCHED_DEFER_TABLE = [
    # (E, n_loc, k, expected m) — round-3b sweep: batched deferral wins
    # at 100k from k=2 up (k2 0.523 m8 vs 0.694 m0; k4 split 0.494 vs
    # 0.784) and at 1M (k2: 5.55 vs 8.74)
    (101_376, 81, 2, 8),
    (101_376, 81, 4, 8),
    (101_376, 81, 8, 8),
    (1_007_616, 81, 2, 8),
]


@pytest.mark.parametrize("E,n_loc,k,m", BATCHED_DEFER_TABLE)
def test_auto_defer_x_batched(E, n_loc, k, m):
    from spectralelementmethod_tpu.solver.cg import auto_defer_x_batched

    assert auto_defer_x_batched(E, n_loc, k) == m


class TestPmgDefaults:
    """The pmg factory defaults ARE the measured-best bench config
    (round-4 sweep at p=8/100k, scripts/measure_r4_pmg.py):

        p_coarse=1            39 its  0.297 s  V-cycle 2.49 ms  <- default
        p_coarse=1, degree=5  25 its  0.426 s  (cheaper its, dearer cycle)
        p_coarse=2           133 its  2.646 s  V-cycle 12.3 ms  (r03 bench)
        p_coarse=4           434 its 13.3 s
        smoother=fdm pc=1    106 its  1.784 s

    The round-3 driver-bench regression (cg_solve_to_tol_s 2.59 s vs the
    recorded ~0.44) was exactly the hardcoded p_coarse=2; bench.py now
    uses the defaults pinned here."""

    def test_factory_defaults_are_measured_best(self):
        import inspect

        from spectralelementmethod_tpu.solver.pmg import (
            make_pmg_preconditioner)

        sig = inspect.signature(make_pmg_preconditioner)
        # None = dimension-appropriate default; 2D resolves to 1
        # (behavioral check below in test_bench_does_not_override)
        assert sig.parameters["p_coarse"].default is None
        assert sig.parameters["smoother"].default == "jacobi"
        assert sig.parameters["degree"].default == 3
        assert sig.parameters["alpha"].default == 4.0

        import re
        src = inspect.getsource(make_pmg_preconditioner)
        assert re.search(r"if p_coarse is None:\n        p_coarse = 1",
                         src), "2D default coarse order must stay 1"

    def test_bench_does_not_override_p_coarse(self):
        import re

        src = open("bench.py").read()
        # no hardcoded coarse-order override anywhere in the bench
        assert not re.search(r"p_coarse\s*=\s*[02-9]", src)


class TestAffineToleranceFloor:
    def test_high_aspect_fine_mesh_stays_affine(self):
        """80x1280-class aspect ratios accumulate ~3x the old 100*eps
        threshold of f64 rounding in the geometry GEMMs; the 1e-12
        floor keeps them (correctly) affine.  Round-4: the old
        threshold silently knocked config-5 off the exact coarse
        solve."""
        mesh = rectangle_mesh(4, 64, 2)      # same 1:16 cell aspect
        disc = Discretization(mesh, gll_basis_2d(2))
        prob = Poisson(disc, dtype=np.float64)
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        W = disc.basis.weight_grid().reshape(-1)
        _, exact = sumfac.affine_factorization(Gf, W)
        assert exact
