"""Two-level p-multigrid preconditioner (solver/pmg.py) + mesh order change.

Oracle layers:

1. ``mesh_with_order``: exact sublattice node identities, shared node
   array, boundary copy, coarse quadrature integrates the area;
2. transfer adjointness and V-cycle symmetry in the weighted L-vector
   inner product (what CG requires of a preconditioner);
3. the exact tensor-grid coarse solve (GridFDM) really inverts the
   coarse operator;
4. end-to-end ``Poisson.solve_local(precond="pmg")``: same solution as
   Jacobi-CG at a fraction of the iterations, h-independent counts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import (annulus_mesh, mesh_with_order,
                                            rectangle_mesh)
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops import sumfac
from spectralelementmethod_tpu.ops.exchange import make_exchange
from spectralelementmethod_tpu.solver.pmg import (GridFDM,
                                                  make_pmg_preconditioner)


def _problem(nx=12, ny=10, p=4, all_dirichlet=True):
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, forcing=lambda x, y: np.sin(np.pi * x)
                   * np.cos(np.pi * y), dtype=np.float32)
    prob.set_dirichlet("ebc", 0.0)
    if all_dirichlet:
        prob.set_dirichlet("nbc", 0.0)
    return prob


def _pieces(prob):
    disc = prob.disc
    ex = make_exchange(disc)
    Gf = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    A = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, free, vector_layout="ne", assume_masked_input=True)
    return ex, Gf, A, free, free_np


class TestMeshWithOrder:
    def test_sublattice_identity(self):
        mesh = rectangle_mesh(4, 3, 8)
        mc = mesh_with_order(mesh, 2)
        nmf = mesh.cell_blocks()[0][2].reshape(12, 9, 9)
        nmc = mc.cell_blocks()[0][2]
        assert np.array_equal(nmf[:, ::4, ::4], nmc)
        assert mc.nodes is mesh.nodes          # shared, ids preserved
        assert list(mc.boundary_names) == list(mesh.boundary_names)
        assert np.array_equal(mc.boundary_faces("ebc"),
                              mesh.boundary_faces("ebc"))

    def test_coarse_quadrature_area(self):
        mc = mesh_with_order(rectangle_mesh(4, 3, 8), 1)
        disc = Discretization(mc, gll_basis_2d(1))
        assert abs(float(np.sum(disc.detJxW)) - 4.0) < 1e-12

    def test_indivisible_order_raises(self):
        with pytest.raises(ValueError, match="divide"):
            mesh_with_order(rectangle_mesh(2, 2, 5), 2)


class TestVCycle:
    def test_symmetric_in_weighted_dot(self):
        prob = _problem()
        ex, Gf, A, free, free_np = _pieces(prob)
        M = make_pmg_preconditioner(
            prob.disc, ex, Gf, A, ~prob._dirichlet_mask,
            np.asarray(prob.operator_diagonal()), p_coarse=1)
        assert M._coarse_kind == "fdm"
        w = jnp.asarray(np.asarray(
            ex._weights_as(np.float32, transposed=True)))
        rng = np.random.RandomState(1)
        aa = jnp.where(free, ex.dss_T(jnp.asarray(
            rng.standard_normal(free.shape).astype(np.float32))), 0.0)
        bb = jnp.where(free, ex.dss_T(jnp.asarray(
            rng.standard_normal(free.shape).astype(np.float32))), 0.0)
        d1 = float(jnp.sum(w * M(aa) * bb))
        d2 = float(jnp.sum(w * aa * M(bb)))
        assert abs(d1 - d2) / abs(d1) < 1e-4

    def test_transfer_adjointness(self):
        """<P ec, r>_wf == <ec, R r>_wc (global P^T identity)."""
        prob = _problem()
        ex, Gf, A, free, free_np = _pieces(prob)
        M = make_pmg_preconditioner(
            prob.disc, ex, Gf, A, ~prob._dirichlet_mask,
            np.asarray(prob.operator_diagonal()), p_coarse=2)
        ex_c = M._A_c.exchange if hasattr(M._A_c, "exchange") else None
        from spectralelementmethod_tpu.mesh import mesh_with_order as mo
        mesh_c = mo(prob.disc.mesh, 2)
        disc_c = Discretization(mesh_c, gll_basis_2d(2))
        ex_c = make_exchange(disc_c)
        w_f = jnp.asarray(np.asarray(
            ex._weights_as(np.float32, transposed=True)))
        w_c = jnp.asarray(np.asarray(
            ex_c._weights_as(np.float32, transposed=True)))
        rng = np.random.RandomState(2)
        r = jnp.where(free, ex.dss_T(jnp.asarray(
            rng.standard_normal(free.shape).astype(np.float32))), 0.0)
        free_c = jnp.asarray(np.ascontiguousarray(
            ((~prob._dirichlet_mask)[ex_c.gather_hier]).T))
        ec = jnp.where(free_c, ex_c.dss_T(jnp.asarray(
            rng.standard_normal((ex_c.n_loc, ex_c.E))
            .astype(np.float32))), 0.0)
        lhs = float(jnp.sum(w_f * M._prolong(ec) * r))
        rhs = float(jnp.sum(w_c * ec * M._restrict(r)))
        assert abs(lhs - rhs) / (abs(lhs) + 1e-30) < 1e-4

    def test_grid_fdm_inverts_coarse_operator(self):
        prob = _problem(nx=7, ny=5, p=4)
        ex, Gf, A, free, free_np = _pieces(prob)
        M = make_pmg_preconditioner(
            prob.disc, ex, Gf, A, ~prob._dirichlet_mask,
            np.asarray(prob.operator_diagonal()), p_coarse=2)
        assert M._coarse_kind == "fdm"
        mesh_c = mesh_with_order(prob.disc.mesh, 2)
        disc_c = Discretization(mesh_c, gll_basis_2d(2))
        ex_c = make_exchange(disc_c)
        free_c = jnp.asarray(np.ascontiguousarray(
            ((~prob._dirichlet_mask)[ex_c.gather_hier]).T))
        rng = np.random.RandomState(3)
        rc = jnp.where(free_c, ex_c.dss_T(jnp.asarray(
            rng.standard_normal((ex_c.n_loc, ex_c.E))
            .astype(np.float32))), 0.0)
        uc = M._coarse(rc)
        back = np.asarray(M._A_c(uc))
        ref = np.asarray(rc)
        assert np.abs(back - ref).max() / np.abs(ref).max() < 1e-4

    def test_chebyshev_fallback_on_nonuniform_mesh(self):
        """Graded rectangle: affine cells (axis-aligned) but non-uniform
        sizes -> GridFDM inadmissible -> Chebyshev coarse, still a
        working preconditioner."""
        from spectralelementmethod_tpu.mesh import (geometric_progression,
                                                    structured_patch_mesh)

        p = 4
        mesh = structured_patch_mesh(
            geometric_progression(-1.0, 1.0, 10, 1.3),
            np.linspace(-1.0, 1.0, 9), p, lambda U, V: (U, V),
            boundary_names={"west": "ebc", "south": "ebc",
                            "north": "nbc", "east": "nbc"})
        disc = Discretization(mesh, gll_basis_2d(p))
        prob = Poisson(disc, forcing=1.0, dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        prob.set_dirichlet("nbc", 0.0)
        ex, Gf, A, free, free_np = _pieces(prob)
        M = make_pmg_preconditioner(
            prob.disc, ex, Gf, A, ~prob._dirichlet_mask,
            np.asarray(prob.operator_diagonal()), p_coarse=2)
        assert M._coarse_kind == "chebyshev"
        with pytest.raises(ValueError, match="tensor"):
            make_pmg_preconditioner(
                prob.disc, ex, Gf, A, ~prob._dirichlet_mask,
                np.asarray(prob.operator_diagonal()), p_coarse=2,
                coarse="fdm")
        sol = prob.solve_local(
            tol=1e-6, vector_layout="ne",
            precond={"pmg": {"p_coarse": 2}})
        assert bool(sol.cg.converged)


class TestSolveLocalPMG:
    def test_matches_jacobi_with_far_fewer_iterations(self):
        prob = _problem(nx=24, ny=24, p=4)
        sol_j = prob.solve_local(tol=1e-6, precond="jacobi",
                                 vector_layout="ne")
        prob2 = _problem(nx=24, ny=24, p=4)
        sol_m = prob2.solve_local(tol=1e-6,
                                  precond={"pmg": {"p_coarse": 2}},
                                  vector_layout="ne")
        assert bool(sol_m.cg.converged)
        scale = np.abs(sol_j.u).max()
        assert np.abs(sol_m.u - sol_j.u).max() / scale < 1e-3
        assert int(sol_m.cg.iterations) * 4 <= int(sol_j.cg.iterations)

    def test_h_independent_iterations(self):
        counts = []
        for nx in (8, 16, 32):
            prob = _problem(nx=nx, ny=nx, p=4)
            sol = prob.solve_local(tol=1e-6,
                                   precond={"pmg": {"p_coarse": 2}},
                                   vector_layout="ne")
            counts.append(int(sol.cg.iterations))
        # 16x the elements, (nearly) flat count — Jacobi would triple+
        assert counts[-1] <= counts[0] + 6

    def test_mixed_bc_fast_coarse(self):
        """ebc on west+south only: per-side trimming still admissible."""
        prob = _problem(nx=12, ny=10, p=4, all_dirichlet=False)
        sol = prob.solve_local(tol=1e-6, precond="pmg",
                               vector_layout="ne")
        assert bool(sol.cg.converged)
        M = prob._op_cache[("M", "pmg", "ne", ())]
        assert M._coarse_kind == "fdm"
        sol_j = _problem(nx=12, ny=10, p=4,
                         all_dirichlet=False).solve_local(
            tol=1e-6, precond="jacobi", vector_layout="ne")
        scale = np.abs(sol_j.u).max()
        assert np.abs(sol.u - sol_j.u).max() / scale < 1e-3

    def test_fdm_smoother_variant(self):
        prob = _problem(nx=16, ny=16, p=4)
        sol = prob.solve_local(
            tol=1e-6, vector_layout="ne",
            precond={"pmg": {"p_coarse": 2, "smoother": "fdm"}})
        assert bool(sol.cg.converged)
        prob_j = _problem(nx=16, ny=16, p=4)
        sol_j = prob_j.solve_local(tol=1e-6, precond="jacobi",
                                   vector_layout="ne")
        assert (int(sol.cg.iterations) * 4 <= int(sol_j.cg.iterations))


class TestPMGGenerality:
    """Round-3 capabilities: f64 outer ladder, curved (general-factor)
    coarse levels, Helmholtz reaction terms (VERDICT round-2 item 5)."""

    def test_f64_outer_f32_cycle_reaches_1e10(self):
        """f64 CG preconditioned by the f32 V-cycle solves to 1e-10 and
        matches the manufactured solution (the GMRES-IR-style mixed
        ladder)."""
        p, nx = 4, 12
        mesh = rectangle_mesh(nx, nx, p, x0=(0, 0), x1=(1, 1))
        disc = Discretization(mesh, gll_basis_2d(p))
        u_ex = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)  # noqa
        f = lambda x, y: 2 * np.pi**2 * u_ex(x, y)  # noqa
        prob = Poisson(disc, forcing=f, dtype=np.float64)
        prob.set_dirichlet("ebc", 0.0)
        prob.set_dirichlet("nbc", 0.0)
        sol = prob.solve_local(tol=1e-11, precond="pmg",
                               vector_layout="ne")
        assert bool(sol.cg.converged)
        M = prob._op_cache[("M", "pmg", "ne", ())]
        assert M._cycle_dtype == np.float32
        assert sol.u.dtype == np.float64
        # spectral accuracy at p=4 on 12x12: ~1e-7; the f64 ladder must
        # not floor above it
        assert prob.l2_error(sol.u, u_ex) < 2e-6

    def test_f64_exact_cycle_dtype(self):
        prob = _problem(nx=8, ny=8, p=4)
        prob.dtype = np.float32  # problem built f32; request f64 cycle
        ex, Gf, A, free, free_np = _pieces(prob)
        M = make_pmg_preconditioner(
            prob.disc, ex, Gf, A, ~prob._dirichlet_mask,
            np.asarray(prob.operator_diagonal()), p_coarse=2,
            dtype=np.float32, cycle_dtype=np.float64)
        assert M._cycle_dtype == np.float64
        r = jnp.asarray(np.random.RandomState(0).standard_normal(
            (ex.n_loc, ex.E)).astype(np.float32)) * free
        z = M(r)
        assert np.asarray(z).dtype == np.float32
        assert np.isfinite(np.asarray(z)).all()

    def test_curved_annulus_poisson_pmg(self):
        """Curved isoparametric mesh: the rediscretized (general-factor)
        coarse level makes pmg admissible where round 2 raised
        ValueError('affine')."""
        R = 10.0
        mesh = annulus_mesh(order=4, n_theta=6, n_r=10, r_outer=R,
                            progression=1.3)
        disc = Discretization(mesh, gll_basis_2d(4))
        prob = Poisson(disc, forcing=0.0, dtype=np.float64)
        prob.set_dirichlet("sphere", 0.0)
        prob.set_dirichlet("shell", 1.0)
        sol = prob.solve_local(tol=1e-10, precond="pmg",
                               vector_layout="ne")
        assert bool(sol.cg.converged)
        M = prob._op_cache[("M", "pmg", "ne", ())]
        assert M._coarse_kind == "chebyshev"
        exact = lambda x, y: np.log(np.sqrt(x**2 + y**2)) / np.log(R)  # noqa
        assert prob.l2_error(sol.u, exact) < 1e-4  # p=4 discretization err
        # and it must genuinely precondition: fewer its than jacobi
        prob_j = Poisson(disc, forcing=0.0, dtype=np.float64)
        prob_j.set_dirichlet("sphere", 0.0)
        prob_j.set_dirichlet("shell", 1.0)
        sol_j = prob_j.solve_local(tol=1e-10, precond="jacobi",
                                   vector_layout="ne")
        assert int(sol.cg.iterations) * 2 <= int(sol_j.cg.iterations)
        scale = np.abs(sol_j.u).max()
        # residual tol 1e-10 -> solution agreement bounded by kappa(A)
        assert np.abs(sol.u - sol_j.u).max() / scale < 1e-5

    def test_variable_coefficient_pmg(self):
        """Variable diffusivity breaks affinity -> general coarse path
        carries c(x) through coeff_fn."""
        p, nx = 4, 10
        mesh = rectangle_mesh(nx, nx, p, x0=(0, 0), x1=(1, 1))
        disc = Discretization(mesh, gll_basis_2d(p))
        c = lambda x, y: 1.0 + 0.8 * np.sin(2 * x) * np.cos(y)  # noqa
        prob = Poisson(disc, forcing=1.0, coefficient=c,
                       dtype=np.float64)
        prob.set_dirichlet("ebc", 0.0)
        prob.set_dirichlet("nbc", 0.0)
        sol = prob.solve_local(tol=1e-10, precond="pmg",
                               vector_layout="ne")
        assert bool(sol.cg.converged)
        prob_j = Poisson(disc, forcing=1.0, coefficient=c,
                         dtype=np.float64)
        prob_j.set_dirichlet("ebc", 0.0)
        prob_j.set_dirichlet("nbc", 0.0)
        sol_j = prob_j.solve_local(tol=1e-10, precond="jacobi",
                                   vector_layout="ne")
        scale = np.abs(sol_j.u).max()
        assert np.abs(sol.u - sol_j.u).max() / scale < 1e-5
        assert int(sol.cg.iterations) * 2 <= int(sol_j.cg.iterations)


class TestHelmholtzPMG:
    def test_curved_helmholtz_pmg_matches_jacobi(self):
        """BASELINE config 3 (curved variable-coefficient Helmholtz) on
        the pmg path: same solution as Jacobi-CG, fewer iterations."""
        from spectralelementmethod_tpu.models.helmholtz import Helmholtz

        mesh = annulus_mesh(order=4, n_theta=6, n_r=10, r_outer=6.0,
                            progression=1.2)
        disc = Discretization(mesh, gll_basis_2d(4))

        def make():
            h = Helmholtz(
                disc, forcing=lambda x, y: np.exp(-(x**2 + y**2)),
                coefficient=lambda x, y: 1.0 + 0.3 * x * x,
                reaction=lambda x, y: 2.0 + y * y,
                dtype=np.float64)
            h.set_dirichlet("sphere", 0.0)
            h.set_dirichlet("shell", 0.0)
            return h

        h_j = make()
        sol_j = h_j.solve_local(tol=1e-10, precond="jacobi",
                                vector_layout="ne")
        h_m = make()
        sol_m = h_m.solve_local(tol=1e-10, precond="pmg",
                                vector_layout="ne")
        assert bool(sol_m.cg.converged)
        scale = np.abs(sol_j.u).max()
        assert np.abs(sol_m.u - sol_j.u).max() / scale < 1e-5
        assert int(sol_m.cg.iterations) < int(sol_j.cg.iterations)


class TestLatticeCoarse:
    """Order-independent exact coarse solve (GridFDM2DLattice): host
    partitioners (panel/Morton) scramble the element numbering GridFDM
    infers from, but not the node lattice — the exact coarse solve must
    survive reordering (it is what keeps config-5 h-independent)."""

    def _reordered_problem(self, order, nx=12, ny=10, p=4):
        from spectralelementmethod_tpu.parallel import partition as pt

        mesh = rectangle_mesh(nx, ny, p)
        if order == "panel":
            perm = pt.panel_order(n_fast=ny, n_slow=nx, panel=5)
        else:
            perm = pt.morton_order(mesh.centroids)
        mesh = pt.reorder_elements(mesh, perm)
        disc = Discretization(mesh, gll_basis_2d(p))
        prob = Poisson(disc, forcing=lambda x, y: np.sin(np.pi * x)
                       * np.cos(np.pi * y), dtype=np.float32)
        prob.set_dirichlet("ebc", 0.0)
        return prob

    @pytest.mark.parametrize("order", ["panel", "morton"])
    def test_reordered_mesh_keeps_exact_coarse(self, order):
        prob = self._reordered_problem(order)
        ex, Gf, A, free, free_np = _pieces(prob)
        M = make_pmg_preconditioner(
            prob.disc, ex, Gf, A, ~prob._dirichlet_mask,
            np.asarray(prob.operator_diagonal()))
        assert M._coarse_kind == "fdm"

    def test_lattice_solution_matches_tensor_grid(self):
        """Same mesh, natural vs panel order: both exact-coarse pmg
        solves reach the same solution."""
        prob_nat = _problem(nx=12, ny=10, p=4, all_dirichlet=False)
        sol_nat = prob_nat.solve_local(tol=1e-6, precond="pmg",
                                       vector_layout="ne")
        prob_pan = self._reordered_problem("panel")
        sol_pan = prob_pan.solve_local(tol=1e-6, precond="pmg",
                                       vector_layout="ne")
        assert bool(sol_pan.cg.converged)
        # compare on global node values (orders differ element-wise,
        # global node ids are shared)
        scale = np.abs(sol_nat.u).max()
        assert np.abs(sol_pan.u - sol_nat.u).max() / scale < 1e-4
        # iteration counts in the same exact-coarse class
        assert abs(int(sol_pan.cg.iterations)
                   - int(sol_nat.cg.iterations)) <= 6


class TestBenchArmComposition:
    """Regression pin on the EXACT driver-bench converged-arm composition
    (VERDICT round-4 item 1): cg_refined x factory-default pmg x f32 x
    fused-pad exchange x weighted dot, tol 1e-6 — the arm that shipped
    red in BENCH_r04 after an unmeasured change.  CPU runs the XLA
    operator backend (the bench's 'auto' resolves to the fused Pallas
    kernel on TPU; same math, tests_tpu covers the kernel identity)."""

    def _bench_problem(self, nx=20, ny=20, p=8):
        import jax

        mesh = rectangle_mesh(nx, ny, p)
        disc = Discretization(mesh, gll_basis_2d(p))
        prob = Poisson(disc, dtype=np.float32)
        # bench.py's exact Dirichlet data (linear ramp on "ebc")
        prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
        ex = make_exchange(disc, fused_pad=True)
        free_np = (~prob._dirichlet_mask)[ex.gather_hier]
        free = jnp.asarray(np.ascontiguousarray(free_np.T))
        Gf = prob._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            prob._D0_host, prob._D1_host)
        A = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, free, backend="auto", precision="highest",
            vector_layout="ne", assume_masked_input=True)
        u_dL = jnp.asarray(np.ascontiguousarray(ex.local_from_global(
            np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)
        ).astype(np.float32).T))
        bL = jnp.asarray(np.ascontiguousarray(
            ex.local_from_global(np.asarray(prob._b))
            .astype(np.float32).T))
        r_cg = jax.jit(
            lambda f, b, u: jnp.where(f, b - A(u), 0.0))(free, bL, u_dL)
        return prob, ex, Gf, A, free, r_cg

    def _hi_pieces(self, prob, ex, free):
        """f64 anchor operator + lifted RHS, exactly as bench.py builds
        them (same factor VALUES as the f32 system, f64 arithmetic)."""
        import jax

        disc = prob.disc
        with jax.enable_x64():
            Gf64 = np.asarray(prob._G_host, np.float64).reshape(
                disc.E, 3, -1)
            Dhat64 = np.asarray(sumfac.make_stacked_derivative(
                prob._D0_host, prob._D1_host), np.float64)
            A_hi = sumfac.make_local_laplacian_operator(
                ex, Gf64, Dhat64, free, backend="xla",
                precision="highest", vector_layout="ne",
                assume_masked_input=True)
            u_d_np = np.where(prob._dirichlet_mask,
                              prob._dirichlet_vals, 0.0)
            bL64 = jnp.asarray(np.ascontiguousarray(
                ex.local_from_global(np.asarray(prob._b))
                .astype(np.float64).T), jnp.float64)
            u_dL64 = jnp.asarray(np.ascontiguousarray(
                ex.local_from_global(u_d_np).astype(np.float64).T),
                jnp.float64)
            r_hi = jax.jit(
                lambda f, b, u: jnp.where(f, b - A_hi(u), 0.0))(
                    free, bL64, u_dL64)
        return A_hi, r_hi

    def test_bench_converged_arm_is_green(self):
        from spectralelementmethod_tpu.solver.cg import cg_refined

        prob, ex, Gf, A, free, r_cg = self._bench_problem()
        M = make_pmg_preconditioner(
            prob.disc, ex, Gf, A, ~prob._dirichlet_mask,
            np.asarray(prob.operator_diagonal()))
        assert M._coarse_kind == "fdm"
        A_hi, r_hi = self._hi_pieces(prob, ex, free)
        dw = ex._weights_as(np.float32, transposed=True)
        dw64 = jnp.asarray(np.asarray(dw), jnp.float64)
        tol = 1e-6
        rs = cg_refined(A, r_cg, M=M, tol=tol, max_iter=700,
                        dot=ex.dot_T, dot_weight=dw, block=64, cycles=3,
                        A_hi=A_hi, b_hi=r_hi)
        assert bool(rs.converged), (
            f"bench arm red: its={int(rs.iterations)} "
            f"issued={int(rs.issued)} |r|={float(rs.residual_norm):.3e} "
            f"cycles={rs.cycle_resnorms} stalled={rs.stalled}")
        assert not rs.stalled
        # per-cycle diagnostics populated (VERDICT round-4 item 3)
        assert 1 <= len(rs.cycle_resnorms) <= 2
        # exact-coarse pmg converges in the O(10) class; 3x headroom
        # against run-to-run noise — the r03/r04 regressions were 133
        # and ~2000-issued, far outside
        assert int(rs.iterations) <= 120
        # the claimed residual is the f64-evaluated TRUE residual
        rn0 = float(jnp.sqrt(jnp.sum(dw64 * r_hi * r_hi)))
        true_r = jnp.where(free, r_hi - A_hi(rs.x), 0.0)
        trn = float(jnp.sqrt(jnp.sum(dw64 * true_r * true_r)))
        assert trn <= tol * rn0 * 1.05
        assert float(rs.residual_norm) == pytest.approx(trn, rel=1e-6)

    def test_bench_static_arm_is_green(self):
        """The production single-dispatch arm (cg_refined_static), the
        exact composition bench.py ships: same certification."""
        import jax

        from spectralelementmethod_tpu.solver.cg import cg_refined_static

        prob, ex, Gf, A, free, r_cg = self._bench_problem()
        M = make_pmg_preconditioner(
            prob.disc, ex, Gf, A, ~prob._dirichlet_mask,
            np.asarray(prob.operator_diagonal()))
        A_hi, r_hi = self._hi_pieces(prob, ex, free)
        dw = ex._weights_as(np.float32, transposed=True)
        tol = 1e-6
        rs = cg_refined_static(A, r_hi, A_hi=A_hi, M=M, tol=tol,
                               schedule=(64, 32, 32, 64), dot_weight=dw)
        assert bool(rs.converged), (
            f"static bench arm red: its={int(rs.iterations)} "
            f"issued={int(rs.issued)} |r|={float(rs.residual_norm):.3e} "
            f"cycles={rs.cycle_resnorms} stalled={rs.stalled}")
        assert not rs.stalled
        assert int(rs.issued) <= 128       # later segments cond-skipped
        assert len(rs.cycle_resnorms) == 4
        # certified against the f64-evaluated residual
        dw64 = jnp.asarray(np.asarray(dw), jnp.float64)
        with jax.enable_x64():
            rn0 = float(jnp.sqrt(jnp.sum(dw64 * r_hi * r_hi)))
            true_r = jnp.where(free, r_hi - A_hi(rs.x), 0.0)
            trn = float(jnp.sqrt(jnp.sum(dw64 * true_r * true_r)))
        assert trn <= tol * rn0 * 1.05
        assert float(rs.residual_norm) == pytest.approx(trn, rel=1e-6)
