"""Squirmer (axisymmetric Navier-Stokes) end-to-end tests.

Oracles (SURVEY.md §4):

* Stokes limit: swimming speed -> 1 for the 3/2 sin(th)(1+beta cos(th))
  slip (classical squirmer result U = (2/3) B1, B1 = 3/2), fixed-sphere
  drag -> -6 pi;
* the reference's only quantitative end-to-end value: speed
  0.92571156681483957 at Re=1, beta=1 on the donut mesh at p=8
  (``examples/squirmer-axisymmetric.py:666-671``);
* checkpoint/resume and continuation-driver behavior.
"""

import numpy as np
import pytest

from spectralelementmethod_tpu.mesh import annulus_mesh
from spectralelementmethod_tpu.models import squirmer as sqm
from spectralelementmethod_tpu.solver.rootfind import SolverFailure


def coarse_mesh():
    return annulus_mesh(order=6, n_theta=6, n_r=10, r_outer=100.0,
                        progression=1.6)


@pytest.fixture(scope="module")
def coarse_squirmer():
    sq = sqm.Squirmer(coarse_mesh(), order=6)
    return sq


class TestStokesLimit:
    def test_swimming_speed_is_one(self, coarse_squirmer):
        sq = coarse_squirmer
        sq.set_initial_guess()
        speed = sq.calc_speed([0.99, 1.01], n_rey=0.01, beta=1.0,
                              verbose=False)
        # analytic U = 1 up to finite-domain (R=100) and Re=0.01 effects
        assert abs(speed - 1.0) < 5e-3

    def test_fixed_sphere_drag(self):
        fs = sqm.FixedSphere(coarse_mesh(), order=6)
        fs.run(0.01, verbose=False)
        force = fs.calc_force()
        # Stokes drag -6 pi (flow from +z pushes the sphere downstream),
        # with O(1%) finite-domain/Oseen corrections
        assert abs(force - (-6 * np.pi)) < 0.06 * 6 * np.pi
        assert force < 0

    def test_newton_quadratic_convergence(self, coarse_squirmer):
        """Exact autodiff Jacobians: Newton converges in a few iterations."""
        sq = coarse_squirmer
        sq.set_initial_guess()
        sq.compute_operators(0.5)
        sq.set_boundary_conditions(speed=1.0, beta=0.5)
        sq.solve(it_max=8, tol=1e-10, verbose=False)  # raises on failure

    def test_solver_failure_raised(self, coarse_squirmer):
        sq = coarse_squirmer
        sq.set_initial_guess()
        sq.compute_operators(1.0)
        sq.set_boundary_conditions(speed=1.0, beta=1.0)
        with pytest.raises(SolverFailure):
            sq.solve(it_max=1, tol=1e-14, verbose=False)


class TestGoldenValue:
    def test_reference_golden_speed(self):
        """The reference's documented oracle at its own resolution:
        donut mesh (9 x 15 transfinite, progression 1.35, R=100), p=8,
        Re=1, beta=1 -> 0.92571156681483957.

        With gmsh-faithful node placement (transfinite vertices +
        boundary-snapped arcs + straight interior chords) we land 1.8e-6
        from the recorded digits; that is at the noise floor of the
        oracle itself — the reference computed it with flow tolerance
        1e-6 on ||d vort|| and secant stop 1e-5 on the speed
        (``squirmer:691,695``), so its recorded digits carry O(1e-6)
        solver noise on top of any residual mesh-byte differences.
        """
        mesh = annulus_mesh(order=8, n_theta=9, n_r=15, r_outer=100.0,
                            progression=1.35, node_placement="gmsh")
        sq = sqm.Squirmer(mesh, order=8)
        sq.set_initial_guess()
        speed = sq.calc_speed([0.99, 1.01], n_rey=1.0, beta=1.0,
                              verbose=False)
        assert abs(speed - 0.92571156681483957) < 3e-6

    def test_golden_tight_secant_self_consistency(self):
        """Drive OUR secant to 1e-8 (flow tol 1e-10): speeds computed
        from two different bracket pairs agree to ~1e-7, demonstrating
        the framework's own speed is resolved two orders below the
        1.8e-6 offset from the recorded golden digits — that residual is
        bounded by the ORACLE's solver noise (the reference computed its
        digits with flow tolerance 1e-6 and secant stop 1e-5,
        ``squirmer:691,695``), not by this implementation (VERDICT
        round-2 item 8)."""
        mesh = annulus_mesh(order=8, n_theta=9, n_r=15, r_outer=100.0,
                            progression=1.35, node_placement="gmsh")
        sq = sqm.Squirmer(mesh, order=8)
        sq.set_initial_guess()
        tight = {"flow_solver_opts": {"tol": 1e-10, "it_max": 14},
                 "speed_solver_opts": {"tol": 1e-8, "it_max": 20}}
        s1 = sq.calc_speed([0.99, 1.01], n_rey=1.0, beta=1.0,
                           verbose=False, **tight)
        # second solve from a different bracket, warm state
        s2 = sq.calc_speed([0.90, 0.95], n_rey=1.0, beta=1.0,
                           verbose=False, **tight)
        assert abs(s1 - s2) < 1e-7
        assert abs(s1 - 0.92571156681483957) < 3e-6

    def test_golden_speed_placement_insensitive(self):
        """Polar-exact node placement (a strictly better sphere fit) must
        agree with the gmsh-faithful mesh at the discretization level —
        guards against either placement quietly distorting the domain."""
        mesh = annulus_mesh(order=8, n_theta=9, n_r=15, r_outer=100.0,
                            progression=1.35, node_placement="polar")
        sq = sqm.Squirmer(mesh, order=8)
        sq.set_initial_guess()
        speed = sq.calc_speed([0.99, 1.01], n_rey=1.0, beta=1.0,
                              verbose=False)
        assert abs(speed - 0.92571156681483957) < 3e-6


class TestCheckpointAndContinuation:
    def test_save_load_roundtrip(self, coarse_squirmer, tmp_path):
        import h5py

        sq = coarse_squirmer
        sq.set_initial_guess()
        sq.calc_speed([0.99, 1.01], n_rey=0.01, beta=1.0, verbose=False)
        path = str(tmp_path / "results.h5")
        with h5py.File(path, "w") as f:
            sq.save_data(f)
        soln_before = sq.soln_vec.copy()
        speed_before = sq.phys_params["speed"]

        sq.soln_vec = np.zeros_like(sq.soln_vec)
        with h5py.File(path, "r") as f:
            label = [k for k in f.keys()][0]
            assert label == "Re=1.00e-02,beta=1.00e+00"
            sq.load_data(f[label])
        np.testing.assert_array_equal(sq.soln_vec, soln_before)
        assert sq.phys_params["speed"] == speed_before

    def test_continuation_sweep_and_resume(self, coarse_squirmer, tmp_path):
        import h5py

        sq = coarse_squirmer
        path = str(tmp_path / "sweep.h5")
        speeds = sqm.main(sq, [0.01, 0.05], [1.0], filename=path,
                          verbose=False)
        assert set(speeds) == {(0.01, 1.0), (0.05, 1.0)}
        with h5py.File(path, "r") as f:
            assert "Re=1.00e-02,beta=1.00e+00" in f
            assert "Re=5.00e-02,beta=1.00e+00" in f

        # resume: both points load from file (no solves); speeds identical
        speeds2 = sqm.main(sq, [0.01, 0.05], [1.0], filename=path,
                           verbose=False)
        assert speeds2 == speeds

    def test_guess_from(self, coarse_squirmer):
        sq = coarse_squirmer
        sq.set_initial_guess()
        sq.calc_speed([0.99, 1.01], n_rey=0.01, beta=1.0, verbose=False)

        other = sqm.Squirmer(
            annulus_mesh(order=4, n_theta=5, n_r=8, r_outer=100.0,
                         progression=1.8),
            order=4,
        )
        other.guess_from(sq)
        # warm-started field should resemble the source solution at shared
        # physical locations (sample the stream function near the sphere)
        from spectralelementmethod_tpu.core import pointlocate as pl

        pts = np.array([[1.5, 0.3], [2.0, -1.0]])
        a = pl.interpolate(sq.disc, sq.soln[:, 0], pts)
        b = pl.interpolate(other.disc, other.soln[:, 0], pts)
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


def test_reference_api_names():
    """Reference-parity entry points exist."""
    assert hasattr(sqm, "squirmer_vslip_profile")
    assert hasattr(sqm, "zero_slip_vel")
    assert hasattr(sqm, "sfn_potential")
    assert hasattr(sqm, "sfn_free_stream")
    sq_cls = sqm.Squirmer
    for name in ("run", "solve", "calc_force", "calc_speed", "save_data",
                 "load_data", "guess_from", "set_initial_guess",
                 "set_boundary_conditions", "compute_operators",
                 "pre_assembly"):
        assert hasattr(sq_cls, name), name


class TestMixedPrecisionSolver:
    """gmres-ir (f64 GMRES + f32 condensation preconditioner) must match
    the direct f64 Schur solve — the TPU path, where XLA's batched LU is
    f32-only."""

    def test_gmres_ir_matches_direct(self):
        mesh = annulus_mesh(order=6, n_theta=6, n_r=10, r_outer=100.0,
                            progression=1.6)
        sq_d = sqm.Squirmer(mesh, order=6, linear_solver="direct")
        sq_m = sqm.Squirmer(mesh, order=6, linear_solver="gmres-ir")
        for sq in (sq_d, sq_m):
            sq.run(n_rey=0.5, beta=0.5, speed=0.95, verbose=False)
        np.testing.assert_allclose(sq_m.soln, sq_d.soln, atol=1e-8)
        f_d, f_m = sq_d.calc_force(), sq_m.calc_force()
        assert abs(f_m - f_d) < 1e-8

    def test_device_newton_loop_matches_host(self):
        """newton_loop='device' (one lax.while_loop dispatch) == the host
        restart-ladder loop."""
        mesh = annulus_mesh(order=6, n_theta=6, n_r=10, r_outer=100.0,
                            progression=1.6)
        sq_h = sqm.Squirmer(mesh, order=6, linear_solver="gmres-ir")
        sq_h.run(n_rey=0.5, beta=0.5, speed=0.95, verbose=False)

        sq_d = sqm.Squirmer(mesh, order=6, linear_solver="gmres-ir")
        sq_d.set_initial_guess()
        sq_d.compute_operators(0.5)
        sq_d.set_boundary_conditions(speed=0.95, beta=0.5)
        sq_d.solve(verbose=False, newton_loop="device")
        # force BEFORE any host access: exercises the device-resident
        # quadrature (no field download)
        assert sq_d._soln_dev is not None
        f_dev = sq_d.calc_force()
        assert sq_d._soln_dev is not None      # still on device
        np.testing.assert_allclose(sq_d.soln, sq_h.soln, atol=1e-9)
        assert sq_d._soln_dev is None          # property downloaded it
        f_np = sq_d.calc_force()               # numpy quadrature path
        assert abs(f_dev - f_np) < 1e-10
        assert abs(f_dev - sq_h.calc_force()) < 1e-9

        # BC writes on a live device copy (the next secant speed)
        sq_d.solve(verbose=False, newton_loop="device")
        sq_d.set_boundary_conditions(speed=0.96, beta=0.5)
        assert sq_d._soln_dev is not None      # no download on BC write
        sq_h.set_boundary_conditions(speed=0.96, beta=0.5)
        np.testing.assert_allclose(sq_d.soln, sq_h.soln, atol=1e-9)


class TestSchurFactorApply:
    """schur_factor + schur_apply == schur_solve on the same system."""

    def test_matches_schur_solve(self):
        import jax.numpy as jnp
        from spectralelementmethod_tpu.solver import condensation as sc
        from spectralelementmethod_tpu.basis import gll_basis_2d
        from spectralelementmethod_tpu.core.discretization import (
            Discretization)
        from spectralelementmethod_tpu.mesh import rectangle_mesh

        mesh = rectangle_mesh(3, 2, 3)
        disc = Discretization(mesh, gll_basis_2d(3))
        csys = sc.build_condensed_indexing(disc, dofs_per_node=2)
        E = disc.E
        nd = 2 * disc.n_loc
        rng = np.random.RandomState(0)
        # well-conditioned SPD-ish local systems
        B = rng.standard_normal((E, nd, nd)).astype(np.float32)
        lmat = jnp.asarray(B @ np.swapaxes(B, 1, 2)
                           + 10 * nd * np.eye(nd, dtype=np.float32))
        free = np.ones(csys.n_ext_dofs, bool)
        free[:5] = False
        free_d = jnp.asarray(free)
        facs = sc.schur_factor(lmat, csys, free_d)
        for seed in (1, 2):
            lrhs = jnp.asarray(rng.standard_normal((E, nd))
                               .astype(np.float32))
            xe0, xl0 = sc.schur_solve(lmat, lrhs, csys, free_d)
            xe1, xl1 = sc.schur_apply(facs, lrhs, csys)
            np.testing.assert_allclose(np.asarray(xe1), np.asarray(xe0),
                                       rtol=2e-4, atol=2e-5)
            np.testing.assert_allclose(np.asarray(xl1), np.asarray(xl0),
                                       rtol=2e-4, atol=2e-5)

    def test_rhs_extra(self):
        import jax.numpy as jnp
        from spectralelementmethod_tpu.solver import condensation as sc
        from spectralelementmethod_tpu.basis import gll_basis_2d
        from spectralelementmethod_tpu.core.discretization import (
            Discretization)
        from spectralelementmethod_tpu.mesh import rectangle_mesh

        mesh = rectangle_mesh(2, 2, 2)
        disc = Discretization(mesh, gll_basis_2d(2))
        csys = sc.build_condensed_indexing(disc, dofs_per_node=1)
        E, nd = disc.E, disc.n_loc
        rng = np.random.RandomState(3)
        B = rng.standard_normal((E, nd, nd))
        lmat = jnp.asarray(B @ np.swapaxes(B, 1, 2) + 10 * nd * np.eye(nd))
        lrhs = jnp.asarray(rng.standard_normal((E, nd)))
        extra = jnp.asarray(rng.standard_normal(csys.n_ext_dofs))
        free_d = jnp.ones(csys.n_ext_dofs, bool)
        facs = sc.schur_factor(lmat, csys, free_d)
        xe0, _ = sc.schur_solve(lmat, lrhs, csys, free_d, rhs_extra=extra)
        xe1, _ = sc.schur_apply(facs, lrhs, csys, rhs_extra=extra)
        np.testing.assert_allclose(np.asarray(xe1), np.asarray(xe0),
                                   rtol=1e-9, atol=1e-10)


class TestDeviceForceNumpySlip:
    def test_fixed_sphere_device_force(self):
        """Round-2 review regression: the device-resident force quadrature
        must not jit-trace numpy-based slip profiles (FixedSphere's
        zero_slip_vel calls np.zeros_like) — the profile is evaluated
        host-side at the static face coordinates instead."""
        fs = sqm.FixedSphere(coarse_mesh(), order=6,
                             linear_solver="gmres-ir")
        fs.run(0.01, verbose=False, newton_loop="device")
        assert fs._soln_dev is not None
        f_dev = fs.calc_force()                # device quadrature
        _ = fs.soln                            # downloads
        assert fs._soln_dev is None
        f_np = fs.calc_force()                 # numpy quadrature
        assert abs(f_dev - f_np) < 1e-10
        assert abs(f_dev - (-6 * np.pi)) < 0.06 * 6 * np.pi
