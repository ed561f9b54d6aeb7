"""Tests for utils (perf, logging, checkpoint) and sp_array parity."""

import numpy as np
import pytest

from spectralelementmethod_tpu.ops.sp_array import KroneckerArray
from spectralelementmethod_tpu.utils import checkpoint as ckpt
from spectralelementmethod_tpu.utils.logging import MetricsRecorder, get_logger
from spectralelementmethod_tpu.utils.perf import Timer, roofline, timed


class TestKroneckerArray:
    def test_diag_matrix(self):
        """A 2D KroneckerArray with kdmap [0, 0] is a diagonal matrix."""
        d = np.array([1.0, 2.0, 3.0])
        ka = KroneckerArray((3, 3), d, [0, 0])
        np.testing.assert_array_equal(ka.to_array(), np.diag(d))

    def test_rank4_mass_operator(self):
        """The reference's mass-operator pattern: Me.add_diag(W, [0,1,0,1])
        densifies to a diagonal rank-4 tensor (squirmer:253-254)."""
        W = np.arange(6.0).reshape(2, 3)
        me = KroneckerArray((2, 3, 2, 3), W, [0, 1, 0, 1])
        dense = me.to_array()
        for p in range(2):
            for q in range(3):
                expect = np.zeros((2, 3))
                expect[p, q] = W[p, q]
                np.testing.assert_array_equal(dense[p, q], expect)

    def test_dot_dense_matches_densified(self):
        rng = np.random.RandomState(0)
        X = rng.randn(4, 5, 6)
        ka = KroneckerArray((4, 5, 4, 5, 4, 6), X, [0, 1, 0, 1, 0, 2])
        v = rng.randn(4, 6)
        out = ka.dot_dense(v, [4, 5]).to_array()
        expect = np.einsum("pqrstu,tu->pqrs", ka.to_array(), v)
        np.testing.assert_allclose(out, expect, atol=1e-12)

    def test_shape_validation(self):
        with pytest.raises(AssertionError):
            KroneckerArray((3, 4), np.zeros((3, 3)), [0, 1])


class TestPerf:
    def test_timer(self):
        t = Timer("x")
        with t:
            pass
        with t:
            pass
        assert t.count == 2
        assert t.total >= 0

    def test_timed(self):
        result, dt = timed(lambda a: a + 1, 1, reps=3)
        assert result == 2 and dt >= 0

    def test_roofline(self):
        r = roofline(flops=10**9, bytes_moved=10**8, seconds=1e-2,
                     device="TPU v5 lite")
        assert r.gflops == pytest.approx(100.0)
        assert r.intensity == pytest.approx(10.0)
        assert r.bound == "memory"  # ridge for v5e is ~240 FLOP/B
        assert 0 < r.efficiency <= 1.1


class TestLoggingAndCheckpoint:
    def test_logger_idempotent(self):
        a = get_logger("semtpu.test")
        b = get_logger("semtpu.test")
        assert a is b and len(a.handlers) == 1

    def test_metrics(self, tmp_path):
        m = MetricsRecorder()
        m.record(iter=0, res=1.0)
        m.record(iter=1, res=0.1)
        assert m.series("res") == [1.0, 0.1]
        p = tmp_path / "m.jsonl"
        m.dump_jsonl(str(p))
        assert len(p.read_text().splitlines()) == 2

    def test_checkpoint_roundtrip(self, tmp_path):
        import h5py

        label = ckpt.param_label(Re=1.5, beta=0.25)
        assert label == "Re=1.50e+00,beta=2.50e-01"
        path = str(tmp_path / "r.h5")
        with h5py.File(path, "w") as f:
            ckpt.save_solution(f, label, np.arange(5.0), speed=2.0)
            assert ckpt.has_solution(f, label)
            vec, attrs = ckpt.load_solution(f, label)
        np.testing.assert_array_equal(vec, np.arange(5.0))
        assert attrs["speed"] == 2.0


class TestChecks:
    def test_validate_discretization(self):
        from spectralelementmethod_tpu.basis import gll_basis_2d
        from spectralelementmethod_tpu.core.discretization import (
            Discretization)
        from spectralelementmethod_tpu.mesh.generators import annulus_mesh
        from spectralelementmethod_tpu.utils import checks

        disc = Discretization(annulus_mesh(4, n_theta=5, n_r=6),
                              gll_basis_2d(4))
        report = checks.validate_discretization(disc)
        assert report["detJ_min"] > 0
        assert report["symmetry_rel_err"] < 1e-10

    def test_checked_catches_nan(self):
        import jax.numpy as jnp
        import pytest

        from spectralelementmethod_tpu.utils import checks

        def f(x):
            return checks.assert_finite(jnp.log(x), "logx")

        g = checks.checked(f)
        g(jnp.asarray([1.0, 2.0]))  # fine
        with pytest.raises(Exception):
            g(jnp.asarray([-1.0, 2.0]))  # log(-1) = nan

    def test_nan_debug_mode_restores(self):
        import jax

        from spectralelementmethod_tpu.utils import checks

        before = jax.config.jax_debug_nans
        with checks.nan_debug_mode():
            assert jax.config.jax_debug_nans
        assert jax.config.jax_debug_nans == before


class TestCompilationCache:
    def test_enable_compilation_cache(self, tmp_path, monkeypatch):
        import jax

        from spectralelementmethod_tpu import config as cfg

        monkeypatch.setattr(cfg, "_CACHE_ENABLED", False)
        d = str(tmp_path / "xla_cache")
        out = cfg.enable_compilation_cache(d)
        assert out == d
        import os

        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # idempotent: second call keeps the configured dir
        assert cfg.enable_compilation_cache("/elsewhere") == d

    def test_opt_out(self, tmp_path, monkeypatch):
        from spectralelementmethod_tpu import config as cfg

        monkeypatch.setattr(cfg, "_CACHE_ENABLED", False)
        monkeypatch.setenv("SEM_TPU_CACHE_DIR", "off")
        assert cfg.enable_compilation_cache(str(tmp_path)) is None
