"""Operator variants: affine-compressed factors, bf16 compute, precision."""

import jax.numpy as jnp
import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll_basis_2d
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.mesh import rectangle_mesh
from spectralelementmethod_tpu.mesh.generators import annulus_mesh
from spectralelementmethod_tpu.models.poisson import Poisson
from spectralelementmethod_tpu.ops import sumfac
from spectralelementmethod_tpu.ops.exchange import make_exchange


def _setup(mesh, p):
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    ex = make_exchange(disc)
    Gf = jnp.asarray(np.asarray(prob._G), jnp.float32).reshape(
        disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    u = jnp.asarray(np.random.RandomState(0).standard_normal(
        (ex.E, ex.n_loc)).astype(np.float32))
    return disc, ex, Gf, Dhat, u


def test_affine_detection():
    disc, ex, Gf, Dhat, u = _setup(rectangle_mesh(4, 4, 4), 4)
    a, exact = sumfac.affine_factorization(
        np.asarray(Gf), disc.basis.weight_grid().reshape(-1))
    assert exact
    # annulus is curved: not affine
    disc2, ex2, Gf2, _, _ = _setup(annulus_mesh(3, n_theta=4, n_r=5), 3)
    _, exact2 = sumfac.affine_factorization(
        np.asarray(Gf2), disc2.basis.weight_grid().reshape(-1))
    assert not exact2


def test_affine_apply_matches_general():
    disc, ex, Gf, Dhat, u = _setup(rectangle_mesh(4, 4, 4), 4)
    A_gen = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, backend="xla", structure="general")
    A_aff = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, backend="xla", structure="affine")
    a, b = np.asarray(A_gen(u)), np.asarray(A_aff(u))
    assert np.abs(a - b).max() <= 1e-5 * np.abs(a).max()


def test_affine_raises_on_curved():
    disc, ex, Gf, Dhat, u = _setup(annulus_mesh(3, n_theta=4, n_r=5), 3)
    with pytest.raises(ValueError):
        sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, backend="xla", structure="affine")
    # auto silently falls back to the general path
    A = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, backend="xla", structure="auto")
    assert np.all(np.isfinite(np.asarray(A(u))))


@pytest.mark.parametrize("structure", ["general", "affine"])
def test_bf16_compute_close_to_f32(structure):
    mesh = rectangle_mesh(4, 4, 4)
    disc, ex, Gf, Dhat, u = _setup(mesh, 4)
    A32 = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, backend="xla", structure=structure)
    A16 = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, backend="xla", structure=structure,
        compute_dtype=jnp.bfloat16)
    a, b = np.asarray(A32(u)), np.asarray(A16(u))
    assert b.dtype == np.float32
    assert np.abs(a - b).max() <= 0.03 * np.abs(a).max()
