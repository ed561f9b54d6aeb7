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
