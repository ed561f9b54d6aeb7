"""Native (C++) meshkit: hash matching and batched point location.

Skipped when no C++ toolchain is available (the library then uses its
numpy fallbacks, covered by the other test modules).
"""

import numpy as np
import pytest

from spectralelementmethod_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="C++ toolchain unavailable"
)


def test_match_keys_pairs_and_singletons():
    keys = np.array([5, 9, 5, 7, 9, 11], dtype=np.int64)
    partner = native.match_keys(keys)
    assert partner.tolist() == [2, 4, 0, -1, 1, -1]


def test_match_keys_triple_raises():
    with pytest.raises(ValueError):
        native.match_keys(np.array([3, 3, 3], dtype=np.int64))


def test_match_keys_matches_numpy_sort():
    rng = np.random.RandomState(0)
    vals = rng.randint(0, 5000, size=4000).astype(np.int64)
    # force exactly-paired keys: duplicate a subset once
    uniq = np.unique(vals)
    keys = np.concatenate([uniq, uniq[: uniq.size // 2]])
    rng.shuffle(keys)
    partner = native.match_keys(keys)
    for i, j in enumerate(partner):
        if j >= 0:
            assert keys[j] == keys[i] and i != j and partner[j] == i
        else:
            assert np.count_nonzero(keys == keys[i]) == 1


def test_lookup_keys():
    keys = np.array([10, 20, 30], dtype=np.int64)
    out = native.lookup_keys(keys, np.array([30, 15, 10], dtype=np.int64))
    assert out.tolist() == [2, -1, 0]


def test_locate_points_matches_python(poisson_disc=None):
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core import pointlocate as ploc
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh.generators import annulus_mesh

    mesh = annulus_mesh(4, n_theta=6, n_r=8)
    disc = Discretization(mesh, gll_basis_2d(4))
    rng = np.random.RandomState(1)
    r = np.exp(rng.uniform(np.log(1.05), np.log(95.0), 64))
    th = rng.uniform(0.05, np.pi - 0.05, 64)
    pts = np.stack([r * np.sin(th), r * np.cos(th)], axis=1)

    elems, xis = ploc.locate_points(disc, pts)
    assert np.all(elems >= 0)
    for q in range(0, 64, 7):
        # python single-point reference
        e_ref, xi_ref = ploc.find_element_containing_point(disc, pts[q])
        assert elems[q] == e_ref
        np.testing.assert_allclose(xis[q], xi_ref, atol=1e-10)
        # round-trip through the forward map
        x = ploc.forward_map(disc, int(elems[q]), xis[q])
        np.testing.assert_allclose(x, pts[q], atol=1e-7)


def test_locate_points_outside_domain():
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core import pointlocate as ploc
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh

    disc = Discretization(rectangle_mesh(3, 3, 3), gll_basis_2d(3))
    elems, _ = ploc.locate_points(disc, np.array([[5.0, 5.0], [0.1, 0.2]]))
    assert elems[0] == -1 and elems[1] >= 0
