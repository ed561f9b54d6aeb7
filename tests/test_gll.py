"""Tests for GLL node/weight generation.

Oracle style follows the reference test strategy (SURVEY.md §4): exactness of
quadrature to degree 2n-3 (reference ``sem/quadratures.py:196-200``), known
closed-form low-order rules, symmetry, and agreement between the float64 and
mpmath generators.
"""

import numpy as np
import pytest

from spectralelementmethod_tpu.basis import gll
from spectralelementmethod_tpu.basis.quadrature import GaussLobatto


def test_low_order_closed_forms():
    # n=2: trapezoid endpoints
    r = gll.gauss_legendre_lobatto(2)
    np.testing.assert_allclose(r.nodes, [-1.0, 1.0])
    np.testing.assert_allclose(r.quad_wts, [1.0, 1.0])
    # n=3: Simpson
    r = gll.gauss_legendre_lobatto(3)
    np.testing.assert_allclose(r.nodes, [-1.0, 0.0, 1.0], atol=1e-15)
    np.testing.assert_allclose(r.quad_wts, [1 / 3, 4 / 3, 1 / 3], rtol=1e-15)
    # n=4: nodes +-1, +-1/sqrt(5); weights 1/6, 5/6
    r = gll.gauss_legendre_lobatto(4)
    s5 = 1.0 / np.sqrt(5.0)
    np.testing.assert_allclose(r.nodes, [-1.0, -s5, s5, 1.0], rtol=1e-15)
    np.testing.assert_allclose(
        r.quad_wts, [1 / 6, 5 / 6, 5 / 6, 1 / 6], rtol=1e-14
    )
    # n=5: nodes +-1, +-sqrt(3/7), 0; weights 1/10, 49/90, 32/45
    r = gll.gauss_legendre_lobatto(5)
    s37 = np.sqrt(3.0 / 7.0)
    np.testing.assert_allclose(r.nodes, [-1, -s37, 0, s37, 1], atol=1e-15)
    np.testing.assert_allclose(
        r.quad_wts, [1 / 10, 49 / 90, 32 / 45, 49 / 90, 1 / 10], rtol=1e-14
    )


@pytest.mark.parametrize("n", [2, 3, 4, 5, 8, 9, 12, 17, 33])
def test_exactness_degree(n):
    """The n-point rule integrates monomials exactly up to degree 2n-3."""
    r = gll.gauss_legendre_lobatto(n)
    for deg in range(0, 2 * n - 2):
        exact = 0.0 if deg % 2 == 1 else 2.0 / (deg + 1)
        approx = np.dot(r.quad_wts, r.nodes**deg)
        assert abs(approx - exact) < 5e-14 * max(1.0, abs(exact)), (n, deg)
    # and (for moderate n, where the error term is resolvable in float64)
    # fails at degree 2n-2
    if 2 < n <= 12:
        deg = 2 * n - 2
        exact = 2.0 / (deg + 1)
        approx = np.dot(r.quad_wts, r.nodes**deg)
        assert abs(approx - exact) > 1e-10


@pytest.mark.parametrize("n", [3, 6, 9, 11, 24])
def test_symmetry(n):
    r = gll.gauss_legendre_lobatto(n)
    np.testing.assert_allclose(r.nodes, -r.nodes[::-1], atol=1e-16)
    np.testing.assert_allclose(r.quad_wts, r.quad_wts[::-1], rtol=1e-15)
    assert abs(r.quad_wts.sum() - 2.0) < 1e-14
    # barycentric weights alternate sign
    signs = np.sign(r.bary_wts)
    assert np.all(signs[:-1] == -signs[1:])


@pytest.mark.parametrize("n", [2, 5, 9, 11, 16])
def test_matches_mpmath_generator(n):
    """float64 generator agrees with the arbitrary-precision one."""
    a = gll.gauss_legendre_lobatto(n)
    b = gll.gauss_legendre_lobatto_mp(n)
    np.testing.assert_allclose(a.nodes, b.nodes, atol=2e-16)
    np.testing.assert_allclose(a.bary_wts, b.bary_wts, rtol=1e-13)
    np.testing.assert_allclose(a.quad_wts, b.quad_wts, rtol=1e-13)


def test_table_roundtrip(tmp_path):
    """HDF5 table writer/loader mirrors the reference file layout."""
    fpath = str(tmp_path / "basis-data.hdf5")
    gll.write_table(fpath, max_order=6)
    for order in (1, 2, 5, 6):
        loaded = gll.load_table(fpath, order)
        direct = gll.gauss_legendre_lobatto(order + 1)
        np.testing.assert_allclose(loaded.nodes, direct.nodes, atol=1e-15)
        np.testing.assert_allclose(loaded.bary_wts, direct.bary_wts, rtol=1e-13)
        np.testing.assert_allclose(loaded.quad_wts, direct.quad_wts, rtol=1e-13)
    with pytest.raises(ValueError):
        gll.load_table(fpath, 7)


def test_matches_reference_table():
    """Cross-check against the reference's shipped basis-data.hdf5 if present."""
    import os

    ref = "/root/reference/sem/data/basis-data.hdf5"
    if not os.path.exists(ref):
        pytest.skip("reference table not available")
    for order in (1, 4, 8, 10):
        loaded = gll.load_table(ref, order)
        direct = gll.gauss_legendre_lobatto(order + 1)
        np.testing.assert_allclose(loaded.nodes, direct.nodes, atol=5e-16)
        np.testing.assert_allclose(loaded.bary_wts, direct.bary_wts, rtol=1e-12)
        np.testing.assert_allclose(loaded.quad_wts, direct.quad_wts, rtol=1e-12)


def test_gauss_lobatto_quadrature_object():
    q = GaussLobatto(9)
    assert q.deg == 2 * 9 - 3
    assert q.n_points == 9
    # integrate x + 1 over [-1, 1] = 2 (reference tests/test_basis.py:100-105)
    assert abs(q(lambda x: x + 1.0) - 2.0) < 1e-14
    assert abs(q.integrate(q.abscissa + 1.0) - 2.0) < 1e-14
    # xweight multiplies without summing
    np.testing.assert_allclose(q.xweight(np.ones(9)), q.weights)


def test_high_order_no_cap():
    """Orders beyond the reference's table cap of 10 work."""
    r = gll.gauss_legendre_lobatto(65)  # order 64
    assert r.order == 64
    assert abs(r.quad_wts.sum() - 2.0) < 1e-13
    assert np.all(np.diff(r.nodes) > 0)
