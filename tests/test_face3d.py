"""3D face geometry: orientation, surface measures, Neumann BCs, fluxes.

Mirrors the 2D orientation suite for hexahedral faces (the reference is
2D-only, ``sem/mapping.py:110-111``; the conventions generalized here are
``sem/mapping.py:19-76`` orientation and ``:184-268`` SubMapping n_dS/dS).
"""

import numpy as np
import pytest

from spectralelementmethod_tpu.basis.tensor import (TensorProductQS,
                                                    gll_basis_2d,
                                                    gll_basis_3d)
from spectralelementmethod_tpu.core.discretization import Discretization
from spectralelementmethod_tpu.core import mapping as mp
from spectralelementmethod_tpu.mesh.generators import box_mesh
from spectralelementmethod_tpu.mesh.geometry import (FACE_AXES_3D,
                                                     subface_index_array,
                                                     subface_slice)


def _disc(order=3, nx=2, ny=2, nz=2, **kw):
    mesh = box_mesh(nx, ny, nz, order, **kw)
    return Discretization(mesh, gll_basis_3d(order))


class TestSubfaceSlice3D:
    def test_index_array_matches_slice(self):
        shape = (3, 4, 5)
        arr = np.arange(np.prod(shape)).reshape(shape)
        for f in range(6):
            ia = subface_index_array(f, shape)
            sl = subface_slice(f, arr, 3)
            np.testing.assert_array_equal(arr.ravel()[ia], sl)

    def test_face_grid_shapes(self):
        # in-plane axes follow FACE_AXES_3D order
        shape = (3, 4, 5)
        for f in range(6):
            t0, t1 = FACE_AXES_3D[f]
            assert subface_index_array(f, shape).shape == (
                shape[t0], shape[t1])

    def test_fixed_axis_value(self):
        # face f restricts axis f//2 to end f%2
        shape = (3, 4, 5)
        grids = np.meshgrid(*(np.linspace(-1, 1, s) for s in shape),
                            indexing="ij")
        for f in range(6):
            ax, end = divmod(f, 2)
            vals = subface_slice(f, grids[ax], 3)
            np.testing.assert_allclose(vals, 1.0 if end else -1.0)

    def test_reference_cube_outward_cross_product(self):
        # on the identity-mapped cube, (d x/d t0) x (d x/d t1) must point
        # along the outward normal of every face
        shape = (4, 4, 4)
        grids = np.stack(np.meshgrid(
            *(np.linspace(-1, 1, s) for s in shape), indexing="ij"))
        for f in range(6):
            ax, end = divmod(f, 2)
            t0, t1 = FACE_AXES_3D[f]
            # identity map: d x/d t_i = e_{t_i}, constants over the face
            e0 = np.zeros(3)
            e0[t0] = 1.0
            e1 = np.zeros(3)
            e1[t1] = 1.0
            n = np.cross(e0, e1)
            expect = np.zeros(3)
            expect[ax] = 1.0 if end else -1.0
            np.testing.assert_allclose(n, expect)
            # and the slice really lands on that face
            face_vals = subface_slice(f, grids[ax], 3)
            np.testing.assert_allclose(face_vals, expect[ax])

    def test_2d_conventions_unchanged(self):
        # regression: the 2D CCW behavior is bit-identical to the docstring
        arr = np.arange(12).reshape(3, 4)
        np.testing.assert_array_equal(subface_slice(0, arr, 2),
                                      arr[0, ::-1])
        np.testing.assert_array_equal(subface_slice(1, arr, 2), arr[-1, :])
        np.testing.assert_array_equal(subface_slice(2, arr, 2), arr[:, 0])
        np.testing.assert_array_equal(subface_slice(3, arr, 2),
                                      arr[::-1, -1])


class TestFaceGeometry3D:
    def test_outward_unit_normals_box(self):
        disc = _disc(order=3, boundary_names={
            "west": "w", "east": "e", "south": "s", "north": "n",
            "bottom": "b", "top": "t"})
        expected = {
            "w": [-1, 0, 0], "e": [1, 0, 0], "s": [0, -1, 0],
            "n": [0, 1, 0], "b": [0, 0, -1], "t": [0, 0, 1]}
        for name, n_exp in expected.items():
            (fg,) = disc.face_geometry_groups(name)
            un = fg.unit_normal
            diff = un - np.asarray(n_exp, float)[None, :, None]
            assert np.abs(diff).max() < 1e-12

    def test_surface_area_scaled_box(self):
        # box [0,1]x[0,2]x[0,3]: area = 2*(1*2 + 1*3 + 2*3) = 22
        disc = _disc(order=4, x0=(0, 0, 0), x1=(1.0, 2.0, 3.0))
        (fg,) = disc.face_geometry_groups("ebc")
        area = float(np.sum(fg.dSxW))
        np.testing.assert_allclose(area, 22.0, rtol=1e-12)

    def test_tangents_are_jacobian_columns(self):
        disc = _disc(order=2, x0=(0, 0, 0), x1=(2.0, 4.0, 6.0))
        (fg,) = disc.face_geometry_groups("ebc")
        # affine box: d x/d t is half the cell extent along t
        h = np.array([2.0 / 2, 4.0 / 2, 6.0 / 2]) / 2  # cells split axes
        for j, f in enumerate(fg.faces):
            t0, t1 = FACE_AXES_3D[int(f)]
            np.testing.assert_allclose(
                np.linalg.norm(fg.tangent[j], axis=0), h[t0], rtol=1e-12)
            np.testing.assert_allclose(
                np.linalg.norm(fg.tangent2[j], axis=0), h[t1], rtol=1e-12)

    def test_boundary_node_set_matches_face_groups(self):
        disc = _disc(order=3)
        (fg,) = disc.face_geometry_groups("ebc")
        via_faces = np.unique(disc._face_nodes_of(fg).ravel())
        np.testing.assert_array_equal(disc.boundary_node_set("ebc"),
                                      via_faces)


def _u_exact(x, y, z):
    return x * x + 2 * y * y + 3 * z * z + x * y * z


def _grad_u(x, y, z):
    return (2 * x + y * z, 4 * y + x * z, 6 * z + x * y)


class TestPoisson3DNeumann:
    @pytest.fixture(scope="class")
    def solved(self):
        from spectralelementmethod_tpu.models.poisson import Poisson

        disc = _disc(order=3, nx=2, ny=2, nz=2, x0=(0, 0, 0),
                     x1=(1, 1, 1), boundary_names={
                         "west": "dir", "south": "dir", "bottom": "dir",
                         "east": "neu_e", "north": "neu_n", "top": "neu_t"})
        prob = Poisson(disc, forcing=-12.0)  # f = -Delta u = -12
        prob.set_dirichlet("dir", _u_exact)
        # inhomogeneous Neumann: g = n . grad u on each +side
        prob.set_neumann("neu_e", lambda x, y, z: _grad_u(x, y, z)[0])
        prob.set_neumann("neu_n", lambda x, y, z: _grad_u(x, y, z)[1])
        prob.set_neumann("neu_t", lambda x, y, z: _grad_u(x, y, z)[2])
        sol = prob.solve(tol=1e-13)
        return prob, disc, sol

    def test_matches_manufactured_solution_1e10(self, solved):
        prob, disc, sol = solved
        x = disc.global_gll_coords()
        err = np.abs(sol.u - _u_exact(*x))
        assert err.max() < 1e-10

    def test_l2_error(self, solved):
        prob, disc, sol = solved
        assert prob.l2_error(sol.u, _u_exact) < 1e-10

    def test_boundary_flux_matches_analytic(self, solved):
        prob, disc, sol = solved
        # exact nodal field (it lies in the FE space at p=3)
        x = disc.global_gll_coords()
        u = _u_exact(*x)
        # east face x=1: flux = int (2 + y z) dy dz over [0,1]^2 = 2.25
        np.testing.assert_allclose(prob.boundary_flux(u, "neu_e"), 2.25,
                                   rtol=1e-11)
        # top face z=1: flux = int (6 + x y) dx dy = 6.25
        np.testing.assert_allclose(prob.boundary_flux(u, "neu_t"), 6.25,
                                   rtol=1e-11)

    def test_divergence_theorem(self, solved):
        prob, disc, sol = solved
        # sum of fluxes over the whole boundary = int Delta u = 12
        x = disc.global_gll_coords()
        u = _u_exact(*x)
        total = sum(prob.boundary_flux(u, b)
                    for b in ("dir", "neu_e", "neu_n", "neu_t"))
        np.testing.assert_allclose(total, 12.0, rtol=1e-11)


class TestBoundaryFlux2D:
    def test_flux_2d_divergence_theorem(self):
        from spectralelementmethod_tpu.mesh.generators import rectangle_mesh
        from spectralelementmethod_tpu.models.poisson import Poisson

        mesh = rectangle_mesh(3, 3, 3, x0=(0, 0), x1=(1, 1),
                              boundary_names={"west": "b", "east": "b",
                                              "south": "b", "north": "b"})
        disc = Discretization(mesh, gll_basis_2d(3))
        prob = Poisson(disc)
        x = disc.global_gll_coords()
        u = x[0] ** 2 * x[1] + x[1] ** 3  # Delta u = 2y + 6y
        flux = prob.boundary_flux(u, "b")
        # int_Omega (2y + 6y) = 4 on the unit square
        np.testing.assert_allclose(flux, 4.0, rtol=1e-11)
