"""Gmsh binary 2.2 I/O tests: spiral ordering, roundtrip, solve-on-import."""

import numpy as np
import pytest

from spectralelementmethod_tpu.mesh import annulus_mesh, rectangle_mesh
from spectralelementmethod_tpu.mesh.gmsh import (
    FileFormatError,
    lex_to_spiral_permutation,
    load_msh,
    save_msh,
    spiral_to_lex_permutation,
)


class TestSpiralOrdering:
    def test_quad4(self):
        """Gmsh quad4 CCW vertices -> lexicographic grid."""
        idxmap = spiral_to_lex_permutation((2, 2))
        # spiral list [v00, v10, v11, v01]; lex grid rows=u:
        np.testing.assert_array_equal(idxmap, [[0, 3], [1, 2]])

    def test_quad9(self):
        """3x3: 4 vertices, 4 edge midpoints CCW, 1 center."""
        idxmap = spiral_to_lex_permutation((3, 3))
        # gmsh quad9: v(0,0) v(2,0) v(2,2) v(0,2), e_s(1,0) e_e(2,1)
        # e_n(1,2) e_w(0,1), center(1,1)
        expected = np.array([[0, 7, 3], [4, 8, 6], [1, 5, 2]])
        np.testing.assert_array_equal(idxmap, expected)

    def test_line(self):
        idxmap = spiral_to_lex_permutation((5,))
        np.testing.assert_array_equal(idxmap, [0, 2, 3, 4, 1])

    def test_inverse(self):
        for shape in [(2, 2), (3, 3), (5, 5), (9, 9), (6,), (2,)]:
            fwd = spiral_to_lex_permutation(shape).ravel()
            inv = lex_to_spiral_permutation(shape)
            np.testing.assert_array_equal(fwd[inv], np.arange(fwd.size))

    def test_matches_reference_algorithm(self):
        """Cross-check against a direct transcription of the reference's
        per-element conversion (sem/grid_importers.py:273-333)."""
        for shape in [(2, 2), (3, 3), (4, 4), (5, 5), (9, 9), (4,), (7,)]:
            n = int(np.prod(shape))
            spiral = np.arange(100, 100 + n, dtype=np.int64)
            mine = spiral[spiral_to_lex_permutation(shape).ravel()]
            ref = _reference_convert(shape, spiral.copy())
            np.testing.assert_array_equal(mine.reshape(shape), ref)


def _reference_convert(shape, global_indices):
    """Transcription of the reference algorithm for oracle testing only."""
    if len(shape) == 1:
        M, N = shape[0], 1
    else:
        M, N = shape
    idxmap = np.zeros((M, N), dtype=int)
    k = 0
    l = 0
    while l < min(M, N) // 2:
        corners = ([l, -l - 1, -l - 1, l], [l, l, -l - 1, -l - 1])
        idxmap[corners] = np.arange(k, k + 4)
        k += 4
        p_ns = M - 2 * (l + 1)
        idxmap[l + 1:-l - 1, l] = np.arange(k, k + p_ns)
        k += p_ns
        p_ew = N - 2 * (l + 1)
        idxmap[-l - 1, l + 1:-l - 1] = np.arange(k, k + p_ew)
        k += p_ew
        idxmap[l + 1:-l - 1, -l - 1] = np.arange(k + p_ns - 1, k - 1, -1)
        k += p_ns
        idxmap[l, l + 1:-l - 1] = np.arange(k + p_ew - 1, k - 1, -1)
        k += p_ew
        l += 1
    if (M % 2 or N % 2) and (min(M, N) != 2):
        if M > N:
            idxmap[[l, -l - 1], [l, l]] = np.arange(k, k + 2)
            k += 2
            idxmap[l + 1:-l - 1, l] = np.arange(k, M * N)
        elif M < N:
            idxmap[[l, l], [l, -l - 1]] = np.arange(k, k + 2)
            k += 2
            idxmap[l, l + 1:-l - 1] = np.arange(k, M * N)
        else:
            idxmap[l, l] = M * N - 1
    idxmap = idxmap.squeeze()
    out = global_indices.copy().reshape(idxmap.shape)
    out[...] = global_indices[idxmap.ravel()].reshape(idxmap.shape)
    return out


class TestRoundTrip:
    @pytest.mark.parametrize("make", [
        lambda: rectangle_mesh(3, 2, 4),
        lambda: rectangle_mesh(2, 2, 1),
        lambda: annulus_mesh(order=3, n_theta=4, n_r=3, r_outer=5.0),
    ])
    def test_save_load(self, make, tmp_path):
        mesh = make()
        path = str(tmp_path / "mesh.msh")
        save_msh(mesh, path)
        loaded = load_msh(path, ndim=2)

        assert loaded.n_nodes == mesh.n_nodes
        assert loaded.n_cells == mesh.n_cells
        np.testing.assert_allclose(loaded.nodes, mesh.nodes, atol=1e-15)
        assert loaded.region_names == mesh.region_names
        assert set(loaded.boundary_names) == set(mesh.boundary_names)
        for name in mesh.boundary_names:
            a = {tuple(p) for p in mesh.boundary_faces(name).tolist()}
            b = {tuple(p) for p in loaded.boundary_faces(name).tolist()}
            assert a == b, name
        for i, (c1, c2) in enumerate(zip(mesh.cells, loaded.cells)):
            np.testing.assert_array_equal(
                c1.node_ind_lexicographic, c2.node_ind_lexicographic
            )
            assert c1.region_name == c2.region_name

    def test_adjacency_rebuilt(self, tmp_path):
        mesh = rectangle_mesh(3, 3, 2)
        path = str(tmp_path / "m.msh")
        save_msh(mesh, path)
        loaded = load_msh(path, 2)
        for i in range(mesh.n_cells):
            c1, c2 = mesh.get_cell(i), loaded.get_cell(i)
            for face in range(4):
                n1, n2 = c1.neighbor(face), c2.neighbor(face)
                assert (n1 is None) == (n2 is None)
                if n1 is not None:
                    assert n1.index == n2.index


def test_poisson_on_imported_mesh(tmp_path):
    """End-to-end: export -> import -> solve matches direct-mesh solve."""
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.models.poisson import Poisson

    mesh = rectangle_mesh(3, 3, 4)
    path = str(tmp_path / "square.msh")
    save_msh(mesh, path)
    loaded = load_msh(path, 2)

    sols = []
    for m in (mesh, loaded):
        disc = Discretization(m, gll_basis_2d(4))
        prob = Poisson(disc)
        prob.set_dirichlet("ebc", 0.0)
        sols.append(prob.solve(tol=1e-13, host_loop=True).u)
    np.testing.assert_allclose(sols[0], sols[1], atol=1e-11)


def test_rejects_garbage(tmp_path):
    p = tmp_path / "bad.msh"
    p.write_bytes(b"not a mesh file\n")
    with pytest.raises(FileFormatError):
        load_msh(str(p), 2)


def test_rejects_ascii(tmp_path):
    p = tmp_path / "ascii.msh"
    p.write_bytes(b"$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
    with pytest.raises(NotImplementedError):
        load_msh(str(p), 2)
