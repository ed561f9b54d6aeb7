"""In-memory structured mesh generators.

The reference ships only Gmsh ``.geo`` sources (``examples/meshes/*.geo``,
``tests/mesh/square.geo``) and requires an external ``gmsh`` binary to
produce ``.msh`` files (which are git-lfs absent upstream).  These generators
build the same meshes directly:

* :func:`rectangle_mesh` — the unit-square mesh of ``tests/mesh/square.geo``
  / ``examples/meshes/square.geo`` (regions "interior"; boundaries "ebc" =
  west+south, "nbc" = north+east).
* :func:`annulus_mesh` — the transfinite sphere-in-shell "donut" mesh of
  ``examples/meshes/donut.geo`` (boundaries "sphere"/"shell"/"symaxis",
  angular equispacing, radial geometric grading).
* :func:`mapped_mesh` — general single-patch structured mesh through a
  user coordinate map.

All generators place each cell's high-order nodes *equispaced in the patch
parameter* within the cell, matching Gmsh's high-order node convention that
the isoparametric mapping construction assumes (equispaced parametric nodes,
``sem/basis_functions.py:599-624`` via ``sem/mapping.py:98-103``).
"""

from __future__ import annotations

import numpy as np

from .geometry import Quadrilateral
from .mesh import Mesh


def _patch_param_1d(corner_values: np.ndarray, order: int) -> np.ndarray:
    """Global 1D parameter line: cells between consecutive corner values,
    ``order+1`` equispaced nodes per cell, shared endpoints."""
    n_cells = corner_values.size - 1
    n_glob = n_cells * order + 1
    u = np.empty(n_glob)
    for c in range(n_cells):
        u[c * order:(c + 1) * order + 1] = np.linspace(
            corner_values[c], corner_values[c + 1], order + 1
        )
    return u


def structured_patch_mesh(
    u_corners,
    v_corners,
    order: int,
    coord_map,
    region: str = "interior",
    boundary_names: dict | None = None,
) -> Mesh:
    """Build a single-patch structured quad mesh.

    Parameters
    ----------
    u_corners, v_corners : array
        Cell-corner values of the two patch parameters (lengths nx+1, ny+1).
    order : int
        Geometric polynomial order of each cell (cells have
        ``(order+1)**2`` nodes).
    coord_map : callable
        ``coord_map(U, V) -> (x, y)`` mapping patch parameters to physical
        coordinates (vectorized).
    boundary_names : dict
        Maps sides ``"west"/"east"/"south"/"north"`` (faces of the *patch*)
        to boundary names; sides mapping to the same name share a boundary;
        sides absent get no boundary.
    """
    u_corners = np.asarray(u_corners, dtype=np.float64)
    v_corners = np.asarray(v_corners, dtype=np.float64)
    nx, ny = u_corners.size - 1, v_corners.size - 1
    p = order

    u = _patch_param_1d(u_corners, p)
    v = _patch_param_1d(v_corners, p)
    U, V = np.meshgrid(u, v, indexing="ij")
    x, y = coord_map(U, V)

    mesh = Mesh(2)
    mesh.set_nodes(np.stack([x.ravel(), y.ravel()]))
    geometry = Quadrilateral(p + 1, p + 1)
    gid = mesh.add_geometry(geometry)
    rid = mesh.new_region(region)

    # all element node maps at once: cell (i, j) covers global grid rows
    # i*p..i*p+p and columns j*p..j*p+p (cell numbering: i * ny + j)
    glob = np.arange(u.size * v.size).reshape(u.size, v.size)
    i0 = (np.arange(nx) * p)[:, None, None, None]
    j0 = (np.arange(ny) * p)[None, :, None, None]
    ii = i0 + np.arange(p + 1)[None, None, :, None]
    jj = j0 + np.arange(p + 1)[None, None, None, :]
    node_maps = glob[ii, jj].reshape(nx * ny, p + 1, p + 1)
    mesh.add_cells(node_maps, gid, rid)

    mesh.find_neighbors()

    if boundary_names:
        ids = {}
        for side, name in boundary_names.items():
            if name not in ids:
                ids[name] = mesh.new_boundary(name)
        # patch side -> (cell numbers, face number):  faces are
        # 0=west(u0=0) 1=east 2=south(u1=0) 3=north of each cell
        side_cells = {
            "west": (np.arange(ny), 0),
            "east": ((nx - 1) * ny + np.arange(ny), 1),
            "south": (np.arange(nx) * ny, 2),
            "north": (np.arange(nx) * ny + ny - 1, 3),
        }
        for side, name in boundary_names.items():
            cells, face = side_cells[side]
            mesh.add_boundary_cells(cells, ids[name], 1, face)
    return mesh


# general-purpose alias
mapped_mesh = structured_patch_mesh


def rectangle_mesh(
    nx: int,
    ny: int,
    order: int,
    x0=(-1.0, -1.0),
    x1=(1.0, 1.0),
    region: str = "interior",
    boundary_names: dict | None = None,
) -> Mesh:
    """Uniform rectangle mesh.

    Defaults reproduce ``tests/mesh/square.geo``: domain [-1,1]², region
    "interior", boundary "ebc" on west+south and "nbc" on north+east.
    """
    if boundary_names is None:
        boundary_names = {
            "west": "ebc",
            "south": "ebc",
            "north": "nbc",
            "east": "nbc",
        }

    def cmap(U, V):
        return U, V

    return structured_patch_mesh(
        np.linspace(x0[0], x1[0], nx + 1),
        np.linspace(x0[1], x1[1], ny + 1),
        order,
        cmap,
        region=region,
        boundary_names=boundary_names,
    )


def geometric_progression(a: float, b: float, n: int, ratio: float) -> np.ndarray:
    """n+1 points from a to b with interval lengths in geometric progression.

    Matches Gmsh's ``Transfinite Line ... Using Progression r`` semantics
    (first interval shortest at ``a`` for ratio > 1).
    """
    if abs(ratio - 1.0) < 1e-14:
        return np.linspace(a, b, n + 1)
    lengths = ratio ** np.arange(n)
    t = np.concatenate([[0.0], np.cumsum(lengths)])
    t /= t[-1]
    return a + (b - a) * t


def annulus_mesh(
    order: int,
    n_theta: int = 9,
    n_r: int = 15,
    r_inner: float = 1.0,
    r_outer: float = 100.0,
    progression: float = 1.35,
    region: str = "interior",
) -> Mesh:
    """Half-annulus "donut" mesh for axisymmetric flow past a sphere.

    Reproduces ``examples/meshes/donut.geo``: half-disc shell in the
    meridional (rho, z) plane (rho >= 0), inner circle of radius
    ``r_inner`` ("sphere"), outer circle ``r_outer`` ("shell"), the two
    segments of the rho=0 axis ("symaxis").  Angular spacing is uniform
    (Transfinite Line {1,2} = 10 → 9 cells); radial spacing is a geometric
    progression refined toward the sphere (Transfinite 16 Using Progression
    1.35 → 15 cells).

    The patch parameters are polar: u = polar angle from the +z axis in
    [0, pi], v = radius.  High-order nodes are therefore placed equispaced
    in angle along circumferential edges (exact circles, like Gmsh's
    boundary snapping) and equispaced in radius radially.
    """
    theta_corners = np.linspace(0.0, np.pi, n_theta + 1)
    r_corners = geometric_progression(r_inner, r_outer, n_r, progression)

    def cmap(TH, R):
        # (rho, z): rho = r sin(theta) >= 0, z = r cos(theta).
        # det J = r * d(theta)/du * d(r)/dv > 0 with both increasing.
        return R * np.sin(TH), R * np.cos(TH)

    return structured_patch_mesh(
        theta_corners,
        r_corners,
        order,
        cmap,
        region=region,
        boundary_names={
            "south": "sphere",   # v = r_inner
            "north": "shell",    # v = r_outer
            "west": "symaxis",   # theta = 0  (positive z axis)
            "east": "symaxis",   # theta = pi (negative z axis)
        },
    )


def single_cell_mesh(order: int, corners=None) -> Mesh:
    """One-quadrilateral in-memory mesh (the reference's test fixture,
    ``tests/test_discrete.py:22-38``).

    ``corners``: optional (4, 2) array of vertex positions in the order
    (u0=0,u1=0), (0,1), (1,0), (1,1); default is the bi-unit square.
    """
    if corners is None:
        def cmap(U, V):
            return U, V
    else:
        c = np.asarray(corners, dtype=np.float64)

        def cmap(U, V):
            s, t = (U + 1) / 2, (V + 1) / 2
            x = ((1 - s) * (1 - t) * c[0, 0] + (1 - s) * t * c[1, 0]
                 + s * (1 - t) * c[2, 0] + s * t * c[3, 0])
            y = ((1 - s) * (1 - t) * c[0, 1] + (1 - s) * t * c[1, 1]
                 + s * (1 - t) * c[2, 1] + s * t * c[3, 1])
            return x, y

    return structured_patch_mesh(
        np.array([-1.0, 1.0]),
        np.array([-1.0, 1.0]),
        order,
        cmap,
        boundary_names={"west": "w", "east": "e", "south": "s", "north": "n"},
    )
