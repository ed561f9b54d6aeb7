"""Visualization tests (Agg backend, no display)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from spectralelementmethod_tpu import plot2d  # noqa: E402
from spectralelementmethod_tpu.basis import gll_basis_2d  # noqa: E402
from spectralelementmethod_tpu.core.discretization import (  # noqa: E402
    Discretization,
)
from spectralelementmethod_tpu.mesh import (  # noqa: E402
    annulus_mesh,
    rectangle_mesh,
)


@pytest.fixture(scope="module")
def disc():
    mesh = rectangle_mesh(3, 2, 4)
    return Discretization(mesh, gll_basis_2d(4))


def test_triangulate(disc):
    tri = plot2d.triangulate(disc.mesh)
    assert tri.triangles.shape == (disc.E * 2 * 4 * 4, 3)
    # all node indices in range
    assert tri.triangles.max() < disc.n_nodes
    # triangles are CCW (positive area)
    x, y = disc.mesh.nodes
    t = tri.triangles
    area = 0.5 * (
        (x[t[:, 1]] - x[t[:, 0]]) * (y[t[:, 2]] - y[t[:, 0]])
        - (x[t[:, 2]] - x[t[:, 0]]) * (y[t[:, 1]] - y[t[:, 0]])
    )
    assert np.all(area > 0)


def test_values_at_nodes_roundtrip(disc):
    """A polynomial field resamples exactly onto the equispaced nodes."""
    xg = disc.global_gll_coords()
    u = xg[0] ** 2 + xg[1]
    vals = disc.values_at_nodes(u)
    x, y = disc.mesh.nodes  # mesh nodes ARE the equispaced nodes
    np.testing.assert_allclose(vals, x**2 + y, atol=1e-11)


def test_contour_and_surface(disc, tmp_path):
    import matplotlib.pyplot as plt

    xg = disc.global_gll_coords()
    u = np.sin(xg[0]) * xg[1]
    cs = plot2d.tricontourf(disc, u, levels=10)
    assert cs is not None
    plot2d.tricontour(disc, u, levels=5)
    plot2d.surface(disc, u)
    plt.savefig(tmp_path / "plot.png")
    plt.close("all")


def test_draw_functions(tmp_path):
    import matplotlib.pyplot as plt

    mesh = annulus_mesh(order=3, n_theta=4, n_r=3, r_outer=5.0)
    ax = plot2d.draw_cells(mesh, draw_nums=True, draw_param_axes=True)
    plot2d.draw_nodes(mesh, ax=ax)
    plot2d.draw_cell_nodes(mesh.get_cell(0), local_indices=True, ax=ax)
    plot2d.draw_cell_nodes(mesh.get_cell(1), global_indices=True,
                           hierarchical_order=True, ax=ax)
    (line,) = ax.plot([0, 1, 2], [0, 1, 0])
    plot2d.add_arrow_to_line(line)
    plt.savefig(tmp_path / "mesh.png")
    plt.close("all")
