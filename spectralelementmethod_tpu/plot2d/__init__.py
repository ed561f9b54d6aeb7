"""2D visualization (matplotlib, host-side).

Parity: reference ``sem/plot2d/`` (L5 in SURVEY.md §1).
"""

from .contours import surface, triangulate_data, tricontour, tricontourf
from .mesh import (
    PlottingError,
    add_arrow_to_line,
    draw_cell,
    draw_cell_nodes,
    draw_cells,
    draw_nodes,
    triangulate,
)

__all__ = [
    "PlottingError",
    "triangulate",
    "draw_nodes",
    "draw_cell",
    "draw_cell_nodes",
    "draw_cells",
    "add_arrow_to_line",
    "triangulate_data",
    "tricontour",
    "tricontourf",
    "surface",
]
