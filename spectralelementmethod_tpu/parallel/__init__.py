"""Multi-chip layer: device meshes, element-axis sharding, partitioning.

Net-new vs the reference (zero distributed machinery; SURVEY.md §2):
XLA collectives over a ``jax.sharding.Mesh`` replace its absent comm
backend.
"""

from .partition import cut_faces, morton_order, rcm_order, reorder_elements
from .sharding import (
    device_mesh,
    hybrid_device_mesh,
    make_sharded_poisson_operator,
    pad_elements,
    sharded_local_poisson_problem,
    sharded_poisson_problem,
)

__all__ = [
    "cut_faces",
    "morton_order",
    "rcm_order",
    "reorder_elements",
    "device_mesh",
    "hybrid_device_mesh",
    "make_sharded_poisson_operator",
    "pad_elements",
    "sharded_local_poisson_problem",
    "sharded_poisson_problem",
]
