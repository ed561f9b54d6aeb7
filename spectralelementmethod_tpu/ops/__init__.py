"""Device operator kernels: sum-factorized applies, DSS exchange, Pallas.

The compute core (SURVEY.md §7 items 2-3): matrix-free element-batched
operator application and direct stiffness summation.
"""

from .exchange import LocalExchange, RollExchange, make_exchange
from .sp_array import KroneckerArray
from .sumfac import (
    laplacian_apply,
    laplacian_apply_fused,
    laplacian_apply_local,
    make_local_laplacian_operator,
    make_multi_rhs_laplacian_T,
    make_poisson_operator,
    make_stacked_derivative,
    mass_apply_local,
    scatter_add,
)

__all__ = [
    "LocalExchange",
    "RollExchange",
    "make_exchange",
    "KroneckerArray",
    "laplacian_apply",
    "laplacian_apply_fused",
    "laplacian_apply_local",
    "make_local_laplacian_operator",
    "make_multi_rhs_laplacian_T",
    "make_poisson_operator",
    "make_stacked_derivative",
    "mass_apply_local",
    "scatter_add",
]
