"""Solvers: preconditioned CG, static condensation, FDM Schwarz, Newton.

Replaces the reference's sparse direct pipeline (``sem/linalg.py``,
``sem/discrete.py:283-528``) with matrix-free Krylov + batched dense
condensation (SURVEY.md §2 table).
"""

from .cg import (CGResult, cg, cg_batched, cg_fused, cg_fused_batched,
                 cg_host, jacobi_preconditioner)
from .gmres import GMRESResult, gmres, gmres_batched
from .condensation import CondensedSystem, schur_solve
from .fdm import gll_fdm_eig, make_fdm_preconditioner
from .rootfind import SolverFailure, newton

__all__ = [
    "CGResult",
    "cg",
    "cg_batched",
    "cg_fused",
    "cg_fused_batched",
    "cg_host",
    "jacobi_preconditioner",
    "GMRESResult",
    "gmres",
    "gmres_batched",
    "CondensedSystem",
    "schur_solve",
    "gll_fdm_eig",
    "make_fdm_preconditioner",
    "SolverFailure",
    "newton",
]
