"""Application models: Poisson, Helmholtz, axisymmetric squirmer.

The reference's examples layer (L6) as a first-class model family
(``examples/poisson.py`` intent, ``examples/squirmer-axisymmetric.py``).
"""

from .advection_diffusion import AdvectionDiffusion
from .helmholtz import Helmholtz
from .poisson import Poisson, PoissonSolution
from .squirmer import FixedSphere, Squirmer, SphereWithSlipVel

__all__ = [
    "AdvectionDiffusion",
    "Helmholtz",
    "Poisson",
    "PoissonSolution",
    "FixedSphere",
    "Squirmer",
    "SphereWithSlipVel",
]
