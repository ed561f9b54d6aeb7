"""spectralelementmethod_tpu — a TPU-native hp/spectral element framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference ``nchisholm/SpectralElementMethod`` (serial numpy/scipy; see
SURVEY.md), re-designed TPU-first:

* element-batched struct-of-arrays discretization (no per-element Python
  objects on the hot path),
* matrix-free sum-factorized operator application (batched MXU matmuls /
  Pallas kernels),
* direct stiffness summation as device-side scatter-add,
* matrix-free preconditioned Krylov solves and batched static condensation,
* element-axis sharding over a ``jax.sharding.Mesh`` with XLA collectives.

Unlike the reference (whose ``sem/__init__.py`` is an empty stub), this is a
curated top-level API.
"""

import importlib

from .utils.hostmem import tune_host_allocator as _tune

_tune()  # reuse heap for large numpy temporaries (see utils/hostmem.py)

from . import basis, config  # noqa: E402

__version__ = "0.1.0"

_SUBPACKAGES = ("mesh", "core", "ops", "solver", "models", "parallel",
                "utils", "plot2d", "native")

__all__ = ["basis", "config", "__version__", *_SUBPACKAGES]


def __getattr__(name):
    """Lazy subpackage access (keeps bare import light; matplotlib et al.
    load only when their subpackage is touched)."""
    if name in _SUBPACKAGES:
        return importlib.import_module("." + name, __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
