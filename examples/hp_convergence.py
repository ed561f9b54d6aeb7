#!/usr/bin/env python
"""hp-convergence sweep for the Poisson solver (BASELINE config 2).

Solves -lap u = f with manufactured u = sin(pi x) sin(pi y) across a grid
of polynomial orders p and mesh refinements h, reporting L2 errors and
observed convergence rates.  Spectral (exponential-in-p) convergence is the
signature correctness property of the method.

Usage::

    python examples/hp_convergence.py [--orders 2 4 6 8 12 16] [--cells 2 4]
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--orders", type=int, nargs="*",
                    default=[2, 4, 6, 8, 12, 16])
    ap.add_argument("--cells", type=int, nargs="*", default=[2, 4])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson

    exact = lambda x, y: np.sin(np.pi * x) * np.sin(np.pi * y)  # noqa: E731
    f = lambda x, y: 2 * np.pi**2 * exact(x, y)  # noqa: E731

    print(f"{'n':>4} {'p':>4} {'ndof':>9} {'L2 error':>13} {'rate':>8}")
    for n in args.cells:
        last = None
        for p in args.orders:
            mesh = rectangle_mesh(n, n, p, boundary_names={
                "west": "d", "east": "d", "south": "d", "north": "d"})
            disc = Discretization(mesh, gll_basis_2d(p))
            prob = Poisson(disc, forcing=f)
            prob.set_dirichlet("d", 0.0)
            sol = prob.solve(tol=1e-14, host_loop=True)
            err = prob.l2_error(sol.u, exact)
            if last is not None and err > 0:
                rate = np.log(last / err)
            else:
                rate = float("nan")
            print(f"{n:>4} {p:>4} {disc.ndof:>9} {err:>13.4e} "
                  f"{rate:>8.2f}")
            last = err
        print()


if __name__ == "__main__":
    main()
