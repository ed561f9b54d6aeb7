#!/usr/bin/env python
r"""Multi-RHS Poisson solves through one operator and one CG ladder.

The reference solves one system per ``spsolve`` call
(``sem/discrete.py:502-528``); here k right-hand sides share every
operator read, preconditioner, and host synchronization
(:meth:`~spectralelementmethod_tpu.models.poisson.Poisson.solve_local_batch`).
On TPU with float32 + bf16 direction storage, batches of k >= 2 engage
the batched fused CG kernels with the far-class split and deferred
solution updates — the round-3 measured optimum (0.47-0.49 ms per
iteration per RHS at p=8 / 100k elements, ~1.3x the sequential
single-RHS path per RHS).

Usage::

    python examples/multi_rhs.py [--cells 24] [--order 4] [--k 4] [--f32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=24)
    ap.add_argument("--order", type=int, default=4)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--f32", action="store_true",
                    help="float32 + bf16 directions (the fused TPU path)")
    args = ap.parse_args()

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.config import enable_x64
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson

    dtype = np.float32 if args.f32 else np.float64
    if not args.f32:
        enable_x64()
    n, p, k = args.cells, args.order, args.k
    mesh = rectangle_mesh(n, n, p, x0=(0, 0), x1=(1, 1))
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=dtype)
    prob.set_dirichlet("ebc", 0.0)
    prob.set_dirichlet("nbc", 0.0)

    # k forcings: harmonics sin(j pi x) sin(pi y) with known solutions
    forcings = [
        (lambda x, y, j=j: ((j * j + 1) * np.pi**2
                            * np.sin(j * np.pi * x) * np.sin(np.pi * y)))
        for j in range(1, k + 1)
    ]

    kw = {}
    if args.f32:
        import jax.numpy as jnp

        kw = dict(p_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    sol = prob.solve_local_batch(forcings,
                                 tol=1e-6 if args.f32 else 1e-11, **kw)
    dt = time.perf_counter() - t0

    print(f"{disc.E} elements p={p}, {disc.n_nodes} nodes, k={k} RHS, "
          f"dtype={np.dtype(dtype).name}")
    its = np.atleast_1d(np.asarray(sol.cg.iterations))
    print(f"batched solve: {dt:.2f} s, per-RHS iterations {its.tolist()}")
    for j in range(k):
        exact = lambda x, y, j=j + 1: np.sin(j * np.pi * x) \
            * np.sin(np.pi * y)  # noqa: E731
        err = prob.l2_error(sol.u[j], exact)
        print(f"  RHS {j + 1}: L2 error vs exact harmonic = {err:.3e}")


if __name__ == "__main__":
    main()
