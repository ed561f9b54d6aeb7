#!/usr/bin/env python
"""Multi-device Poisson: element-sharded L-vector CG over a device mesh.

The distributed capability the reference lacks entirely (SURVEY.md §2:
zero parallelism; every element loop is serial Python).  Here the element
axis shards over all available devices; DSS roll classes lower to XLA
collective-permutes and inner products to psum — on a TPU slice these
ride ICI.

Run on real devices, or simulate a slice on CPU:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_poisson.py --nx 32 --order 6
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

# honor JAX_PLATFORMS even when a site plugin force-registers another
# backend (the env var is otherwise silently overridden)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=32)
    ap.add_argument("--order", type=int, default=6)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--devices", type=int, default=None,
                    help="mesh size (default: all local devices)")
    ap.add_argument("--comm", choices=["propagation", "shardmap", "shardmap-fused"],
                    default="propagation",
                    help="halo exchange: XLA sharding propagation, or "
                         "explicit ppermute inside shard_map "
                         "(parallel.halo), or ppermute + the fused "
                         "Pallas block kernel per shard")
    args = ap.parse_args()

    import jax

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.parallel import sharding as sh
    from spectralelementmethod_tpu.solver.cg import cg

    n_dev = args.devices or len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    mesh = rectangle_mesh(args.nx, args.nx, args.order)
    disc = Discretization(mesh, gll_basis_2d(args.order))
    print(f"elements: {disc.E}, DOFs: {disc.ndof}")

    ue = lambda x, y: np.sin(np.pi * (x + 1) / 2) * np.sin(  # noqa: E731
        np.pi * (y + 1) / 2)
    prob = Poisson(disc, forcing=lambda x, y: np.pi**2 / 2 * ue(x, y),
                   dtype=np.float32)
    prob.set_dirichlet("ebc", 0.0)
    prob.set_dirichlet("nbc", 0.0)

    dev_mesh = sh.device_mesh(n_dev)
    A, r, M, u_dL, ex, _ = sh.sharded_local_poisson_problem(
        prob, dev_mesh, comm=args.comm)
    print(f"element axis padded {disc.E} -> {ex.E} over {n_dev} shards "
          f"(comm={args.comm})")

    transposed = args.comm.startswith("shardmap")
    dot = ex.dot_T if transposed else ex.dot
    t0 = time.perf_counter()
    res = cg(A, r, M=M, tol=args.tol, max_iter=5000, dot=dot)
    jax.block_until_ready(res.x)
    t = time.perf_counter() - t0
    uL = np.asarray(u_dL + res.x)
    u = (ex.global_from_local_T(uL) if transposed
         else ex.global_from_local(uL))

    err = prob.l2_error(u, ue)
    print(f"CG: {int(res.iterations)} iterations, |r| = "
          f"{float(res.residual_norm):.3e}, wall {t:.2f}s")
    print(f"L2 error vs manufactured solution: {err:.3e}")


if __name__ == "__main__":
    main()
