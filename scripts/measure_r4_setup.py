"""Round-4 setup-time roofline: WHERE does one-time setup go?

VERDICT round-3 weak #2 / item 3: iteration loops got three rounds of
roofline rigor; setup got none, and it now dominates time-to-solution
(100k: ~80 s end-to-end setup vs 0.34 s converged solve).  This script
produces the demanded breakdown table at the three tracked scales —
100k-2D (bench headline), 19.7k-3D (10.2M nodes), and optionally 1M-2D
(--one-m) — using the utils.stages accounting now wired through the
mesh generators, Gmsh importer, Discretization geometry, model
constructors, exchange factory, and preconditioner builds.

Run on a quiet host (CPU-bound; the device is only touched by the pmg
build's estimate_lmax):

    python scripts/measure_r4_setup.py [--one-m]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np  # noqa: E402


def arm_2d(E_target, label):
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.solver.pmg import make_pmg_preconditioner
    from spectralelementmethod_tpu.utils import stages

    import jax.numpy as jnp

    stages.snapshot(reset=True)
    p = 8
    nx = max(int(np.sqrt(E_target)), 1)
    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
    ex = make_exchange(disc, fused_pad=True)
    diag = prob.operator_diagonal()
    Gf = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(prob._D0_host, prob._D1_host)
    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    A = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, free, vector_layout="ne", assume_masked_input=True)
    M = make_pmg_preconditioner(disc, ex, Gf, A, ~prob._dirichlet_mask,
                                np.asarray(diag))
    wall = time.perf_counter() - t0
    snap = stages.snapshot()
    print(f"\n===== {label} (E={disc.E}, n_nodes={disc.n_nodes}) =====")
    print(stages.report(reset=True))
    print(f"  {'untracked':24s} {wall - sum(snap.values()):8.2f}s")
    print(f"  {'TOTAL wall':24s} {wall:8.2f}s")


def arm_3d():
    from spectralelementmethod_tpu.basis import gll_basis_3d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import box_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.utils import stages

    stages.snapshot(reset=True)
    p = 8
    t0 = time.perf_counter()
    mesh = box_mesh(27, 27, 27, p)
    disc = Discretization(mesh, gll_basis_3d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", 0.0)
    ex = make_exchange(disc)
    diag = prob.operator_diagonal()     # noqa: F841
    wall = time.perf_counter() - t0
    snap = stages.snapshot()
    print(f"\n===== 3D 19.7k hexes p=8 (n_nodes={disc.n_nodes}) =====")
    print(stages.report(reset=True))
    print(f"  {'untracked':24s} {wall - sum(snap.values()):8.2f}s")
    print(f"  {'TOTAL wall':24s} {wall:8.2f}s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one-m", action="store_true")
    ap.add_argument("--skip-3d", action="store_true")
    ap.add_argument("--cache", action="store_true",
                    help="enable the persistent compile + setup caches "
                         "(the production/bench posture); run twice to "
                         "see cold vs warm")
    args = ap.parse_args()
    if args.cache:
        from spectralelementmethod_tpu.config import (
            enable_compilation_cache, enable_setup_cache)

        enable_compilation_cache()
        enable_setup_cache()
    arm_2d(99_856, "2D 100k p=8")
    if not args.skip_3d:
        arm_3d()
    if args.one_m:
        arm_2d(1_048_576, "2D 1M p=8")


if __name__ == "__main__":
    main()
