"""Round-4f: why does the 1M f32 pmg-CG stall/drift?

Probes, all one process on the TPU:

1. estimate_lmax at 30 vs 80 power iterations (underestimate -> the
   Chebyshev interval misses the top of the spectrum -> the smoother
   amplifies those modes -> M loses positive definiteness -> CG drifts).
2. V-cycle symmetry/definiteness spot checks in the weighted dot.
3. Inner-CG behavior with a padded lmax (safety 1.2) and with a
   deeper power iteration.

Run ON the TPU host, nothing else using the chip:

    python scripts/debug_1m_pmg.py [--elements 1048576]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=1048576)
    args = ap.parse_args()

    from spectralelementmethod_tpu import config
    config.enable_compilation_cache()
    config.enable_setup_cache()

    import jax
    import jax.numpy as jnp

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.solver.cg import (cg, cg_refined,
                                                     jacobi_preconditioner)
    from spectralelementmethod_tpu.solver import pmg as pmgmod

    p = 8
    nx = max(int(np.sqrt(args.elements)), 1)
    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
    ex = make_exchange(disc, fused_pad=True)
    print(f"[setup {time.perf_counter() - t0:.1f}s E={disc.E}]",
          flush=True)

    Gf = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(prob._D0_host, prob._D1_host)
    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    A = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, free, vector_layout="ne", assume_masked_input=True)
    dw = ex._weights_as(np.float32, transposed=True)
    diag_np = np.asarray(prob.operator_diagonal())

    # -- probe 1: lmax convergence ---------------------------------------
    diagL = np.ascontiguousarray(diag_np[ex.gather_hier].T).astype(
        np.float32)
    B = jacobi_preconditioner(jnp.asarray(diagL), free)
    for iters in (30, 80):
        t0 = time.perf_counter()
        lam = pmgmod.estimate_lmax(A, B, (ex.n_loc, ex.E),
                                   dtype=np.float32, iters=iters,
                                   safety=1.0)
        print(f"lmax(iters={iters}) = {lam:.6f}   "
              f"[{time.perf_counter() - t0:.1f}s]", flush=True)

    # -- probe 2: V-cycle definiteness spot check -------------------------
    M = pmgmod.make_pmg_preconditioner(
        disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np)
    rng = np.random.RandomState(0)
    for trial in range(3):
        v = jnp.where(free, ex.dss_T(jnp.asarray(
            rng.standard_normal(free.shape).astype(np.float32))), 0.0)
        zz = M(v)
        num = float(jnp.sum(dw * v * zz))
        den = float(jnp.sum(dw * v * v))
        print(f"<v, Mv>_w / <v, v>_w = {num / den:.4e}", flush=True)

    bL = jnp.asarray(np.ascontiguousarray(
        ex.local_from_global(np.asarray(prob._b)).astype(np.float32).T))
    u_dL = jnp.asarray(np.ascontiguousarray(ex.local_from_global(
        np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)
    ).astype(np.float32).T))
    r_cg = jax.jit(lambda f, b, u: jnp.where(f, b - A(u), 0.0))(
        free, bL, u_dL)
    r_cg.block_until_ready()

    def solve_with(M_, label):
        t0 = time.perf_counter()
        rs = cg_refined(A, r_cg, M=M_, tol=1e-6, max_iter=700,
                        dot_weight=dw, block=64, cycles=3)
        print(f"{label}: its={int(rs.iterations)} "
              f"issued={int(rs.issued)} true|r|={float(rs.residual_norm):.3e} "
              f"conv={bool(rs.converged)} [{time.perf_counter()-t0:.1f}s]",
              flush=True)

    solve_with(M, "default M (safety 1.05, iters 30)")

    # -- probe 3: padded interval ------------------------------------------
    M2 = pmgmod.make_pmg_preconditioner(
        disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np, alpha=3.2)
    solve_with(M2, "alpha=3.2 (wider top margin)")


if __name__ == "__main__":
    main()
