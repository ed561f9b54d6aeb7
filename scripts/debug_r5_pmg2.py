"""Round-5 probe 2: the f64-anchored refined arm at 100k.

Probe 1 (debug_r5_pmg.py) root-caused the red converged arm: the f32
apply's ~5 eps32 per-entry rounding floors any f32-evaluated residual
near 1.4e-5 RELATIVE at 6.4M DOFs — above the 1e-6 target — so the old
"green" plain arm was a false convergence of the recurrence residual
and f32-only refinement stalls at the anchor-evaluation floor.

This measures the honest fix: cg_refined with f64 anchors (A_hi/b_hi;
~2-3 f64 XLA applies total) around the f32 pmg-CG inner solves, with
the round-5 float32-precision V-cycle (mm_precision fix: 18 its vs the
legacy 39).  Target: certified 1e-6 convergence in the ~0.3-0.6 s
class at 100k.

    python scripts/debug_r5_pmg2.py [--elements 99856]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=99856)
    ap.add_argument("--order", type=int, default=8)
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
    from spectralelementmethod_tpu.solver.cg import cg_refined
    from spectralelementmethod_tpu.solver import pmg as pmgmod

    p = args.order
    nx = max(int(np.sqrt(args.elements)), 1)
    ny = max(args.elements // nx, 1)

    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, ny, p)
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
        ex, Gf, Dhat, free, backend="auto", precision="highest",
        vector_layout="ne", assume_masked_input=True)
    dot = ex.dot_T
    dw = ex._weights_as(np.float32, transposed=True)
    diag_np = np.asarray(prob.operator_diagonal())

    def to_localT(u, dtype):
        lv = ex.local_from_global(np.asarray(u)).astype(dtype)
        return np.ascontiguousarray(lv.T)

    u_d_np = np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)
    bL = jnp.asarray(to_localT(prob._b, np.float32))
    u_dL = jnp.asarray(to_localT(u_d_np, np.float32))
    r_cg = jax.jit(
        lambda f, b, u: jnp.where(f, b - A(u), 0.0))(free, bL, u_dL)
    r_cg.block_until_ready()

    # ---- f64 operator + lifted RHS (anchor path) -------------------------
    t0 = time.perf_counter()
    with jax.enable_x64():
        Gf64 = np.asarray(prob._G_host, np.float64).reshape(disc.E, 3, -1)
        Dhat64 = np.asarray(Dhat, np.float64)
        A_hi = sumfac.make_local_laplacian_operator(
            ex, Gf64, Dhat64, free, backend="xla", precision="highest",
            vector_layout="ne", assume_masked_input=True)
        bL64 = jnp.asarray(to_localT(prob._b, np.float64), jnp.float64)
        u_dL64 = jnp.asarray(to_localT(u_d_np, np.float64), jnp.float64)
        r_hi = jax.jit(
            lambda f, b, u: jnp.where(f, b - A_hi(u), 0.0))(
                free, bL64, u_dL64)
        r_hi.block_until_ready()
        dw64 = jnp.asarray(np.asarray(dw), jnp.float64)
        rn0 = float(jnp.sqrt(jnp.sum(dw64 * r_hi * r_hi)))
    print(f"[f64 operator+rhs {time.perf_counter() - t0:.1f}s] "
          f"|r0|_w64 = {rn0:.6e}", flush=True)

    t0 = time.perf_counter()
    M = pmgmod.make_pmg_preconditioner(
        disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np)
    print(f"[pmg build {time.perf_counter() - t0:.1f}s]", flush=True)

    def run():
        return cg_refined(A, r_cg, M=M, tol=1e-6, max_iter=700,
                          dot=dot, dot_weight=dw, block=64, cycles=3,
                          A_hi=A_hi, b_hi=r_hi)

    for rep in range(3):
        t0 = time.perf_counter()
        rs = run()
        rs.x.block_until_ready()
        wall = time.perf_counter() - t0
        with jax.enable_x64():
            rt = jnp.where(free, r_hi - A_hi(rs.x), 0.0)
            trn = float(jnp.sqrt(jnp.sum(dw64 * rt * rt)))
        cyc = ",".join(f"{v:.2e}" for v in rs.cycle_resnorms)
        print(f"f64-anchored rep{rep}: its={int(rs.iterations)} "
              f"issued={int(rs.issued)} |r|={float(rs.residual_norm):.3e} "
              f"true|r|_64={trn:.3e} (target {1e-6 * rn0:.3e}) "
              f"conv={bool(rs.converged)} stalled={rs.stalled} "
              f"wall={wall:.3f}s cyc={cyc}", flush=True)


if __name__ == "__main__":
    main()
