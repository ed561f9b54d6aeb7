"""Round-4 pmg sweep: find the bench converged-arm config that reproduces
the round-2h record (~61-64 its, ~0.44-0.6 s to 1e-6 at p=8/100k).

The r03 driver bench reported 133 its / 2.591 s through the identical
code path (make_pmg_preconditioner p_coarse=2 + cg block=64 ladder) —
either the round-3 pmg rewrite regressed convergence, the p_coarse=2
choice is wrong, or the geometric ladder bills frozen V-cycles.  This
script separates all three: per-config iteration counts, issued counts,
wall-clock, and per-V-cycle device cost, all in ONE process on the TPU.

Run ON the TPU host, nothing else using the chip:

    python scripts/measure_r4_pmg.py [--elements 99856]
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

    import jax.numpy as jnp  # noqa: E402

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.solver.cg import cg
    from spectralelementmethod_tpu.solver.pmg import make_pmg_preconditioner
    from spectralelementmethod_tpu.utils import timing

    p = args.order
    nx = max(int(np.sqrt(args.elements)), 1)
    ny = max(args.elements // nx, 1)
    dtype = np.float32

    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    print(f"[mesh+disc {time.perf_counter() - t0:.1f}s]", flush=True)
    prob = Poisson(disc, dtype=dtype)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))

    D = prob._D0_host
    Dhat = sumfac.make_stacked_derivative(D, D)
    Gf = prob._G_host.reshape(disc.E, 3, -1)

    t0 = time.perf_counter()
    ex = make_exchange(disc, fused_pad=True)
    print(f"[exchange {time.perf_counter() - t0:.1f}s]", flush=True)

    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    A_cg = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, free, backend="auto", precision="highest",
        vector_layout="ne", assume_masked_input=True)
    dot = ex.dot_T
    dw = ex._weights_as(np.dtype(dtype), transposed=True)

    def to_local(u):
        lv = ex.local_from_global(np.asarray(u)).astype(dtype)
        return jnp.asarray(np.ascontiguousarray(lv.T))

    u_dL = to_local(
        np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0))
    bL = to_local(prob._b)
    import jax
    r_cg = jax.jit(
        lambda f, b, u: jnp.where(f, b - A_cg(u), 0.0))(free, bL, u_dL)
    r_cg.block_until_ready()

    diag_np = np.asarray(prob.operator_diagonal())
    tol_s = 1e-6

    arms = [
        dict(p_coarse=2),                       # r03 bench arm (control)
        dict(p_coarse=1),                       # solve_local default
        dict(p_coarse=4),
        dict(p_coarse=2, smoother="fdm"),
        dict(p_coarse=1, smoother="fdm"),
        dict(p_coarse=2, degree=5),
        dict(p_coarse=1, degree=5),
    ]
    print(f"{'arm':38s} {'its':>5s} {'issued':>6s} {'wall_s':>7s} "
          f"{'Vcyc_ms':>8s} {'resnorm':>9s} coarse", flush=True)
    for kw in arms:
        label = ",".join(f"{k}={v}" for k, v in kw.items())
        try:
            t0 = time.perf_counter()
            M = make_pmg_preconditioner(
                disc, ex, Gf, A_cg, ~prob._dirichlet_mask, diag_np, **kw)
            t_build = time.perf_counter() - t0

            def run_solve():
                return cg(A_cg, r_cg, M=M, tol=tol_s, max_iter=2000,
                          dot=dot, dot_weight=dw, block=64)

            rs = run_solve()
            rs.x.block_until_ready()            # warmup/compile
            t0 = time.perf_counter()
            rs = run_solve()
            rs.x.block_until_ready()
            wall = time.perf_counter() - t0

            ts = timing.time_step(lambda v: M(v), r_cg, reps=20)
            v_ms = ts["t_apply"] * 1e3
            print(f"{label:38s} {int(rs.iterations):5d} "
                  f"{int(rs.issued):6d} {wall:7.3f} {v_ms:8.3f} "
                  f"{float(rs.residual_norm):9.2e} "
                  f"{M._coarse_kind} [build {t_build:.1f}s]", flush=True)
        except Exception as e:                  # noqa: BLE001
            print(f"{label:38s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
