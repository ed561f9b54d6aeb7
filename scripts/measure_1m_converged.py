"""Round-5: the 1M certified converged solve, standalone.

The full 1M bench spends ~15 min on throughput arms before reaching the
converged arm; this runs ONLY the arm that answers "does the solver
solve at 1M": solve_local(certify=True) — f32 pmg-CG segments anchored
on the exact rank-1 f64 operator, one program, certified at f64.

    python scripts/measure_1m_converged.py [--elements 1048576]
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
    ap.add_argument("--order", type=int, default=8)
    args = ap.parse_args()

    from spectralelementmethod_tpu import config
    config.enable_compilation_cache()
    config.enable_setup_cache()

    import jax  # noqa: F401
    import jax.numpy as jnp

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson

    p = args.order
    nx = max(int(np.sqrt(args.elements)), 1)
    ny = max(args.elements // nx, 1)

    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
    print(f"[setup {time.perf_counter() - t0:.1f}s E={disc.E} "
          f"n_nodes={disc.n_nodes}]", flush=True)

    tol = 1e-6
    t0 = time.perf_counter()
    sol = prob.solve_local(tol=tol, precond="pmg", certify=True)
    print(f"[cold certify {time.perf_counter() - t0:.1f}s]", flush=True)

    for rep in range(2):
        t0 = time.perf_counter()
        sol = prob.solve_local(tol=tol, precond="pmg", certify=True)
        t_e2e = time.perf_counter() - t0
        rs = sol.cg
        cyc = ",".join(f"{v:.2e}" for v in rs.cycle_resnorms)
        print(f"warm rep{rep}: e2e={t_e2e:.2f}s its={int(rs.iterations)} "
              f"issued={int(rs.issued)} |r|_64={float(rs.residual_norm):.3e} "
              f"conv={bool(rs.converged)} stalled={rs.stalled} cyc={cyc}",
              flush=True)

    # solve-only (no host materialization of u)
    from spectralelementmethod_tpu.solver.cg import cg_refined_static

    ctx = prob._local_setup("pmg", "auto", None, "auto")
    vl = ctx["vector_layout"]
    _vk, _u, r_hi = prob.__dict__["_vec2d_hi"]
    A_hi = prob._op_cache[("A_hi", vl)]
    w = prob._op_cache[("w_cert", vl)]
    A2 = prob._op_cache.get(("A_xla_cert", vl), ctx["A"])
    for rep in range(3):
        t0 = time.perf_counter()
        rs = cg_refined_static(A2, r_hi, A_hi=A_hi, M=ctx["M"], tol=tol,
                               dot_weight=w)
        rs.x.block_until_ready()
        print(f"solve-only rep{rep}: {time.perf_counter() - t0:.3f}s "
              f"its={int(rs.iterations)} issued={int(rs.issued)} "
              f"conv={bool(rs.converged)}", flush=True)


if __name__ == "__main__":
    main()
