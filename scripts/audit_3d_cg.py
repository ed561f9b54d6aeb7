"""3D CG iteration, honest re-measurement (follow-up to audit_3d.py).

audit_3d's 400-vs-200-iteration differencing returned NEGATIVE time:
the two ladders ran on identical inputs and the tunneled backend
replays identical dispatches (the round-2h timing-integrity finding).
Here every run gets a salted RHS, and we difference iteration counts
within one ladder call pattern.  Also times the solve_local production
path for cross-checking against the round-2h 13.4 ms/iter record.

Run ON the TPU host:  python scripts/audit_3d_cg.py [nx] [p]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 27
P = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.basis import gll_basis_3d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import box_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.solver.cg import cg

    print(f"=== build nx={NX} p={P} ===", flush=True)
    t0 = time.perf_counter()
    mesh = box_mesh(NX, NX, NX, P)
    disc = Discretization(mesh, gll_basis_3d(P))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", 0.0)
    ctx = prob._local_setup_3d("jacobi")
    ex, A, M, free = ctx["ex"], ctx["A"], ctx["M"], ctx["free"]
    E, n = ex.E, ex.n_loc
    print(f"build {time.perf_counter() - t0:.1f}s E={E} n={n} "
          f"nodes={disc.n_nodes}", flush=True)

    rng = np.random.RandomState(0)
    # upload ONCE; per-run salting happens on device (a 57 MB host
    # upload per run through the tunnel would dominate the differencing)
    b0_dev = jnp.where(free, jnp.asarray(
        rng.standard_normal((E, n)).astype(np.float32)), 0.0)
    float(jnp.sum(b0_dev))
    w = ex._weights_as(np.float32)

    def run(iters, salt):
        b = b0_dev * jnp.float32(1.0 + salt)
        res = cg(A, b, M=M, tol=0.0, max_iter=iters, dot_weight=w,
                 block=iters)
        # scalar host pull that data-depends on the result:
        # block_until_ready was measured returning EARLY on the
        # tunneled backend (utils/timing.py round-2h finding)
        float(jnp.sum(res.x))
        return res

    run(10, 1e-7)                          # compile
    run(100, 9e-7)
    run(200, 8e-7)
    run(400, 7e-7)
    ts = {}
    for iters, salt in ((100, 3e-7), (200, 4e-7), (400, 5e-7)):
        t0 = time.perf_counter()
        run(iters, salt)
        ts[iters] = time.perf_counter() - t0
    ms_iter = (ts[400] - ts[200]) / 200 * 1e3
    ms_iter_lo = (ts[200] - ts[100]) / 100 * 1e3
    print(json.dumps({
        "metric": "cg3d_ms_per_iter_salted",
        "value": round(ms_iter, 3),
        "alt_200_100": round(ms_iter_lo, 3),
        "t100_s": round(ts[100], 3), "t200_s": round(ts[200], 3),
        "t400_s": round(ts[400], 3),
    }), flush=True)

    # the production entry (fresh problem to avoid cache crosstalk)
    prob2 = Poisson(disc, dtype=np.float32)
    prob2.set_dirichlet("ebc", 0.0)
    t0 = time.perf_counter()
    sol = prob2.solve_local(tol=1e-5, max_iter=618)
    float(np.sum(sol.u))
    t_solve = time.perf_counter() - t0
    print(json.dumps({
        "metric": "solve_local_3d_wallclock_s",
        "value": round(t_solve, 3),
        "iters": int(sol.cg.iterations), "issued": int(sol.cg.issued),
        "ms_per_issued_iter": round(
            t_solve * 1e3 / max(int(sol.cg.issued), 1), 3),
        "resnorm": float(sol.cg.residual_norm),
    }), flush=True)
    print("=== done ===", flush=True)


if __name__ == "__main__":
    main()
