"""Per-component device timing of the 3D pmg V-cycle.

The round-4 97k-hex bench showed pmg converging in 16 iterations but at
~2.5 s per issued V-cycle — two orders above its ~7-fine-applies
nominal cost.  This probe times each component (fine apply, smoother,
transfers, coarse solve, whole M) dispatch-differenced with salted
inputs, at the 19.7k-hex audit scale by default.

Run ON the TPU host, nothing else using the chip:

    python scripts/profile_pmg3d.py [--nx 27]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np  # noqa: E402


def timed(label, fn, x, reps=10):
    from spectralelementmethod_tpu.utils import timing

    ts = timing.time_step(lambda v: fn(v), x, reps=reps)
    ms = ts["t_apply"] * 1e3
    flag = "" if ts["reliable"] else "   [UNRELIABLE]"
    print(f"  {label:28s} {ms:9.3f} ms{flag}", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=27)
    args = ap.parse_args()

    import jax.numpy as jnp

    from spectralelementmethod_tpu.basis import gll_basis_3d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import box_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson

    p = 8
    t0 = time.perf_counter()
    mesh = box_mesh(args.nx, args.nx, args.nx, p)
    disc = Discretization(mesh, gll_basis_3d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", 0.0)
    print(f"[build {time.perf_counter() - t0:.1f}s  E={disc.E} "
          f"nodes={disc.n_nodes}]", flush=True)
    t0 = time.perf_counter()
    prob.solve_local(tol=1e-3, max_iter=5, precond="pmg")
    print(f"[pmg setup+compile {time.perf_counter() - t0:.1f}s]",
          flush=True)

    Mk = [k for k in prob._op_cache if k[0] == "M" and "pmg" in str(k)]
    M = prob._op_cache[Mk[0]]
    print("coarse kind:", M._coarse_kind, " levels:", M._levels,
          flush=True)
    ctx_k = [k for k in prob._op_cache if k[0] == "A"]
    print("op cache keys:", list(prob._op_cache), flush=True)
    # rebuild the same masked operator the solve used
    A = prob._op_cache.get(("A3d",), None)

    rng = np.random.RandomState(0)
    from spectralelementmethod_tpu.ops.exchange import make_exchange

    ex = make_exchange(disc)
    r = jnp.asarray(ex.dss(jnp.asarray(
        rng.standard_normal((ex.E, ex.n_loc)).astype(np.float32))))

    restrict, prolong, C = M._restrict, M._prolong, M._coarse
    print("component timings (dispatch-differenced):", flush=True)
    rc = restrict(r)
    rc.block_until_ready()
    timed("restrict+prolong", lambda v: prolong(restrict(v)), r)
    timed("coarse solve C", C, rc)
    timed("whole V-cycle M", M, r)


if __name__ == "__main__":
    main()
