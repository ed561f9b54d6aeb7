"""Per-component device timing of the 2D pmg V-cycle at bench scale.

bench --precond pmg measured 235 ms per preconditioned CG iteration at
p=8/100k while the V-cycle's nominal cost is ~7 fine applies (~6 ms) —
a ~35x gap.  This probe times each V-cycle component (fine apply,
Chebyshev smoother, restrict, coarse FDM solve, prolong, whole M, one
CG iteration) jitted and dispatch-differenced (N vs 2N chained calls),
to find the pathological stage.

Run ON the TPU host with nothing else using the chip:

    python scripts/profile_pmg.py [--elements 99856]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(label, fn, x, reps=20):
    """Dispatch-differenced chained-call timing of y = fn(y) (salted
    inputs + scalar-pull sync via utils.timing — see that module)."""
    from spectralelementmethod_tpu.utils import timing

    ts = timing.time_step(lambda v: fn(v), x, reps=reps)
    ms = ts["t_apply"] * 1e3
    flag = "" if ts["reliable"] else "   [UNRELIABLE]"
    print(f"  {label:28s} {ms:9.3f} ms{flag}", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=99856)
    args = ap.parse_args()

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson

    p = 8
    nx = max(int(round(args.elements ** 0.5)), 2)
    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, forcing=1.0, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    prob.solve_local(tol=1e-3, max_iter=5, precond="pmg",
                     vector_layout="ne")          # builds + caches all
    print(f"[setup {time.perf_counter() - t0:.1f}s]", flush=True)

    ctx = prob._local_setup("pmg", "auto", None, "ne")
    A, M = ctx["A"], ctx["M"]
    ex = ctx["ex"]
    print(f"coarse kind: {getattr(M, '_coarse_kind', '?')}", flush=True)

    # V-cycle internals via the factory's introspection attributes
    S_f = getattr(M, "_S_f", None)
    C = getattr(M, "_coarse", None)
    restrict = getattr(M, "_restrict", None)
    prolong = getattr(M, "_prolong", None)

    rng = np.random.RandomState(0)
    r = jnp.asarray(ex.dss_T(jnp.asarray(
        rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))))

    print("component timings (dispatch-differenced):", flush=True)
    timed("A_f apply", A, r)
    if S_f is not None:
        timed("S_f smoother", S_f, r)
    if restrict is not None and C is not None and prolong is not None:
        rc = restrict(r)
        rc.block_until_ready()

        timed("restrict+prolong", lambda v: prolong(restrict(v)), r)
        timed("coarse solve C", C, rc)
    timed("whole V-cycle M", M, r)
    timed("CG iteration (A + M + vec)",
          lambda v: M(A(v)) + 0.5 * v, r)


if __name__ == "__main__":
    main()
