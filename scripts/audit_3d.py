"""3D roofline audit: where does the 13-15 ms/iter 3D CG go?

VERDICT round-2 item 2: 2D got a pass-by-pass traffic audit; 3D numbers
(365 GFLOP/s general apply, 13.4 ms/iter at 10.2M nodes) had no
accounting.  This script times each component of the production 3D path
(separable apply -> plane-roll DSS -> Jacobi CG iteration) in isolation
with salted chain timing, and prints measured ms + modeled HBM bytes +
implied GB/s per component against the ~620 GB/s XLA fusion ceiling
(round-2j).

Run ON the TPU host:  python scripts/audit_3d.py [nx] [p]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from exp_pallas_scale import _time_chain  # noqa: E402

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 27
P = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.basis import gll_basis_3d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import box_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac

    print(f"=== build nx={NX} p={P} ===", flush=True)
    t0 = time.perf_counter()
    mesh = box_mesh(NX, NX, NX, P)
    disc = Discretization(mesh, gll_basis_3d(P))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", 0.0)
    ctx = prob._local_setup_3d("jacobi")
    ex, A_raw, A, M = ctx["ex"], ctx["A_raw"], ctx["A"], ctx["M"]
    free = ctx["free"]
    E, n = ex.E, ex.n_loc
    n_nodes = disc.n_nodes
    print(f"build {time.perf_counter() - t0:.1f}s  E={E} n={n} "
          f"nodes={n_nodes} structure={A_raw._structure}", flush=True)

    shape = tuple(disc.shape)
    rng = np.random.RandomState(0)
    uL = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))

    # components ---------------------------------------------------------
    a_np, _ = sumfac.affine_factorization(
        prob._G_host.reshape(disc.E, 6, -1),
        np.asarray(disc.basis.weight_grid()).reshape(-1))
    if ex.E > disc.E:
        a_np = np.concatenate(
            [a_np, np.zeros((ex.E - disc.E, 6), a_np.dtype)])
    a_d = jnp.asarray(a_np, np.float32)
    ws = [np.asarray(disc.basis.subbases[d].quad_wts) for d in range(3)]
    Ks = [jnp.asarray(sumfac.assembled_1d_stiffness(
        np.asarray(disc.basis.subbases[d].D1), ws[d]), jnp.float32)
        for d in range(3)]
    wds = [jnp.asarray(w, jnp.float32) for w in ws]

    def apply_only(x):
        ue = x.reshape((E,) + shape)
        ve = sumfac.laplacian_apply_local_3d_separable(
            ue, a_d, *Ks, *wds)
        return ve.reshape(E, n)

    def dss_only(x):
        return ex.dss(x)

    def axpy(x):
        return x * 1.0001 + 0.3 * x

    MB = 1e6
    f4 = 4 * E * n / MB          # one (E, n) f32 pass in MB
    comps = [
        # (label, fn, modeled MB/apply, model note)
        ("apply_sep", apply_only, 4 * f4,
         "u in x3 einsums (XLA may CSE to 1) + fused combine out"),
        ("dss_rolls", dss_only, 2 * f4 + 12 * (4 * E * P ** 2 / MB),
         "in+out copy (at[].add functionalization) + 6x2 plane r/w"),
        ("apply+dss(A_raw)", A_raw, 6 * f4, "sum of the two"),
        ("A_masked", A, 8 * f4, "A_raw + 2 mask passes"),
        ("M_jacobi", M, 3 * f4, "r in, inv in, z out"),
        ("axpy", axpy, 2 * f4, "1 in 1 out"),
    ]
    results = {}
    for label, fn, model_mb, note in comps:
        def step(x, fn=fn):
            y = fn(x)
            return y * jax.lax.rsqrt(jnp.vdot(y, y).real.astype(
                y.dtype) + 1e-30)

        dt = _time_chain(step, uL, iters=20)
        results[label] = dt
        print(json.dumps({
            "component": label, "ms": round(dt * 1e3, 3),
            "model_MB": round(model_mb, 1),
            "implied_GBps_at_model": round(model_mb / 1e3 / dt, 1),
            "note": note,
        }), flush=True)

    # full CG iteration (as solved) --------------------------------------
    from spectralelementmethod_tpu.solver.cg import cg

    b = jnp.where(free, jnp.asarray(
        rng.standard_normal((E, n)).astype(np.float32)), 0.0)
    w = ex._weights_as(np.float32)

    def run(iters):
        res = cg(A, b, M=M, tol=0.0, max_iter=iters, dot_weight=w,
                 block=iters)
        res.x.block_until_ready()
        return res

    run(10)
    t0 = time.perf_counter()
    run(200)
    t200 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(400)
    t400 = time.perf_counter() - t0
    ms_iter = (t400 - t200) / 200 * 1e3
    print(json.dumps({
        "component": "cg_iteration", "ms": round(ms_iter, 3),
        "sum_of_parts_ms": round(
            (results["A_masked"] + results["M_jacobi"]
             + 5 * results["axpy"]) * 1e3, 3),
        "note": "differenced 400-200 its; parts model = A + M + ~5 axpy",
    }), flush=True)
    print("=== audit done ===", flush=True)


if __name__ == "__main__":
    main()
