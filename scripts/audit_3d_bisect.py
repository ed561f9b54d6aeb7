"""3D CG gap bisect: hand-rolled CG iteration in one fori chain.

audit_3d measured components (A_masked 2.6 ms + M 0.16 + ~5 axpy 0.36)
summing to ~3.2 ms, while the production `cg` ladder runs 8.9 ms/iter
(audit_3d_cg, salted).  This script times a manually-fused CG iteration
(identical math: apply+DSS, Jacobi M, 2 weighted reductions, 3 axpys)
inside one jitted fori loop — if it lands near the parts sum, the gap
is `cg`'s loop machinery; if near 8.9, it is intrinsic while-body op
cost (layout pinning / lost fusion across iteration boundaries).

Run ON the TPU host:  python scripts/audit_3d_bisect.py
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
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.basis import gll_basis_3d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import box_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.utils.hoist import hoist_closure

    print(f"=== build nx={NX} p={P} ===", flush=True)
    mesh = box_mesh(NX, NX, NX, P)
    disc = Discretization(mesh, gll_basis_3d(P))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", 0.0)
    ctx = prob._local_setup_3d("jacobi")
    ex, A, M, free = ctx["ex"], ctx["A"], ctx["M"], ctx["free"]
    E, n = ex.E, ex.n_loc

    rng = np.random.RandomState(0)
    b = jnp.where(free, jnp.asarray(
        rng.standard_normal((E, n)).astype(np.float32)), 0.0)
    w = jnp.asarray(ex._weights_as(np.float32))

    def iteration(state):
        x, r, p, z, rz = state
        Ap = A(p)
        pAp = jnp.sum(w * p * Ap)
        alpha = rz / jnp.where(pAp != 0, pAp, 1.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.sum(w * r * z)
        beta = rz_new / jnp.where(rz != 0, rz, 1.0)
        p = z + beta * p
        return (x, r, p, z, rz_new)

    def chain(iters, salt):
        b_s = b * (1.0 + salt)
        z0 = M(b_s)
        state = (jnp.zeros_like(b), b_s, z0, z0, jnp.sum(w * b_s * z0))

        @jax.jit
        def run(state):
            return jax.lax.fori_loop(
                0, iters, lambda i, s: iteration(s), state)

        out = run(state)
        return float(jnp.sum(out[0]))        # scalar pull sync

    chain(5, 1e-7)
    chain(10, 2e-7)
    t0 = time.perf_counter()
    chain(100, 3e-7)
    t100 = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain(200, 4e-7)
    t200 = time.perf_counter() - t0
    print(json.dumps({
        "metric": "cg3d_handrolled_ms_per_iter",
        "value": round((t200 - t100) / 100 * 1e3, 3),
        "t100": round(t100, 3), "t200": round(t200, 3),
    }), flush=True)

    # variant: drop the weighted dots (bandwidth of w) — bounds their cost
    def iteration_nodot(state):
        x, r, p, z, rz = state
        Ap = A(p)
        alpha = jnp.float32(1e-3)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        p = z + jnp.float32(0.5) * p
        return (x, r, p, z, rz)

    def chain2(iters, salt):
        b_s = b * (1.0 + salt)
        z0 = M(b_s)
        state = (jnp.zeros_like(b), b_s, z0, z0, jnp.float32(1.0))

        @jax.jit
        def run(state):
            return jax.lax.fori_loop(
                0, iters, lambda i, s: iteration_nodot(s), state)

        out = run(state)
        return float(jnp.sum(out[0]))

    chain2(5, 1e-7)
    t0 = time.perf_counter()
    chain2(100, 3e-7)
    t100 = time.perf_counter() - t0
    t0 = time.perf_counter()
    chain2(200, 4e-7)
    t200 = time.perf_counter() - t0
    print(json.dumps({
        "metric": "cg3d_nodot_ms_per_iter",
        "value": round((t200 - t100) / 100 * 1e3, 3),
    }), flush=True)
    print("=== done ===", flush=True)


if __name__ == "__main__":
    main()
