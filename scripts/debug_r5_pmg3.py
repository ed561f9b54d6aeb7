"""Round-5 probe 3: pick the production converged-arm composition.

Candidates at 100k (all certified against the f64-evaluated residual):

A. anchored-2cyc: cg_refined + f64 anchors + inner_tol_factor=0.25
   (2 cycles x 64-block inner f32 solves + 2 f64 anchor applies).
B. f64-outer: one plain cg ladder in f64 (vectors, recurrence, apply)
   with the f32 V-cycle via pmg dtype=f64/cycle_dtype=f32 — fewer
   dispatches, but every iteration pays an f64 apply.
Also times the raw f64 XLA apply (the anchor/outer-iteration unit cost).

    python scripts/debug_r5_pmg3.py [--elements 99856]
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
    from spectralelementmethod_tpu.solver.cg import cg, cg_refined
    from spectralelementmethod_tpu.solver import pmg as pmgmod
    from spectralelementmethod_tpu.utils import timing
    from spectralelementmethod_tpu.utils.hoist import hoist_closure

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
        print(f"|r0|_w64 = {rn0:.6e}", flush=True)

        # raw f64 apply unit cost
        Ah_pure, Ah_c = hoist_closure(A_hi, r_hi)
        Ah_c = tuple(Ah_c)

        def _step64(x, c):
            y = Ah_pure(x, *c)
            return y * jax.lax.rsqrt(jnp.sum(y * y) + 1e-300)

        ts = timing.time_step(_step64, r_hi, reps=20, consts=(Ah_c,))
        print(f"f64 apply: {ts['t_apply'] * 1e3:.3f} ms "
              f"(reliable={ts['reliable']})", flush=True)

    t0 = time.perf_counter()
    M = pmgmod.make_pmg_preconditioner(
        disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np)
    print(f"[pmg f32 build {time.perf_counter() - t0:.1f}s]", flush=True)

    def check(label, rs, wall):
        with jax.enable_x64():
            rt = jnp.where(free, r_hi - A_hi(rs.x), 0.0)
            trn = float(jnp.sqrt(jnp.sum(dw64 * rt * rt)))
        cyc = ",".join(f"{v:.2e}" for v in rs.cycle_resnorms)
        print(f"{label}: its={int(rs.iterations)} issued={int(rs.issued)} "
              f"true|r|_64={trn:.3e} (target {1e-6 * rn0:.3e}) "
              f"conv={bool(rs.converged)} stalled={rs.stalled} "
              f"wall={wall:.3f}s cyc={cyc}", flush=True)

    # ---- A: anchored, inner_tol_factor=0.25 ------------------------------
    def runA():
        return cg_refined(A, r_cg, M=M, tol=1e-6, max_iter=700,
                          dot=dot, dot_weight=dw, block=64, cycles=3,
                          A_hi=A_hi, b_hi=r_hi)

    for rep in range(3):
        t0 = time.perf_counter()
        rs = runA()
        rs.x.block_until_ready()
        check(f"A anchored f=0.25 rep{rep}", rs,
              time.perf_counter() - t0)

    # ---- B: f64-outer / f32-cycle ----------------------------------------
    t0 = time.perf_counter()
    with jax.enable_x64():
        M64 = pmgmod.make_pmg_preconditioner(
            disc, ex, Gf, A_hi, ~prob._dirichlet_mask, diag_np,
            dtype=np.float64, cycle_dtype=np.float32)
    print(f"[pmg f64/f32 build {time.perf_counter() - t0:.1f}s]",
          flush=True)

    def runB():
        with jax.enable_x64():
            return cg(A_hi, r_hi, M=M64, tol=1e-6, max_iter=700,
                      dot_weight=dw64, block=64)

    for rep in range(3):
        t0 = time.perf_counter()
        rs = runB()
        rs.x.block_until_ready()
        check(f"B f64-outer rep{rep}   ", rs, time.perf_counter() - t0)


if __name__ == "__main__":
    main()
