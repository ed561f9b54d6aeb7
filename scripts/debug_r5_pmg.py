"""Round-5 root-cause probe: why is the 100k f32 pmg converged arm flaky?

Suspects (VERDICT round-4 item 1 + round-5 code read):

A. estimate_lmax power-iteration underestimate -> Chebyshev interval
   misses the top of the spectrum -> smoother amplifies those modes.
B. The V-cycle's OWN matmuls (GridFDM eigen-transforms, restrict/
   prolong) ran at JAX-default matmul precision = single-pass bf16 on
   the TPU MXU (~3 decimal digits), while the operator applies were
   'highest' — a nonlinear ~1e-2-class perturbation inside an allegedly
   fixed SPD preconditioner.  Fixed by pmg.py `mm_precision="float32"`
   (this probe A/Bs the legacy `None` against the fix).
C. The f32 outer recurrence floor (probe-2/3 of round 4f) — cured by
   re-anchoring (cg_refined) IF the V-cycle itself is sound.

Measurements, one process on the TPU:

1. lmax(BA) estimate at 30/60/120 power iterations (safety=1.0).
2. Spectrum of M A for legacy/fixed M: lam_max (power), lam_min
   (shifted power), and rho(I - M A).  lam_min <= 0 => M indefinite
   => plain CG invalid.  rho < 1 => V-cycle contractive.
3. Solve arms, 3 repeats each (flakiness check): plain cg + legacy M,
   plain cg + fixed M, cg_refined (bench composition) + fixed M,
   fixed M with lmax_iters=60/safety=1.1.

    python scripts/debug_r5_pmg.py [--elements 99856]
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
    ap.add_argument("--repeats", type=int, default=3)
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

    p = args.order
    nx = max(int(np.sqrt(args.elements)), 1)
    ny = max(args.elements // nx, 1)
    dtype = np.float32

    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=dtype)
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
    dw = ex._weights_as(np.dtype(dtype), transposed=True)
    diag_np = np.asarray(prob.operator_diagonal())

    def to_local(u):
        lv = ex.local_from_global(np.asarray(u)).astype(dtype)
        return jnp.asarray(np.ascontiguousarray(lv.T))

    u_dL = to_local(
        np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0))
    bL = to_local(prob._b)
    r_cg = jax.jit(
        lambda f, b, u: jnp.where(f, b - A(u), 0.0))(free, bL, u_dL)
    r_cg.block_until_ready()
    rn0 = float(jnp.sqrt(jnp.sum(dw * r_cg * r_cg)))
    print(f"|r0|_w = {rn0:.6e}  (tol 1e-6 -> stop {1e-6 * rn0:.3e})",
          flush=True)

    # ---- probe 1: lmax estimate convergence ------------------------------
    diagL = np.ascontiguousarray(diag_np[ex.gather_hier].T).astype(
        np.float32)
    B = jacobi_preconditioner(jnp.asarray(diagL), free)
    for iters in (30, 60, 120):
        t0 = time.perf_counter()
        lam = pmgmod.estimate_lmax(A, B, (ex.n_loc, ex.E),
                                   dtype=np.float32, iters=iters,
                                   safety=1.0)
        print(f"lmax(BA, iters={iters}) = {lam:.6f}  "
              f"[{time.perf_counter() - t0:.1f}s]", flush=True)

    # ---- probe 2: spectrum of M A ----------------------------------------
    def spectrum(M, label):
        def MA(v):
            return M(A(v))

        t0 = time.perf_counter()
        lmax = pmgmod.estimate_lmax(MA, lambda v: v, (ex.n_loc, ex.E),
                                    dtype=np.float32, iters=60,
                                    safety=1.0)
        c = 1.25 * lmax

        def shifted(v):
            return c * v - MA(jnp.where(free, v, 0.0))

        smax = pmgmod.estimate_lmax(shifted, lambda v: v,
                                    (ex.n_loc, ex.E),
                                    dtype=np.float32, iters=120,
                                    safety=1.0)
        lmin = c - smax

        def E_prop(v):
            v = jnp.where(free, v, 0.0)
            return v - MA(v)

        rho = pmgmod.estimate_lmax(E_prop, lambda v: v,
                                   (ex.n_loc, ex.E),
                                   dtype=np.float32, iters=60,
                                   safety=1.0)
        print(f"{label}: lam_max(MA)={lmax:.4f} lam_min(MA)={lmin:.4e} "
              f"rho(I-MA)={rho:.4f} kappa={lmax / max(lmin, 1e-30):.1f} "
              f"[{time.perf_counter() - t0:.1f}s]", flush=True)

    M_legacy = pmgmod.make_pmg_preconditioner(
        disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np,
        mm_precision=None)
    M_fixed = pmgmod.make_pmg_preconditioner(
        disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np)
    spectrum(M_legacy, "legacy (bf16-default coarse/transfer)")
    spectrum(M_fixed, "fixed  (float32 coarse/transfer)   ")

    # ---- probe 3: solve arms ---------------------------------------------
    def run(label, M, refined=False, repeats=args.repeats):
        for rep in range(repeats):
            t0 = time.perf_counter()
            if refined:
                rs = cg_refined(A, r_cg, M=M, tol=1e-6, max_iter=700,
                                dot=dot, dot_weight=dw, block=64,
                                cycles=3)
            else:
                rs = cg(A, r_cg, M=M, tol=1e-6, max_iter=1000,
                        dot=dot, dot_weight=dw, block=64)
            rs.x.block_until_ready()
            wall = time.perf_counter() - t0
            true_r = jnp.where(free, r_cg - A(rs.x), 0.0)
            trn = float(jnp.sqrt(jnp.sum(dw * true_r * true_r)))
            cyc = (" cyc=" + ",".join(f"{v:.2e}"
                                      for v in rs.cycle_resnorms)
                   if rs.cycle_resnorms else "")
            print(f"{label} rep{rep}: its={int(rs.iterations)} "
                  f"issued={int(rs.issued)} |r|={float(rs.residual_norm):.3e} "
                  f"true|r|={trn:.3e} conv={bool(rs.converged)} "
                  f"stalled={rs.stalled} wall={wall:.3f}s{cyc}",
                  flush=True)

    run("plain+legacyM ", M_legacy)
    run("plain+fixedM  ", M_fixed)
    run("refined+fixedM", M_fixed, refined=True)

    M_safe = pmgmod.make_pmg_preconditioner(
        disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np,
        lmax_iters=60, lmax_safety=1.1)
    run("plain+safeM   ", M_safe, repeats=1)
    run("refined+safeM ", M_safe, refined=True, repeats=1)


if __name__ == "__main__":
    main()
