"""General-path fused kernel + multi-RHS amortization (p=8, f32, 100k).

The curved-mesh (general) apply reads full (3, n, E) factor slabs; the
XLA path additionally materializes the (2n, E) grads/flux intermediates
between the two dots.  ``make_fused_general_laplacian_T`` fuses the
chain in VMEM and sublane-stacks ``n_rhs`` RHS so the slabs stream once
per tile — predicted per-RHS passes ~(2 + 3/k) vs ~9 unfused.

Arms (all on one 316x316 p=8 mesh, factors forced to general):
  1. XLA general apply, single RHS          (the current curved-path cost)
  2. fused general, k = 1, 2, 4, 8          (per-RHS ms)
  3. affine fused apply                      (context: the bench headline)
  4. XLA general under vmap, k = 4           (the non-kernel batched alt)

Run ON the TPU host, nothing else using the chip:

    python scripts/measure_multirhs.py [nx]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage  # noqa: E402
from measure_panel import _build  # noqa: E402
from exp_pallas_scale import _time_chain  # noqa: E402

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 316


def _norm_step(A):
    import jax
    import jax.numpy as jnp

    def step(x):
        y = A(x)
        return y * jax.lax.rsqrt(jnp.vdot(y, y).real.astype(y.dtype)
                                 + 1e-30)

    return step


def _report(label, dt_ms, k=1, **kw):
    print(json.dumps({
        "metric": f"apply_ms[{label}]",
        "value": round(dt_ms, 3),
        "per_rhs_ms": round(dt_ms / k, 3),
        "nrhs": k, **kw,
    }), flush=True)


def main():
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.ops import pallas_kernels, sumfac

    prob, ex, Gf, Dhat, a, Kcat = _build(NX)
    n, E = ex.n_loc, ex.E
    rng = np.random.RandomState(0)
    uT = jnp.asarray(rng.standard_normal((n, E)).astype(np.float32))

    def xla_general():
        A = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla",
            structure="general")
        dt = _time_chain(_norm_step(A), uT, iters=30)
        _report("xla-general", dt * 1e3)

    def fused_general():
        for k in (1, 2, 4, 8):
            try:
                A = pallas_kernels.make_fused_general_laplacian_T(
                    ex, Gf, Dhat, n_rhs=k)
            except ValueError as e:
                print(f"[fusedgen-k{k}: skipped — {e}]", flush=True)
                continue
            prep = A._prep
            U = jnp.asarray(rng.standard_normal(
                (k * n, E)).astype(np.float32))
            dt = _time_chain(_norm_step(A), U, iters=30)
            _report(f"fusedgen-k{k}", dt * 1e3, k=k,
                    TE=prep.TE, Hb=prep.Hb)
            del A, U

    def affine_context():
        A = pallas_kernels.make_fused_affine_laplacian_T(ex, Kcat, a)
        dt = _time_chain(_norm_step(A), uT, iters=30)
        _report("affine-fused", dt * 1e3)

    def xla_vmap_batch():
        import jax

        A1 = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla",
            structure="general")
        Ab = jax.vmap(A1)
        U = jnp.asarray(rng.standard_normal((4, n, E)).astype(np.float32))
        dt = _time_chain(_norm_step(Ab), U, iters=30)
        _report("xla-general-vmap-k4", dt * 1e3, k=4)

    def batched_solve():
        """End-to-end: 100 whole-batch CG iterations through the fused
        multi-RHS operator (general factors), k = 4."""
        from spectralelementmethod_tpu.solver.cg import cg_batched

        k, iters = 4, 100
        free = jnp.ones((n, E), bool)
        A_b = sumfac.make_multi_rhs_laplacian_T(
            ex, Gf, Dhat, k, free_local=free, structure="general",
            assume_masked_input=True)
        arm = "fused" if getattr(A_b, "_fused", None) is not None \
            else "xla-vmap"
        w = ex._weights_as(np.float32, transposed=True)
        # well-posed SPD system: mass-shifted operator not needed for a
        # fixed-iteration timing; tol=0 runs the full budget
        R = jnp.asarray(rng.standard_normal(
            (k, n, E)).astype(np.float32))

        def run():
            res = cg_batched(A_b, R, tol=0.0, max_iter=iters,
                             block=iters, dot_weight=w, whole_batch=True)
            res.x.block_until_ready()
            return res

        run()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"cg_batched_ms_per_iter[{arm}-k{k}]",
            "value": round(dt * 1e3 / iters, 3),
            "per_rhs_ms": round(dt * 1e3 / iters / k, 3),
            "nrhs": k,
        }), flush=True)

    def general_cg():
        """General fused CG (plain-general vs fused f32 vs fused bf16p),
        100 iterations on the Dirichlet system."""
        from spectralelementmethod_tpu.solver.cg import (
            cg, cg_fused, jacobi_preconditioner)

        iters = 100
        free_np = (~prob._dirichlet_mask)[ex.gather_hier]
        free = jnp.asarray(np.ascontiguousarray(free_np.T))
        diagL = jnp.asarray(np.ascontiguousarray(
            np.asarray(prob.operator_diagonal())
            [ex.gather_hier].astype(np.float32).T))
        inv0 = jnp.where(free, 1.0 / jnp.where(diagL != 0, diagL, 1.0),
                         0.0)
        w = ex._weights_as(np.float32, transposed=True)
        wf0 = jnp.where(free, w, 0.0)
        b0 = ex.dss_T(jnp.asarray(rng.standard_normal(
            (n, E)).astype(np.float32))) * jnp.where(free, 1.0, 0.0)

        A = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, free, vector_layout="ne", backend="xla",
            structure="general", assume_masked_input=True)
        M = jacobi_preconditioner(diagL, free)

        def run_plain():
            res = cg(A, b0, M=M, tol=0.0, max_iter=iters, block=iters,
                     dot_weight=w)
            res.x.block_until_ready()
            return res

        run_plain()
        t0 = time.perf_counter()
        res = run_plain()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "cg_general_ms_per_iter[plain-xla]",
            "value": round(dt * 1e3 / iters, 3),
            "resnorm": float(res.residual_norm)}), flush=True)

        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels_general)

        for tag, prec, p_dt in (("f32", "highest", None),
                                ("bf16p", "high", jnp.bfloat16)):
            try:
                kA, kB, G = make_fused_cg_kernels_general(
                    ex, sumfac._pad_factors_to_exchange(Gf, ex), Dhat,
                    precision=prec, p_dtype=p_dt)
            except ValueError as e:
                print(f"[general-cg-{tag}: skipped — {e}]", flush=True)
                continue
            inv_d = inv0.astype(jnp.bfloat16) if p_dt else inv0
            wf_d = wf0.astype(jnp.bfloat16) if p_dt else wf0

            def run_f():
                res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d,
                               tol=0.0, max_iter=iters, block=iters,
                               p_dtype=p_dt)
                res.x.block_until_ready()
                return res

            run_f()
            t0 = time.perf_counter()
            res = run_f()
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": f"cg_general_ms_per_iter[fused-{tag}]",
                "value": round(dt * 1e3 / iters, 3),
                "TE": kA._prep.TE, "Hb": kA._prep.Hb,
                "resnorm": float(res.residual_norm)}), flush=True)
            del kA, kB

    def batched_fused_cg():
        """k-RHS fused CG ms/iter/RHS (shared factor/diag/weight
        streams) vs the single-RHS fused iteration, k in {2, 4}."""
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels_general)
        from spectralelementmethod_tpu.solver.cg import cg_fused_batched

        iters = 100
        free = jnp.ones((n, E), bool)
        w = ex._weights_as(np.float32, transposed=True)
        inv0 = jnp.where(free, 0.1, 0.0).astype(jnp.bfloat16)
        wf0 = jnp.asarray(w).astype(jnp.bfloat16)
        from spectralelementmethod_tpu.ops.pallas_kernels import (
            make_fused_cg_kernels_batched)

        Gf_p = sumfac._pad_factors_to_exchange(Gf, ex)
        Wg = prob.disc.basis.weight_grid().reshape(-1)
        a_f, _ = sumfac.affine_factorization(Gf_p, Wg)
        Kc = sumfac.make_affine_element_matrices(Dhat, Wg, order=ex.hier)
        for arm, k in (("gen", 2), ("gen", 4), ("aff", 2), ("aff", 4)):
            try:
                if arm == "gen":
                    kA, kB, G = make_fused_cg_kernels_general(
                        ex, Gf_p, Dhat, n_rhs=k, precision="high",
                        p_dtype=jnp.bfloat16)
                else:
                    kA, kB, G = make_fused_cg_kernels_batched(
                        ex, Kc, a_f, n_rhs=k, precision="high",
                        p_dtype=jnp.bfloat16)
            except ValueError as e:
                print(f"[batched-fused-cg-{arm}-k{k}: skipped — {e}]",
                      flush=True)
                continue
            B = jnp.asarray(rng.standard_normal(
                (k, n, E)).astype(np.float32))

            def run():
                res = cg_fused_batched(kA, kB, B, inv=inv0, w_free=wf0,
                                       tol=0.0, max_iter=iters,
                                       block=iters,
                                       p_dtype=jnp.bfloat16)
                res.x.block_until_ready()
                return res

            run()
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": f"cg_fused_batched[{arm}-k{k}]",
                "value": round(dt * 1e3 / iters, 3),
                "per_rhs_ms": round(dt * 1e3 / iters / k, 3),
                "TE": kA._prep.TE, "Hb": kA._prep.Hb,
            }), flush=True)
            del kA, kB

    stage("xla general apply", xla_general)
    if pallas_kernels.supported():
        stage("fused general k-sweep", fused_general)
        stage("affine fused context", affine_context)
    else:
        print("[fused arms skipped: no Mosaic backend]", flush=True)
    stage("xla vmap batch", xla_vmap_batch)
    stage("whole-batch CG solve", batched_solve)
    if pallas_kernels.supported():
        stage("general fused CG", general_cg)
        stage("batched fused CG", batched_fused_cg)
    banner("measure_multirhs done")


if __name__ == "__main__":
    main()
