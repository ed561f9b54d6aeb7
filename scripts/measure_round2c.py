"""Round-2c TPU measurements: device-side GMRES stall + 1M far-split A/B.

One process (the remote terminal charges each new process a device-claim
stall).  Stages:

  1. 100k apply highest + plain CG      (procedural-mask headline rerun)
  2. 100k fused-bf16p CG                (mask gain on the fused path)
  3. squirmer warm Newton + calc_speed  (GMRES-IR stagnation fix)
  4. 1M far-split A/B: full-halo kernel vs split kernel vs XLA unfused,
     and fused-bf16p CG in both halo modes

Run ON the TPU host with nothing else using the chip:

    BENCH_VERBOSE=1 python scripts/measure_round2b.py
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")


def banner(msg):
    print(f"\n===== {msg} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def run_bench(argv):
    import bench

    old = sys.argv
    sys.argv = ["bench.py"] + argv
    try:
        bench.main()
    finally:
        sys.argv = old


def stage(name, fn):
    banner(name)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"[stage {name}: ok in {time.perf_counter() - t0:.1f}s]",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"[stage {name}: FAILED after {time.perf_counter() - t0:.1f}s]",
              flush=True)


def squirmer_stage():
    import jax

    jax.config.update("jax_enable_x64", True)

    from spectralelementmethod_tpu.mesh import annulus_mesh
    from spectralelementmethod_tpu.models.squirmer import Squirmer

    mesh = annulus_mesh(order=8, n_theta=9, n_r=15, r_outer=100.0,
                        progression=1.35)
    sq = Squirmer(mesh, order=8)
    sq.set_initial_guess()
    t0 = time.perf_counter()
    sq.run(1.0, beta=1.0, speed=1.0, it_max=10, tol=1e-6)
    t_cold = time.perf_counter() - t0
    print(json.dumps({"metric": "squirmer_cold_newton_s",
                      "value": round(t_cold, 2)}), flush=True)
    sq.set_initial_guess()
    t0 = time.perf_counter()
    sq.run(1.0, beta=1.0, speed=1.0, it_max=10, tol=1e-6)
    t_warm = time.perf_counter() - t0
    print(json.dumps({"metric": "squirmer_warm_newton_s",
                      "value": round(t_warm, 2)}), flush=True)
    # device-loop arm (one lax.while_loop dispatch per Newton solve)
    sq.set_initial_guess()
    sq.set_boundary_conditions(1.0, 1.0)
    t0 = time.perf_counter()
    sq.solve(it_max=10, tol=1e-6, newton_loop="device")
    t_dev_cold = time.perf_counter() - t0
    sq.set_initial_guess()
    t0 = time.perf_counter()
    sq.solve(it_max=10, tol=1e-6, newton_loop="device")
    t_dev = time.perf_counter() - t0
    print(json.dumps({"metric": "squirmer_warm_newton_device_s",
                      "value": round(t_dev, 2),
                      "cold_s": round(t_dev_cold, 2)}), flush=True)

    golden = 0.92571156681483957
    for tag, opts in (("", None),
                      ("_device", {"newton_loop": "device"})):
        sq.set_initial_guess()
        t0 = time.perf_counter()
        speed = sq.calc_speed([0.99, 1.01], n_rey=1.0, beta=1.0,
                              flow_solver_opts=opts)
        t_speed = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"squirmer_calc_speed{tag}_s",
            "value": round(t_speed, 2),
            "speed": float(speed),
            "golden_abs_err": abs(float(speed) - golden),
        }), flush=True)


def onem_ab_stage():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import pallas_kernels, sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.utils.hoist import hoist_closure

    p = 8
    nx = 1000
    banner("1M mesh+disc build")
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = make_exchange(disc, fused_pad=True)
    E = ex.E
    print(f"E_real={ex.E_real} E_pad={E}", flush=True)
    Gf = np.zeros((E, 3, disc.n_loc), np.float32)
    Gf[:disc.E] = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)

    rng = np.random.RandomState(0)
    uT = jnp.asarray(rng.standard_normal((ex.n_loc, E)).astype(np.float32))

    def time_apply(label, A):
        A_pure, A_c = hoist_closure(A, uT)
        A_c = tuple(A_c)

        @jax.jit
        def chain(u, n, c):
            def body(i, x):
                y = A_pure(x, *c)
                return y * jax.lax.rsqrt(jnp.vdot(y, y).real + 1e-30)
            return jax.lax.fori_loop(0, n, body, u)

        chain(uT, 10, A_c).block_until_ready()        # compile

        def run(n):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                chain(uT, n, A_c).block_until_ready()
                b = min(b, time.perf_counter() - t0)
            return b
        t_n, t_2n = run(20), run(40)
        ms = (t_2n - t_n) / 20 * 1e3
        print(json.dumps({"metric": f"onem_apply_ms[{label}]",
                          "value": round(ms, 3)}), flush=True)

    banner("1M apply: split (auto)")
    A_split = pallas_kernels.make_fused_affine_laplacian_T(
        ex, Kcat, a, precision="highest", max_halo="auto")
    prep = A_split._prep
    print(f"split prep: TE={prep.TE} Hb={prep.Hb} has_far={prep.has_far} "
          f"n_aux={prep.n_aux}", flush=True)
    time_apply("split", A_split)
    del A_split

    banner("1M apply: full halo")
    try:
        A_full = pallas_kernels.make_fused_affine_laplacian_T(
            ex, Kcat, a, precision="highest", max_halo=None)
        prep = A_full._prep
        print(f"full prep: TE={prep.TE} Hb={prep.Hb} "
              f"has_far={prep.has_far}", flush=True)
        time_apply("full", A_full)
        del A_full
    except Exception:
        traceback.print_exc()

    banner("1M apply: xla unfused")
    A_xla = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne", backend="xla",
        precision="highest")
    time_apply("xla", A_xla)
    del A_xla

    # fused-bf16p CG in both halo modes
    from spectralelementmethod_tpu.solver.cg import cg_fused

    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    diagL = np.asarray(prob.operator_diagonal())[ex.gather_hier]
    diagT = jnp.asarray(np.ascontiguousarray(diagL.T).astype(np.float32))
    b0 = jnp.where(free, jnp.asarray(
        np.ascontiguousarray(
            prob._b[ex.gather_hier].T).astype(np.float32)), 0.0)

    for label, mh in (("split", "auto"), ("full", None)):
        banner(f"1M fused-bf16p CG: {label}")
        try:
            kA, kB, G = pallas_kernels.make_fused_cg_kernels(
                ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16,
                max_halo=mh)
            prep = kA._prep
            print(f"cg prep: TE={prep.TE} Hb={prep.Hb} "
                  f"has_far={prep.has_far}", flush=True)
            aux_dt = jnp.bfloat16
            inv_d = jnp.where(
                free, 1.0 / jnp.where(diagT != 0, diagT, 1.0), 0.0
            ).astype(aux_dt)
            wf_d = jnp.where(
                free, ex._weights_as(np.float32, transposed=True), 0.0
            ).astype(aux_dt)
            res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d,
                           tol=0.0, max_iter=100, block=100,
                           p_dtype=jnp.bfloat16)
            res.x.block_until_ready()
            t0 = time.perf_counter()
            res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d,
                           tol=0.0, max_iter=100, block=100,
                           p_dtype=jnp.bfloat16)
            res.x.block_until_ready()
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": f"onem_cg_bf16p_ms_per_iter[{label}]",
                "value": round(dt * 1e3 / max(int(res.iterations), 1), 3),
                "iters": int(res.iterations),
            }), flush=True)
            del kA, kB
        except Exception:
            traceback.print_exc()


def main():
    import sys

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    if only in (None, "squirmer"):
        stage("squirmer (device-side stall freeze)", squirmer_stage)
    if only in (None, "1m"):
        stage("1M far-split A/B", onem_ab_stage)
    banner("all stages done")


if __name__ == "__main__":
    main()
