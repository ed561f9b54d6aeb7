"""Round-2 pending TPU measurements, batched into ONE process.

The remote-TPU terminal charges each new process a long device-claim
stall at its first device op (see docs/perf.md), so every pending
BASELINE.md number is measured here in sequence:

  1. 1M-element apply, `highest` (far-class halo split)   -> ONEM_SPLIT
  2. 1M-element apply, `high` (bf16x3)
  3. 1M-element fused-bf16p CG (far epilogue in-loop)
  4. squirmer warm Newton solve                           -> SQ_NEWTON
  5. squirmer calc_speed                                  -> SQ_SPEED

Run ON the TPU host with nothing else using the chip:

    BENCH_VERBOSE=1 python scripts/measure_round2.py
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
    import numpy as np

    from spectralelementmethod_tpu.mesh import annulus_mesh
    from spectralelementmethod_tpu.models.squirmer import Squirmer

    mesh = annulus_mesh(order=8, n_theta=9, n_r=15, r_outer=100.0,
                        progression=1.35)
    sq = Squirmer(mesh, order=8)
    print(f"E={sq.disc.E} n_ext_dofs={sq.csys.n_ext_dofs}", flush=True)

    # cold run: compiles everything (Newton step, GMRES-IR, force)
    banner("squirmer cold solve (compile)")
    sq.set_initial_guess()
    t0 = time.perf_counter()
    sq.run(1.0, beta=1.0, speed=1.0, it_max=10, tol=1e-6)
    t_cold = time.perf_counter() - t0
    print(json.dumps({"metric": "squirmer_cold_newton_s",
                      "value": round(t_cold, 2)}), flush=True)

    # warm run: same operators, fresh initial guess -> pure solve time
    banner("squirmer warm solve")
    sq.set_initial_guess()
    t0 = time.perf_counter()
    sq.run(1.0, beta=1.0, speed=1.0, it_max=10, tol=1e-6)
    t_warm = time.perf_counter() - t0
    print(json.dumps({"metric": "squirmer_warm_newton_s",
                      "value": round(t_warm, 2)}), flush=True)

    banner("squirmer calc_speed (warm caches)")
    sq.set_initial_guess()
    t0 = time.perf_counter()
    speed = sq.calc_speed([0.99, 1.01], n_rey=1.0, beta=1.0)
    t_speed = time.perf_counter() - t0
    golden = 0.92571156681483957
    print(json.dumps({
        "metric": "squirmer_calc_speed_s",
        "value": round(t_speed, 2),
        "speed": float(speed),
        "golden_abs_err": abs(float(speed) - golden),
    }), flush=True)


def main():
    stage("1M apply highest (far split) + plain CG",
          lambda: run_bench(["--elements", "1000000"]))
    stage("1M apply high (bf16x3)",
          lambda: run_bench(["--elements", "1000000", "--precision", "high"]))
    stage("1M fused-bf16p CG",
          lambda: run_bench(["--elements", "1000000",
                             "--cg-mode", "fused-bf16p"]))
    stage("squirmer", squirmer_stage)
    banner("all stages done")


if __name__ == "__main__":
    main()
