"""Deferred-x fused CG A/B (p=8, f32, bf16 direction storage).

``cg_fused(defer_x=m)`` removes kernel A's per-iteration x read+write
(2 of ~9.5 effective f32 HBM passes) for an amortized ``(2 + m/2)/m``
catch-up pass — predicted ~13% at m=8 on the 100k bf16p iteration
(0.46 -> ~0.40 ms).  This measures ms/iter for m in {0, 4, 8, 16} at
100k elements and m in {0, 8} at 1M (far-split kernels), plus a
solution-quality check (true residual after a fixed-tolerance solve).

Run ON the TPU host, nothing else using the chip:

    python scripts/measure_deferx.py [--skip-1m]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage, _cg_operands  # noqa: E402
from measure_panel import _build  # noqa: E402


def _time_cg_defer(label, ex, Kcat, a, b0, inv_d, wf_d, m, iters=100):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    try:
        kA, kB, G = pallas_kernels.make_fused_cg_kernels(
            ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16,
            defer_x=bool(m))
    except ValueError as e:
        print(f"[{label}: skipped — {e}]", flush=True)
        return
    prep = kA._prep
    print(f"{label} prep: TE={prep.TE} Hb={prep.Hb} "
          f"has_far={prep.has_far}", flush=True)

    def run():
        res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d,
                       tol=0.0, max_iter=iters, block=iters,
                       p_dtype=jnp.bfloat16, defer_x=m)
        res.x.block_until_ready()
        return res

    run()                                  # compile
    t0 = time.perf_counter()
    res = run()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"cg_bf16p_ms_per_iter[{label}]",
        "value": round(dt * 1e3 / max(int(res.iterations), 1), 3),
        "iters": int(res.iterations),
        "defer_x": m,
        "resnorm": float(res.residual_norm),
    }), flush=True)
    del kA, kB


def stage_100k():
    prob, ex, Gf, Dhat, a, Kcat = _build(316)      # 99 856 elements
    b0, inv_d, wf_d = _cg_operands(prob, ex)
    for m in (0, 4, 8, 16):
        _time_cg_defer(f"100k-m{m}", ex, Kcat, a, b0, inv_d, wf_d, m)
    del prob, ex, Gf, Dhat, a, Kcat, b0, inv_d, wf_d


def stage_1m():
    prob, ex, Gf, Dhat, a, Kcat = _build(1024)     # 1 048 576 elements
    b0, inv_d, wf_d = _cg_operands(prob, ex)
    for m in (0, 8):
        _time_cg_defer(f"1m-m{m}", ex, Kcat, a, b0, inv_d, wf_d, m)
    del prob, ex, Gf, Dhat, a, Kcat, b0, inv_d, wf_d


def main():
    stage("deferred-x 100k", stage_100k)
    if "--skip-1m" not in sys.argv:
        stage("deferred-x 1M", stage_1m)
    banner("measure_deferx done")


if __name__ == "__main__":
    main()
