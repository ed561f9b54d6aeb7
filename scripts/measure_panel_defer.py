"""1M fused-bf16p CG: panel order x defer_x composition A/B.

Round-2h measured (lex order, padded full halo, Hb=1152):
  defer_x=0: 9.35 ms/iter      defer_x=8: 6.24 ms/iter  (the record)
Round-2f measured (panel=128 order, far-in-B split, NO defer):
  10.45 ms/iter (panel) vs 10.25 (lex) at 100-iteration dispatches.

Untested: panel order (near window Hb=128+far-in-B) COMBINED with
defer_x=8.  Panel order shrinks kernel A's three halo-window reads
(r, p, inv aux windows at factor (TE+2Hb)/TE); defer_x removes the x
traffic — the two act on different passes, so the wins should stack.

Run ON the TPU host:  python scripts/measure_panel_defer.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage, _cg_operands  # noqa: E402
from measure_panel import _build  # noqa: E402


def _time_cg(label, ex, Kcat, a, b0, inv_d, wf_d, m, iters=1000):
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
          f"has_far={prep.has_far} n_far={prep.n_far}", flush=True)

    def run():
        res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d,
                       tol=0.0, max_iter=iters, block=250,
                       p_dtype=jnp.bfloat16, defer_x=m)
        res.x.block_until_ready()
        return res

    run()                                  # compile
    t0 = time.perf_counter()
    res = run()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"cg_bf16p_ms_per_iter[{label}]",
        "value": round(dt * 1e3 / max(int(res.issued), 1), 3),
        "iters": int(res.issued), "defer_x": m,
        "resnorm": float(res.residual_norm),
    }), flush=True)
    del kA, kB


def main():
    for panel in (128, 0):
        def arm(panel=panel):
            prob, ex, Gf, Dhat, a, Kcat = _build(1024, panel=panel)
            b0, inv_d, wf_d = _cg_operands(prob, ex)
            for m in (8, 0):
                _time_cg(f"1m-panel{panel}-m{m}", ex, Kcat, a,
                         b0, inv_d, wf_d, m)

        stage(f"panel={panel} 1M", arm)


if __name__ == "__main__":
    main()
