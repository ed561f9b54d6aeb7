"""Panel ordering at 1M under the padded exchange — the round-3 matrix.

VERDICT round-2 item 4: the full-halo panel-128 arm was never run (it
was inadmissible before the round-2h exchange padding).  This script
closes the claim with the full composition at 1M elements (1024^2, p=8,
f32):

    apply:  (panel in {0, 128}) x (max_halo in {auto, None})
    CG:     (panel in {0, 128}) x (max_halo in {auto, None})
                               x (defer_x in {0, 8})

Panel order regroups columns into 128-wide panels: near offsets become
{1, 127, 128, 129} (window Hb=256 full-halo — factor 1+512/TE instead of
lex's 1+2304/2304=2.0) with one small uniform cross-panel class per
direction that must ride the far epilogue — so "full halo" for panel
arms means max_halo covering the near classes only (256), NOT the
cross-panel offset (~131k, never admissible).

Run ON the TPU host:  python scripts/measure_panel_r3.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage, _cg_operands  # noqa: E402
from measure_panel import _build, _time_apply  # noqa: E402


def _time_cg(label, ex, Kcat, a, b0, inv_d, wf_d, m, max_halo,
             iters=1000):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    try:
        kA, kB, G = pallas_kernels.make_fused_cg_kernels(
            ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16,
            defer_x=bool(m), max_halo=max_halo)
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
        "TE": prep.TE, "Hb": prep.Hb, "far": prep.has_far,
        "resnorm": float(res.residual_norm),
    }), flush=True)
    del kA, kB


def main():
    for panel in (128, 0):
        def arm(panel=panel):
            tag = f"panel{panel}" if panel else "lex"
            prob, ex, Gf, Dhat, a, Kcat = _build(1024, panel=panel)
            # apply arms
            _time_apply(f"{tag}-apply-auto", ex, Kcat, a)
            _time_apply(f"{tag}-apply-full", ex, Kcat, a, max_halo=None)
            if panel:
                # near window covering {1,127,128,129} explicitly
                _time_apply(f"{tag}-apply-h256", ex, Kcat, a,
                            max_halo=256)
            b0, inv_d, wf_d = _cg_operands(prob, ex)
            for m in (0, 8):
                _time_cg(f"{tag}-cg-auto-m{m}", ex, Kcat, a,
                         b0, inv_d, wf_d, m, "auto")
                _time_cg(f"{tag}-cg-full-m{m}", ex, Kcat, a,
                         b0, inv_d, wf_d, m, None)
                if panel:
                    _time_cg(f"{tag}-cg-h256-m{m}", ex, Kcat, a,
                             b0, inv_d, wf_d, m, 256)
            del prob, ex, Gf, Dhat, a, Kcat, b0, inv_d, wf_d

        stage(f"panel={panel} 1M", arm)
    banner("all stages done")


if __name__ == "__main__":
    main()
