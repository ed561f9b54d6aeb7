"""Fused-CG pair: far-split x defer_x interaction A/B at 1M elements.

The round-2h 1M records left a confound: the 6.24 ms/iter defer_x=8
record and the 9.35 ms/iter m0 record were measured with whatever halo
mode `max_halo='auto'` picked, and the round-2k far-in-B arms ran under
concurrent host load.  This script crosses the two axes cleanly
(bf16-direction pair kernels, p=8 f32, robust in-run comparison):

  full-m0 / full-m8     max_halo=None  (full-halo windows)
  split-m0 / split-m8   max_halo=128   (far rows ride into kernel B)
  auto-m8               max_halo='auto' (confirms the auto rule's pick)

Run ON the TPU host with nothing else using the chip:

    BENCH_VERBOSE=1 python scripts/measure_cg_far_defer.py [nx ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage, _build, _cg_operands  # noqa: E402


def _arm(label, ex, Kcat, a, b0, inv_d, wf_d, *, max_halo, m, iters):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    try:
        kA, kB, _ = pallas_kernels.make_fused_cg_kernels(
            ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16,
            defer_x=bool(m), max_halo=max_halo)
    except ValueError as e:
        print(f"[{label}: skipped — {e}]", flush=True)
        return
    prep = kA._prep
    print(f"{label}: TE={prep.TE} Hb={prep.Hb} far={prep.has_far}",
          flush=True)

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
        "metric": f"cg_ms_per_iter[{label}]",
        "value": round(dt * 1e3 / max(int(res.issued), 1), 3),
        "iters": int(res.issued),
        "resnorm": float(res.residual_norm),
    }), flush=True)


def main():
    sizes = [int(v) for v in sys.argv[1:]] or [1024]
    for nx in sizes:
        tag = "100k" if nx < 1000 else "1m"
        it = 1000 if nx < 1000 else 200
        banner(f"cg far/defer A/B nx={nx}")

        def arms(nx=nx, tag=tag, it=it):
            prob, ex, Gf, Dhat, a, Kcat = _build(nx)
            b0, inv_d, wf_d = _cg_operands(prob, ex)
            for m in (0, 8):
                _arm(f"{tag}-full-m{m}", ex, Kcat, a, b0, inv_d, wf_d,
                     max_halo=None, m=m, iters=it)
                _arm(f"{tag}-split-m{m}", ex, Kcat, a, b0, inv_d, wf_d,
                     max_halo=128, m=m, iters=it)
            _arm(f"{tag}-auto-m8", ex, Kcat, a, b0, inv_d, wf_d,
                 max_halo="auto", m=8, iters=it)

        stage(f"{tag}-arms", arms)


if __name__ == "__main__":
    main()
