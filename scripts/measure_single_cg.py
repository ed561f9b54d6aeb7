"""Single-kernel fused CG iteration (make_fused_cg_kernel_single) A/B.

Arms (p=8, f32, bf16 direction/aux storage unless noted):

  100k (nx=316):
    pair-m0      two-kernel fused CG (the 0.46-0.49 ms/iter record)
    one-m0       ONE kernel/iter, default target_win
    one-m0-w{W}  target_win sweep
    one-m8       single kernel + defer_x=8
    one-f32      f32 direction storage ('highest' dots)
  1M (nx=1024):
    pair-m8      the 6.24 ms/iter record config
    one-m0 / one-m8

Run ON the TPU host with nothing else using the chip:

    BENCH_VERBOSE=1 python scripts/measure_single_cg.py [nx ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage, _build, _cg_operands  # noqa: E402


def _time(label, run, iters):
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


def _arm_pair(label, ex, Kcat, a, b0, inv_d, wf_d, m, iters):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    try:
        kA, kB, _ = pallas_kernels.make_fused_cg_kernels(
            ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16,
            defer_x=bool(m))
    except ValueError as e:
        print(f"[{label}: skipped — {e}]", flush=True)
        return
    prep = kA._prep
    print(f"{label}: TE={prep.TE} Hb={prep.Hb} far={prep.has_far}",
          flush=True)
    _time(label, lambda: _run(cg_fused, kA, kB, b0, inv_d, wf_d,
                              jnp.bfloat16, m, iters), iters)


def _arm_single(label, ex, Kcat, a, b0, inv_d, wf_d, m, iters,
                p_bf16=True, target_win=None):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    kw = {} if target_win is None else {"target_win": target_win}
    p_dt = jnp.bfloat16 if p_bf16 else None
    try:
        kAB, _ = pallas_kernels.make_fused_cg_kernel_single(
            ex, Kcat, a,
            precision="high" if p_bf16 else "highest",
            p_dtype=p_dt, defer_x=bool(m), **kw)
    except ValueError as e:
        print(f"[{label}: skipped — {e}]", flush=True)
        return
    prep = kAB._prep
    print(f"{label}: TE={prep.TE} Hb={prep.Hb}", flush=True)
    if not p_bf16:
        inv_d = inv_d.astype(jnp.float32)
        wf_d = wf_d.astype(jnp.float32)
    _time(label, lambda: _run(cg_fused, kAB, None, b0, inv_d, wf_d,
                              p_dt, m, iters), iters)


def _run(cg_fused, kA, kB, b0, inv_d, wf_d, p_dt, m, iters):
    res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d,
                   tol=0.0, max_iter=iters, block=250,
                   p_dtype=p_dt, defer_x=m)
    res.x.block_until_ready()
    return res


def main():
    sizes = [int(v) for v in sys.argv[1:]] or [316, 1024]
    for nx in sizes:
        tag = "100k" if nx < 1000 else "1m"
        it = 1000 if nx < 1000 else 200

        def arm(nx=nx, tag=tag, it=it):
            prob, ex, Gf, Dhat, a, Kcat = _build(nx)
            b0, inv_d, wf_d = _cg_operands(prob, ex)
            _arm_pair(f"{tag}-pair-m0", ex, Kcat, a, b0, inv_d, wf_d,
                      0, it)
            _arm_single(f"{tag}-one-m0", ex, Kcat, a, b0, inv_d, wf_d,
                        0, it)
            _arm_single(f"{tag}-one-m8", ex, Kcat, a, b0, inv_d, wf_d,
                        8, it)
            if nx < 1000:
                for w in (1536, 3072):
                    _arm_single(f"{tag}-one-m0-w{w}", ex, Kcat, a, b0,
                                inv_d, wf_d, 0, it, target_win=w)
                _arm_single(f"{tag}-one-f32", ex, Kcat, a, b0, inv_d,
                            wf_d, 0, it, p_bf16=False)
            else:
                _arm_pair(f"{tag}-pair-m8", ex, Kcat, a, b0, inv_d,
                          wf_d, 8, it)

        stage(f"single-kernel CG nx={nx}", arm)


if __name__ == "__main__":
    main()
