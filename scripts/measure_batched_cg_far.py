"""Batched fused CG with the far-class split: does window relief flip
the measured k>=2 losses?

Round-2h measured the batched CG kernels LOSING to k independent
single-RHS solves (affine k=4: 0.904 vs 0.488 ms/iter/RHS at 100k)
because the k-fold-shrunk VMEM window degenerates to TE=384 at full
halo (window factor 3x).  With the far split (Hb=128) the same VMEM
budget gives TE 3x the lanes at window factor ~1.2.  Arms (p=8, f32,
bf16 directions, 100k elements, 1000-iteration ladders):

  single         the 1-RHS record config (context)
  k{2,4}-full    batched, max_halo=None (the round-2h losers)
  k{2,4}-split   batched, max_halo='auto' (splits at cost>=0.75)

Run ON the TPU host with nothing else using the chip:

    BENCH_VERBOSE=1 python scripts/measure_batched_cg_far.py [nx ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage, _build, _cg_operands  # noqa: E402


def _report(label, res, dt):
    print(json.dumps({
        "metric": f"cg_ms_per_iter[{label}]",
        "value": round(dt * 1e3 / max(int(res.issued), 1), 3),
        "iters": int(res.issued),
        "resnorm": float(res.residual_norm),
    }), flush=True)


def _arm_single(label, ex, Kcat, a, b0, inv_d, wf_d, iters):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    kA, kB, _ = pallas_kernels.make_fused_cg_kernels(
        ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16)
    prep = kA._prep
    print(f"{label}: TE={prep.TE} Hb={prep.Hb} far={prep.has_far}",
          flush=True)

    def run():
        res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d, tol=0.0,
                       max_iter=iters, block=250, p_dtype=jnp.bfloat16)
        res.x.block_until_ready()
        return res

    run()
    t0 = time.perf_counter()
    res = run()
    _report(label, res, time.perf_counter() - t0)


def _arm_batched(label, ex, Kcat, a, b0, inv_d, wf_d, *, k, max_halo,
                 iters, m=0):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused_batched

    try:
        kA, kB, _ = pallas_kernels.make_fused_cg_kernels_batched(
            ex, Kcat, a, n_rhs=k, precision="high",
            p_dtype=jnp.bfloat16, max_halo=max_halo, defer_x=bool(m))
    except ValueError as e:
        print(f"[{label}: skipped — {e}]", flush=True)
        return
    prep = kA._prep
    print(f"{label}: TE={prep.TE} Hb={prep.Hb} far={prep.has_far}",
          flush=True)
    n = ex.n_loc
    B = jnp.concatenate(
        [jnp.roll(b0, j, axis=1) for j in range(k)], axis=0)

    def run():
        res = cg_fused_batched(kA, kB, B, inv=inv_d, w_free=wf_d,
                               tol=0.0, max_iter=iters, block=250,
                               p_dtype=jnp.bfloat16, defer_x=m)
        res.x.block_until_ready()
        return res

    try:
        run()
    except Exception as e:  # noqa: BLE001 — e.g. scoped-VMEM compile OOM
        print(f"[{label}: FAILED at compile/run — "
              f"{str(e).splitlines()[0][:200]}]", flush=True)
        return
    t0 = time.perf_counter()
    res = run()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"cg_ms_per_iter_per_rhs[{label}]",
        "value": round(dt * 1e3 / max(int(res.issued), 1) / k, 3),
        "iters": int(res.issued),
        "resnorm": [float(v) for v in res.residual_norm],
    }), flush=True)


def main():
    sizes = [int(v) for v in sys.argv[1:]] or [316]
    for nx in sizes:
        tag = "100k" if nx < 1000 else "1m"
        it = 1000 if nx < 1000 else 200
        banner(f"batched CG far A/B nx={nx}")

        def arms(nx=nx, tag=tag, it=it):
            prob, ex, Gf, Dhat, a, Kcat = _build(nx)
            b0, inv_d, wf_d = _cg_operands(prob, ex)
            if nx < 1000:
                _arm_single(f"{tag}-single", ex, Kcat, a, b0, inv_d,
                            wf_d, it)
                for k in (2, 4):
                    _arm_batched(f"{tag}-k{k}-full", ex, Kcat, a, b0,
                                 inv_d, wf_d, k=k, max_halo=None,
                                 iters=it)
                    _arm_batched(f"{tag}-k{k}-split", ex, Kcat, a, b0,
                                 inv_d, wf_d, k=k, max_halo="auto",
                                 iters=it)
            else:
                # 1M: the defer_x x far-split product at k=2 (the
                # single-RHS record config is split + defer_x=8).
                # Full-halo k=2 is INADMISSIBLE at 1M: TE is pinned to
                # Hb_full=1152 and the k-stacked window state overflows
                # scoped vmem by 320K (measured compile OOM) — the far
                # split is the only k>=2 config at this scale.
                for m in (0, 8):
                    _arm_batched(f"{tag}-k2-split-m{m}", ex, Kcat, a,
                                 b0, inv_d, wf_d, k=2, max_halo=128,
                                 iters=it, m=m)

        stage(f"{tag}-arms", arms)


if __name__ == "__main__":
    main()
