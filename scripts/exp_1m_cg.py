"""Where do 1M fused-CG iterations spend their time?

Round-2d measured 10.6 ms/iter (split, far-in-B) at p=8/1M vs a ~4.2 ms
HBM-traffic floor — a 2.5x gap that does not exist at 100k (0.46 vs
0.40).  Candidate causes: pallas per-tile overhead (G=489 tiles/kernel
at TE=2048 vs 45 at 100k), fori-carry copies, the XLA far stage, or
kernel-boundary serialization.  Probes:

  1. kA-only loop (chain r <- Ap_near; far XLA ops dead-code away)
  2. kB-only loop (fixed Ap/far operands; chain r <- r')
  3. full iteration at TE = 1024 / 2048 / 3072 (grid-overhead scaling)
  4. clean 100k A/B re-run (the round-2d one was contaminated by a
     concurrent pytest run)
  5. x64 far-split compile check (round-2d hit an infra 500)

Run ON the TPU host, nothing else using the chip:

    python scripts/exp_1m_cg.py
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import _build, _cg_operands, banner, stage  # noqa: E402


def _loop_time(label, body, init, iters=100):
    import jax

    @jax.jit
    def chain(x0):
        return jax.lax.fori_loop(0, iters, body, x0)

    out = chain(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chain(init)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": f"ms_per_iter[{label}]",
                      "value": round(dt * 1e3 / iters, 3)}), flush=True)


def probe(prob, ex, Kcat, a, tag, wins=(1422, 2764, 3698)):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    b0, inv_d, wf_d = _cg_operands(prob, ex)

    for win in wins:
        try:
            kA, kB, G = pallas_kernels.make_fused_cg_kernels(
                ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16,
                target_win=win)
        except ValueError as e:
            print(f"[win={win}: {e}]", flush=True)
            continue
        prep = kA._prep
        print(f"win={win}: TE={prep.TE} Hb={prep.Hb} G={prep.G} "
              f"has_far={prep.has_far}", flush=True)
        t0 = time.perf_counter()
        res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d, tol=0.0,
                       max_iter=100, block=100, p_dtype=jnp.bfloat16)
        res.x.block_until_ready()
        t0 = time.perf_counter()
        res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d, tol=0.0,
                       max_iter=100, block=100, p_dtype=jnp.bfloat16)
        res.x.block_until_ready()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"cg_bf16p_ms_per_iter[{tag}-win{win}-TE{prep.TE}]",
            "value": round(dt * 1e3 / max(int(res.iterations), 1), 3),
        }), flush=True)

        if win == wins[1]:
            # component loops at the production window
            p0 = jnp.zeros_like(b0, dtype=jnp.bfloat16)
            x0 = jnp.zeros_like(b0)

            def body_a(i, r):
                p, Ap, x, d = kA(r, p0, inv_d, x0, 0.5, 0.5)
                return (Ap[0] if isinstance(Ap, tuple) else Ap) + 1e-30 * r

            _loop_time(f"{tag}-kA-only", body_a, b0)

            pA, ApA, xA, dA = kA(b0, p0, inv_d, x0, 0.5, 0.5)

            def body_b(i, r):
                r2, rz, rn = kB(r, ApA, inv_d, wf_d, 0.3)
                return r2

            _loop_time(f"{tag}-kB-only", body_b, b0)
        del kA, kB


def stage_1m():
    prob, ex, Gf, Dhat, a, Kcat = _build(1000)
    probe(prob, ex, Kcat, a, "1m")


def stage_100k():
    prob, ex, Gf, Dhat, a, Kcat = _build(316)
    # auto now keeps the full halo at 100k; verify clean numbers for
    # both modes via explicit max_halo through probe's target windows
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    b0, inv_d, wf_d = _cg_operands(prob, ex)
    for label, mh in (("100k-auto", "auto"), ("100k-split", 128)):
        kA, kB, G = pallas_kernels.make_fused_cg_kernels(
            ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16,
            max_halo=mh)
        prep = kA._prep
        print(f"{label}: TE={prep.TE} Hb={prep.Hb} G={prep.G} "
              f"has_far={prep.has_far}", flush=True)
        res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d, tol=0.0,
                       max_iter=100, block=100, p_dtype=jnp.bfloat16)
        res.x.block_until_ready()
        t0 = time.perf_counter()
        res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d, tol=0.0,
                       max_iter=100, block=100, p_dtype=jnp.bfloat16)
        res.x.block_until_ready()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"cg_bf16p_ms_per_iter[{label}]",
            "value": round(dt * 1e3 / max(int(res.iterations), 1), 3),
        }), flush=True)
        del kA, kB


def stage_x64():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.ops import pallas_kernels

    prob, ex, Gf, Dhat, a, Kcat = _build(32, p=2)
    A = pallas_kernels.make_fused_affine_laplacian_T(
        ex, Kcat, a, precision="highest", max_halo=1)
    assert A._prep.has_far
    uT = jnp.asarray(np.random.RandomState(0).standard_normal(
        (ex.n_loc, ex.E)).astype(np.float32))
    out = jax.jit(A)(uT)
    out.block_until_ready()
    print(json.dumps({"metric": "x64_far_split_compile_ok", "value": 1}),
          flush=True)


def main():
    stage("100k clean A/B", stage_100k)
    stage("1M component probe", stage_1m)
    stage("x64 far-split compile check", stage_x64)
    banner("all stages done")


if __name__ == "__main__":
    main()
