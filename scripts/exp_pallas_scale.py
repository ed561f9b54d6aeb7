"""Why do the fused Pallas kernels lose HBM efficiency at 1M elements?

Measured (p=8): the plain fused apply runs at ~1.5x its traffic floor at
100k elements but ~4.6x at 1M; fused-CG kernel A at ~2.4x (TE sweep
refutes per-tile fixed overhead: halving G changed little).  XLA's own
vector ops still hit ~81% of HBM peak on the same (81, 1M) arrays, so
the effect is Pallas-specific.  Probes:

  1. trivial copy kernel out = 2*u on (81, E) at E = 104k / 400k / 1M,
     TE = 1024 / 2048 / 4096 / 8192: pure streaming efficiency vs array
     size and tile width (GB/s printed)
  2. copy kernel with 4 inputs + 2 outputs (the fused-CG operand count)
     at the same sizes: DMA-descriptor scaling
  3. fused apply at E = 104k / 250k / 500k / 1M: where does efficiency
     fall off?
  4. kB-only loop at 1M (operands as jit ARGS, not captured literals —
     the previous probe 413'd the remote compile with a 324 MB payload)
  5. x64 far-split compile check, FIRST touching the device in this
     process (prior runs hit an infra error right after failures)

Run ON the TPU host, nothing else using the chip:

    python scripts/exp_pallas_scale.py
"""

import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import _build, _cg_operands, banner, stage  # noqa: E402


def _bw(label, nbytes, dt_s):
    print(json.dumps({"metric": f"gbps[{label}]",
                      "value": round(nbytes / dt_s / 1e9, 1)}), flush=True)


def _time_chain(fn, x0, iters=50):
    """Per-iteration device time, dispatch latency differenced out.

    One dispatch of an N-iteration fori chain carries the full ~28 ms
    tunnel dispatch latency; dividing by N leaves ~28/N ms of fake
    per-iteration cost (the first run of this probe did exactly that and
    read 1.25 ms for a 0.29 ms apply).  Time chains of N and 2N
    iterations and difference them instead.  Delegates to
    ``utils.timing.time_step`` (salted inputs + scalar-pull sync:
    ``block_until_ready`` was measured returning before completion on
    the tunneled backend, and identical dispatches can be deduped).
    """
    from spectralelementmethod_tpu.utils import timing

    ts = timing.time_step(lambda v: fn(v), x0, reps=iters)
    t = ts["t_apply"]
    return t if t == t and t > 0 else 1e-9


def stage_x64():
    # Runs LAST: a failure here must not leave x64 on for other stages
    # (that is exactly what poisoned the first run of this probe — every
    # index-map literal traced as i64 and Mosaic refused the mixed
    # func.return; ops/pallas_kernels._im32 now pins them to int32).
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
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
    finally:
        jax.config.update("jax_enable_x64", False)


def stage_copy():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = 81

    def copy_kernel(u_ref, o_ref):
        o_ref[:] = 2.0 * u_ref[:]

    def multi_kernel(a_ref, b_ref, c_ref, d_ref, o1_ref, o2_ref):
        s = a_ref[:] + b_ref[:].astype(jnp.float32)
        t = c_ref[:] * d_ref[:].astype(jnp.float32)
        o1_ref[:] = s + t
        o2_ref[:] = (s - t).astype(o2_ref.dtype)

    for E in (131_072, 524_288, 1_048_576):
        rng = np.random.RandomState(0)
        u = jnp.asarray(rng.standard_normal((n, E)).astype(np.float32))
        ub = u.astype(jnp.bfloat16)
        for TE in (1024, 2048, 4096, 8192):
            if E % TE:
                continue
            G = E // TE
            spec = pl.BlockSpec((n, TE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

            def copy_call(x):
                return pl.pallas_call(
                    copy_kernel,
                    out_shape=jax.ShapeDtypeStruct((n, E), jnp.float32),
                    grid=(G,), in_specs=[spec], out_specs=spec)(x)

            dt = _time_chain(copy_call, u)
            _bw(f"copy-E{E}-TE{TE}", 2 * n * E * 4, dt)

            # 4 in + 2 out, double-buffered: stays under the 16 MB scoped
            # VMEM limit only for TE <= 4096 (81*TE*(4+2)*3*2 bytes)
            if n * TE * 18 * 2 > 15e6:
                continue

            def multi_call(x):
                return pl.pallas_call(
                    multi_kernel,
                    out_shape=(jax.ShapeDtypeStruct((n, E), jnp.float32),
                               jax.ShapeDtypeStruct((n, E), jnp.bfloat16)),
                    grid=(G,), in_specs=[spec] * 4,
                    out_specs=(spec, spec))(x, ub, x, ub)[0]

            dt = _time_chain(multi_call, u)
            _bw(f"multi-E{E}-TE{TE}", n * E * (4 + 2 + 4 + 2 + 4 + 2), dt)


def stage_apply_scale():
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.utils.hoist import hoist_closure
    import jax

    for nx in (316, 500, 707, 1000):
        prob, ex, Gf, Dhat, a, Kcat = _build(nx)
        A = pallas_kernels.make_fused_affine_laplacian_T(
            ex, Kcat, a, precision="highest")
        prep = A._prep
        rng = np.random.RandomState(0)
        uT = jnp.asarray(
            rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))

        def step(x):
            y = A(x)
            return y * jax.lax.rsqrt(jnp.vdot(y, y).real + 1e-30)

        dt = _time_chain(step, uT, iters=30)
        # apply traffic: u in (window factor), out, + G epilogue noise
        wf = (prep.TE + 2 * prep.Hb) / prep.TE
        nbytes = ex.n_loc * ex.E * 4 * (wf + 1)
        print(json.dumps({
            "metric": f"apply_ms[E{ex.E}-TE{prep.TE}-Hb{prep.Hb}]",
            "value": round(dt * 1e3, 3),
            "eff_gbps": round(nbytes / dt / 1e9, 1),
        }), flush=True)
        del A, uT, prob, ex


def stage_kb_only():
    import jax
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    prob, ex, Gf, Dhat, a, Kcat = _build(1000)
    b0, inv_d, wf_d = _cg_operands(prob, ex)
    kA, kB, G = pallas_kernels.make_fused_cg_kernels(
        ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16)
    prep = kA._prep
    print(f"TE={prep.TE} Hb={prep.Hb} G={prep.G} far={prep.has_far}",
          flush=True)
    p0 = jnp.zeros_like(b0, dtype=jnp.bfloat16)
    x0 = jnp.zeros_like(b0)
    pA, ApA, xA, dA = kA(b0, p0, inv_d, x0, 0.5, 0.5)
    ApA = jax.block_until_ready(ApA)

    iters = 50

    @jax.jit
    def chain_b(r, Ap, inv, wf):
        # inv/wf must be jit ARGS: captured they inline as (81, 1M)
        # HLO literals and 413 the remote compile (324 MB payload)
        def body(i, r):
            r2, rz, rn = kB(r, Ap, inv, wf, 0.3)
            return r2
        return jax.lax.fori_loop(0, iters, body, r)

    out = chain_b(b0, ApA, inv_d, wf_d)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain_b(b0, ApA, inv_d, wf_d))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"metric": "ms_per_iter[1m-kB-only]",
                      "value": round(best / iters * 1e3, 3)}), flush=True)


def main():
    stage("pallas streaming scale", stage_copy)
    stage("fused apply size scaling", stage_apply_scale)
    stage("1M kB-only", stage_kb_only)
    stage("x64 far-split compile check", stage_x64)
    banner("all stages done")


if __name__ == "__main__":
    main()
