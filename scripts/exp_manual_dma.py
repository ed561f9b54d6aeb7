"""Manual k-deep DMA pipelining vs the Pallas grid pipeline at 1M.

exp_streams3/exp_buffered established (honest timing, v5e):
  - Pallas grid-pipelined copy ceiling ~310-320 GB/s on (81, 1M) f32,
    flat across TE 512..8192 and dimension semantics
  - pl.Buffered(buffer_count > 2) is rejected by Mosaic lowering
  - XLA streams the same arrays at 612-684 GB/s

Hypothesis: the double-buffered pipeline holds only ~2 outstanding
DMAs per operand; DMA issue latency then caps throughput.  Two tests:

  1. Giant blocks under a raised vmem_limit_bytes (TE 16384..65536,
     default pipeline): latency amortization via block size.
  2. A manual pipeline: input/output left in ANY (HBM), the kernel
     issues its own async copies k deep (k = 2, 4, 8) from a k-slot
     VMEM scratch ring.

Run ON the TPU host:  python scripts/exp_manual_dma.py
(--manual-only skips the giant-block grid stages)

Measured (v5e, 2026-08-19, honest timing) — BOTH hypotheses refuted:

  grid pipeline, giant blocks under 100 MB cap:
      TE 16384 / 32768 / 65536: 296 / 301 / 299 GB/s (flat — a 21 MB
      block DMA runs no faster than a 0.7 MB one)
  manual k-deep async-copy ring (80 rows, separate in/out semaphores):
      d2/d4/d8 @ TE2048: 331 / 328 / 337 GB/s
      d4 @ TE8192: 335;  d8 @ TE512: 333

Conclusion: ~330 GB/s is a hard ceiling for kernel-issued (custom-call)
HBM streaming on this chip — independent of pipeline depth, block size,
issue mechanism, and dimension semantics; concurrent operand streams
cap it at ~394 (exp_streams3 k4).  XLA fusions stream the same arrays
at 612-684 GB/s.  Note 2.26 ms for the 678 MB copy ~= read at ~620 +
write at ~620 run BACK TO BACK: kernel DMAs appear not to overlap the
read and write directions, while XLA fusions do.  Design rule: Pallas
kernels win by eliminating passes (fusion), not by out-streaming XLA;
at HBM scale expect ~330-400 GB/s effective inside kernels.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spectralelementmethod_tpu.utils.timing import sync

N = 81
E = 1_048_576
CAP = 100 * 1024 * 1024


def _bw(label, nbytes, dt_s, extra=""):
    print(json.dumps({"metric": f"gbps[{label}]",
                      "value": round(nbytes / dt_s / 1e9, 1),
                      "ms": round(dt_s * 1e3, 3), "note": extra}),
          flush=True)


def time_step(step, x0, reps=30, tries=3):
    salt_ctr = iter(range(1, 1 << 30))

    @jax.jit
    def chain(x, n, salt):
        x = x * (1.0 + salt.astype(x.dtype))
        return jax.lax.fori_loop(0, n, lambda i, v: step(v), x)

    def run(n):
        best = float("inf")
        for _ in range(tries):
            s = jnp.asarray(next(salt_ctr) * 1e-7, jnp.float32)
            t0 = time.perf_counter()
            sync(chain(x0, n, s))
            best = min(best, time.perf_counter() - t0)
        return best

    sync(chain(x0, reps, jnp.asarray(0.0, jnp.float32)))
    n = reps
    t_n, t_2n = run(n), run(2 * n)
    while t_2n - t_n < 0.05 * t_n and n < 4096:
        n *= 4
        t_n, t_2n = run(n), run(2 * n)
    dt = t_2n - t_n
    return dt / n if dt > 0 else float("nan")


def grid_copy_step(TE, cap=None):
    G = E // TE
    spec = pl.BlockSpec((N, TE), lambda i: (0, i))
    kwargs = {}
    if cap:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=cap)

    def kernel(i_ref, o_ref):
        o_ref[:] = 2.0 * i_ref[:]

    def step(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((N, E), jnp.float32),
            grid=(G,), in_specs=[spec], out_specs=spec, **kwargs)(x)

    return step


def manual_copy_step(TE, depth, cap=CAP, rows=80):
    # explicit DMAs require 8-aligned sublane extents ("Slice shape
    # along dimension 0 must be aligned to tiling (8), but is 81") —
    # the bandwidth question is shape-independent, so probe at 80 rows
    G = E // TE
    assert G >= depth

    def kernel(x_hbm, o_hbm):
        def body(sin, sout, isem, osem):
            def in_dma(slot, i):
                return pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(i * TE, TE)], sin.at[slot],
                    isem.at[slot])

            def out_dma(slot, i):
                return pltpu.make_async_copy(
                    sout.at[slot], o_hbm.at[:, pl.ds(i * TE, TE)],
                    osem.at[slot])

            for k in range(depth):
                in_dma(k, k).start()

            def loop(i, _):
                slot = jax.lax.rem(i, depth)
                in_dma(slot, i).wait()

                @pl.when(i >= depth)
                def _():
                    out_dma(slot, i - depth).wait()

                sout[slot] = 2.0 * sin[slot]
                out_dma(slot, i).start()

                @pl.when(i + depth < G)
                def _():
                    in_dma(slot, i + depth).start()

                return _

            jax.lax.fori_loop(0, G, lambda i, c: (loop(i, c), None)[1],
                              None)
            for j in range(G - depth, G):
                out_dma(j % depth, j).wait()

        pl.run_scoped(
            body,
            sin=pltpu.VMEM((depth, rows, TE), jnp.float32),
            sout=pltpu.VMEM((depth, rows, TE), jnp.float32),
            isem=pltpu.SemaphoreType.DMA((depth,)),
            osem=pltpu.SemaphoreType.DMA((depth,)),
        )

    def step(x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((rows, E), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=cap),
        )(x)

    return step


def main():
    print(jax.devices(), flush=True)
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.standard_normal((N, E)).astype(np.float32))

    def stage(label, fn, x=None, rows=N):
        x = x0 if x is None else x
        t0 = time.time()
        try:
            dt = time_step(fn, x)
            _bw(label, 2 * rows * E * 4, dt)
        except Exception as e:  # noqa: BLE001
            print(f"[{label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}]", flush=True)
        else:
            print(f"[{label}: ok in {time.time()-t0:.1f}s]", flush=True)

    if "--manual-only" not in sys.argv:
        for TE in (16384, 32768, 65536):
            stage(f"grid-TE{TE}-cap", grid_copy_step(TE, cap=CAP))
    x80 = x0[:80]
    for depth, TE in ((2, 2048), (4, 2048), (8, 2048), (4, 8192),
                      (8, 512)):
        stage(f"manual-d{depth}-TE{TE}", manual_copy_step(TE, depth),
              x=x80, rows=80)


if __name__ == "__main__":
    main()
