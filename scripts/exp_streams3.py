"""Honest (salted, scalar-synced) streaming-bandwidth probes at HBM scale.

The round-2e/2f stream experiments (`exp_dma_streams`, `exp_pallas_scale`)
predate `utils/timing.py` and produced physically impossible numbers
(22M GB/s) — the tunneled backend dedups identical dispatches and its
block_until_ready returns early.  This probe re-asks the open questions
with `time_step` (per-call-unique salt + scalar host pull):

  1. XLA ceiling at 1M: tanh (2 passes) and an 8-in/1-out add on
     (81, 1M) f32.  Is XLA really at ~660 GB/s where Pallas sits at 300?
  2. Pallas copy, k = 1/2/4/8 concurrent operand streams (the element
     axis pre-split across k refs).  Does bandwidth scale with stream
     count?
  3. Pallas copy, block height sweep (TE = 512..8192) at k=1.
  4. Pallas copy with `dimension_semantics=("arbitrary",)`.

Run ON the TPU host:  python scripts/exp_streams3.py

Measured (v5e, 2026-08-19, honest timing):

  xla-tanh-1M 612-622 GB/s; xla-add8-1M (9 streams) 684 GB/s
  pallas-copy k1/k2/k4: 311 / 322 / 394 GB/s (k8: scoped-VMEM OOM,
      16 MB stack limit — see exp_buffered.py)
  pallas-copy TE 512/1024/2048/4096/8192: 255/280/311/319/308 GB/s
  dimension_semantics parallel vs arbitrary: 310 vs 315 (no effect)

Conclusion: the Pallas copy ceiling at HBM scale is ~310-320 GB/s —
half of XLA's sustained rate on identical arrays — independent of
block size and semantics; concurrent operand streams help sublinearly.
The double-buffered pipeline (~2 outstanding DMAs/operand) is the
suspect; `exp_buffered.py` probes pl.Buffered pipeline depths.
"""

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


def _bw(label, nbytes, dt_s, extra=""):
    print(json.dumps({"metric": f"gbps[{label}]",
                      "value": round(nbytes / dt_s / 1e9, 1),
                      "ms": round(dt_s * 1e3, 3), "note": extra}),
          flush=True)


def time_list_step(step, xs0, reps=30, tries=3):
    """Like timing.time_step but for steps mapping a LIST of arrays to a
    same-shaped list (needed for k-stream probes)."""
    salt_ctr = iter(range(1, 1 << 30))

    @jax.jit
    def chain(xs, n, salt):
        xs = [x * (1.0 + salt.astype(x.dtype)) for x in xs]

        def body(i, v):
            return step(v)

        return jax.lax.fori_loop(0, n, body, xs)

    def run(n):
        best = float("inf")
        for _ in range(tries):
            s = jnp.asarray(next(salt_ctr) * 1e-7, jnp.float32)
            t0 = time.perf_counter()
            sync(chain(xs0, n, s))
            best = min(best, time.perf_counter() - t0)
        return best

    sync(chain(xs0, reps, jnp.asarray(0.0, jnp.float32)))   # compile
    n = reps
    t_n, t_2n = run(n), run(2 * n)
    while t_2n - t_n < 0.05 * t_n and n < 4096:
        n *= 4
        t_n, t_2n = run(n), run(2 * n)
    dt = t_2n - t_n
    return dt / n if dt > 0 else float("nan")


def make_parts(k, seed=0):
    Ek = E // k
    rs = np.random.RandomState(seed)
    return [jnp.asarray(rs.standard_normal((N, Ek)).astype(np.float32))
            for _ in range(k)]


def stage_xla():
    (u,) = make_parts(1)
    dt = time_list_step(lambda xs: [jnp.tanh(xs[0])], [u])
    _bw("xla-tanh-1M", 2 * N * E * 4, dt)

    # 8 reads + 1 write per step; the extra arrays ride the loop carry
    # (closing over them would bake 2.4 GB of HLO constants — the exact
    # payload-overflow failure utils/hoist.py exists to prevent)
    def add8(xs):
        s = xs[0]
        for v in xs[1:]:
            s = s + v
        return [s * 0.125] + xs[1:]

    xs0 = [jax.device_put(u * (1.0 + 0.125 * i)).block_until_ready()
           for i in range(8)]        # 8 full (N, E) streams, ~2.7 GB
    dt = time_list_step(add8, xs0)
    _bw("xla-add8-1M", 9 * N * E * 4, dt)


def copy_step(k, TE, dimsem=None):
    Ek = E // k
    G = Ek // TE
    spec = pl.BlockSpec((N, TE), lambda i: (0, i))
    kwargs = {}
    if dimsem is not None:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(dimsem,))

    def kernel(*refs):
        for i_ref, o_ref in zip(refs[:k], refs[k:]):
            o_ref[:] = 2.0 * i_ref[:]

    def step(xs):
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((N, Ek), jnp.float32)
                            for _ in range(k)),
            grid=(G,), in_specs=[spec] * k, out_specs=tuple([spec] * k),
            **kwargs)(*xs)
        return list(outs)

    return step


def stage_streams():
    for k in (1, 2, 4, 8):
        xs = make_parts(k)
        dt = time_list_step(copy_step(k, 2048), xs)
        _bw(f"pallas-copy-k{k}", 2 * N * E * 4, dt)


def stage_blocks():
    xs = make_parts(1)
    for TE in (512, 1024, 2048, 4096, 8192):
        dt = time_list_step(copy_step(1, TE), xs)
        _bw(f"pallas-copy-TE{TE}", 2 * N * E * 4, dt)


def stage_dimsem():
    xs = make_parts(1)
    for ds in ("parallel", "arbitrary"):
        dt = time_list_step(copy_step(1, 2048, dimsem=ds), xs)
        _bw(f"pallas-copy-{ds}", 2 * N * E * 4, dt)


def main():
    print(jax.devices(), flush=True)
    for name, fn in [("xla", stage_xla), ("streams", stage_streams),
                     ("blocks", stage_blocks), ("dimsem", stage_dimsem)]:
        t0 = time.time()
        try:
            fn()
            print(f"[{name}: ok in {time.time()-t0:.1f}s]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}: FAILED {e!r}]", flush=True)


if __name__ == "__main__":
    main()
