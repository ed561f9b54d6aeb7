"""Pallas pipeline-depth probe: pl.Buffered + vmem_limit_bytes at 1M.

exp_streams3 (honest timing) measured the Pallas copy ceiling at
~310-320 GB/s on (81, 1M) f32 — half of XLA's 612-684 GB/s on the same
arrays — flat across block sizes (TE 512..8192), dimension semantics,
and only mildly improved by concurrent operand streams (k4: 394).
The default pipeline is double-buffered: ~2 outstanding DMAs/operand.

jax 0.9.0 exposes ``pl.BlockSpec(pipeline_mode=pl.Buffered(n))`` and
``pltpu.CompilerParams(vmem_limit_bytes=...)`` (the 16 MB scoped cap
that killed the k8-stream probe).  This measures:

  1. copy k1, TE=2048, buffer_count in {2, 3, 4, 8}, 96 MB vmem cap
  2. copy k1, TE=8192, buffer_count 4 (big blocks x deep pipeline)
  3. 8-stream copy retry under the raised cap
  4. 6-operand (4-in/2-out, fused-CG shape) with buffer_count 4

Run ON the TPU host:  python scripts/exp_buffered.py

Measured (v5e, 2026-08-19): NEGATIVE on depth — Mosaic lowering rejects
``pl.Buffered(buffer_count > 2)`` ("Only single (1) and double (2)
buffering are supported").  copy-TE2048-buf2 306.7 GB/s (matches the
default); copy-k8 under the raised cap 289.3 (no win over k4's 394 —
the 16 streams contend); 6-operand fused-CG-shaped kernel 363.4 GB/s.
Deeper pipelining therefore needs manual DMA rings —
see exp_manual_dma.py.
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
VMEM_CAP = 100 * 1024 * 1024


def _bw(label, nbytes, dt_s, extra=""):
    print(json.dumps({"metric": f"gbps[{label}]",
                      "value": round(nbytes / dt_s / 1e9, 1),
                      "ms": round(dt_s * 1e3, 3), "note": extra}),
          flush=True)


def time_list_step(step, xs0, reps=30, tries=3):
    salt_ctr = iter(range(1, 1 << 30))

    @jax.jit
    def chain(xs, n, salt):
        xs = [x * (1.0 + salt.astype(x.dtype)) for x in xs]
        return jax.lax.fori_loop(0, n, lambda i, v: step(v), xs)

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


def copy_step(k, TE, nbuf=None, cap=None):
    Ek = E // k
    G = Ek // TE
    pm = pl.Buffered(buffer_count=nbuf) if nbuf else None
    spec = pl.BlockSpec((N, TE), lambda i: (0, i), pipeline_mode=pm)
    kwargs = {}
    if cap:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=cap)

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


def stage_depth():
    xs = make_parts(1)
    for nb in (2, 3, 4, 8):
        dt = time_list_step(copy_step(1, 2048, nbuf=nb, cap=VMEM_CAP), xs)
        _bw(f"copy-TE2048-buf{nb}", 2 * N * E * 4, dt)


def stage_big():
    xs = make_parts(1)
    for TE, nb in ((8192, 4), (4096, 8)):
        dt = time_list_step(copy_step(1, TE, nbuf=nb, cap=VMEM_CAP), xs)
        _bw(f"copy-TE{TE}-buf{nb}", 2 * N * E * 4, dt)


def stage_k8():
    xs = make_parts(8)
    dt = time_list_step(copy_step(8, 2048, cap=VMEM_CAP), xs)
    _bw("copy-k8-cap", 2 * N * E * 4, dt)
    dt = time_list_step(copy_step(8, 1024, nbuf=4, cap=VMEM_CAP), xs)
    _bw("copy-k8-TE1024-buf4", 2 * N * E * 4, dt)


def six_step(TE, nbuf=None, cap=VMEM_CAP):
    G = E // TE
    pm = pl.Buffered(buffer_count=nbuf) if nbuf else None
    spec = pl.BlockSpec((N, TE), lambda i: (0, i), pipeline_mode=pm)
    kwargs = {}
    if cap:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=cap)

    def kernel(a, b, c, d, o1, o2):
        o1[:] = a[:] + b[:]
        o2[:] = c[:] * d[:]

    def step(xs):
        o1, o2 = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((N, E), jnp.float32),) * 2,
            grid=(G,), in_specs=[spec] * 4, out_specs=(spec, spec),
            **kwargs)(*xs)
        return [o1, o2, xs[2], xs[3]]

    return step


def stage_six():
    rs = np.random.RandomState(1)
    xs = [jnp.asarray(rs.standard_normal((N, E)).astype(np.float32))
          for _ in range(4)]
    for nb in (None, 4):
        dt = time_list_step(six_step(1024, nbuf=nb), xs)
        _bw(f"six-TE1024-buf{nb or 2}", 6 * N * E * 4, dt)


def main():
    print(jax.devices(), flush=True)
    for name, fn in [("depth", stage_depth), ("big", stage_big),
                     ("k8", stage_k8), ("six", stage_six)]:
        t0 = time.time()
        try:
            fn()
            print(f"[{name}: ok in {time.time()-t0:.1f}s]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}]", flush=True)


if __name__ == "__main__":
    main()
