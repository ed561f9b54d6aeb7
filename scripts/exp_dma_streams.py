"""Does Pallas streaming bandwidth scale with DMA stream count?

`exp_tilemajor` showed contiguous (tile-major) blocks stream no faster
than 2D-strided ones (~300 GB/s copy, 1 in + 1 out), while the 6-operand
kernel reaches ~500 GB/s — bandwidth appears bound per *operand stream*,
not by transfer shape.  If so, splitting one logical array across k
input refs (k concurrent DMA queues) should scale throughput.

Stages (run ON the TPU host):

  1. honest XLA reference: tanh chain (cannot be constant-folded, unlike
     the 2*x chain that produced nonsense in exp_tilemajor) and an
     8-array add reduce, on (81, E) f32 at E = 1M
  2. copy with the element axis split across k = 1 / 2 / 4 operand pairs
     (same total traffic, k DMA streams per direction)
  3. read-only (sum) and write-only (broadcast) kernels at k = 1 / 4,
     to see whether read and write streams share the ceiling
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage  # noqa: E402
from exp_pallas_scale import _time_chain  # noqa: E402

N = 81
E = 1_048_576
TE = 2048


def _bw(label, nbytes, dt_s):
    print(json.dumps({"metric": f"gbps[{label}]",
                      "value": round(nbytes / dt_s / 1e9, 1)}), flush=True)


def _u():
    import jax.numpy as jnp
    import numpy as np

    return jnp.asarray(
        np.random.RandomState(0).standard_normal((N, E)).astype(np.float32))


def stage_xla_ref():
    import jax
    import jax.numpy as jnp

    u = _u()
    dt = _time_chain(jnp.tanh, u, iters=30)
    _bw("xla-tanh", 2 * N * E * 4, dt)

    us = [u + float(i) for i in range(7)]

    def add8(x):
        s = x
        for v in us:
            s = s + v
        return s * (1.0 / 8.0)

    dt = _time_chain(add8, u, iters=30)
    _bw("xla-add8", 9 * N * E * 4, dt)


def stage_split_copy():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u = _u()

    for k in (1, 2, 4):
        Ek = E // k
        G = Ek // TE
        spec = pl.BlockSpec((N, TE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

        def kernel(*refs):
            ins, outs = refs[:k], refs[k:]
            for i_ref, o_ref in zip(ins, outs):
                o_ref[:] = 2.0 * i_ref[:]

        def call(x):
            parts = [jax.lax.slice_in_dim(x, j * Ek, (j + 1) * Ek, axis=1)
                     for j in range(k)]
            outs = pl.pallas_call(
                kernel,
                out_shape=tuple(
                    jax.ShapeDtypeStruct((N, Ek), jnp.float32)
                    for _ in range(k)),
                grid=(G,), in_specs=[spec] * k,
                out_specs=tuple([spec] * k))(*parts)
            return jnp.concatenate(outs, axis=1)

        # time the pallas region only: slice+concat add XLA passes, so
        # chain the raw call on pre-split parts instead
        parts0 = [jax.lax.slice_in_dim(u, j * Ek, (j + 1) * Ek, axis=1)
                  for j in range(k)]

        def chain_fn(xs):
            outs = pl.pallas_call(
                kernel,
                out_shape=tuple(
                    jax.ShapeDtypeStruct((N, Ek), jnp.float32)
                    for _ in range(k)),
                grid=(G,), in_specs=[spec] * k,
                out_specs=tuple([spec] * k))(*xs)
            return list(outs)

        dt = _time_chain(chain_fn, parts0, iters=30)
        _bw(f"split-copy-k{k}", 2 * N * E * 4, dt)


def stage_rw_only():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    u = _u()

    for k in (1, 4):
        Ek = E // k
        G = Ek // TE
        spec = pl.BlockSpec((N, TE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        ssum = pl.BlockSpec((1, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

        def rd_kernel(*refs):
            ins, outs = refs[:k], refs[k:]
            for i_ref, o_ref in zip(ins, outs):
                acc = jnp.sum(i_ref[:], axis=0, keepdims=True)
                o_ref[:] = jax.lax.slice(acc, (0, 0), (1, 128))

        def rd_chain(xs):
            outs = pl.pallas_call(
                rd_kernel,
                out_shape=tuple(
                    jax.ShapeDtypeStruct((1, 128), jnp.float32)
                    for _ in range(k)),
                grid=(G,), in_specs=[spec] * k,
                out_specs=tuple([ssum] * k))(*xs)
            # keep a data dependency chain: fold the scalars back in
            # (x1e-30, not x0.0 — the algebraic simplifier would DCE
            # the whole read otherwise)
            return [x + o[0, 0] * 1e-30 for x, o in zip(xs, outs)]

        parts0 = [jax.lax.slice_in_dim(u, j * Ek, (j + 1) * Ek, axis=1)
                  for j in range(k)]
        dt = _time_chain(rd_chain, parts0, iters=30)
        # rd_chain adds one XLA in+out pass over E for the dependency
        _bw(f"read-k{k}+xlapass", 3 * N * E * 4, dt)


def main():
    stage("xla reference (honest)", stage_xla_ref)
    stage("split copy streams", stage_split_copy)
    stage("read-only streams", stage_rw_only)
    banner("all stages done")


if __name__ == "__main__":
    main()
