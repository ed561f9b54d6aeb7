"""Is the 1M-element Pallas efficiency gap a strided-DMA problem?

`exp_pallas_scale` measured a trivial copy kernel on (81, E) arrays at
~300 GB/s once E is HBM-resident (E >= 524288), while XLA's own vector
ops reach ~660 GB/s on the same shapes.  Hypothesis: the (81, TE) block
of an (81, E) array is a 2D-strided DMA — 81 rows of TE*4 bytes each,
separated by a 4 MB pitch at E=1M — and the per-row descriptor overhead
caps streaming.  A *tile-major* (G, 81, TE) layout makes each block one
contiguous chunk.

Stages (run ON the TPU host, nothing else using the chip):

  1. XLA reference: jit(2*u) on (81, E) at E = 524288 / 1048576
  2. tile-major copy kernel on (G, 81, TE) blocks, same sizes
  3. tile-major multi kernel (4 in / 2 out, the fused-CG operand count)

If tile-major restores ~2x, the fused kernels should switch the CG
state arrays to tile-major storage (the fused path never needs XLA
rolls; vector ops are elementwise and layout-agnostic).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage  # noqa: E402
from exp_pallas_scale import _time_chain  # noqa: E402


def _bw(label, nbytes, dt_s):
    print(json.dumps({"metric": f"gbps[{label}]",
                      "value": round(nbytes / dt_s / 1e9, 1)}), flush=True)


def stage_xla_ref():
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 81
    for E in (524_288, 1_048_576):
        u = jnp.asarray(np.random.RandomState(0)
                        .standard_normal((n, E)).astype(np.float32))
        dt = _time_chain(lambda x: 2.0 * x, u)
        _bw(f"xla-copy-E{E}", 2 * n * E * 4, dt)


def stage_tilemajor():
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

    for E in (524_288, 1_048_576):
        for TE in (1024, 2048, 4096):
            if E % TE:
                continue
            G = E // TE
            rng = np.random.RandomState(0)
            u = jnp.asarray(
                rng.standard_normal((G, n, TE)).astype(np.float32))
            ub = u.astype(jnp.bfloat16)
            spec = pl.BlockSpec((1, n, TE), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

            def copy_call(x):
                return pl.pallas_call(
                    copy_kernel,
                    out_shape=jax.ShapeDtypeStruct((G, n, TE), jnp.float32),
                    grid=(G,), in_specs=[spec], out_specs=spec)(x)

            dt = _time_chain(copy_call, u)
            _bw(f"tm-copy-E{E}-TE{TE}", 2 * n * E * 4, dt)

            if n * TE * 18 * 2 > 15e6:
                continue

            def multi_call(x):
                return pl.pallas_call(
                    multi_kernel,
                    out_shape=(
                        jax.ShapeDtypeStruct((G, n, TE), jnp.float32),
                        jax.ShapeDtypeStruct((G, n, TE), jnp.bfloat16)),
                    grid=(G,), in_specs=[spec] * 4,
                    out_specs=(spec, spec))(x, ub, x, ub)[0]

            dt = _time_chain(multi_call, u)
            _bw(f"tm-multi-E{E}-TE{TE}",
                n * E * (4 + 2 + 4 + 2 + 4 + 2), dt)


def main():
    stage("xla streaming reference", stage_xla_ref)
    stage("tile-major pallas streaming", stage_tilemajor)
    banner("all stages done")


if __name__ == "__main__":
    main()
