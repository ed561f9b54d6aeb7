"""Probe: chip matmul peak (XLA + pallas) and aligned-shape variants.

All timings run as one jitted fori_loop chain (per-dispatch tunnel latency
would otherwise dominate).  Development tool, not part of the suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain(f, x0, reps=30):
    @jax.jit
    def run(x):
        def body(i, x):
            y = f(x)
            return y * jax.lax.rsqrt(
                jnp.vdot(y, y).real.astype(y.dtype) + 1e-30)
        return jax.lax.fori_loop(0, reps, body, x)

    run(x0).block_until_ready()
    t0 = time.perf_counter()
    run(x0).block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    P = jax.lax.Precision
    rng = np.random.RandomState(0)

    # chip peak: big square matmul chains A @ X
    N = 4096
    A32 = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    X32 = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    for prec, label in [(P.DEFAULT, "xla f32 def"), (P.HIGHEST, "xla f32 hi")]:
        t = chain(lambda x: jnp.dot(A32, x, precision=prec), X32)
        print(f"{label:16s} {2*N**3/t/1e12:7.1f} TFLOP/s", flush=True)
    Ab = A32.astype(jnp.bfloat16)
    t = chain(lambda x: jnp.dot(Ab, x.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32), X32)
    print(f"{'xla bf16':16s} {2*N**3/t/1e12:7.1f} TFLOP/s", flush=True)

    # the fused-apply matmul shape in XLA, both orientations
    Epad = 98304
    for (n, m) in [(81, 243), (128, 384)]:
        x = jnp.asarray(rng.standard_normal((n, Epad)).astype(np.float32))
        K = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

        def fK(u):
            V = jax.lax.dot_general(
                K, u, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=P.DEFAULT)
            return V[:n] + V[n:2 * n] + V[2 * n:]
        t = chain(fK, x)
        print(f"xla K({m},{n})@u(n,{Epad}): {t*1e3:7.3f} ms "
              f"{2*m*n*Epad/t/1e12:6.2f} TFLOP/s", flush=True)

        xT = jnp.asarray(np.asarray(x).T.copy())
        KT2 = jnp.asarray(np.asarray(K).T.copy())

        def fU(u):
            V = jax.lax.dot_general(
                u, KT2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=P.DEFAULT)
            return V[:, :n] + V[:, n:2 * n] + V[:, 2 * n:]
        t = chain(fU, xT)
        print(f"xla u({Epad},{n})@K(n,{m}): {t*1e3:7.3f} ms "
              f"{2*m*n*Epad/t/1e12:6.2f} TFLOP/s", flush=True)

    # pallas aligned variant (chained)
    for (n, m, TE) in [(81, 243, 4096), (128, 384, 4096)]:
        G = Epad // TE
        x = jnp.asarray(rng.standard_normal((n, Epad)).astype(np.float32))
        K = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
        spec_c = pl.BlockSpec((n, TE), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((m, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

        def kern(x_ref, k_ref, o_ref):
            V = jax.lax.dot_general(
                k_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=P.DEFAULT)
            o_ref[:] = V[:n] + V[n:2 * n] + V[2 * n:]

        def f(x):
            return pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((n, Epad), x.dtype),
                grid=(G,), in_specs=[spec_c, kspec], out_specs=spec_c)(x, K)
        t = chain(f, x)
        print(f"pallas K({m},{n}) TE={TE}: {t*1e3:7.3f} ms "
              f"{2*m*n*Epad/t/1e12:6.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
