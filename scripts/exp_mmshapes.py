"""Probe: pallas matmul shape/alignment sweep for the fused apply.

Times KT (3n, n) @ u (n, TE) per block under: TE sweep, lane-aligned
padding (n 81->128, 3n 243->384), operand order swap. Development tool.
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


def chain(f, x0, reps=50):
    @jax.jit
    def run(x):
        def body(i, x):
            y = f(x)
            return y * jax.lax.rsqrt(jnp.vdot(y, y).astype(y.dtype) + 1e-30)
        return jax.lax.fori_loop(0, reps, body, x)

    run(x0).block_until_ready()
    t0 = time.perf_counter()
    run(x0).block_until_ready()
    return (time.perf_counter() - t0) / reps


def make_mm(n, m, Epad, TE, prec):
    """out (n, Epad) = combine(K (m, n) @ u (n, TE)) per block."""
    G = Epad // TE
    KT = jnp.asarray(np.random.RandomState(1)
                     .standard_normal((m, n)).astype(np.float32))
    spec_c = pl.BlockSpec((n, TE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((m, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    def kern(x_ref, k_ref, o_ref):
        V = jax.lax.dot_general(
            k_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        acc = V[:n]
        for j in range(1, m // n):
            acc = acc + V[j * n:(j + 1) * n]
        o_ref[:] = acc

    def f(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((n, Epad), x.dtype),
            grid=(G,), in_specs=[spec_c, kspec], out_specs=spec_c)(x, KT)
    return f


def make_mm_swapped(n, m, Epad, TE, prec):
    """same but dot(u^T-style): V = dot_general(u, K) contracting n."""
    G = Epad // TE
    K2 = jnp.asarray(np.random.RandomState(1)
                     .standard_normal((n, m)).astype(np.float32))
    spec_c = pl.BlockSpec((n, TE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((n, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    def kern(x_ref, k_ref, o_ref):
        # (TE, m) = x^T (TE, n) @ K (n, m): contract dim0 of x with dim0 of K
        V = jax.lax.dot_general(
            x_ref[:], k_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (TE, m)
        acc = V[:, :n]
        for j in range(1, m // n):
            acc = acc + V[:, j * n:(j + 1) * n]
        o_ref[:] = acc.T

    def f(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((n, Epad), x.dtype),
            grid=(G,), in_specs=[spec_c, kspec], out_specs=spec_c)(x, K2)
    return f


def main():
    Epad = 98304  # divisible by 2048/4096/8192/16384
    P = jax.lax.Precision
    rng = np.random.RandomState(0)

    for (n, m) in [(81, 243), (128, 384)]:
        x = jnp.asarray(rng.standard_normal((n, Epad)).astype(np.float32))
        for TE in (2048, 4096, 8192, 16384):
            for pname, prec in [("def", P.DEFAULT), ("hi", P.HIGHEST)]:
                try:
                    t = chain(make_mm(n, m, Epad, TE, prec), x)
                    gf = 2 * m * n * Epad / t / 1e9
                    print(f"n={n:3d} m={m:3d} TE={TE:5d} {pname:3s} "
                          f"{t*1e3:7.3f} ms  {gf:8.0f} GFLOP/s", flush=True)
                except Exception as e:
                    print(f"n={n} TE={TE} {pname}: {type(e).__name__}",
                          flush=True)
        # swapped orientation at TE=4096
        for pname, prec in [("def", P.DEFAULT), ("hi", P.HIGHEST)]:
            t = chain(make_mm_swapped(n, m, Epad, 4096, prec), x)
            gf = 2 * m * n * Epad / t / 1e9
            print(f"n={n:3d} m={m:3d} TE= 4096 swap-{pname:3s} "
                  f"{t*1e3:7.3f} ms  {gf:8.0f} GFLOP/s", flush=True)


if __name__ == "__main__":
    main()
