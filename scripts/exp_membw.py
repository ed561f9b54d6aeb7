"""Probe: raw Pallas/XLA memory bandwidth at the fused-kernel shapes.

Development tool, not part of the suite.
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
            return y * (1.0 + 1e-30 * y[0, 0])
        return jax.lax.fori_loop(0, reps, body, x)

    run(x0).block_until_ready()
    t0 = time.perf_counter()
    run(x0).block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    n, Epad, TE = 81, 100352, 2048
    G = Epad // TE
    x = jnp.asarray(np.random.RandomState(0)
                    .standard_normal((n, Epad)).astype(np.float32))
    nbytes = x.size * 4

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.000001

    spec_c = pl.BlockSpec((n, TE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)

    def pl_copy(x):
        return pl.pallas_call(
            copy_kernel, out_shape=jax.ShapeDtypeStruct((n, Epad), x.dtype),
            grid=(G,), in_specs=[spec_c], out_specs=spec_c)(x)

    def tri_kernel(a_ref, b_ref, c_ref, o_ref):
        o_ref[:] = (a_ref[:] + b_ref[:] + c_ref[:]) * 0.333333

    spec_l = pl.BlockSpec((n, TE), lambda i: (0, jnp.maximum(i - 1, 0)),
                          memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec((n, TE), lambda i: (0, jnp.minimum(i + 1, G - 1)),
                          memory_space=pltpu.VMEM)

    def pl_tri(x):
        return pl.pallas_call(
            tri_kernel, out_shape=jax.ShapeDtypeStruct((n, Epad), x.dtype),
            grid=(G,), in_specs=[spec_l, spec_c, spec_r],
            out_specs=spec_c)(x, x, x)

    # matmul-only kernel at kernel shapes (no halo)
    KT = jnp.asarray(np.random.RandomState(1)
                     .standard_normal((3 * n, n)).astype(np.float32))
    kspec = pl.BlockSpec((3 * n, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    def mm_kernel(x_ref, k_ref, o_ref):
        V = jax.lax.dot_general(
            k_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        o_ref[:] = V[:n] + V[n:2 * n] + V[2 * n:]

    def pl_mm(x):
        return pl.pallas_call(
            mm_kernel, out_shape=jax.ShapeDtypeStruct((n, Epad), x.dtype),
            grid=(G,), in_specs=[spec_c, kspec], out_specs=spec_c)(x, KT)

    def mm_kernel_def(x_ref, k_ref, o_ref):
        V = jax.lax.dot_general(
            k_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        o_ref[:] = V[:n] + V[n:2 * n] + V[2 * n:]

    def pl_mm_def(x):
        return pl.pallas_call(
            mm_kernel_def, out_shape=jax.ShapeDtypeStruct((n, Epad), x.dtype),
            grid=(G,), in_specs=[spec_c, kspec], out_specs=spec_c)(x, KT)

    cases = {
        "xla_scale": lambda x: x * 1.000001,
        "pallas_copy": pl_copy,
        "pallas_tri3read": pl_tri,
        "pallas_mm_highest": pl_mm,
        "pallas_mm_default": pl_mm_def,
    }
    for name, f in cases.items():
        t = chain(f, x)
        rw = {"xla_scale": 2, "pallas_copy": 2, "pallas_tri3read": 4,
              "pallas_mm_highest": 2, "pallas_mm_default": 2}[name]
        print(f"{name:20s} {t*1e3:8.3f} ms  {rw*nbytes/t/1e9:7.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
