"""Decide: is there a fixed per-op/per-iteration overhead on this backend?

Times the same op under different chain constructions and rep counts.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(run, x0):
    run(x0).block_until_ready()
    t0 = time.perf_counter()
    run(x0).block_until_ready()
    return time.perf_counter() - t0


def main():
    E, n = 20000, 81
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))
    print(f"device={jax.devices()[0]}", flush=True)

    def make_chain(f, reps, mode):
        @jax.jit
        def run(x):
            def body(i, x):
                y = f(x)
                if mode == "norm":
                    return y * jax.lax.rsqrt(
                        jnp.vdot(y, y).astype(y.dtype) + 1e-30)
                return y * jnp.float32(1.0 + 1e-9)
            return jax.lax.fori_loop(0, reps, body, x)
        return run

    op = lambda x: x + jnp.roll(x, 1, axis=0)

    for reps in (10, 50, 200):
        for mode in ("const", "norm"):
            t = timeit(make_chain(op, reps, mode), v)
            print(f"roll_add reps={reps:4d} mode={mode:6s} "
                  f"total={t*1e3:9.3f} ms  per-rep={t/reps*1e6:9.1f} us",
                  flush=True)

    # does time scale with ops-per-iteration?
    def op4(x):
        return (jnp.roll(x, 1, axis=0) + jnp.roll(x, -1, axis=0)
                + jnp.roll(x, 2, axis=0) + jnp.roll(x, -2, axis=0))

    for mode in ("const", "norm"):
        t = timeit(make_chain(op4, 50, mode), v)
        print(f"roll_x4  reps=  50 mode={mode:6s} total={t*1e3:9.3f} ms  "
              f"per-rep={t/50*1e6:9.1f} us", flush=True)

    # single dispatch round-trip
    f1 = jax.jit(lambda x: x + 1.0)
    f1(v).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        f1(v).block_until_ready()
    print(f"single dispatch (x+1): {(time.perf_counter()-t0)/10*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
