"""Find the per-iteration overhead floor of chained ops on the backend."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chain(f, x0, reps=50, norm=True):
    @jax.jit
    def run(x):
        def body(i, x):
            y = f(x)
            if norm:
                y = y * jax.lax.rsqrt(
                    jnp.vdot(y, y).astype(y.dtype) + 1e-30)
            return y
        return jax.lax.fori_loop(0, reps, body, x)

    run(x0).block_until_ready()
    t0 = time.perf_counter()
    run(x0).block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=20000)
    args = ap.parse_args()
    E, n = args.elements, 81
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))
    print(f"E={E} device={jax.devices()[0]}")

    results = {}
    results["mul_norm"] = chain(lambda x: x * 1.0001, u)
    results["mul_nonorm"] = chain(lambda x: x * 1.0001, u, norm=False)
    results["roll_norm"] = chain(lambda x: jnp.roll(x, 5, axis=0), u)
    results["sum_rows"] = chain(
        lambda x: x + jnp.sum(x, axis=1, keepdims=True), u)
    idx = jnp.asarray(np.random.RandomState(1).permutation(E))
    results["perm_gather_rows"] = chain(lambda x: x[idx], u)
    flat_idx = jnp.asarray(np.random.RandomState(2).permutation(E * 4))
    u4 = jnp.asarray(
        np.random.RandomState(3).standard_normal(
            (E * 4, 7)).astype(np.float32))
    results["gather_E4x7"] = chain(lambda x: x[flat_idx], u4)

    for k, v in results.items():
        print(f"{k:18s} {v * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
