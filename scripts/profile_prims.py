"""Primitive-op timings on TPU: slices, updates, matmul precisions. Dev tool."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chain(f, x0, reps=50):
    @jax.jit
    def run(x):
        def body(i, x):
            y = f(x)
            return y * jnp.asarray(1.0 + 1e-9, y.dtype)
        return jax.lax.fori_loop(0, reps, body, x)

    run(x0).block_until_ready()
    t0 = time.perf_counter()
    run(x0).block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    E = 20000
    n = 81
    p1 = 9
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))
    v3 = v.reshape(E, p1, p1)
    x56 = jnp.asarray(rng.standard_normal((E, 56)).astype(np.float32))
    row = jnp.asarray(rng.standard_normal((E, p1)).astype(np.float32))
    Dh = jnp.asarray(rng.standard_normal((2 * n, n)).astype(np.float32))
    Dh128 = jnp.asarray(
        rng.standard_normal((256, 128)).astype(np.float32))
    v128 = jnp.asarray(rng.standard_normal((E, 128)).astype(np.float32))
    print(f"device={jax.devices()[0]}")

    t = {}
    def rec(k, f, x):
        t[k] = chain(f, x)
        print(f"{k:22s} {t[k] * 1e3:8.3f} ms", flush=True)
    rec("update_mid_lanes", lambda x: x.at[:, 4:60].set(x56), v)
    rec("read_mid_lanes", lambda x: x.at[:, 4:60].set(x[:, 4:60] * 1.01), v)
    rec("row_update", lambda x: x.at[:, 0, :].set(row), v3)
    rec("col_update", lambda x: x.at[:, :, 0].set(row), v3)
    rec("lane_gather4", lambda x: x.at[:, 0].set(
            x[:, 0] + x[:, n - 1] + x[:, n - p1] + x[:, 4]), v)
    rec("roll_add", lambda x: x + jnp.roll(x, 1, axis=0), v)

    for prec in ("default", "highest"):
        rec(f"mm_81x162_{prec}",
            lambda x, p=prec: jnp.einsum(
                "en,mn->em", x, Dh, precision=p)[:, :n], v)
    rec("mm_128x256",
        lambda x: jnp.einsum(
            "en,mn->em", x, Dh128, precision="default")[:, :128], v128)
    vb = v.astype(jnp.bfloat16)
    Dhb = Dh.astype(jnp.bfloat16)
    rec("mm_81x162_bf16",
        lambda x: jax.lax.dot_general(
            x, Dhb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32
        )[:, :n].astype(jnp.bfloat16), vb)

    for k, val in t.items():
        print(f"{k:22s} {val * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
