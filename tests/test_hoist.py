"""Closure hoisting (inline-literal avoidance)."""

import jax
import jax.numpy as jnp
import numpy as np

from spectralelementmethod_tpu.utils.hoist import hoist_closure


def test_hoist_matches_and_shrinks_hlo():
    big = jnp.asarray(np.random.RandomState(0).standard_normal(
        (2000, 81)).astype(np.float32))
    mask = jnp.asarray(np.arange(2000) % 3 == 0)

    def f(u):
        return jnp.where(mask[:, None], u * big, 0.0).sum(axis=1)

    u = jnp.ones((2000, 81), jnp.float32)
    pure, consts = hoist_closure(f, u)
    assert len(consts) >= 2
    np.testing.assert_allclose(np.asarray(pure(u, *consts)),
                               np.asarray(f(u)), rtol=1e-6)

    inline_len = len(jax.jit(f).lower(u).as_text())
    hoisted_len = len(
        jax.jit(lambda u, c: pure(u, *c)).lower(u, tuple(consts)).as_text()
    )
    assert hoisted_len < inline_len / 10


def test_hoist_multiple_args_and_scalar_out():
    w = jnp.asarray([2.0, 3.0])

    def dot2(a, b):
        return jnp.vdot(a * w, b)

    a = jnp.asarray([1.0, 1.0])
    b = jnp.asarray([5.0, 7.0])
    pure, consts = hoist_closure(dot2, a, b)
    assert float(pure(a, b, *consts)) == float(dot2(a, b))


def test_hoist_traceable_in_while_loop():
    big = jnp.asarray(np.ones((64, 8), np.float32) * 0.5)

    def f(u):
        return u * big

    u = jnp.ones((64, 8), jnp.float32)
    pure, consts = hoist_closure(f, u)

    @jax.jit
    def run(u, c):
        def body(state):
            u, k = state
            return pure(u, *c), k + 1

        return jax.lax.while_loop(lambda s: s[1] < 3, body, (u, 0))

    out, k = run(u, tuple(consts))
    np.testing.assert_allclose(np.asarray(out), 0.125)


def test_hoist_cache_stable_for_bound_methods():
    """exchange.dot-style bound methods must hit the cache across accesses
    (attribute access creates a fresh bound-method object each time)."""

    class Holder:
        w = jnp.asarray([2.0, 1.0])

        def dot(self, a, b):
            return jnp.vdot(a * self.w, b)

    h = Holder()
    a = jnp.asarray([1.0, 2.0])
    p1, c1 = hoist_closure(h.dot, a, a)
    p2, c2 = hoist_closure(h.dot, a, a)   # fresh bound method object
    assert p1 is p2
    assert float(p1(a, a, *c1)) == float(h.dot(a, a))


def test_hoist_cache_distinguishes_shapes():
    big = jnp.asarray(np.ones((4, 4), np.float32))

    def f(u):
        return u * big[: u.shape[0], : u.shape[1]]

    p1, _ = hoist_closure(f, jnp.ones((4, 4), jnp.float32))
    p2, _ = hoist_closure(f, jnp.ones((2, 4), jnp.float32))
    assert p1 is not p2
