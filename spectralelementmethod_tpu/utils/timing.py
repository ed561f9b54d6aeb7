"""Robust device timing for remote/async JAX backends.

Two failure modes of naive ``block_until_ready()`` timing were measured
on the tunneled TPU backend (2026-08-18 session):

* ``block_until_ready`` can return BEFORE the computation finishes
  (async completion signalling), so ``t = time(dispatch + block)``
  under-reports arbitrarily — a 12800-apply chain "completed" in 0.0 ms.
* repeated dispatches with bit-identical arguments can resolve to an
  already-computed result, so best-of-N timing loops measure a cache
  roundtrip instead of execution.

A host pull of a scalar that data-depends on the result always waits
for real completion (it cannot fabricate the bytes), and salting the
input with a per-call-unique constant defeats any dispatch dedup.  The
helpers here package that: ``sync(x)`` forces completion; ``time_chain``
times an ``f(x) -> y``-shaped step by running salted, chained
``fori_loop`` blocks of N and 2N reps and differencing (subtracts the
dispatch/sync roundtrip AND any fixed per-call overhead).
"""

from __future__ import annotations

import time

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def sync(x) -> float:
    """Force device completion of ``x`` via a scalar host pull.

    Returns the pulled scalar (sum over a flat slice) so callers can
    also use it as a cheap checksum.
    """
    leaves = jax.tree_util.tree_leaves(x)
    acc = 0.0
    for leaf in leaves:
        v = jnp.ravel(leaf)[:1]
        acc += float(v[0].real) if jnp.iscomplexobj(v) else float(v[0])
    return acc


@partial(jax.jit, static_argnums=(0,))
def _chain(step, x, n_reps, salt, *consts):
    """n_reps chained applications of ``step`` on a salted input.

    ``consts`` pass through to ``step(v, *consts)`` — operator operands
    hoisted out of the closure (:func:`.hoist.hoist_closure`) so large
    arrays travel as runtime arguments, not inline HLO literals.
    """
    x = x * (1.0 + salt.astype(x.dtype))

    def body(i, v):
        return step(v, *consts)

    return jax.lax.fori_loop(0, n_reps, body, x)


def time_step(step: Callable, x0, reps: int = 50, tries: int = 3,
              max_reps: int = 4096, consts=()) -> dict:
    """Per-application seconds of ``step`` (y = step(x, *consts), same
    shape as x).

    Dispatch-differenced: times salted chains of ``reps`` and
    ``2 * reps`` applications (best of ``tries``, each call's salt
    unique) and divides the difference.  Grows ``reps`` until the two
    differ by >5%; reports ``reliable=False`` if they never do, and
    refuses (t=nan) when the implied time is non-positive.

    ``step`` must be jittable and shape-preserving.  The chain is
    jitted once per (step, shape); pass a stable function object.
    """
    salt_ctr = iter(range(1, 1 << 30))
    consts = tuple(consts)

    def run(n):
        best = float("inf")
        for _ in range(tries):
            s = jnp.asarray(next(salt_ctr) * 1e-7, jnp.float32)
            t0 = time.perf_counter()
            sync(_chain(step, x0, n, s, *consts))
            best = min(best, time.perf_counter() - t0)
        return best

    sync(_chain(step, x0, reps, jnp.asarray(0.0, jnp.float32),
                *consts))                                    # compile
    t_n, t_2n = run(reps), run(2 * reps)
    reliable = True
    while t_2n - t_n < 0.05 * t_n and reps < max_reps:
        reps *= 4
        t_n, t_2n = run(reps), run(2 * reps)
    if t_2n - t_n < 0.05 * t_n:
        reliable = False
    dt = t_2n - t_n
    t_apply = dt / reps if dt > 0 else float("nan")
    return {"t_apply": t_apply, "reliable": reliable and dt > 0,
            "reps": reps, "t_n": t_n, "t_2n": t_2n}
