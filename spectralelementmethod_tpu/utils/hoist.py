"""Hoist closure-captured arrays out of functions before jitting.

``jax.jit`` lowers arrays captured in a function's closure as *inline HLO
literals*.  For operator closures over element-batched data this bloats
the compile payload by the full operator size (tens of MB per 10k
elements; gigabytes at 1M), slowing compiles and overflowing
remote-compile transports.  ``jax.closure_convert`` does not help here:
it only hoists closed-over *tracers* (its custom-derivative use case),
leaving concrete arrays baked.

:func:`hoist_closure` traces the function once, extracts every jaxpr
constant, and returns a pure function taking those constants as explicit
arguments — which jit then lowers as ordinary parameters.
"""

from __future__ import annotations

import sys
import weakref

import jax
from jax import core as jcore


def ensure_recursion_headroom(limit: int = 10000) -> None:
    """Raise Python's recursion limit for deep JAX traces.

    Tracing a Pallas kernel inside ``make_jaxpr`` inside a jitted solve
    rides the default 1000-frame limit; at 1M-element operand counts the
    promotion machinery tips over it (measured: RecursionError inside a
    kernel ``%`` op).  Idempotent, only ever raises the limit.
    """
    if sys.getrecursionlimit() < limit:
        sys.setrecursionlimit(limit)

#: weak per-function cache: fn -> {aval signature -> (pure, consts)}.
#: Returning the *same* pure-function object for repeated calls is what
#: lets jit reuse its compiled executable — a fresh wrapper per call is a
#: static-argument cache miss, i.e. a full recompile per solve (~seconds
#: through a remote-compile tunnel).
_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def hoist_closure(fn, *example_args):
    """(pure_fn, consts): ``pure_fn(*args, *consts) == fn(*args)``.

    ``consts`` is a list of arrays the closure captured; pass them as
    dynamic arguments to the jitted caller.  The returned function is
    traceable (usable inside jit/while_loop/grad).

    Results are cached per (fn, argument avals): calling again with the
    same function object returns the *identical* pure function, so jits
    keyed on it (static argument) hit their compilation cache.  The
    cached consts reflect the closure contents at first trace.

    Functions tagged ``fn._no_hoist = True`` are returned as-is with no
    consts — their captures then lower as inline literals.  Pallas-backed
    operators set this: passing kernel operands as runtime jit parameters
    aborts the TPU runtime (observed on v5e via the remote-compile path),
    while the same kernel with captured-literal operands runs fine.
    """
    if getattr(fn, "_no_hoist", False):
        return fn, []
    key = tuple((tuple(a.shape), str(a.dtype))
                for a in map(jnp_aval, example_args))
    # bound methods are fresh objects on every attribute access; key them
    # by their owner instead (with the method in the subkey), else the
    # cache misses every call and downstream jits recompile per solve
    owner = fn
    if hasattr(fn, "__self__") and hasattr(fn, "__func__"):
        owner = fn.__self__
        key = (fn.__func__, key)
    try:
        per_fn = _cache.setdefault(owner, {})
        if key in per_fn:
            return per_fn[key]
    except TypeError:       # owner not weak-referenceable
        per_fn = None

    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr, consts = closed.jaxpr, closed.consts
    n_args = len(jaxpr.invars)

    def pure(*args_and_consts):
        args = args_and_consts[:n_args]
        cvals = args_and_consts[n_args:]
        out = jcore.eval_jaxpr(jaxpr, list(cvals), *args)
        return out[0] if len(out) == 1 else tuple(out)

    result = (pure, list(consts))
    if per_fn is not None:
        per_fn[key] = result
    return result


def jnp_aval(x):
    """Shape/dtype view of a value (jax.Array, numpy array, or scalar)."""
    import numpy as np

    if hasattr(x, "aval"):
        return x.aval
    return np.asarray(x)
