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

import jax
from jax import core as jcore


def hoist_closure(fn, *example_args):
    """(pure_fn, consts): ``pure_fn(*args, *consts) == fn(*args)``.

    ``consts`` is a list of arrays the closure captured; pass them as
    dynamic arguments to the jitted caller.  The returned function is
    traceable (usable inside jit/while_loop/grad).
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr, consts = closed.jaxpr, closed.consts
    n_args = len(jaxpr.invars)

    def pure(*args_and_consts):
        args = args_and_consts[:n_args]
        cvals = args_and_consts[n_args:]
        out = jcore.eval_jaxpr(jaxpr, list(cvals), *args)
        return out[0] if len(out) == 1 else tuple(out)

    return pure, list(consts)
