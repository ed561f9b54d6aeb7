"""Matrix-free preconditioned conjugate gradients (JAX).

Replaces the reference's sparse direct solve on the condensed exterior
system (``scipy.sparse.linalg.spsolve`` at ``sem/discrete.py:511``) with a
device-resident Krylov iteration that never materializes a global matrix
(north star, BASELINE.json).  The loop is a ``lax.while_loop`` so the whole
solve is one XLA computation; per-iteration cost is one operator apply
(batched sum-factorized matmuls) plus a few vector ops.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def cg_host(
    A: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    M: Callable | None = None,
    tol: float = 1e-12,
    atol: float = 0.0,
    max_iter: int = 1000,
    dot: Callable | None = None,
) -> CGResult:
    """PCG with a host-side Python loop (device work = operator applies).

    Same math as :func:`cg` but without compiling the loop itself — much
    faster to start for small/one-off solves and for CPU test runs; the
    fused ``lax.while_loop`` version is the production TPU path.
    """
    if M is None:
        M = lambda r: r  # noqa: E731
    if dot is None:
        dot = lambda u, v: jnp.vdot(u, v)  # noqa: E731
    x = jnp.zeros_like(b) if x0 is None else x0
    A = jax.jit(A)
    M = jax.jit(M)

    def norm(v):
        return float(jnp.sqrt(jnp.real(dot(v, v))))

    stop = max(tol * norm(b), atol)
    r = b - A(x)
    z = M(r)
    p = z
    rz = dot(r, z)
    k = 0
    rnorm = norm(r)
    while rnorm > stop and k < max_iter:
        Ap = A(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        rz = rz_new
        k += 1
        rnorm = norm(r)
    return CGResult(
        x,
        jnp.array(k, dtype=jnp.int32),
        jnp.array(rnorm),
        jnp.array(rnorm <= stop),
    )


def cg(
    A: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    M: Callable | None = None,
    tol: float = 1e-12,
    atol: float = 0.0,
    max_iter: int = 1000,
    dot: Callable | None = None,
) -> CGResult:
    """Solve ``A x = b`` with preconditioned CG.

    ``A``: SPD linear operator (callable).  ``M``: preconditioner
    approximating A^-1 (callable), e.g. inverse-diagonal (Jacobi).
    ``dot``: custom inner product (e.g. multiplicity-weighted for
    L-vectors, :meth:`..ops.exchange.LocalExchange.dot`); defaults to the
    Euclidean one.  Stops when ||r|| <= max(tol * ||b||, atol) in the
    ``dot``-induced norm.

    The operator/preconditioner closures are converted to explicit
    runtime arguments (:func:`..utils.hoist.hoist_closure`) before the
    jitted ``while_loop``: arrays captured in closures would otherwise be
    lowered as *inline HLO literals*, which bloats compile payloads by
    the full operator data size (gigabytes at 1M elements — it overflows
    remote-compile transports and slows every compile).
    """
    from ..utils.hoist import hoist_closure
    if M is None:
        M = lambda r: r  # noqa: E731
    if dot is None:
        dot = lambda u, v: jnp.vdot(u, v)  # noqa: E731
    if x0 is None:
        x0 = jnp.zeros_like(b)

    A_p, A_c = hoist_closure(A, b)
    M_p, M_c = hoist_closure(M, b)
    dot_p, dot_c = hoist_closure(dot, b, b)

    return _cg_jit(
        A_p, M_p, dot_p, b, x0,
        jnp.asarray(tol, dtype=jnp.result_type(float)),
        jnp.asarray(atol, dtype=jnp.result_type(float)),
        max_iter, tuple(A_c), tuple(M_c), tuple(dot_c),
    )


@partial(jax.jit, static_argnames=("A", "M", "dot", "max_iter"))
def _cg_jit(A, M, dot, b, x0, tol, atol, max_iter, A_c, M_c, dot_c
            ) -> CGResult:
    # the residual norm is computed inside the body (fused with the other
    # vector work) and carried, so the loop condition reads a scalar
    # instead of re-reducing the full residual every iteration
    def norm2(v):
        return jnp.real(dot(v, v, *dot_c))

    stop2 = jnp.maximum(tol * tol * norm2(b), atol * atol)

    r0 = b - A(x0, *A_c)
    z0 = M(r0, *M_c)
    rz0 = dot(r0, z0, *dot_c)
    rn0 = norm2(r0)

    def cond(state):
        x, r, z, p, rz, rn2, k = state
        return (rn2 > stop2) & (k < max_iter)

    def body(state):
        x, r, z, p, rz, rn2, k = state
        Ap = A(p, *A_c)
        alpha = rz / dot(p, Ap, *dot_c)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r, *M_c)
        rz_new = dot(r, z, *dot_c)
        rn2_new = norm2(r)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, rn2_new, k + 1)

    state = (x0, r0, z0, z0, rz0, rn0, jnp.array(0, dtype=jnp.int32))
    x, r, z, p, rz, rn2, k = jax.lax.while_loop(cond, body, state)
    rnorm = jnp.sqrt(rn2)
    return CGResult(x, k, rnorm, rnorm * rnorm <= stop2)


def jacobi_preconditioner(diag: jax.Array, free_mask: jax.Array | None = None):
    """Inverse-diagonal preconditioner; safe where the diagonal is 0/masked.

    The diagonal comes matrix-free from the scatter-added per-element
    operator diagonals (``ops.sumfac.laplacian_diag_local``) — the batched
    analogue of extracting the assembled matrix diagonal.
    """
    safe = jnp.where(diag != 0, diag, 1.0)
    inv = 1.0 / safe
    if free_mask is not None:
        inv = jnp.where(free_mask, inv, 0.0)

    def M(r):
        return inv * r

    return M
