"""Matrix-free restarted GMRES (device Arnoldi, host restart loop).

Completes the Krylov suite next to :mod:`.cg` (SPD): GMRES handles the
nonsymmetric operators of this domain — advection-dominated transport and
the linearized Navier-Stokes systems of the squirmer path (SURVEY.md §7
item 4, "Newton-Krylov": JVP the residual instead of hand-assembling
Jacobians; the JVP of an einsum chain is an einsum chain, and GMRES is
the matching solver).

One restart cycle (m Arnoldi steps + least-squares + update) runs as a
single jitted kernel — the Krylov basis (m+1, *vec) lives on device and
the small (m+1, m) Hessenberg least-squares problem is solved with
Givens rotations inside the kernel.  Host code only drives restarts and
checks convergence (one sync per cycle; the same remote-backend dispatch
economics as :func:`.cg.cg`).

Restrictions:

* **Not reverse-mode differentiable.** The Arnoldi MGS/Givens loops use
  ``fori_loop`` with a traced upper bound (``j + 1``), which XLA lowers
  to ``while_loop``; reverse-mode AD through a cycle therefore fails.
  Differentiate through solves via the implicit function theorem
  (``jax.lax.custom_root`` / adjoint solves) instead of unrolling.
* The ``lax.cond`` convergence freeze short-circuits only on the
  single-RHS path; under ``vmap`` (``gmres_batched``) it batches to a
  ``select`` and every lane pays the A/M applies each iteration.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def _identity_M(r):
    return r


def _euclidean_dot(u, v):
    return jnp.vdot(u, v)


class GMRESResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def gmres(
    A: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    M: Callable | None = None,
    tol: float = 1e-10,
    atol: float = 0.0,
    restart: int = 30,
    max_restarts: int = 50,
    dot: Callable | None = None,
    stall_ratio: float | None = None,
) -> GMRESResult:
    """Solve ``A x = b`` (A nonsymmetric OK) with left-preconditioned
    restarted GMRES(restart).

    ``M`` approximates A^-1 (applied to residuals); ``dot`` defines the
    inner product (e.g. multiplicity-weighted for L-vectors).  Stops when
    the preconditioned residual norm <= max(tol * ||M b||, atol).

    ``stall_ratio`` (None = off) freezes a solve whose restart cycle
    fails to shrink the residual below ``stall_ratio * rn_prev`` while
    still above ``stop`` — the attainable-accuracy-floor cutoff the
    squirmer's GMRES-IR path uses (0.5 there, measured).  Off by
    default: a slow-but-converging solve (plateau-then-drop restarting
    behavior) must keep its full restart budget (round-2 review).
    """
    from ..utils.hoist import hoist_closure

    if M is None:
        M = _identity_M
    if dot is None:
        dot = _euclidean_dot
    if x0 is None:
        x0 = jnp.zeros_like(b)

    A_p, A_c = hoist_closure(A, b)
    M_p, M_c = hoist_closure(M, b)
    dot_p, dot_c = hoist_closure(dot, b, b)
    A_c, M_c, dot_c = tuple(A_c), tuple(M_c), tuple(dot_c)

    cycles = _gmres_cycles(A_p, M_p, dot_p, int(restart),
                           stall_ratio)

    ftype = jnp.result_type(b.dtype, jnp.float32)
    Mb = M_p(b, *M_c)
    bnorm = jnp.sqrt(jnp.real(dot_p(Mb, Mb, *dot_c)))
    stop = jnp.maximum(jnp.asarray(tol, ftype) * bnorm,
                       jnp.asarray(atol, ftype))

    # geometric ladder of batched cycles (one host sync per batch;
    # converged state freezes device-side — see _gmres_cycles)
    x = x0
    total_its = 0
    rnorm = None
    issued, batch, done = 0, 2, False
    while issued < max_restarts and not done:
        k = min(batch, max_restarts - issued)
        x, rnorm, its, done_d = cycles(k, x, b, stop, A_c, M_c, dot_c)
        total_its += int(its)
        issued += k
        done = bool(done_d)
        batch = min(batch * 2, 16)
    return GMRESResult(
        x, jnp.asarray(total_its, jnp.int32), rnorm, rnorm <= stop
    )


def gmres_batched(
    A: Callable,
    B: jax.Array,
    X0: jax.Array | None = None,
    *,
    M: Callable | None = None,
    tol: float = 1e-10,
    atol: float = 0.0,
    restart: int = 30,
    max_restarts: int = 50,
    dot: Callable | None = None,
    stall_ratio: float | None = None,
) -> GMRESResult:
    """Solve ``A x_j = b_j`` for a batch of RHS with restarted GMRES.

    The batched twin of :func:`gmres` (and of :func:`.cg.cg_batched`):
    ``B`` stacks k right-hand sides on a leading axis, the jitted
    restart cycles are ``vmap``-ped so each RHS carries its own Arnoldi
    state and convergence/stagnation freeze, and ONE host ladder drives
    all k solves.  The reference solves one system per ``spsolve`` call
    (``sem/discrete.py:502-528``); batched nonsymmetric solves are
    net-new.  Returns a :class:`GMRESResult` with batched fields.
    """
    from ..utils.hoist import hoist_closure

    if M is None:
        M = _identity_M
    if dot is None:
        dot = _euclidean_dot
    if X0 is None:
        X0 = jnp.zeros_like(B)

    A_p, A_c = hoist_closure(A, B[0])
    M_p, M_c = hoist_closure(M, B[0])
    dot_p, dot_c = hoist_closure(dot, B[0], B[0])
    A_c, M_c, dot_c = tuple(A_c), tuple(M_c), tuple(dot_c)

    cycles = _gmres_cycles_batched(A_p, M_p, dot_p, int(restart),
                                   stall_ratio)

    ftype = jnp.result_type(B.dtype, jnp.float32)

    def stop_of(b):
        Mb = M_p(b, *M_c)
        return jnp.sqrt(jnp.real(dot_p(Mb, Mb, *dot_c)))

    bnorms = jax.jit(jax.vmap(stop_of))(B)
    stops = jnp.maximum(jnp.asarray(tol, ftype) * bnorms,
                        jnp.asarray(atol, ftype))

    X = X0
    total_its = jnp.zeros(B.shape[0], jnp.int32)
    rnorm = None
    issued, batch = 0, 2
    while issued < max_restarts:
        k = min(batch, max_restarts - issued)
        X, rnorm, its, done_d = cycles(k, X, B, stops, A_c, M_c, dot_c)
        total_its = total_its + its
        issued += k
        if bool(jax.device_get(done_d).all()):
            break
        batch = min(batch * 2, 16)
    return GMRESResult(X, total_its, rnorm, rnorm <= stops)


@lru_cache(maxsize=64)
def _gmres_cycles_batched(A, M, dot, m: int,
                          stall_ratio: float | None = None):
    """vmapped twin of :func:`_gmres_cycles` (shared operator consts,
    per-RHS Arnoldi/convergence/stagnation state)."""
    from functools import partial

    body = _gmres_cycle_fn(A, M, dot, m)

    @partial(jax.jit, static_argnames=("k",))
    def cycles(k, X, B, stops, A_c, M_c, dot_c):
        ftype = jnp.result_type(B.dtype, jnp.float32)

        def per_rhs(x, b, stop):
            def one(_i, carry):
                def run(carry):
                    x, rn_prev, its, _done = carry
                    x2, rn2, dk = body(x, b, stop, A_c, M_c, dot_c)
                    done = rn2 <= stop
                    if stall_ratio is not None:
                        done = done | ((rn2 > stall_ratio * rn_prev)
                                       & (rn2 > stop))
                    return (x2, rn2, its + dk, done)

                return jax.lax.cond(carry[3], lambda c: c, run, carry)

            return jax.lax.fori_loop(
                0, k, one,
                (x, jnp.asarray(jnp.inf, ftype),
                 jnp.asarray(0, jnp.int32), jnp.asarray(False)),
            )

        return jax.vmap(per_rhs)(X, B, stops)

    return cycles


@lru_cache(maxsize=64)
def _gmres_cycle_fn(A, M, dot, m: int):
    """One GMRES(m) cycle (un-jitted): Arnoldi + Givens + update."""

    def cycle(x, b, stop, A_c, M_c, dot_c):
        def pdot(u, v):
            return dot(u, v, *dot_c)

        def norm(v):
            return jnp.sqrt(jnp.real(pdot(v, v)))

        r = M(b - A(x, *A_c), *M_c)
        beta = norm(r)
        ftype = beta.dtype

        shape = r.shape
        V = jnp.zeros((m + 1,) + shape, r.dtype)
        V = V.at[0].set(r / jnp.where(beta != 0, beta, 1.0))
        H = jnp.zeros((m + 1, m), ftype)
        # Givens-rotated rhs of the least-squares problem
        g = jnp.zeros(m + 1, ftype).at[0].set(beta)
        cs = jnp.zeros(m, ftype)
        sn = jnp.zeros(m, ftype)

        def body(j, carry):
            # lax.cond, not masked selects: once the Arnoldi residual
            # estimate reaches ``stop`` the remaining iterations of the
            # cycle must cost NOTHING — with a near-exact preconditioner
            # (the squirmer's f32 condensation solve) convergence lands
            # within a handful of the m iterations, and executing the
            # frozen A/M applies + the (m+1)-dot MGS for the tail was
            # ~80% of each cycle's wall-clock (profile_squirmer).
            # NOTE: this short-circuit only holds on the single-RHS path;
            # under vmap (gmres_batched) the cond batches to a select and
            # every lane executes run() each iteration regardless of its
            # own `done` flag.
            def run(carry):
                V, H, g, cs, sn, done, k = carry
                w = M(A(V[j], *A_c), *M_c)
                # modified Gram-Schmidt (the 0..j loop bound does the
                # masking: only populated columns are visited)
                def mgs(i, wh):
                    w, h = wh
                    hij = pdot(V[i], w)
                    w = w - hij * V[i]
                    h = h.at[i].set(jnp.real(hij))
                    return (w, h)

                # dynamic bound: only columns 0..j are populated, so the
                # remaining m-j dots of the masked full loop are pure
                # overhead (they dominate early iterations at m=30)
                w, h = jax.lax.fori_loop(0, j + 1, mgs,
                                         (w, jnp.zeros(m + 1, ftype)))
                hnext = norm(w)
                h = h.at[j + 1].set(hnext)
                V2 = V.at[j + 1].set(w / jnp.where(hnext != 0, hnext, 1.0))

                # apply previous Givens rotations to the new column (the
                # 0..j-1 bound visits exactly the rotations set so far)
                def rot(i, h):
                    hi = cs[i] * h[i] + sn[i] * h[i + 1]
                    hi1 = -sn[i] * h[i] + cs[i] * h[i + 1]
                    return h.at[i].set(hi).at[i + 1].set(hi1)

                h = jax.lax.fori_loop(0, j, rot, h)
                denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
                denom = jnp.where(denom != 0, denom, 1.0)
                c, s = h[j] / denom, h[j + 1] / denom
                h = h.at[j].set(c * h[j] + s * h[j + 1]).at[j + 1].set(0.0)
                gj = g[j]
                g2 = g.at[j].set(c * gj).at[j + 1].set(-s * gj)

                new_done = done | (jnp.abs(g2[j + 1]) <= stop)
                return (V2, H.at[:, j].set(h), g2,
                        cs.at[j].set(c), sn.at[j].set(s),
                        new_done, k + 1)

            return jax.lax.cond(carry[5], lambda c: c, run, carry)

        done0 = beta <= stop
        V, H, g, cs, sn, done, k = jax.lax.fori_loop(
            0, m, body,
            (V, H, g, cs, sn, done0, jnp.array(0, jnp.int32)),
        )

        # back-substitute the k x k triangular system (masked full loop)
        def back(row, y):
            i = m - 1 - row
            active = (i < k).astype(ftype)
            num = g[i] - jnp.dot(H[i], y)
            hii = jnp.where(H[i, i] != 0, H[i, i], 1.0)
            return y.at[i].set(active * num / hii)

        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, ftype))
        dx = jnp.tensordot(y.astype(V.dtype), V[:m], axes=1)
        x = x + dx

        rnorm = jnp.abs(g[jnp.minimum(k, m)])
        return x, rnorm, k

    return cycle


@lru_cache(maxsize=64)
def _gmres_cycle(A, M, dot, m: int):
    """One jitted GMRES(m) cycle."""
    return jax.jit(_gmres_cycle_fn(A, M, dot, m))


@lru_cache(maxsize=64)
def _gmres_cycles(A, M, dot, m: int, stall_ratio: float | None = None):
    """k restart cycles per dispatch with device-side convergence freeze.

    On remote backends each host convergence check costs a round trip
    comparable to dozens of device iterations (same economics as the CG
    block ladder, :func:`.cg.cg`); batching k cycles per jitted call cuts
    the syncs to O(max_restarts / k).  Converged state short-circuits via
    ``lax.cond`` — frozen cycles do no Arnoldi work.

    With ``stall_ratio`` set, a cycle that fails to shrink the residual
    below ``stall_ratio * rn_prev`` while still above ``stop`` also
    freezes (stagnation at the attainable-accuracy floor: with a
    reduced-precision preconditioner, ``stop`` relative to a tiny rhs can
    sit below what the arithmetic can reach — burning restart cycles
    there costs seconds per solve for zero gain; the squirmer's GMRES-IR
    passes 0.5).  Callers distinguish the two exits by comparing the
    returned ``rnorm`` against ``stop``.

    Returns ``cycles(k, x, b, stop, A_c, M_c, dot_c) ->
    (x, rnorm, total_new_its, done)`` with ``done`` = converged OR
    stagnated.
    """
    from functools import partial

    body = _gmres_cycle_fn(A, M, dot, m)

    @partial(jax.jit, static_argnames=("k",))
    def cycles(k, x, b, stop, A_c, M_c, dot_c):
        ftype = jnp.result_type(b.dtype, jnp.float32)

        def one(_i, carry):
            def run(carry):
                x, rn_prev, its, _done = carry
                x2, rn2, dk = body(x, b, stop, A_c, M_c, dot_c)
                done = rn2 <= stop
                if stall_ratio is not None:
                    done = done | ((rn2 > stall_ratio * rn_prev)
                                   & (rn2 > stop))
                return (x2, rn2, its + dk, done)

            return jax.lax.cond(carry[3], lambda c: c, run, carry)

        return jax.lax.fori_loop(
            0, k, one,
            (x, jnp.asarray(jnp.inf, ftype), jnp.asarray(0, jnp.int32),
             jnp.asarray(False)),
        )

    return cycles
