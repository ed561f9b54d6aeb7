"""Probe: CG per-iteration pass-merging variants on the fused operator.

Variants: production body; no-premask operator (p provably masked);
rz-frozen body (skip the separate rn2 dot per iteration); weighted-copy
dots (keep w*r as state to drop the w read from dots).  Development tool.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(step, s0, reps=50):
    @jax.jit
    def run(s, m):
        return jax.lax.fori_loop(0, m, lambda i, s: step(s), s)

    run(s0, reps)[0].block_until_ready()

    def t(m, tries=3):
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            run(s0, m)[0].block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    return max(t(2 * reps) - t(reps), 1e-9) / reps


def main():
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange

    p, nx, ny = 8, 316, 316
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    Gf = np.asarray(disc.laplacian_factors(None),
                    np.float32).reshape(disc.E, 3, -1)
    D = np.asarray(disc.basis.subbases[0].D1)
    Dhat = sumfac.make_stacked_derivative(D, D)
    ex = make_exchange(disc, fused_pad=True)
    n, E = ex.n_loc, ex.E

    rng = np.random.RandomState(0)
    free_np = rng.rand(n, E) > 0.05
    free = jnp.asarray(free_np)
    A_m = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, free, vector_layout="ne")
    A_raw = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, vector_layout="ne")
    w = jnp.asarray(np.ascontiguousarray(
        ex._weights_np.T.astype(np.float32)) * free_np)
    diag = jnp.asarray((1.0 + rng.rand(n, E)).astype(np.float32))
    inv = jnp.where(free, 1.0 / diag, 0.0)

    r0 = jnp.asarray(np.where(free_np, rng.standard_normal((n, E)), 0.0)
                     .astype(np.float32))
    x0 = jnp.zeros_like(r0)
    z0 = inv * r0
    rz0 = jnp.sum(r0 * z0 * w)
    s0 = (x0, r0, z0, z0, rz0, rz0)

    def dotw(a, b):
        return jnp.sum(a * b * w)

    def body_prod(s):
        x, r, z, pv, rz, rn2 = s
        Ap = A_m(pv)
        denom = dotw(pv, Ap)
        alpha = rz / jnp.where(denom != 0, denom, 1.0)
        x = x + alpha * pv
        r = r - alpha * Ap
        z = inv * r
        rz_n = dotw(r, z)
        rn2 = dotw(r, r)
        beta = rz_n / jnp.where(rz != 0, rz, 1.0)
        pv = z + beta * pv
        return (x, r, z, pv, rz_n, rn2)

    def body_nopre(s):
        x, r, z, pv, rz, rn2 = s
        Ap = jnp.where(free, A_raw(pv), 0.0)
        denom = dotw(pv, Ap)
        alpha = rz / jnp.where(denom != 0, denom, 1.0)
        x = x + alpha * pv
        r = r - alpha * Ap
        z = inv * r
        rz_n = dotw(r, z)
        rn2 = dotw(r, r)
        beta = rz_n / jnp.where(rz != 0, rz, 1.0)
        pv = z + beta * pv
        return (x, r, z, pv, rz_n, rn2)

    def body_norn(s):
        x, r, z, pv, rz, rn2 = s
        Ap = jnp.where(free, A_raw(pv), 0.0)
        denom = dotw(pv, Ap)
        alpha = rz / jnp.where(denom != 0, denom, 1.0)
        x = x + alpha * pv
        r = r - alpha * Ap
        z = inv * r
        rz_n = dotw(r, z)
        beta = rz_n / jnp.where(rz != 0, rz, 1.0)
        pv = z + beta * pv
        return (x, r, z, pv, rz_n, rz_n)

    def body_wstate(s):
        # weighted dots without re-reading w: keep zw = w*z as state-free
        # temp (z and zw produced in the same pass)
        x, r, z, pv, rz, rn2 = s
        Ap = jnp.where(free, A_raw(pv), 0.0)
        wAp = w * Ap
        denom = jnp.sum(pv * wAp)
        alpha = rz / jnp.where(denom != 0, denom, 1.0)
        x = x + alpha * pv
        r = r - alpha * Ap
        z = inv * r
        zw = w * z
        rz_n = jnp.sum(r * zw)
        beta = rz_n / jnp.where(rz != 0, rz, 1.0)
        pv = z + beta * pv
        return (x, r, z, pv, rz_n, rz_n)

    for name, body in [("production", body_prod), ("no-premask", body_nopre),
                       ("rz-freeze", body_norn), ("w-fold", body_wstate)]:
        t = timed(body, s0)
        print(f"{name:12s} {t*1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
