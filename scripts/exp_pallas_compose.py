"""Experiment: find what makes pallas_local + XLA-DSS composition slow.

Times pallas kernel followed by successively more of the DSS pipeline.
Development tool, not part of the suite.
"""

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
            return y * jax.lax.rsqrt(jnp.vdot(y, y).astype(y.dtype) + 1e-30)
        return jax.lax.fori_loop(0, reps, body, x)

    run(x0).block_until_ready()
    t0 = time.perf_counter()
    run(x0).block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import pallas_kernels, sumfac
    from spectralelementmethod_tpu.ops.exchange import RollExchange

    p = 8
    nx = ny = 316
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    ex = RollExchange(disc)
    E, n = ex.E, ex.n_loc
    ne, neb = ex.ne, ex.n_edge_block
    oe, ov = ex.off_edge, ex.off_vert
    print(f"E={E} n={n}", flush=True)

    Gf = jnp.asarray(np.asarray(prob._G), jnp.float32).reshape(E, 3, -1)
    D = np.asarray(prob._D0)
    Dhat = sumfac.make_stacked_derivative(D, D)
    Dhat_h = jnp.asarray(Dhat[:, ex.hier], jnp.float32)
    g0, g1, g2 = [jnp.asarray(Gf[:, i]) for i in range(3)]

    rng = np.random.RandomState(0)
    uL = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))

    def pl_local(u):
        return pallas_kernels.fused_laplacian_local(u, g0, g1, g2, Dhat_h)

    def dss2d(vL):
        F = vL[:, oe:oe + neb]
        recv = jnp.zeros_like(F)
        for d_f, s_f, delta, flip, mask in ex.edge_classes:
            src = jnp.roll(vL[:, oe + s_f * ne: oe + (s_f + 1) * ne],
                           -delta, axis=0)
            if flip:
                src = jnp.flip(src, axis=1)
            src = jnp.where(mask[:, None], src, 0.0)
            recv = recv.at[:, d_f * ne:(d_f + 1) * ne].add(src)
        edges = F + recv
        V = vL[:, ov:ov + 4]
        vsum = V
        for d_s, s_s, delta, mask in ex.vert_classes:
            src = jnp.roll(V[:, s_s], -delta, axis=0)
            vsum = vsum.at[:, d_s].add(jnp.where(mask, src, 0.0))
        return jnp.concatenate([edges, vsum, vL[:, ex.off_int:]], axis=1)

    cases = {
        "pallas_only": pl_local,
        "pallas_plus1": lambda u: pl_local(u) + 1.0,
        "pallas_roll1": lambda u: jnp.roll(pl_local(u), -1, axis=0),
        "pallas_dss2d": lambda u: dss2d(pl_local(u)),
        "pallas_dssroll_cur": lambda u: ex.dss(pl_local(u)),
        "xla_dss2d_only": dss2d,
    }
    for name, f in cases.items():
        t = chain(f, uL)
        print(f"{name:22s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
