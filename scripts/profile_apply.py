"""Micro-profile of the element-apply pipeline pieces on the live backend.

Times (as jitted 20-rep fori_loop chains, so dispatch latency is amortized):
matmuls-only, pointwise G, edge exchange, vertex exchange, full dss, full
apply (xla and pallas backends).  Development tool, not part of the suite.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chain(f, x0, reps=100):
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=100_000)
    ap.add_argument("--order", type=int, default=8)
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import pallas_kernels, sumfac
    from spectralelementmethod_tpu.ops.exchange import (LocalExchange,
                                                        RollExchange)

    p = args.order
    nx = max(int(np.sqrt(args.elements)), 1)
    ny = max(args.elements // nx, 1)
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    ex = LocalExchange(disc)
    E, n = disc.E, disc.n_loc
    print(f"E={E} n={n} device={jax.devices()[0]}")

    Gf = jnp.asarray(np.asarray(prob._G), jnp.float32).reshape(E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    Dhat_h = jnp.asarray(Dhat[:, ex.hier], jnp.float32)
    g0, g1, g2 = [jnp.asarray(Gf[:, i]) for i in range(3)]

    rng = np.random.RandomState(0)
    uL = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))

    def matmuls_only(u):
        grads = jnp.einsum("en,mn->em", u, Dhat_h, precision="highest")
        ur, us = grads[:, :n], grads[:, n:]
        fr = g0 * ur + g1 * us
        fs = g1 * ur + g2 * us
        flux = jnp.concatenate([fr, fs], axis=1)
        return jnp.einsum("em,mn->en", flux, Dhat_h, precision="highest")

    def edge_only(v):
        Ee, ne, neb = ex.E, ex.ne, ex.n_edge_block
        F = v[:, 4:4 + neb].reshape(Ee * 4, ne, 1)
        recv = F[ex.nb_lin].reshape(Ee, 4, ne, 1)
        recv = jnp.where(ex.flip[..., None], jnp.flip(recv, axis=2), recv)
        recv = jnp.where(ex.has_nb[..., None], recv, 0.0)
        edges = F.reshape(Ee, 4, ne, 1) + recv
        return v.at[:, 4:4 + neb].set(edges.reshape(Ee, neb))

    def vert_only(v):
        verts = v[:, :4].reshape(-1, 1)
        summed = jnp.zeros((ex.n_vertices, 1), v.dtype).at[
            ex.vert_gid].add(verts)
        return v.at[:, :4].set(summed[ex.vert_gid].reshape(E, 4))

    A_xla = sumfac.make_local_laplacian_operator(ex, Gf, Dhat, backend="xla")
    exR = RollExchange(disc)
    print(f"roll classes: {len(exR.edge_classes)} edge, "
          f"{len(exR.vert_classes)} vert, tail {exR.tail_fraction:.4f}",
          flush=True)
    A_roll = sumfac.make_local_laplacian_operator(
        exR, Gf, Dhat, backend="xla")

    pieces = {
        "matmuls_only": matmuls_only,
        "edge_exchange": edge_only,
        "vertex_exchange": vert_only,
        "dss_full": ex.dss,
        "dss_roll": exR.dss,
        "apply_xla": A_xla,
        "apply_roll_xla": A_roll,
    }
    if pallas_kernels.supported():
        def pl_local(u):
            return pallas_kernels.fused_laplacian_local(
                u, g0, g1, g2, Dhat_h)

        A_pl = sumfac.make_local_laplacian_operator(
            exR, Gf, Dhat, backend="pallas")
        pieces["pallas_local_only"] = pl_local
        pieces["apply_roll_pallas"] = A_pl

    for name, f in pieces.items():
        t = chain(f, uL, reps=args.reps)
        print(f"{name:20s} {t * 1e3:8.3f} ms   "
              f"(total {t * args.reps:6.2f} s)", flush=True)


if __name__ == "__main__":
    main()
