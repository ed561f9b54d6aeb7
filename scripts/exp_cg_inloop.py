"""In-loop fused-CG kernel cost attribution (TPU experiment).

Times 200-iteration fori loops of: kernel A alone, kernel B alone, the
full cg_fused body (kA + partial sums + scalars + kB), and the plain-CG
body, at p=8 / ~100k elements.  Attribution data for the fused-CG
per-iteration budget (BASELINE.md).

Run ON the TPU host with nothing else using the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(E_target=100_000, p=8, reps=200):
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.ops.pallas_kernels import (
        make_fused_cg_kernels)

    nx = int(np.sqrt(E_target))
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = make_exchange(disc, fused_pad=True, fused_pad_min_e=0)
    E = ex.E
    Gf = np.zeros((E, 3, disc.n_loc), np.float32)
    Gf[:disc.E] = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, _ = sumfac.affine_factorization(Gf, W)
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)

    rng = np.random.RandomState(0)
    shp = (ex.n_loc, E)
    r = jnp.asarray(rng.standard_normal(shp).astype(np.float32))
    x = jnp.zeros_like(r)
    inv = jnp.ones_like(r)
    w = jnp.ones_like(r)

    def timed(label, mk_chain):
        import functools

        @functools.partial(jax.jit, static_argnames=("n",))
        def chain(n, r0):
            return jax.lax.fori_loop(0, n, mk_chain, r0)

        chain(reps, r)[0].block_until_ready()
        t0 = time.perf_counter()
        chain(reps, r)[0].block_until_ready()
        t1 = time.perf_counter() - t0
        chain(2 * reps, r)[0].block_until_ready()
        t0 = time.perf_counter()
        chain(2 * reps, r)[0].block_until_ready()
        t2 = time.perf_counter() - t0
        print(f"{label:28s} {(t2 - t1) / reps * 1e3:7.3f} ms/iter",
              flush=True)

    for prec, p_dt in (("highest", None), ("high", None),
                       ("high", jnp.bfloat16)):
        kA, kB, G = make_fused_cg_kernels(
            ex, Kcat, a, precision=prec, p_dtype=p_dt)
        te, hb = kA._prep.TE, kA._prep.Hb
        tag = f"{prec}{'/bf16p' if p_dt else ''} TE={te} Hb={hb}"
        p0 = jnp.zeros(shp, jnp.bfloat16 if p_dt else jnp.float32)
        invq = inv.astype(jnp.bfloat16) if p_dt else inv
        wq = w.astype(jnp.bfloat16) if p_dt else w

        timed(f"kA[{tag}]",
              lambda i, rv: kA(rv, p0, invq, x, 0.1, 0.1)[1])
        timed(f"kB[{tag}]", lambda i, rv: kB(rv, rv, invq, wq, 0.01)[0])

        def full_body(i, rv):
            pn, Ap, xn, d = kA(rv, p0, invq, x, 0.1, 0.1)
            alpha = 0.5 / jnp.sum(d)
            rn, rzp, rn2p = kB(rv, Ap, invq, wq, alpha)
            return rn * jax.lax.rsqrt(jnp.sum(rn2p) + 1.0)

        timed(f"kA+glue+kB[{tag}]", full_body)


if __name__ == "__main__":
    main(*(int(float(a)) for a in sys.argv[1:]))
