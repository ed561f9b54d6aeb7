"""Staged 1M-element run to isolate remote-compile payload failures."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
import numpy as np


def stage(name):
    print(f"--- {name} @ {time.strftime('%H:%M:%S')}", flush=True)


def main():
    E_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    p = 8
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange

    nx = max(int(np.sqrt(E_target)), 1)
    stage("mesh+disc")
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    stage(f"E={disc.E} problem")
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    stage("exchange")
    ex = make_exchange(disc)
    print("type:", type(ex).__name__, "tail:", ex.tail_fraction)
    Gf = prob._G.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    stage("operator build")
    A = sumfac.make_local_laplacian_operator(ex, Gf, Dhat)
    stage("local_from_global")
    u0 = jnp.asarray(ex.local_from_global(
        np.random.RandomState(0).random_sample(disc.n_nodes)
    ).astype(np.float32))
    stage("eager apply")
    v = A(u0)
    v.block_until_ready()
    stage("eager dot")
    d = ex.dot(v, v)
    jax.block_until_ready(d)
    stage("jit apply (closure-converted)")
    A_pure, A_c = jax.closure_convert(A, u0)
    f = jax.jit(lambda u, c: A_pure(u, *c))
    f(u0, tuple(A_c)).block_until_ready()
    stage("jit chain x10")

    @jax.jit
    def chain(u, c):
        def body(i, x):
            y = A_pure(x, *c)
            return y * jax.lax.rsqrt(jnp.vdot(y, y) + 1e-30)
        return jax.lax.fori_loop(0, 10, body, u)

    t0 = time.perf_counter()
    chain(u0, tuple(A_c)).block_until_ready()
    print("chain compile+run", time.perf_counter() - t0, flush=True)
    t0 = time.perf_counter()
    chain(u0, tuple(A_c)).block_until_ready()
    print("apply ms:", (time.perf_counter() - t0) / 10 * 1e3, flush=True)
    stage("done")


if __name__ == "__main__":
    main()
