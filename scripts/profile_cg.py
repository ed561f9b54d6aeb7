"""Compare while_loop CG vs fori_loop fixed-iteration CG cost on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    E_target, p = 100_000, 8
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.solver.cg import cg, jacobi_preconditioner
    from spectralelementmethod_tpu.utils.hoist import hoist_closure

    nx = int(np.sqrt(E_target))
    disc = Discretization(rectangle_mesh(nx, nx, p), gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = make_exchange(disc)
    Gf = prob._G.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    free = jnp.asarray((~prob._dirichlet_mask)[ex.gather_hier])
    A = sumfac.make_local_laplacian_operator(ex, Gf, Dhat, free)
    diagL = jnp.asarray(ex.local_from_global(
        np.asarray(prob.operator_diagonal())).astype(np.float32))
    M = jacobi_preconditioner(diagL, free)
    bL = jnp.asarray(ex.local_from_global(
        np.asarray(prob._b)).astype(np.float32))
    r0 = jnp.where(free, bL, 0.0)
    print(f"E={disc.E}", flush=True)

    N = 300

    # --- block-ladder cg, single dispatch (block=N) ---
    t0 = time.perf_counter()
    res = cg(A, r0, M=M, tol=0.0, atol=1e-30, max_iter=N, dot=ex.dot,
             block=N)
    res.x.block_until_ready()
    print("block cg compile+run", time.perf_counter() - t0, flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        res = cg(A, r0, M=M, tol=0.0, atol=1e-30, max_iter=N, dot=ex.dot,
                 block=N)
        res.x.block_until_ready()
        tw = time.perf_counter() - t0
        print(f"block cg: {tw:.3f}s total, {tw/N*1e3:.3f} ms/iter "
              f"({int(res.iterations)} its)", flush=True)

    # --- fori_loop fixed-iteration version of the same body ---
    A_p, A_c = hoist_closure(A, r0)
    M_p, M_c = hoist_closure(M, r0)
    d_p, d_c = hoist_closure(ex.dot, r0, r0)

    @jax.jit
    def cg_fori(b, A_c, M_c, d_c):
        x0 = jnp.zeros_like(b)
        r = b - A_p(x0, *A_c)
        z = M_p(r, *M_c)
        rz = d_p(r, z, *d_c)
        state = (x0, r, z, z, rz)

        def body(i, state):
            x, r, z, p, rz = state
            Ap = A_p(p, *A_c)
            alpha = rz / d_p(p, Ap, *d_c)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M_p(r, *M_c)
            rz_new = d_p(r, z, *d_c)
            p = z + (rz_new / rz) * p
            return (x, r, z, p, rz_new)

        return jax.lax.fori_loop(0, N, body, state)

    Ac, Mc, dc = tuple(A_c), tuple(M_c), tuple(d_c)
    cg_fori(r0, Ac, Mc, dc)[0].block_until_ready()
    for rep in range(3):
        t0 = time.perf_counter()
        out = cg_fori(r0, Ac, Mc, dc)
        out[0].block_until_ready()
        tf = time.perf_counter() - t0
        print(f"fori_loop:  {tf:.3f}s total, {tf/N*1e3:.3f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()
