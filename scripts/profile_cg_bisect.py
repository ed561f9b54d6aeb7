"""Bisect which part of the guarded CG body costs 20x. Dev tool."""

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
    from spectralelementmethod_tpu.solver.cg import jacobi_preconditioner
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

    A_p, A_c = hoist_closure(A, r0)
    M_p, M_c = hoist_closure(M, r0)
    d_p, d_c = hoist_closure(ex.dot, r0, r0)
    Ac, Mc, dc = tuple(A_c), tuple(M_c), tuple(d_c)
    N = 300

    def timeit(f, *args):
        f(*args)[0].block_until_ready()
        t0 = time.perf_counter()
        out = f(*args)
        out[0].block_until_ready()
        return time.perf_counter() - t0

    def make(variant):
        @jax.jit
        def run(b, A_c, M_c, d_c):
            x0 = jnp.zeros_like(b)
            r = b - A_p(x0, *A_c)
            z = M_p(r, *M_c)
            rz = d_p(r, z, *d_c)
            rn2 = jnp.real(d_p(r, r, *d_c))
            k = jnp.array(0, jnp.int32)
            stop2 = jnp.asarray(1e-30, rn2.dtype)
            max_it = jnp.asarray(N, jnp.int32)
            state = (x0, r, z, z, rz, rn2, k)

            def body(i, state):
                x, r, z, p, rz, rn2, k = state
                if variant >= 2:
                    done = (rn2 <= stop2) | (k >= max_it)
                Ap = A_p(p, *A_c)
                denom = d_p(p, Ap, *d_c)
                if variant >= 3:
                    alpha = jnp.where(
                        done, 0.0,
                        rz / jnp.where(denom != 0, denom, 1.0))
                else:
                    alpha = rz / denom
                x = x + alpha * p
                r = r - alpha * Ap
                z = M_p(r, *M_c)
                rz_n = d_p(r, z, *d_c)
                if variant >= 1:
                    rn2 = jnp.real(d_p(r, r, *d_c))
                if variant >= 3:
                    beta = rz_n / jnp.where(rz != 0, rz, 1.0)
                    k = k + jnp.where(done, 0, 1).astype(k.dtype)
                else:
                    beta = rz_n / rz
                p = z + beta * p
                return (x, r, z, p, rz_n, rn2, k)

            return jax.lax.fori_loop(0, N, body, state)
        return run

    names = {0: "plain", 1: "+rn2 dot", 2: "+done cmp", 3: "+guards"}
    for v in range(4):
        t = timeit(make(v), r0, Ac, Mc, dc)
        print(f"variant {v} ({names[v]:10s}): {t:.3f}s "
              f"{t/N*1e3:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
