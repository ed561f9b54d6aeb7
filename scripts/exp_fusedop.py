"""Probe: single-matmul transposed affine apply via operand-fused a*u.

S[i,e] = sum_c sum_j Kc[i,j] a_c[e] u[j,e] = Kflat (n, 3n) @ u3 with
u3[(c,j), e] = a_c[e] u[j,e] — if XLA fuses the broadcast-multiply into
the dot operand, u is read once instead of three times.  Also tests the
column-scaling commutation S = sum_c a_c * (Kc @ u) (stacked-K single
matmul + epilogue reduction).  Development tool.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, x0, reps=50):
    @jax.jit
    def run(x, n):
        def body(i, x):
            y = f(x)
            return y * jax.lax.rsqrt(jnp.vdot(y, y).astype(y.dtype) + 1e-30)
        return jax.lax.fori_loop(0, n, body, x)

    run(x0, reps).block_until_ready()

    def t(n, tries=3):
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            run(x0, n).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    return max(t(2 * reps) - t(reps), 1e-9) / reps


def main():
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import RollExchange

    P = jax.lax.Precision
    p = 8
    nx = ny = 316
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    E = disc.E
    ex = RollExchange(disc)
    n = ex.n_loc

    Gf = np.asarray(prob._G, np.float32).reshape(E, 3, -1)
    D = np.asarray(prob._D0)
    Dhat = sumfac.make_stacked_derivative(D, D)
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    Ks = [jnp.asarray(Kcat[:, c * n:(c + 1) * n].astype(np.float32))
          for c in range(3)]
    Kflat = jnp.asarray(Kcat.astype(np.float32))           # (n, 3n)
    Kstack = jnp.concatenate(Ks, axis=0)                   # (3n, n)
    aT = jnp.asarray(np.ascontiguousarray(a.T.astype(np.float32)))

    rng = np.random.RandomState(0)
    uT = jnp.asarray(rng.standard_normal((n, E)).astype(np.float32))

    def make3(prec):
        def f(uT):
            S = None
            for c in range(3):
                T = jnp.einsum("nm,me->ne", Ks[c], uT * aT[c],
                               precision=prec)
                S = T if S is None else S + T
            return S
        return f

    def make_opfused(prec):
        def f(uT):
            u3 = (aT[:, None, :] * uT[None]).reshape(3 * n, uT.shape[1])
            return jax.lax.dot_general(
                Kflat, u3, (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
        return f

    def make_epilogue(prec):
        def f(uT):
            V = jax.lax.dot_general(
                Kstack, uT, (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            return (aT[0] * V[:n] + aT[1] * V[n:2 * n] + aT[2] * V[2 * n:])
        return f

    ref = np.asarray(jax.jit(make3(P.HIGHEST))(uT))
    scale = np.abs(ref).max()
    for name, mk in [("opfused", make_opfused), ("epilogue", make_epilogue)]:
        got = np.asarray(jax.jit(mk(P.HIGHEST))(uT))
        print(f"{name} rel err: {np.abs(got - ref).max() / scale:.3e}",
              flush=True)

    for prec, tag in [(P.HIGHEST, "HIGHEST"), (P.HIGH, "HIGH")]:
        for name, mk in [("3-matmul", make3), ("opfused", make_opfused),
                         ("epilogue", make_epilogue)]:
            t = timed(jax.jit(mk(prec)), uT)
            print(f"{name:10s} {tag:8s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
