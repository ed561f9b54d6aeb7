"""Probe: Pallas transposed-layout local apply (no DSS) vs XLA 3-matmul.

Storage (n, E).  The XLA affine path reads u three times (one per
symmetric-K matmul); a Pallas kernel reads each (n, TE) block once into
VMEM and runs the three accumulating matmuls there.  DSS stays in XLA
(dss_T).  Timing via rep-count differencing (removes the fixed
per-dispatch tunnel latency).  Development tool, not part of the suite.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(f, x0, reps=50):
    """Device time per call via (t_2N - t_N)/N, min of 3."""
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


def build_pallas_local(n, E, TE, Ks, aT, precision):
    """S = sum_c Kc @ (a_c * u) on (n, E) blocks of TE lanes."""
    G = E // TE
    Kcat = jnp.concatenate(Ks, axis=0)                     # (3n, n)

    def kernel(u_ref, a_ref, K_ref, out_ref):
        u = u_ref[:]                                       # (n, TE)
        acc = None
        for c in range(3):
            X = u * a_ref[c:c + 1, :]
            T = jax.lax.dot_general(
                K_ref[c * n:(c + 1) * n], X, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
            acc = T if acc is None else acc + T
        out_ref[:] = acc.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, E), jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((n, TE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, TE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    ), Kcat


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
    E0 = disc.E
    TE = 512
    Epad = -(-E0 // TE) * TE
    ex = RollExchange(disc, pad_to=Epad)
    n = ex.n_loc

    Gf = np.zeros((Epad, 3, n), np.float32)
    Gf[:E0] = np.asarray(prob._G, np.float32).reshape(E0, 3, -1)
    D = np.asarray(prob._D0)
    Dhat = sumfac.make_stacked_derivative(D, D)
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf[:E0], W)
    a_full = np.zeros((Epad, 3), np.float32)
    a_full[:E0] = a
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    Ks = [jnp.asarray(Kcat[:, c * n:(c + 1) * n].astype(np.float32))
          for c in range(3)]
    aT = jnp.asarray(np.ascontiguousarray(a_full.T))       # (3, Epad)

    # reference XLA transposed operator (local + dss)
    A_T = sumfac.make_local_laplacian_operator(
        ex, jnp.asarray(Gf), Dhat, vector_layout="ne")

    rng = np.random.RandomState(0)
    u_np = np.zeros((n, Epad), np.float32)
    u_np[:, :E0] = rng.standard_normal((n, E0)).astype(np.float32)
    uT = jnp.asarray(u_np)

    def xla_local(uT):
        S = None
        for c in range(3):
            T = jnp.einsum("nm,me->ne", Ks[c], uT * aT[c],
                           precision=P.HIGHEST)
            S = T if S is None else S + T
        return S

    for TE_i in (512, 1024, 2048):
        call, Kcat_d = build_pallas_local(n, Epad, TE_i, Ks, aT, P.HIGHEST)

        def pl_local(uT, call=call, Kcat_d=Kcat_d):
            return call(uT, aT, Kcat_d)

        if TE_i == 512:
            vP = np.asarray(pl_local(uT))
            vX = np.asarray(jax.jit(xla_local)(uT))
            scale = np.abs(vX).max()
            print(f"pallasT local rel err: "
                  f"{np.abs(vP - vX).max() / scale:.3e}", flush=True)

        t = timed(pl_local, uT)
        print(f"pallas local TE={TE_i:5d} {t*1e3:8.3f} ms", flush=True)

        def pl_full(uT, pl_local=pl_local):
            return ex.dss_T(pl_local(uT))

        t = timed(pl_full, uT)
        print(f"pallas +dssT TE={TE_i:5d} {t*1e3:8.3f} ms", flush=True)

    t = timed(jax.jit(xla_local), uT)
    print(f"{'xla local':22s} {t*1e3:8.3f} ms", flush=True)
    t = timed(A_T, uT)
    print(f"{'xla local+dssT':22s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
