"""Probe: transposed (n, E) storage — elements in lanes — pure-XLA apply+DSS.

Lane padding for (E, n=81) storage is 81->128 (58% waste) on every
elementwise op; (n, E) wastes only the sublane pad (81->88, 9%).  The
affine assembled-K apply becomes S = sum_c Kc @ (a_c * u) with symmetric
Kc, i.e. three accumulating (n, n) @ (n, E) matmuls; the roll-class DSS
rolls along the lane (element) axis.  Development tool, not in the suite.
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
    n, ne, neb = ex.n_loc, ex.ne, ex.n_edge_block
    oe, ov, oi = ex.off_edge, ex.off_vert, ex.off_int
    assert ex.n_edge_tail == 0 and ex.n_vert_tail == 0

    Gf = np.asarray(prob._G, np.float32).reshape(E, 3, -1)
    D = np.asarray(prob._D0)
    Dhat = sumfac.make_stacked_derivative(D, D)
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    K0 = jnp.asarray(Kcat[:, :n].astype(np.float32))
    K1 = jnp.asarray(Kcat[:, n:2 * n].astype(np.float32))
    K2 = jnp.asarray(Kcat[:, 2 * n:].astype(np.float32))
    aT = jnp.asarray(a.T.astype(np.float32))             # (3, E)

    edge_classes = [(d, s, int(dl), bool(f), jnp.asarray(m))
                    for d, s, dl, f, m in ex.edge_classes]
    vert_classes = [(d, s, int(dl), jnp.asarray(m))
                    for d, s, dl, m in ex.vert_classes]

    def dss_T(vT):
        F = vT[oe:oe + neb]
        recv = jnp.zeros_like(F)
        for d_f, s_f, delta, flip, mask in edge_classes:
            src = jnp.roll(vT[oe + s_f * ne: oe + (s_f + 1) * ne], -delta,
                           axis=1)
            if flip:
                src = src[::-1, :]
            src = jnp.where(mask[None, :], src, 0.0)
            recv = recv.at[d_f * ne:(d_f + 1) * ne].add(src)
        edges = F + recv
        V = vT[ov:ov + 4]
        vsum = V
        for d_s, s_s, delta, mask in vert_classes:
            src = jnp.roll(V[s_s], -delta)
            vsum = vsum.at[d_s].add(jnp.where(mask, src, 0.0))
        return jnp.concatenate([edges, vsum, vT[oi:]], axis=0)

    def make_apply(precision, do_dss=True):
        def f(uT):
            S = jax.lax.dot_general(
                K0, uT * aT[0], (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            S += jax.lax.dot_general(
                K1, uT * aT[1], (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            S += jax.lax.dot_general(
                K2, uT * aT[2], (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            return dss_T(S) if do_dss else S
        return f

    # numeric check vs production
    A_ref = sumfac.make_local_laplacian_operator(
        ex, jnp.asarray(Gf), Dhat, backend="xla")
    rng = np.random.RandomState(0)
    uE = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))
    uT = jnp.asarray(np.asarray(uE).T.copy())
    f_hi = jax.jit(make_apply(P.HIGHEST))
    vT = np.asarray(f_hi(uT))
    vR = np.asarray(A_ref(uE))
    scale = np.abs(vR).max()
    print(f"transposed rel err: {np.abs(vT.T - vR).max() / scale:.3e}",
          flush=True)

    variants = {
        "T HIGHEST":      f_hi,
        "T HIGH":         make_apply(P.HIGH),
        "T DEFAULT":      make_apply(P.DEFAULT),
        "T nodss HIGHEST": make_apply(P.HIGHEST, do_dss=False),
    }
    for name, f in variants.items():
        t = chain(f, uT)
        print(f"{name:18s} {t*1e3:8.3f} ms", flush=True)
    t = chain(A_ref, uE)
    print(f"{'xla (E,n) prod':18s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
