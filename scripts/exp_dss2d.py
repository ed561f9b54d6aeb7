"""Experiment: 2D-native roll DSS + assembled-K affine apply vs current.

Hypotheses:
 1. RollExchange.dss pays for a trailing size-1 axis (lane waste); a pure-2D
    formulation on (E, n) should be ~3x faster.
 2. For affine meshes A_e = a0 K0 + a1 K1 + a2 K2 with fixed (n, n) K's:
    one (E, n) @ (n, 3n) matmul + pointwise combine beats the two-dot
    grad/flux pipeline.
Development tool, not part of the suite.
"""

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
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import RollExchange

    p = 8
    nx = ny = 316
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    ex = RollExchange(disc)
    E, n = ex.E, ex.n_loc
    ne, neb = ex.ne, ex.n_edge_block
    print(f"E={E} n={n} device={jax.devices()[0]}", flush=True)

    rng = np.random.RandomState(0)
    uL = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))

    # ---- current dss (with squeeze/unsqueeze) -----------------------------
    t = chain(ex.dss, uL)
    print(f"dss_roll_current     {t*1e3:8.3f} ms", flush=True)

    # ---- 2D-native roll dss ----------------------------------------------
    oe, ov = ex.off_edge, ex.off_vert

    def dss2d(vL):
        Ee = vL.shape[0]
        F = vL[:, oe:oe + neb]                       # (E, 4*ne) lanes
        recv = jnp.zeros_like(F)
        for d_f, s_f, delta, flip, mask in ex.edge_classes:
            src = jnp.roll(vL[:, oe + s_f * ne: oe + (s_f + 1) * ne],
                           -delta, axis=0)           # (E, ne)
            if flip:
                src = jnp.flip(src, axis=1)
            src = jnp.where(mask[:, None], src, 0.0)
            recv = recv.at[:, d_f * ne:(d_f + 1) * ne].add(src)
        edges = F + recv

        V = vL[:, ov:ov + 4]                         # (E, 4)
        vsum = V
        for d_s, s_s, delta, mask in ex.vert_classes:
            src = jnp.roll(V[:, s_s], -delta, axis=0)
            vsum = vsum.at[:, d_s].add(jnp.where(mask, src, 0.0))
        return jnp.concatenate([edges, vsum, vL[:, ex.off_int:]], axis=1)

    # correctness vs current
    ref = np.asarray(ex.dss(uL))
    got = np.asarray(dss2d(uL))
    err = np.abs(ref - got).max()
    print(f"dss2d max err vs current: {err:.3e}", flush=True)
    t = chain(dss2d, uL)
    print(f"dss_roll_2dnative    {t*1e3:8.3f} ms", flush=True)

    # ---- assembled-K affine apply ------------------------------------------
    Gf = np.asarray(prob._G, dtype=np.float64).reshape(E, 3, -1)
    D = np.asarray(prob._D0)
    Dhat = sumfac.make_stacked_derivative(D, D)      # (2n, n) lex
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    print(f"affine exact: {exact}", flush=True)

    Dr, Ds = Dhat[:n], Dhat[n:]
    K0 = Dr.T @ (W[:, None] * Dr)
    K1 = Dr.T @ (W[:, None] * Ds) + Ds.T @ (W[:, None] * Dr)
    K2 = Ds.T @ (W[:, None] * Ds)
    hier = ex.hier
    # permute to L-vector node order: K[hier][:, hier]
    Kstack = np.stack([K[np.ix_(hier, hier)] for K in (K0, K1, K2)])
    Kcat = jnp.asarray(
        np.concatenate(list(Kstack), axis=0).T.astype(np.float32))  # (n, 3n)
    a_d = jnp.asarray(a.astype(np.float32))          # (E, 3)

    def applyK(u):
        V = jnp.einsum("en,nm->em", u, Kcat, precision="highest")  # (E, 3n)
        return (a_d[:, 0:1] * V[:, :n] + a_d[:, 1:2] * V[:, n:2 * n]
                + a_d[:, 2:3] * V[:, 2 * n:])

    # reference local apply (affine path)
    A_ref = sumfac.make_local_laplacian_operator(
        ex, jnp.asarray(Gf.astype(np.float32)), Dhat, backend="xla")

    def local_ref(u):  # without dss: rebuild from pieces for err check
        return applyK(u)

    vK = np.asarray(ex.dss(applyK(uL)))
    vR = np.asarray(A_ref(uL))
    scale = np.abs(vR).max()
    print(f"assembled-K max rel err vs grad/flux: "
          f"{np.abs(vK - vR).max() / scale:.3e}", flush=True)

    t = chain(applyK, uL)
    print(f"applyK_local_xla     {t*1e3:8.3f} ms", flush=True)

    def applyK_dss(u):
        return dss2d(applyK(u))
    t = chain(applyK_dss, uL)
    print(f"applyK+dss2d         {t*1e3:8.3f} ms", flush=True)

    t = chain(A_ref, uL)
    print(f"current_affine_apply {t*1e3:8.3f} ms", flush=True)

    # high precision variant (3-pass)
    def applyK_hi(u):
        V = jnp.einsum("en,nm->em", u, Kcat, precision="high")
        return (a_d[:, 0:1] * V[:, :n] + a_d[:, 1:2] * V[:, n:2 * n]
                + a_d[:, 2:3] * V[:, 2 * n:])
    vH = np.asarray(ex.dss(applyK_hi(uL)))
    print(f"high-precision rel err: {np.abs(vH - vR).max() / scale:.3e}",
          flush=True)
    t = chain(lambda u: dss2d(applyK_hi(u)), uL)
    print(f"applyK_hi+dss2d      {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
