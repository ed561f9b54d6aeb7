"""Probe: row-major (E, n) pallas fused apply with sublane-halo DSS.

Blocks (TE, n) with elements in sublanes; matmul u_win @ KcatT in the
activations-by-weights orientation; DSS via sublane-shifted slices of the
halo window.  Development tool, not part of the suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def build(n, ne, oe, ov, off_int, TE, H, Epad, edge_classes, vert_classes,
          KcatT, aE, M, precision, do_dss=True):
    """KcatT: (n, 3n); aE: (Epad, 3); M: (Epad, C) masks."""
    G = Epad // TE
    n_e = len(edge_classes)

    def kernel(uL_ref, uC_ref, uR_ref, aL_ref, aC_ref, aR_ref, K_ref,
               m_ref, out_ref):
        if H > 0:
            u_win = jnp.concatenate(
                [uL_ref[TE - H:], uC_ref[:], uR_ref[:H]], axis=0)
            a_win = jnp.concatenate(
                [aL_ref[TE - H:], aC_ref[:], aR_ref[:H]], axis=0)
        else:
            u_win, a_win = uC_ref[:], aC_ref[:]
        V = jax.lax.dot_general(
            u_win, K_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                           # (TEw, 3n)
        S = (a_win[:, 0:1] * V[:, :n] + a_win[:, 1:2] * V[:, n:2 * n]
             + a_win[:, 2:3] * V[:, 2 * n:])
        if not do_dss:
            out_ref[:] = S[H:H + TE].astype(out_ref.dtype)
            return
        edge_out = [S[H:H + TE, oe + f * ne: oe + (f + 1) * ne]
                    for f in range(4)]
        for ci, (d_f, s_f, delta, flip) in enumerate(edge_classes):
            src = S[H + delta: H + delta + TE,
                    oe + s_f * ne: oe + (s_f + 1) * ne]
            if flip:
                src = src[:, ::-1]
            edge_out[d_f] = edge_out[d_f] + src * m_ref[:, ci:ci + 1]
        vert_out = [S[H:H + TE, ov + v: ov + v + 1] for v in range(4)]
        for cj, (d_s, s_s, delta) in enumerate(vert_classes):
            src = S[H + delta: H + delta + TE, ov + s_s: ov + s_s + 1]
            vert_out[d_s] = vert_out[d_s] + src * m_ref[
                :, n_e + cj: n_e + cj + 1]
        out = jnp.concatenate(
            edge_out + vert_out + [S[H:H + TE, off_int:]], axis=1)
        out_ref[:] = out.astype(out_ref.dtype)

    uspec_c = pl.BlockSpec((TE, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    uspec_l = pl.BlockSpec((TE, n), lambda i: (jnp.maximum(i - 1, 0), 0),
                           memory_space=pltpu.VMEM)
    uspec_r = pl.BlockSpec((TE, n),
                           lambda i: (jnp.minimum(i + 1, G - 1), 0),
                           memory_space=pltpu.VMEM)
    aspec_c = pl.BlockSpec((TE, 3), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    aspec_l = pl.BlockSpec((TE, 3), lambda i: (jnp.maximum(i - 1, 0), 0),
                           memory_space=pltpu.VMEM)
    aspec_r = pl.BlockSpec((TE, 3),
                           lambda i: (jnp.minimum(i + 1, G - 1), 0),
                           memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((n, 3 * n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((TE, M.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)

    @jax.jit
    def fused(uE):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Epad, n), uE.dtype),
            grid=(G,),
            in_specs=[uspec_l, uspec_c, uspec_r,
                      aspec_l, aspec_c, aspec_r, kspec, mspec],
            out_specs=uspec_c,
        )(uE, uE, uE, aE, aE, aE, KcatT, M)
    return fused


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
    TE0 = 2048
    Epad = -(-E0 // TE0) * TE0
    ex = RollExchange(disc, pad_to=Epad)
    n, ne = ex.n_loc, ex.ne
    oe, ov = ex.off_edge, ex.off_vert
    assert oe == 0 and ex.n_edge_tail == 0 and ex.n_vert_tail == 0

    Gf = np.zeros((Epad, 3, n), np.float32)
    Gf[:E0] = np.asarray(prob._G, np.float32).reshape(E0, 3, -1)
    D = np.asarray(prob._D0)
    Dhat = sumfac.make_stacked_derivative(D, D)
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf[:E0], W)
    a_full = np.zeros((Epad, 3), np.float32)
    a_full[:E0] = a
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    KcatT = jnp.asarray(Kcat.astype(np.float32))        # (n, 3n)
    aE = jnp.asarray(a_full)                            # (Epad, 3)

    edge_classes, masks = [], []
    for d_f, s_f, delta, flip, mask in ex.edge_classes:
        edge_classes.append((d_f, s_f, int(delta), bool(flip)))
        masks.append(np.asarray(mask, np.float32))
    vert_classes = []
    for d_s, s_s, delta, mask in ex.vert_classes:
        vert_classes.append((d_s, s_s, int(delta)))
        masks.append(np.asarray(mask, np.float32))
    H = max([abs(c[2]) for c in edge_classes]
            + [abs(c[2]) for c in vert_classes])
    M = jnp.asarray(np.stack(masks, axis=1))            # (Epad, C)
    print(f"E={E0} pad={Epad} H={H}", flush=True)

    A_ref = sumfac.make_local_laplacian_operator(
        ex, jnp.asarray(Gf), Dhat, backend="xla")
    rng = np.random.RandomState(0)
    u_np = np.zeros((Epad, n), np.float32)
    u_np[:E0] = rng.standard_normal((E0, n)).astype(np.float32)
    uE = jnp.asarray(u_np)

    f_main = build(n, ne, oe, ov, ex.off_int, 512, H, Epad,
                   edge_classes, vert_classes, KcatT, aE, M, P.HIGHEST)
    vF = np.asarray(f_main(uE))
    vR = np.asarray(A_ref(uE))
    scale = np.abs(vR).max()
    print(f"rowmajor fused rel err: "
          f"{np.abs(vF[:E0]-vR[:E0]).max()/scale:.3e}", flush=True)

    variants = {
        "TE=512 HIGHEST":  f_main,
        "TE=512 DEFAULT":  build(n, ne, oe, ov, ex.off_int, 512, H, Epad,
                                 edge_classes, vert_classes, KcatT, aE, M,
                                 P.DEFAULT),
        "TE=512 nodss":    build(n, ne, oe, ov, ex.off_int, 512, H, Epad,
                                 edge_classes, vert_classes, KcatT, aE, M,
                                 P.HIGHEST, do_dss=False),
        "TE=512 HIGH":     build(n, ne, oe, ov, ex.off_int, 512, H, Epad,
                                 edge_classes, vert_classes, KcatT, aE, M,
                                 P.HIGH),
        "TE=1024 HIGHEST": build(n, ne, oe, ov, ex.off_int, 1024, H, Epad,
                                 edge_classes, vert_classes, KcatT, aE, M,
                                 P.HIGHEST),
    }
    for name, f in variants.items():
        t = chain(f, uE)
        print(f"{name:18s} {t*1e3:8.3f} ms", flush=True)
    t = chain(A_ref, uE)
    print(f"{'xla affine':18s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
