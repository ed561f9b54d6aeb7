"""Prototype: fully-fused transposed-storage apply+DSS Pallas kernel.

Storage (n, E): elements in lanes (the layout XLA itself picks for the
DSS ops).  One kernel per element block: assembled-K matmul on a halo
window + per-class roll exchange in VMEM.  Compares numerics vs the
production XLA path and times both.  Development tool.
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


def chain(f, x0, reps=50):
    """Device time per call via (t_2N - t_N)/N, min of 3."""
    @jax.jit
    def run(x, m):
        def body(i, x):
            y = f(x)
            return y * jax.lax.rsqrt(jnp.vdot(y, y).astype(y.dtype) + 1e-30)
        return jax.lax.fori_loop(0, m, body, x)

    run(x0, reps).block_until_ready()

    def t(m, tries=3):
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            run(x0, m).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    return max(t(2 * reps) - t(reps), 1e-9) / reps


def build_kernel(n, ne, oe, ov, off_int, TE, H, edge_classes, vert_classes,
                 precision=jax.lax.Precision.HIGHEST, do_dss=True,
                 halo_mode=False):
    n_e = len(edge_classes)

    assert oe == 0 and ov == 4 * ne and off_int == 4 * ne + 4, \
        "kernel assumes edges-first layout"

    def kernel(uL_ref, uC_ref, uR_ref, aL_ref, aC_ref, aR_ref, K_ref,
               m_ref, out_ref):
        if halo_mode:
            # halo refs are (n, H) blocks adjacent to the center block
            u_win = jnp.concatenate(
                [uL_ref[:], uC_ref[:], uR_ref[:]], axis=1)
            a_win = jnp.concatenate(
                [aL_ref[:], aC_ref[:], aR_ref[:]], axis=1)
        elif H > 0:
            u_win = jnp.concatenate(
                [uL_ref[:, TE - H:], uC_ref[:], uR_ref[:, :H]], axis=1)
            a_win = jnp.concatenate(
                [aL_ref[:, TE - H:], aC_ref[:], aR_ref[:, :H]], axis=1)
        else:
            u_win, a_win = uC_ref[:], aC_ref[:]
        V = jax.lax.dot_general(
            K_ref[:], u_win, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                            # (3n, TE+2H)
        S = (a_win[0:1] * V[:n] + a_win[1:2] * V[n:2 * n]
             + a_win[2:3] * V[2 * n:])
        if not do_dss:
            out_ref[:] = S[:, H:H + TE].astype(out_ref.dtype)
            return
        # per-dst-slot accumulation, then one concat (no scatters)
        edge_out = [S[oe + f * ne: oe + (f + 1) * ne, H:H + TE]
                    for f in range(4)]
        def _start(delta):
            # clamp only matters for H=0 perf probes (numerics then wrong)
            return max(0, min(H + delta, S.shape[1] - TE))

        for ci, (d_f, s_f, delta, flip) in enumerate(edge_classes):
            s0 = _start(delta)
            src = S[oe + s_f * ne: oe + (s_f + 1) * ne, s0: s0 + TE]
            if flip:
                src = src[::-1]
            edge_out[d_f] = edge_out[d_f] + src * m_ref[ci:ci + 1, :]
        vert_out = [S[ov + v: ov + v + 1, H:H + TE] for v in range(4)]
        for cj, (d_s, s_s, delta) in enumerate(vert_classes):
            s0 = _start(delta)
            src = S[ov + s_s: ov + s_s + 1, s0: s0 + TE]
            vert_out[d_s] = vert_out[d_s] + src * m_ref[
                n_e + cj: n_e + cj + 1, :]
        out = jnp.concatenate(
            edge_out + vert_out + [S[off_int:, H:H + TE]], axis=0)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def main():
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import RollExchange

    p = 8
    nx = ny = 316
    TE = 2048
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    E0 = disc.E
    G = -(-E0 // TE)
    Epad = G * TE
    ex = RollExchange(disc, pad_to=Epad)
    E, n = ex.E, ex.n_loc
    ne, neb = ex.ne, ex.n_edge_block
    oe, ov = ex.off_edge, ex.off_vert
    assert ex.n_edge_tail == 0 and ex.n_vert_tail == 0
    print(f"E={E0} pad={Epad} n={n} classes: {len(ex.edge_classes)}e "
          f"{len(ex.vert_classes)}v", flush=True)

    # assembled-K pieces (all host-side: device round-trips through the
    # tunnel cost minutes at this size)
    Gf = np.zeros((Epad, 3, n), np.float32)
    Gf[:E0] = np.asarray(disc.laplacian_factors(None),
                         np.float32).reshape(E0, 3, -1)
    D = np.asarray(disc.basis.subbases[0].D1)
    Dhat = sumfac.make_stacked_derivative(D, D)
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf[:E0], W)
    print("affine exact:", exact, flush=True)
    a_full = np.zeros((Epad, 3), np.float32)
    a_full[:E0] = a
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    KT = jnp.asarray(
        np.concatenate([Kcat[:, :n], Kcat[:, n:2 * n], Kcat[:, 2 * n:]],
                       axis=0).T.astype(np.float32))      # (3n, n): K_k rows
    # rows of KT: [K0; K1; K2] each (n, n) so that KT @ u = [K0 u; K1 u; K2 u]
    KT = jnp.asarray(np.concatenate(
        [Kcat[:, :n].T, Kcat[:, n:2 * n].T, Kcat[:, 2 * n:].T],
        axis=0).astype(np.float32))

    # classes + H
    edge_classes, masks = [], []
    for d_f, s_f, delta, flip, mask in ex.edge_classes:
        edge_classes.append((d_f, s_f, int(delta), bool(flip)))
        masks.append(np.asarray(mask, np.float32))
    vert_classes = []
    for d_s, s_s, delta, mask in ex.vert_classes:
        vert_classes.append((d_s, s_s, int(delta)))
        masks.append(np.asarray(mask, np.float32))
    H = max(abs(c[2]) for c in edge_classes + [v + (0,) for v in
                                               [(0, 0, 0)]]
            ) if edge_classes else 0
    H = max([abs(c[2]) for c in edge_classes]
            + [abs(c[2]) for c in vert_classes])
    assert H <= TE, (H, TE)
    print(f"H={H}", flush=True)
    M = jnp.asarray(np.stack(masks, axis=0))             # (C, Epad)
    aT = jnp.asarray(a_full.T)                           # (3, Epad)

    import jax.lax as lax
    def make_fused(TE, H, precision, do_dss):
        G = Epad // TE
        kernel = build_kernel(n, ne, oe, ov, ex.off_int, TE, H,
                              edge_classes, vert_classes,
                              precision=precision, do_dss=do_dss)
        uspec_c = pl.BlockSpec((n, TE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        uspec_l = pl.BlockSpec((n, TE),
                               lambda i: (0, jnp.maximum(i - 1, 0)),
                               memory_space=pltpu.VMEM)
        uspec_r = pl.BlockSpec((n, TE),
                               lambda i: (0, jnp.minimum(i + 1, G - 1)),
                               memory_space=pltpu.VMEM)
        aspec_c = pl.BlockSpec((3, TE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        aspec_l = pl.BlockSpec((3, TE),
                               lambda i: (0, jnp.maximum(i - 1, 0)),
                               memory_space=pltpu.VMEM)
        aspec_r = pl.BlockSpec((3, TE),
                               lambda i: (0, jnp.minimum(i + 1, G - 1)),
                               memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((3 * n, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((M.shape[0], TE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)

        @jax.jit
        def fused_T(uT):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n, Epad), uT.dtype),
                grid=(G,),
                in_specs=[uspec_l, uspec_c, uspec_r,
                          aspec_l, aspec_c, aspec_r, kspec, mspec],
                out_specs=uspec_c,
            )(uT, uT, uT, aT, aT, aT, KT, M)
        return fused_T

    # reference path
    A_ref = sumfac.make_local_laplacian_operator(
        ex, jnp.asarray(Gf), Dhat, backend="xla")

    rng = np.random.RandomState(0)
    u_np = np.zeros((Epad, n), np.float32)
    u_np[:E0] = rng.standard_normal((E0, n)).astype(np.float32)
    uL = jnp.asarray(u_np)
    uT = jnp.asarray(u_np.T.copy())

    fused_main = make_fused(2048, H, lax.Precision.HIGHEST, True)
    vT = np.asarray(fused_main(uT)).T
    vR = np.asarray(A_ref(uL))
    scale = np.abs(vR).max()
    err = np.abs(vT[:E0] - vR[:E0]).max() / scale
    print(f"fusedT vs xla rel err: {err:.3e}", flush=True)

    # ---- halo-block variant: small (n, Hb) halo refs instead of full
    # TE-blocks (cuts the 3x u-read amplification to (TE+2Hb)/TE) --------
    def make_fused_halo(TEh, Hb, precision):
        assert Hb >= H and TEh % Hb == 0
        Gh = -(-E0 // TEh)
        Eph = Gh * TEh
        if Eph != Epad:
            exh = RollExchange(disc, pad_to=Eph)
            masks_h, edge_h, vert_h = [], [], []
            for d_f, s_f, delta, flip, mask in exh.edge_classes:
                edge_h.append((d_f, s_f, int(delta), bool(flip)))
                masks_h.append(np.asarray(mask, np.float32))
            for d_s, s_s, delta, mask in exh.vert_classes:
                vert_h.append((d_s, s_s, int(delta)))
                masks_h.append(np.asarray(mask, np.float32))
            Mh = jnp.asarray(np.stack(masks_h, axis=0))
            a_h = np.zeros((Eph, 3), np.float32)
            a_h[:E0] = a
            aTh = jnp.asarray(a_h.T)
        else:
            Mh, aTh, edge_h, vert_h = M, aT, edge_classes, vert_classes
        k = TEh // Hb
        kernel = build_kernel(n, ne, oe, ov, ex.off_int, TEh, Hb,
                              edge_h, vert_h, precision=precision,
                              do_dss=True, halo_mode=True)
        uspec_c = pl.BlockSpec((n, TEh), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        uspec_l = pl.BlockSpec((n, Hb),
                               lambda i: (0, jnp.maximum(i * k - 1, 0)),
                               memory_space=pltpu.VMEM)
        uspec_r = pl.BlockSpec(
            (n, Hb), lambda i: (0, jnp.minimum((i + 1) * k, Gh * k - 1)),
            memory_space=pltpu.VMEM)
        aspec_c = pl.BlockSpec((3, TEh), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        aspec_l = pl.BlockSpec((3, Hb),
                               lambda i: (0, jnp.maximum(i * k - 1, 0)),
                               memory_space=pltpu.VMEM)
        aspec_r = pl.BlockSpec(
            (3, Hb), lambda i: (0, jnp.minimum((i + 1) * k, Gh * k - 1)),
            memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((3 * n, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((Mh.shape[0], TEh), lambda i: (0, i),
                             memory_space=pltpu.VMEM)

        @jax.jit
        def fused_T(uT):
            if uT.shape[1] != Eph:
                uT = jnp.pad(uT, ((0, 0), (0, Eph - uT.shape[1])))
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n, Eph), uT.dtype),
                grid=(Gh,),
                in_specs=[uspec_l, uspec_c, uspec_r,
                          aspec_l, aspec_c, aspec_r, kspec, mspec],
                out_specs=uspec_c,
            )(uT, uT, uT, aTh, aTh, aTh, KT, Mh)
            return out[:, :Epad]
        return fused_T

    fh = make_fused_halo(1920, 384, lax.Precision.HIGHEST)
    vH = np.asarray(fh(uT)).T
    err = np.abs(vH[:E0] - vR[:E0]).max() / scale
    print(f"fused halo vs xla rel err: {err:.3e}", flush=True)

    variants = {
        "fused TE=2048 HIGHEST": fused_main,
        "fusedhalo 1920 HIGHEST": fh,
        "fusedhalo 1920 DEFAULT": make_fused_halo(1920, 384,
                                                  lax.Precision.DEFAULT),
        "fusedhalo 3840 HIGHEST": make_fused_halo(3840, 384,
                                                  lax.Precision.HIGHEST),
        "fusedhalo 3840 DEFAULT": make_fused_halo(3840, 384,
                                                  lax.Precision.DEFAULT),
    }
    for name, f in variants.items():
        t = chain(f, uT)
        print(f"{name:24s} {t*1e3:8.3f} ms", flush=True)
    t = chain(A_ref, uL)
    print(f"{'xla affine apply':24s} {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
