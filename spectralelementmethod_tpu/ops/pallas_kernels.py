"""Pallas TPU kernels for the hot element-apply path.

The TPU-native answer to the reference's native-code component (its only C
file, ``sem/bary_interp.c``, is an unbuilt barycentric-interpolation
prototype): here the per-element operator application itself is a fused
on-chip kernel.

The element-batched weak Laplacian (``..ops.sumfac.make_local_laplacian_
operator``) is two large MXU matmuls with elementwise geometric-factor
weighting in between:

    grads = u  @ Dhat^T        # (E, n) @ (n, 2n)
    flux  = G . grads          # pointwise, 3 factor fields
    out   = flux @ Dhat        # (E, 2n) @ (2n, n)

Under plain XLA the (E, 2n) intermediates round-trip through HBM between
the two dots (XLA does not fuse across a dot boundary), roughly doubling
the HBM traffic of an apply that is bandwidth-bound at practical sizes
(p=8: 32 f32 FLOP/byte fused vs the ~60 FLOP/byte machine balance of a
v5e).  This kernel tiles the element axis, keeps ``grads``/``flux`` in
VMEM, and streams only u, G and the result through HBM.

Row-wise independence makes partial final blocks safe: each output row
depends only on its own input rows, so padded lanes/rows never leak into
stored results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _laplacian_block_kernel(u_ref, g0_ref, g1_ref, g2_ref, dhat_ref,
                            out_ref):
    """One element tile: fused grad -> G-weighting -> grad^T in VMEM."""
    n = out_ref.shape[1]
    u = u_ref[:]
    dhat = dhat_ref[:]
    # (TE, n) @ (2n, n)^T -> (TE, 2n); contract the shared n axis.
    grads = jax.lax.dot_general(
        u, dhat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ur, us = grads[:, :n], grads[:, n:]
    fr = g0_ref[:] * ur + g1_ref[:] * us
    fs = g1_ref[:] * ur + g2_ref[:] * us
    flux = jnp.concatenate([fr, fs], axis=1)            # (TE, 2n)
    out_ref[:] = jnp.dot(
        flux, dhat, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_e", "interpret")
)
def fused_laplacian_local(uL, g0, g1, g2, dhat, *, block_e: int = 512,
                          interpret: bool = False):
    """Fused local weak-Laplacian apply on L-vectors.

    Parameters
    ----------
    uL : (E, n) element-local field (any consistent node order, as long as
        ``dhat`` columns/rows use the same order).
    g0, g1, g2 : (E, n) geometric factor fields [G00, G01, G11].
    dhat : (2n, n) stacked derivative matrix
        (:func:`..ops.sumfac.make_stacked_derivative`, column-permuted to
        the L-vector's node order).
    block_e : element-tile size (rows per kernel instance).
    interpret : run in the Pallas interpreter (CPU testing).

    Returns the **local** result (E, n); DSS exchange is applied by the
    caller (it is cross-element and stays in XLA).
    """
    E, n = uL.shape
    te = max(8, min(block_e, E))
    grid = (pl.cdiv(E, te),)

    row_spec = pl.BlockSpec((te, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    dhat_spec = pl.BlockSpec((2 * n, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    flops = 2 * E * n * (2 * n) * 2 + 6 * E * n
    nbytes = uL.dtype.itemsize
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=E * n * nbytes * 5 + dhat.size * dhat.dtype.itemsize,
        transcendentals=0,
    )

    return pl.pallas_call(
        _laplacian_block_kernel,
        out_shape=jax.ShapeDtypeStruct((E, n), uL.dtype),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, row_spec, dhat_spec],
        out_specs=row_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(uL, g0, g1, g2, dhat)


def _vector_laplacian_block_kernel(u_ref, g0_ref, g1_ref, g2_ref, dhat_ref,
                                   out_ref):
    """Like :func:`_laplacian_block_kernel` for k stacked components.

    u_ref/out_ref: (TE, k*n) with components side by side; the geometric
    factors are shared across components.
    """
    n = g0_ref.shape[1]
    k = out_ref.shape[1] // n
    dhat = dhat_ref[:]
    outs = []
    for c in range(k):
        u = u_ref[:, c * n:(c + 1) * n]
        grads = jax.lax.dot_general(
            u, dhat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ur, us = grads[:, :n], grads[:, n:]
        fr = g0_ref[:] * ur + g1_ref[:] * us
        fs = g1_ref[:] * ur + g2_ref[:] * us
        flux = jnp.concatenate([fr, fs], axis=1)
        outs.append(jnp.dot(flux, dhat, preferred_element_type=jnp.float32))
    out_ref[:] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_e", "interpret"))
def fused_vector_laplacian_local(uL, g0, g1, g2, dhat, *,
                                 block_e: int = 256,
                                 interpret: bool = False):
    """Fused apply for multi-component fields.

    ``uL``: (E, k*n) with k components concatenated along the last axis
    (one Laplacian per component, shared geometric factors).
    """
    E, kn = uL.shape
    n = g0.shape[1]
    te = max(8, min(block_e, E))
    grid = (pl.cdiv(E, te),)

    u_spec = pl.BlockSpec((te, kn), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((te, n), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    dhat_spec = pl.BlockSpec((2 * n, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _vector_laplacian_block_kernel,
        out_shape=jax.ShapeDtypeStruct((E, kn), uL.dtype),
        grid=grid,
        in_specs=[u_spec, g_spec, g_spec, g_spec, dhat_spec],
        out_specs=u_spec,
        interpret=interpret,
    )(uL, g0, g1, g2, dhat)


def fused_affine_tile_shape(E: int, H: int,
                            target_win: int = 4608) -> tuple[int, int] | None:
    """(TE, Hb) for :func:`make_fused_affine_laplacian_T`, or None.

    ``Hb`` is the lane-aligned halo-block width (>= H, multiple of 128);
    ``TE`` a multiple of ``Hb`` dividing ``E`` chosen so the kernel's
    VMEM *window* ``TE + 2 Hb`` stays near ``target_win`` lanes (the
    window bounds scoped-vmem use; 4608 lanes of p=8 f32 state fits the
    16 MB stack with room to spare).  Returns None when no admissible
    tiling exists — callers then pad the exchange
    (``pad_to=fused_affine_pad(E, H)``) or fall back to the XLA path.
    """
    if H <= 0:
        return None
    Hb = -(-H // 128) * 128
    if 3 * Hb > 6912:
        return None       # minimum window (k=1) would blow scoped vmem
    best = None
    k = max(1, round(target_win / Hb) - 2)
    for kk in sorted(range(1, 4 * k + 1), key=lambda x: abs(x - k)):
        TE = kk * Hb
        if E % TE == 0:
            best = (TE, Hb)
            break
    return best


def fused_affine_pad(E: int, H: int, target_win: int = 4608) -> int:
    """Padded element count making the fused-T tiling admissible."""
    Hb = -(-max(H, 1) // 128) * 128
    TE = max(1, round(target_win / Hb) - 2) * Hb
    return -(-E // TE) * TE


def make_fused_affine_laplacian_T(exchange, Kcat, a, *,
                                  precision: str = "highest",
                                  target_win: int = 4608,
                                  interpret: bool = False):
    """Fully-fused transposed-storage apply+DSS kernel (affine meshes).

    One Pallas kernel per (n, TE) lane-block of a transposed (n, E)
    L-vector: assembled-K matmul ``V = [K0;K1;K2] @ u_win`` on a halo
    window (two extra (n, Hb) halo blocks cover every roll-class offset),
    per-element affine reduction ``S = sum_c a_c V_c``, then the complete
    roll-class DSS as static lane-offset slices + mask-weighted adds in
    VMEM.  Output equals ``exchange.dss_T(local_apply(u))`` bit-for-bit
    in structure (summation order differs at fp rounding level).

    Measured p=8 / 100k elements f32 on v5e: 0.30 ms vs 0.40 ms for the
    unfused XLA transposed path at ``highest``; 0.11 ms at ``default``
    (single-pass bf16 MXU).

    Requirements (ValueError otherwise): RollExchange-style ``exchange``
    with edges-first layout, zero exchange tails, and an admissible
    tiling (``fused_affine_tile_shape``; pad the exchange with
    ``pad_to=fused_affine_pad(E, H)`` to guarantee one).

    ``Kcat``: (n, 3n) assembled symmetric element-stiffness blocks
    (``..ops.sumfac.make_affine_element_matrices`` in the exchange's
    local node order).  ``a``: (E, 3) affine factor scales.
    """
    import numpy as np

    ex = exchange
    n, ne = ex.n_loc, ex.ne
    oe, ov, oi = ex.off_edge, ex.off_vert, ex.off_int
    E = ex.E
    if ex.layout != "edges-first":
        raise ValueError("fused-T kernel requires edges-first layout")
    if getattr(ex, "n_edge_tail", 1) or getattr(ex, "n_vert_tail", 1):
        raise ValueError("fused-T kernel requires zero exchange tails")

    edge_classes = [(d, s, int(dl), bool(f))
                    for d, s, dl, f, _m in ex.edge_classes]
    vert_classes = [(d, s, int(dl)) for d, s, dl, _m in ex.vert_classes]
    n_e = len(edge_classes)
    H = max([abs(c[2]) for c in edge_classes]
            + [abs(c[2]) for c in vert_classes] + [1])
    if precision == "high":
        # bf16x3 splits u into hi/lo copies in VMEM; the default window
        # overflows the 16 MB scoped-vmem stack by a hair at p=8
        target_win = int(target_win * 0.9)
    tile = fused_affine_tile_shape(E, H, target_win)
    if tile is None:
        raise ValueError(
            f"no admissible (TE, Hb) tiling for E={E}, H={H}; pad the "
            f"exchange to {fused_affine_pad(E, H, target_win)} elements")
    TE, Hb = tile
    G = E // TE
    k = TE // Hb

    masks = [np.asarray(m, np.float32) for *_c, m in ex.edge_classes]
    masks += [np.asarray(m, np.float32) for *_c, m in ex.vert_classes]
    M = jnp.asarray(np.stack(masks, axis=0))             # (C, E)
    Kcat = np.asarray(Kcat, dtype=np.float64)
    KT = jnp.asarray(np.concatenate(
        [Kcat[:, :n].T, Kcat[:, n:2 * n].T, Kcat[:, 2 * n:].T],
        axis=0).astype(np.float32))                      # (3n, n)
    aT = jnp.asarray(
        np.ascontiguousarray(np.asarray(a, np.float32).T))  # (3, E)
    if precision not in ("highest", "high", "default"):
        raise ValueError(f"unknown precision {precision!r}")
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}.get(precision)
    if precision == "high":
        # Mosaic has no native 3-pass dot; split K = K_hi + K_lo in bf16
        # host-side and run the standard bf16x3 decomposition in-kernel
        # (K_hi u_hi + K_hi u_lo + K_lo u_hi, f32 accumulation) — ~21
        # mantissa bits at half the passes of the 6-pass 'highest'.
        KT_np = np.asarray(KT)
        K_hi = KT_np.astype(jnp.bfloat16)
        K_lo = (KT_np - K_hi.astype(np.float32)).astype(jnp.bfloat16)
        KT = jnp.asarray(np.concatenate([K_hi, K_lo], axis=0))  # (6n, n)

    def kernel(uL_ref, uC_ref, uR_ref, aL_ref, aC_ref, aR_ref, K_ref,
               m_ref, out_ref):
        u_win = jnp.concatenate([uL_ref[:], uC_ref[:], uR_ref[:]], axis=1)
        a_win = jnp.concatenate([aL_ref[:], aC_ref[:], aR_ref[:]], axis=1)
        if precision == "high":
            u_hi = u_win.astype(jnp.bfloat16)
            u_lo = (u_win - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            K_hi, K_lo = K_ref[:3 * n], K_ref[3 * n:]
            dn = (((1,), (0,)), ((), ()))
            V = jax.lax.dot_general(
                K_hi, u_hi, dn, preferred_element_type=jnp.float32)
            V = V + jax.lax.dot_general(
                K_hi, u_lo, dn, preferred_element_type=jnp.float32)
            V = V + jax.lax.dot_general(
                K_lo, u_hi, dn, preferred_element_type=jnp.float32)
        else:
            V = jax.lax.dot_general(
                K_ref[:], u_win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )                                            # (3n, TE + 2Hb)
        S = (a_win[0:1] * V[:n] + a_win[1:2] * V[n:2 * n]
             + a_win[2:3] * V[2 * n:])
        # per-dst-slot accumulation, then one sublane concat (no scatters)
        edge_out = [S[oe + f * ne: oe + (f + 1) * ne, Hb:Hb + TE]
                    for f in range(4)]
        for ci, (d_f, s_f, delta, flip) in enumerate(edge_classes):
            s0 = Hb + delta
            src = S[oe + s_f * ne: oe + (s_f + 1) * ne, s0:s0 + TE]
            if flip:
                src = src[::-1]
            edge_out[d_f] = edge_out[d_f] + src * m_ref[ci:ci + 1, :]
        vert_out = [S[ov + v: ov + v + 1, Hb:Hb + TE] for v in range(4)]
        for cj, (d_s, s_s, delta) in enumerate(vert_classes):
            s0 = Hb + delta
            src = S[ov + s_s: ov + s_s + 1, s0:s0 + TE]
            vert_out[d_s] = vert_out[d_s] + src * m_ref[
                n_e + cj: n_e + cj + 1, :]
        out = jnp.concatenate(
            edge_out + vert_out + [S[oi:, Hb:Hb + TE]], axis=0)
        out_ref[:] = out.astype(out_ref.dtype)

    # halo refs are (., Hb) blocks directly left/right of the center block
    # (border blocks clamp onto real data; every contribution that could
    # read a clamped lane is zeroed by its class mask)
    specs = [
        pl.BlockSpec((n, Hb), lambda i: (0, jnp.maximum(i * k - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, TE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (n, Hb), lambda i: (0, jnp.minimum((i + 1) * k, G * k - 1)),
            memory_space=pltpu.VMEM),
        pl.BlockSpec((3, Hb), lambda i: (0, jnp.maximum(i * k - 1, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, TE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (3, Hb), lambda i: (0, jnp.minimum((i + 1) * k, G * k - 1)),
            memory_space=pltpu.VMEM),
        pl.BlockSpec((KT.shape[0], n), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((M.shape[0], TE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((n, TE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def apply_local_dss(uT):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, E), uT.dtype),
            grid=(G,),
            in_specs=specs,
            out_specs=out_spec,
            interpret=interpret,
        )(uT, uT, uT, aT, aT, aT, KT, M)

    return apply_local_dss


def supported() -> bool:
    """True when the default JAX backend compiles Pallas TPU kernels."""
    return jax.default_backend() == "tpu"
