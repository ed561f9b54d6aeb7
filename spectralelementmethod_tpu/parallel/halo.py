"""Explicit shard_map halo exchange for element-sharded L-vectors.

The production multi-chip path (:func:`.sharding.sharded_local_poisson_
problem`) shards every iteration-state array over the element axis and
relies on XLA *sharding propagation* to turn the roll-class DSS into
collective-permutes — verified by :mod:`tests.test_sharding_hlo`.  This
module provides the same operator with the halo exchange written
*explicitly* as ``jax.lax.ppermute`` inside ``jax.shard_map``:

* the communication pattern is guaranteed by construction (a compiler
  regression can at worst slow it down, not silently replicate a vector);
* each shard owns a contiguous block of elements; a roll by ``delta``
  becomes a block-local lane shift plus a ppermute of the ``delta``-wide
  boundary strip to the neighboring shard — the minimal halo traffic, one
  ICI hop on real hardware;
* f64 works (no Pallas involvement), so the multi-chip dry run can assert
  1e-10-level agreement with the single-device path.

The reference has no distributed machinery at all (SURVEY.md §2); this
layer is net-new TPU-native design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import sumfac

ELEM_AXIS = "elements"


def global_roll(x, delta: int, axis_name: str, n_shards: int,
                wrap: bool = True):
    """``jnp.roll(x, -delta, axis=-1)`` over a block-sharded last axis.

    Call inside ``shard_map``: ``x`` is the local (..., Eb) block.  The
    wrapped strip travels to the neighboring shard via one ppermute
    (global wrap-around included — class masks zero those lanes, exactly
    as they do for single-device ``jnp.roll``).

    ``wrap=False`` drops the global wrap-around pair from the ring
    (ppermute zero-fills the shard that receives nothing) — valid
    whenever the caller's class mask discards every wrapped lane, i.e.
    for any non-periodic element order.  On multi-slice fleets
    (:func:`.sharding.hybrid_device_mesh`) this removes the one ring hop
    that would otherwise cross DCN twice.
    """
    if delta == 0:
        return x
    Eb = x.shape[-1]
    if n_shards == 1:
        return jnp.roll(x, -delta, axis=-1)
    if abs(delta) >= Eb:
        raise ValueError(
            f"roll offset {delta} exceeds the per-shard block ({Eb}); "
            f"use fewer shards or a locality-preserving element order")
    S = n_shards
    if delta > 0:
        strip = x[..., :delta]
        pairs = [((i + 1) % S, i) for i in range(S)]
        if not wrap:
            pairs = pairs[:-1]          # drop source 0 -> dest S-1
        recv = jax.lax.ppermute(strip, axis_name, pairs)
        return jnp.concatenate([x[..., delta:], recv], axis=-1)
    d = -delta
    strip = x[..., Eb - d:]
    pairs = [((i - 1) % S, i) for i in range(S)]
    if not wrap:
        pairs = pairs[1:]               # drop source S-1 -> dest 0
    recv = jax.lax.ppermute(strip, axis_name, pairs)
    return jnp.concatenate([recv, x[..., :Eb - d]], axis=-1)


def _class_uses_wrap(mask, delta: int) -> bool:
    """True iff rolling by ``delta`` feeds any unmasked destination lane
    from a wrapped (modulo-E) source — i.e. the element order is
    periodic for this roll class.

    ``jnp.roll(v, -delta)`` wraps destinations ``[E-delta, E)`` (for
    ``delta > 0``; ``[0, -delta)`` otherwise); the contribution survives
    the class mask only if the mask is set there.
    """
    m = np.asarray(mask, bool)
    return bool(m[-delta:].any() if delta > 0 else m[:-delta].any())


def _check_exchange(exchange):
    ex = exchange
    if not hasattr(ex, "edge_classes"):
        raise ValueError("halo exchange requires a roll-class exchange "
                         "(RollExchange)")
    if ex.n_edge_tail or ex.n_vert_tail:
        raise ValueError(
            "halo exchange requires zero roll-class tails (structured "
            "meshes); generic pairs would need arbitrary cross-shard "
            "gathers")
    if ex.layout != "edges-first":
        raise ValueError("halo exchange requires edges-first layout")
    return ex


def make_halo_dss_T(exchange, axis_name: str = ELEM_AXIS,
                    n_shards: int = 1):
    """Roll-class DSS on a transposed L-vector *block*, for shard_map.

    Returns ``dss(vT_blk, masks_blk) -> vT_blk`` where ``vT_blk`` is the
    shard's (n_loc, Eb) block and ``masks_blk`` the matching (C, Eb) slice
    of the stacked class masks (edge classes first, then vertex classes —
    the order of :func:`stack_class_masks`).  Mirrors
    :meth:`..ops.exchange.RollExchange._dss_T_2d` with
    :func:`global_roll` in place of ``jnp.roll``.
    """
    ex = _check_exchange(exchange)
    neb = ex.n_edge_block
    # per-slot offsets/lengths (anisotropic orders: axis-0 and axis-1
    # edge slots differ in length; class pairing is always same-length)
    eo, el = ex.edge_off, ex.edge_len
    oe, ov = ex.off_edge, ex.off_vert
    # per-class wrap elision: a class whose mask discards every wrapped
    # lane (any non-periodic element order) skips the ring's wrap-around
    # ppermute pair — on a slice-major multi-slice mesh that pair is the
    # one crossing DCN in both directions
    edge_classes = [(d, s, int(dl), bool(f), _class_uses_wrap(m, int(dl)))
                    for d, s, dl, f, m in ex.edge_classes]
    vert_classes = [(d, s, int(dl), _class_uses_wrap(m, int(dl)))
                    for d, s, dl, m in ex.vert_classes]
    n_e = len(edge_classes)

    def dss(vT, masks):
        if neb > 0:
            F = vT[oe:oe + neb]
            recv = jnp.zeros_like(F)
            for ci, (d_f, s_f, delta, flip, wrp) in enumerate(edge_classes):
                src = global_roll(vT[oe + eo[s_f]: oe + eo[s_f] + el[s_f]],
                                  delta, axis_name, n_shards, wrap=wrp)
                if flip:
                    src = src[::-1, :]
                src = jnp.where(masks[ci:ci + 1], src, 0.0)
                recv = recv.at[eo[d_f]:eo[d_f] + el[d_f]].add(src)
            edges = F + recv
        else:
            edges = None

        V = vT[ov:ov + 4]
        vsum = V
        for cj, (d_s, s_s, delta, wrp) in enumerate(vert_classes):
            src = global_roll(V[s_s], delta, axis_name, n_shards, wrap=wrp)
            vsum = vsum.at[d_s].add(
                jnp.where(masks[n_e + cj], src, 0.0))

        if edges is not None:
            return jnp.concatenate([edges, vsum, vT[ex.off_int:]], axis=0)
        return vT.at[ov:ov + 4].set(vsum)

    dss._edge_wrap = [c[4] for c in edge_classes]
    dss._vert_wrap = [c[3] for c in vert_classes]
    return dss


def stack_class_masks(exchange) -> np.ndarray:
    """(C, E) bool stack of the exchange's class masks (edges, verts)."""
    ex = _check_exchange(exchange)
    masks = [np.asarray(m, bool) for *_c, m in ex.edge_classes]
    masks += [np.asarray(m, bool) for *_c, m in ex.vert_classes]
    if not masks:
        return np.zeros((0, ex.E), dtype=bool)
    return np.stack(masks, axis=0)


class _BlockExchangeView:
    """Exchange-shaped view of one halo-extended element block.

    Presents the roll-class *structure* of a global exchange
    (slots, offsets, deltas) with the element count replaced by the
    extended per-shard block size, for
    :func:`..ops.pallas_kernels.make_fused_affine_block_kernel` —
    which takes the (per-shard) class masks as a runtime operand, so
    none are baked here.
    """

    layout = "edges-first"
    n_edge_tail = 0
    n_vert_tail = 0

    def __init__(self, ex, E_ext: int):
        self.n_loc, self.ne = ex.n_loc, ex.ne
        self.edge_len, self.edge_off = ex.edge_len, ex.edge_off
        self.off_edge, self.off_vert = ex.off_edge, ex.off_vert
        self.off_int = ex.off_int
        self.E = self.E_real = int(E_ext)
        self.edge_classes = [(d, s, int(dl), bool(f), None)
                             for d, s, dl, f, _m in ex.edge_classes]
        self.vert_classes = [(d, s, int(dl), None)
                             for d, s, dl, _m in ex.vert_classes]


def make_sharded_fused_operator(exchange, Kcat, a, mesh,
                                free_local=None,
                                axis: str = ELEM_AXIS,
                                precision: str = "highest",
                                interpret: bool = False):
    """Element-sharded fused Pallas apply+DSS with explicit ppermute halo.

    Composes the single-chip production kernel with the multi-chip halo
    exchange: each shard ppermutes its boundary strips (one ICI hop),
    concatenates them onto its (n_loc, Eb) block, and runs the fused
    apply+DSS kernel (:func:`..ops.pallas_kernels.
    make_fused_affine_block_kernel`) on the extended block — matmuls,
    affine reduction and the complete roll-class DSS in one VMEM pass,
    per shard.  The per-shard affine factors and class masks are the
    matching halo-extended slices of the global arrays, passed as sharded
    runtime operands.

    ``Kcat``: (n, 3n) assembled element stiffness
    (``..ops.sumfac.make_affine_element_matrices``); ``a``: (E, 3) affine
    factor scales, padded to the exchange's element count.  Returns
    ``A(uT)`` on (n_loc, E) f32 arrays sharded ``P(None, axis)``.

    Redundant compute: each shard re-applies the operator on its 2·Hpad
    halo columns — a ~2·Hpad·S/E fraction (<2% at 1M elements over 8
    shards with row-stride halos).
    """
    from ..ops import pallas_kernels as pk

    ex = _check_exchange(exchange)
    n, E = ex.n_loc, ex.E
    S = int(mesh.devices.size)
    if E % S:
        raise ValueError(f"E={E} not divisible by {S} shards; pad the "
                         f"exchange (pad_to)")
    Eb = E // S
    deltas = ([abs(int(c[2])) for c in ex.edge_classes]
              + [abs(int(c[2])) for c in ex.vert_classes] + [1])
    H_full = max(deltas)
    # halo width: lane-aligned cover of every roll offset, grown until
    # the extended block admits a fused tiling
    Hpad = -(-H_full // 128) * 128
    for _ in range(64):
        if pk.fused_affine_tile_shape(Eb + 2 * Hpad, H_full) is not None:
            break
        Hpad += 128
    else:
        raise ValueError(f"no admissible fused tiling for block {Eb} "
                         f"with halo {H_full}")
    if Hpad > Eb:
        raise ValueError(
            f"halo {Hpad} exceeds the per-shard block ({Eb}); use fewer "
            f"shards or a locality-preserving element order")
    Eext = Eb + 2 * Hpad

    block_fn = pk.make_fused_affine_block_kernel(
        _BlockExchangeView(ex, Eext), Kcat, precision=precision,
        interpret=interpret)

    aT_g = np.ascontiguousarray(np.asarray(a, np.float32).T)     # (3, E)
    M_g = stack_class_masks(ex).astype(np.float32)               # (C, E)
    if M_g.shape[0] == 0:
        M_g = np.zeros((1, E), np.float32)
    idx = (np.arange(-Hpad, Eb + Hpad)[None, :]
           + (np.arange(S) * Eb)[:, None]) % E                   # (S, Eext)
    a_stack = jnp.asarray(aT_g[:, idx].transpose(1, 0, 2))   # (S, 3, Eext)
    m_stack = jnp.asarray(M_g[:, idx].transpose(1, 0, 2))    # (S, C, Eext)

    def local_fn(uT, a_blk, m_blk):
        a_blk, m_blk = a_blk[0], m_blk[0]
        if S == 1:
            left, right = uT[:, Eb - Hpad:], uT[:, :Hpad]
        else:
            left = jax.lax.ppermute(
                uT[:, Eb - Hpad:], axis,
                [(j, (j + 1) % S) for j in range(S)])
            right = jax.lax.ppermute(
                uT[:, :Hpad], axis,
                [(j, (j - 1) % S) for j in range(S)])
        ext = jnp.concatenate([left, uT, right], axis=1)
        out = block_fn(ext, a_blk, m_blk)
        return out[:, Hpad:Hpad + Eb]

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None, None),
                  P(axis, None, None)),
        out_specs=P(None, axis),
        # pallas_call's out_shape carries no varying-mesh-axes info
        check_vma=False,
    )

    def A(uT):
        if free_local is not None:
            uT = jnp.where(free_local, uT, 0.0)
        vT = sharded(uT, a_stack, m_stack)
        if free_local is not None:
            vT = jnp.where(free_local, vT, 0.0)
        return vT

    A._halo = Hpad
    A._block_fn = block_fn
    A._no_hoist = True
    return A


def make_sharded_local_operator(exchange, Gf, Dhat, mesh,
                                free_local=None,
                                axis: str = ELEM_AXIS,
                                precision: str = "highest"):
    """Element-sharded transposed weak Laplacian with explicit ppermute.

    ``Gf``: (E, 3, n) geometric factors padded to the exchange's element
    count (``E`` must divide by the mesh size); ``free_local``: optional
    (n, E) transposed Dirichlet mask.  Returns ``A(uT)`` acting on
    (n_loc, E) arrays sharded ``P(None, axis)`` — inputs with any other
    sharding are resharded by jit.

    The matmuls are per-shard; only the DSS boundary strips communicate
    (|delta| lanes per roll class and direction — the halo).
    """
    ex = _check_exchange(exchange)
    n, E = ex.n_loc, ex.E
    S = int(mesh.devices.size)
    if E % S:
        raise ValueError(f"E={E} not divisible by {S} shards; pad the "
                         f"exchange (pad_to)")
    Gf = sumfac._pad_factors_to_exchange(Gf, ex)
    dt = jnp.asarray(Gf).dtype
    Dhat_h = jnp.asarray(np.asarray(Dhat)[:, ex.hier], dtype=dt)
    gT = jnp.asarray(
        np.ascontiguousarray(np.asarray(Gf).transpose(1, 2, 0)), dtype=dt)
    masks = jnp.asarray(stack_class_masks(ex))
    dss = make_halo_dss_T(ex, axis, S)

    def local_fn(uT, gT_blk, m_blk):
        grads = jnp.einsum("mn,ne->me", Dhat_h, uT,
                           precision=precision)            # (2n, Eb)
        ur, us = grads[:n], grads[n:]
        fr = gT_blk[0] * ur + gT_blk[1] * us
        fs = gT_blk[1] * ur + gT_blk[2] * us
        flux = jnp.concatenate([fr, fs], axis=0)
        S_loc = jnp.einsum("mn,me->ne", Dhat_h, flux,
                           precision=precision)            # (n, Eb)
        return dss(S_loc, m_blk)

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )

    def A(uT):
        if free_local is not None:
            uT = jnp.where(free_local, uT, 0.0)
        vT = sharded(uT, gT, masks)
        if free_local is not None:
            vT = jnp.where(free_local, vT, 0.0)
        return vT

    A._dss = dss
    return A
