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


def _im32(f):
    """Pin a BlockSpec index map's outputs to int32.

    Under ``jax_enable_x64`` a Python literal in the returned tuple traces
    as i64 while ``pl.program_id`` stays i32; Mosaic then fails to legalize
    the mixed ``func.return (i64, i32)``.  Every index map in this module
    goes through this wrapper so the kernels stay compilable regardless of
    the process-wide x64 flag (the squirmer path flips it on).
    """
    def g(*args):
        return tuple(jnp.asarray(v, jnp.int32) for v in f(*args))
    return g


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

    row_spec = pl.BlockSpec((te, n), _im32(lambda i: (i, 0)),
                            memory_space=pltpu.VMEM)
    dhat_spec = pl.BlockSpec((2 * n, n), _im32(lambda i: (0, 0)),
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

    u_spec = pl.BlockSpec((te, kn), _im32(lambda i: (i, 0)),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((te, n), _im32(lambda i: (i, 0)),
                          memory_space=pltpu.VMEM)
    dhat_spec = pl.BlockSpec((2 * n, n), _im32(lambda i: (0, 0)),
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


def _scale_win(base: int, n: int) -> int:
    """Scale a p=8-calibrated (n=81 rows) lane-window default to ``n``.

    The measured sweet-spot windows (4608 lanes for the plain apply,
    3072/1536 for the CG pair, ...) bound *bytes* of per-lane VMEM
    state, which grows linearly with the sublane row count n = (p+1)^2;
    higher orders must shrink the lane window proportionally or the
    kernel overflows the 16 MB scoped-vmem stack (observed at p=12:
    a 4608-lane window costs 21 MB).  Floored to the 128-lane tiler
    granularity, never below 384.
    """
    return max(384, int(base * 81 / n) // 128 * 128)


def _mask_zeros_of(kind, E):
    """Zero-element set of a procedural mask kind (host verification)."""
    import numpy as np

    if kind[0] == "run":
        out = np.zeros(E, bool)
        out[kind[1]:kind[1] + kind[2]] = True
        return out
    _, s0, P, L = kind
    return ((np.arange(E) - s0) % P) < L


def _fit_single_pattern(z, E):
    """Fit a zero-index set as ONE run or ONE periodic iota, else None."""
    import numpy as np

    if z.size == 0:
        return None
    run_start = np.concatenate([[True], np.diff(z) > 1])
    starts = z[run_start]
    lens = np.diff(np.concatenate([np.nonzero(run_start)[0], [z.size]]))
    if starts.size == 1:
        return ("run", int(starts[0]), int(lens[0]))
    d = np.diff(starts)
    if np.all(d == d[0]):
        s0, P, L = int(starts[0]) % int(d[0]), int(d[0]), int(lens.max())
        if s0 + L <= P:
            k = ("iota", s0, P, L)
            zk = np.nonzero(_mask_zeros_of(k, E))[0]
            if zk.size == z.size and np.array_equal(zk, z):
                return k
    return None


def _periodic_mask_params(mb) -> tuple | None:
    """Recognize a roll-class mask as a procedural iota predicate.

    Returns ``("all",)`` when every element keeps its contribution,
    ``("run", s0, L)`` when the zeroed elements are the single contiguous
    run ``[s0, s0 + L)`` (first/last element rows), ``("iota", s0, P, L)``
    when they are exactly ``{e : (e - s0) mod P < L}`` (periodic column
    masks of structured meshes, P = row stride), ``("and", k1, k2)`` when
    they are the *union* of two such patterns — run U iota (diagonal
    vertex classes of lexicographic meshes: first/last row union
    first/last column) or iota U iota (panel-ordered meshes: panel-
    boundary columns union slow-axis boundary rows) — else None (the
    mask streams as an operand row).

    All candidate fits are vectorized and bounded (no recursion): a
    previous recursive union-peel was O(runs^2) and took ~45 minutes on
    a single 1M-element panel-order mask.
    """
    import numpy as np

    mb = np.asarray(mb, bool)
    E = mb.size
    z = np.nonzero(~mb)[0]
    if z.size == 0:
        return ("all",)

    k = _fit_single_pattern(z, E)
    if k is not None:
        return k

    run_start = np.concatenate([[True], np.diff(z) > 1])
    starts = z[run_start]
    lens = np.diff(np.concatenate([np.nonzero(run_start)[0], [z.size]]))
    zero_set = ~mb

    # two-term union candidates for the FIRST pattern:
    cands1 = [("run", int(starts[int(np.argmax(lens))]),
               int(lens[int(np.argmax(lens))]))]
    d = np.diff(starts)
    vals, counts = np.unique(d, return_counts=True)
    if vals.size <= 6:
        # dominant run spacing -> periodic hypothesis with the modal
        # start residue and modal run length
        P = int(vals[int(np.argmax(counts))])
        if P > 1:
            res = starts % P
            rvals, rcounts = np.unique(res, return_counts=True)
            s0 = int(rvals[int(np.argmax(rcounts))])
            sel = res == s0
            if sel.any():
                lvals, lcounts = np.unique(lens[sel], return_counts=True)
                L = int(lvals[int(np.argmax(lcounts))])
                if s0 + L <= P:
                    cands1.append(("iota", s0, P, L))

    for k1 in cands1:
        zeros1 = _mask_zeros_of(k1, E)
        rest = z[~zeros1[z]]
        k2 = _fit_single_pattern(rest, E)
        if k2 is None:
            continue
        if np.array_equal(zeros1 | _mask_zeros_of(k2, E), zero_set):
            return ("and", k1, k2)
    return None


class _AffineFusedPrep:
    """Shared setup for the fused affine transposed-storage kernels.

    Validates the exchange, chooses the (TE, Hb) lane tiling, bakes the
    roll-class constants / masks, and prepares the assembled stiffness
    matrix in the requested precision.  Used by both the plain apply+DSS
    kernel (:func:`make_fused_affine_laplacian_T`) and the fused
    CG-iteration kernels (:func:`make_fused_cg_kernels`).
    """

    #: far-split candidate halo width (lane-block granularity): classes
    #: with |delta| <= this stay in-window, the rest go through the aux
    #: raw-row epilogue when that's cheaper (structured meshes have
    #: horizontal deltas of +-1 and vertical deltas of +-row-stride, so a
    #: single 128-lane bucket separates them)
    NEAR_HB = 128

    def __init__(self, exchange, Kcat, a, precision: str,
                 target_win: int, max_halo="auto",
                 cheap_far: bool = False,
                 external_operands: bool = False):
        """``external_operands=True`` builds the kernel for per-shard use
        inside ``shard_map``: the affine factors and the class masks are
        runtime operands (they differ per shard) instead of baked
        constants, every class mask streams as a row (procedural iota
        masks would need the shard's global lane offset), and the far
        split is disabled (callers pass ``max_halo=None``)."""
        import numpy as np

        self.cheap_far = cheap_far
        self.external_operands = external_operands
        if external_operands and max_halo is not None:
            raise ValueError("external_operands requires max_halo=None "
                             "(no far split inside shard_map)")
        ex = exchange
        self.ex = ex
        self.n = n = ex.n_loc
        self.ne = ex.ne              # None on anisotropic node grids
        self.oe, self.ov, self.oi = ex.off_edge, ex.off_vert, ex.off_int
        #: per-edge-slot sublane lengths/offsets (anisotropic-safe: the
        #: exchange guarantees classes only pair equal-length slots)
        self.el = tuple(int(v) for v in ex.edge_len)
        self.eo_rel = tuple(int(v) for v in ex.edge_off)
        self.E = E = ex.E
        if ex.layout != "edges-first":
            raise ValueError("fused-T kernel requires edges-first layout")
        if not hasattr(ex, "edge_classes"):
            raise ValueError("fused-T kernel requires a roll-class "
                             "exchange (RollExchange)")
        if getattr(ex, "n_edge_tail", 1) or getattr(ex, "n_vert_tail", 1):
            raise ValueError("fused-T kernel requires zero exchange tails")

        if precision == "high":
            # bf16x3 splits u into hi/lo copies in VMEM; the default
            # window overflows the 16 MB scoped-vmem stack at p=8
            target_win = int(target_win * 0.9)

        all_edge = [(d, s, int(dl), bool(f), m)
                    for d, s, dl, f, m in ex.edge_classes]
        all_vert = [(d, s, int(dl), m) for d, s, dl, m in ex.vert_classes]
        H_full = max([abs(c[2]) for c in all_edge]
                     + [abs(c[2]) for c in all_vert] + [1])
        if max_halo == "auto":
            max_halo = self._pick_max_halo(E, H_full, all_edge, all_vert,
                                           target_win)
        H = H_full if max_halo is None else min(H_full, int(max_halo))

        near_e = [c for c in all_edge if abs(c[2]) <= H]
        near_v = [c for c in all_vert if abs(c[2]) <= H]
        self._far_edge = [c for c in all_edge if abs(c[2]) > H]
        self._far_vert = [c for c in all_vert if abs(c[2]) > H]
        self.edge_classes = [(d, s, dl, f) for d, s, dl, f, _m in near_e]
        self.vert_classes = [(d, s, dl) for d, s, dl, _m in near_v]
        self.n_e = len(self.edge_classes)

        # aux raw-row layout for the far-class epilogue: the union of far
        # SOURCE slots, edge slots first then vertex slots (per-slot row
        # lengths — anisotropic grids have two distinct edge lengths)
        e_slots = sorted({s for _d, s, *_r in self._far_edge})
        v_slots = sorted({s for _d, s, *_r in self._far_vert})
        self.aux_e_slots, self.aux_v_slots = e_slots, v_slots
        self._aux_row, off = {}, 0
        for s in e_slots:
            self._aux_row[("e", s)] = off
            off += self.el[s]
        for s in v_slots:
            self._aux_row[("v", s)] = off
            off += 1
        self.n_aux = off
        self.has_far = self.n_aux > 0
        # compact far DESTINATION layout (kernel-B far fusion): one row
        # block per far dst edge slot, one row per far dst vertex slot
        self.far_e_dst = sorted({d for d, *_r in self._far_edge})
        self.far_v_dst = sorted({d for d, *_r in self._far_vert})
        self._far_dst_row, off = {}, 0
        for d in self.far_e_dst:
            self._far_dst_row[("e", d)] = off
            off += self.el[d]
        for d in self.far_v_dst:
            self._far_dst_row[("v", d)] = off
            off += 1
        self.n_far = off

        tile = fused_affine_tile_shape(E, H, target_win)
        if tile is None:
            raise ValueError(
                f"no admissible (TE, Hb) tiling for E={E}, H={H}; pad the "
                f"exchange to {fused_affine_pad(E, H, target_win)} "
                f"elements")
        self.TE, self.Hb = tile
        self.G = E // self.TE
        self.k = self.TE // self.Hb

        # procedural (iota-predicate) masks: on structured meshes most
        # class masks are periodic in the element index, so they can be
        # synthesized from an in-kernel iota instead of streaming a
        # (C, E) f32 mask operand (~8% of apply HBM traffic at p=8/100k,
        # ~12% at 1M).  Classes whose mask doesn't fit the periodic form
        # keep a row in the (reduced) mask operand.
        self.mask_kinds = []     # ("all",)|("iota", s0, P, L)|("row", i)
        Ereal = getattr(ex, "E_real", E)
        #: pad-tail cutoff: class masks are always False on pad elements,
        #: so procedural kinds AND-in ``g < pad_cut``
        self.pad_cut = Ereal if Ereal < E else None
        if external_operands:
            # per-shard masks arrive as a runtime operand: one row per
            # class, in class order (edges first — stack_class_masks)
            n_classes = len(near_e) + len(near_v)
            self.mask_kinds = [("row", i) for i in range(n_classes)]
            self.pad_cut = None          # pad lanes carried by the rows
            self.M = None
            self.n_mask_rows = max(1, n_classes)
        else:
            rows = []
            for m in ([m for *_c, m in near_e] + [m for *_c, m in near_v]):
                mb = np.asarray(m, bool)
                kind = (None if mb[Ereal:].any()
                        else _periodic_mask_params(mb[:Ereal]))
                if kind is None:
                    kind = ("row", len(rows))
                    rows.append(mb.astype(np.float32))
                self.mask_kinds.append(kind)
            self.M = (jnp.asarray(np.stack(rows, axis=0)) if rows
                      else jnp.zeros((1, E), jnp.float32))   # (C_row, E)
            self.n_mask_rows = self.M.shape[0]
        # procedural kinds for the FAR class masks (same detection as the
        # near masks above) — consumed by the aliased far-row update
        # kernel (:func:`make_far_update_kernel`); rows that don't fit a
        # periodic form stream as M_far rows
        self.far_mask_kinds = []
        far_rows = []
        for m in ([m for *_c, m in self._far_edge]
                  + [m for *_c, m in self._far_vert]):
            mb = np.asarray(m, bool)
            kind = (None if mb[Ereal:].any()
                    else _periodic_mask_params(mb[:Ereal]))
            if kind is None:
                kind = ("row", len(far_rows))
                far_rows.append(mb.astype(np.float32))
            self.far_mask_kinds.append(kind)
        self.M_far = (jnp.asarray(np.stack(far_rows, axis=0)) if far_rows
                      else jnp.zeros((1, E), jnp.float32))
        self.n_far_mask_rows = self.M_far.shape[0]
        self._far_edge = [(d, s, dl, f, jnp.asarray(np.asarray(m)))
                          for d, s, dl, f, m in self._far_edge]
        self._far_vert = [(d, s, dl, jnp.asarray(np.asarray(m)))
                          for d, s, dl, m in self._far_vert]
        if precision not in ("highest", "high", "default"):
            raise ValueError(f"unknown precision {precision!r}")
        self.precision = precision
        self.prec = {"highest": jax.lax.Precision.HIGHEST,
                     "default": jax.lax.Precision.DEFAULT}.get(precision)
        self.aT = (None if (external_operands or a is None) else jnp.asarray(
            np.ascontiguousarray(np.asarray(a, np.float32).T)))  # (3, E)
        if Kcat is None:
            # general-path kernels (make_fused_general_laplacian_T) bring
            # their own constants through prec_const/prec_dot
            self.KT = None
        else:
            Kcat = np.asarray(Kcat, dtype=np.float64)
            KT_np = np.concatenate(
                [Kcat[:, :n].T, Kcat[:, n:2 * n].T, Kcat[:, 2 * n:].T],
                axis=0).astype(np.float32)                   # (3n, n)
            # Mosaic has no native 3-pass dot; split K = K_hi + K_lo in
            # bf16 host-side and run the standard bf16x3 decomposition
            # in-kernel (K_hi u_hi + K_hi u_lo + K_lo u_hi, f32
            # accumulation) — ~21 mantissa bits at half the passes of the
            # 6-pass 'highest'.
            self.KT = self.prec_const(KT_np)

    def _pick_max_halo(self, E, H_full, all_edge, all_vert, target_win):
        """Split classes at NEAR_HB when that beats the full-halo window.

        At H ~ row-stride ~ sqrt(E) the window cap forces halo blocks
        comparable to the tile itself (measured ~2x redundant matmul work
        at 1M elements/p=8).  Splitting keeps the in-window halo at one
        128-lane block and routes the large-offset classes through an aux
        raw-row epilogue costing ~2.5 extra HBM passes over n_aux of the
        n rows.  Costs are compared as fractions of one full apply pass.
        """
        far_e = [c for c in all_edge if abs(c[2]) > self.NEAR_HB]
        far_v = [c for c in all_vert if abs(c[2]) > self.NEAR_HB]
        Hb_full = -(-H_full // 128) * 128
        if not (far_e or far_v) or Hb_full <= self.NEAR_HB:
            return None
        t_near = fused_affine_tile_shape(E, self.NEAR_HB, target_win)
        if t_near is None:
            return None
        t_full = fused_affine_tile_shape(E, H_full, target_win)
        cost_full = (2 * t_full[1] / t_full[0]) if t_full else float("inf")
        # Empirical rules (p=8 on v5e, measured twice each):
        #
        # Plain apply kernels (cheap_far=False): far rows go through the
        # aliased in-place far-row update kernel
        # (:func:`make_far_update_kernel` — ~1.1 extra HBM passes vs the
        # ~2-3 of the old apply_far concat rebuild).  Measured
        # `scripts/measure_far_update.py` at 1M/p=8 'highest': split
        # 4.47 ms vs full 5.82 (old XLA split: 7.24); at 100k
        # (cost_full=0.18) full still wins (0.20 vs 0.25).  Split once
        # the full-halo window is degenerate (cost_full >= 0.75) AND an
        # update-kernel tiling exists (without it the XLA epilogue would
        # re-create the measured-loss regime).
        #
        # Fused-CG kernels (cheap_far=True): the far rows ride into
        # kernel B's existing Ap stream (~1 extra pass over an ~18-row
        # slice).  Measured split-vs-full (ms/iter, v5e p=8):
        #   single 100k  cost 0.5: full wins (0.746 vs 0.754)
        #   batched k=2  cost 1.0: full wins (0.716 vs 0.783 per RHS)
        #   batched k=4  cost 2.0: split wins (0.775 vs 0.816 per RHS)
        #   single 1M    cost 2.0: split wins (9.81 vs 10.90; with
        #                defer_x=8: 6.66 vs 7.16 — they compose)
        # 1.5 separates the measured regimes (round-2n,
        # scripts/measure_cg_far_defer.py + measure_batched_cg_far.py).
        if not self.cheap_far:
            far_tile_ok = fused_affine_tile_shape(E, H_full, 8192)
            if far_tile_ok is None:
                return self.NEAR_HB if t_full is None else None
            return self.NEAR_HB if cost_full >= 0.75 else None
        return self.NEAR_HB if cost_full >= 1.5 else None

    # ---- precision-managed constants/dots (host + in-kernel) ------------

    def prec_const(self, C_np):
        """Prepare a constant matrix for :meth:`prec_dot`.

        'highest'/'default': the f32 ``(rows, m)`` matrix itself.
        'high': a bf16 hi/lo split stacked to ``(2*rows, m)`` — the
        in-kernel bf16x3 decomposition then recovers ~21 mantissa bits
        at half the passes of the 6-pass 'highest'.
        """
        import numpy as np

        C = np.asarray(C_np, dtype=np.float32)
        if self.precision != "high":
            return jnp.asarray(C)
        C_hi = C.astype(jnp.bfloat16)
        C_lo = (C - np.asarray(C_hi, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(np.concatenate([C_hi, C_lo], axis=0))

    def prec_dot(self, C_ref, rows, x):
        """y = C @ x at the configured precision (C from prec_const;
        ``rows`` = the logical row count of C).  f32 accumulation."""
        dn = (((1,), (0,)), ((), ()))
        if self.precision == "high":
            C_hi, C_lo = C_ref[:rows], C_ref[rows:]
            if x.dtype == jnp.bfloat16:
                y = jax.lax.dot_general(
                    C_hi, x, dn, preferred_element_type=jnp.float32)
                return y + jax.lax.dot_general(
                    C_lo, x, dn, preferred_element_type=jnp.float32)
            x_hi = x.astype(jnp.bfloat16)
            x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            y = jax.lax.dot_general(
                C_hi, x_hi, dn, preferred_element_type=jnp.float32)
            y = y + jax.lax.dot_general(
                C_hi, x_lo, dn, preferred_element_type=jnp.float32)
            return y + jax.lax.dot_general(
                C_lo, x_hi, dn, preferred_element_type=jnp.float32)
        if x.dtype == jnp.bfloat16:
            x = x.astype(jnp.float32)
        return jax.lax.dot_general(
            C_ref[:], x, dn,
            preferred_element_type=jnp.float32, precision=self.prec)

    # ---- in-kernel building blocks (traced inside kernel bodies) --------

    def lane_masker(self, TL: int, m_ref):
        """In-kernel class-mask application for a ``TL``-lane center block.

        Returns ``masked_src(src, kind)``: zero the lanes a roll-class
        mask excludes — synthesized from the tile's global element iota
        for procedural kinds, read from the ``m_ref`` operand row
        otherwise.  ``TL`` is the center-block lane count (``self.TE``
        for the main kernels; the far-update kernel uses its own tile).
        Must be called inside a kernel body (uses ``pl.program_id``).
        """
        # global element index of each center-block lane; the mod by each
        # distinct period is shared across classes
        g_lane = (pl.program_id(0) * TL
                  + jax.lax.broadcasted_iota(jnp.int32, (1, TL), 1))
        gmod_cache: dict[int, jnp.ndarray] = {}

        def i32(v):
            # int32 literals: a bare Python int materializes as an i64[]
            # scalar under x64 (the squirmer stage enables it process-
            # wide), and Mosaic's i64->i32 convert lowering recurses
            # forever (observed RecursionError at 1M elements)
            return jnp.int32(v)

        def kind_keep(kind):
            """Lane-keep predicate of a procedural kind (None = all)."""
            if kind[0] == "all":
                return None
            if kind[0] == "run":
                _, s0, L = kind
                return (g_lane < i32(s0)) | (g_lane >= i32(s0 + L))
            if kind[0] == "iota":
                _, s0, P, L = kind
                if P not in gmod_cache:
                    gmod_cache[P] = g_lane % i32(P)
                gm = gmod_cache[P]
                return (gm < i32(s0)) | (gm >= i32(s0 + L))
            _, k1, k2 = kind                    # "and"
            return kind_keep(k1) & kind_keep(k2)

        def masked_src(src, kind):
            if kind[0] == "row":
                i = kind[1]
                return src * m_ref[i:i + 1, :]
            keep = kind_keep(kind)
            if self.pad_cut is not None:
                cut = g_lane < i32(self.pad_cut)
                keep = cut if keep is None else keep & cut
            if keep is None:
                return src
            return jnp.where(keep, src, 0.0)

        return masked_src

    def aux_extract(self, S):
        """Raw pre-DSS source rows needed by the far-class epilogue:
        (n_aux, TE) center-column slice of S in aux-row layout."""
        oe, ov, TE, Hb = self.oe, self.ov, self.TE, self.Hb
        eo, el = self.eo_rel, self.el
        rows = [S[oe + eo[s]: oe + eo[s] + el[s], Hb:Hb + TE]
                for s in self.aux_e_slots]
        rows += [S[ov + s: ov + s + 1, Hb:Hb + TE]
                 for s in self.aux_v_slots]
        return jnp.concatenate(rows, axis=0)

    def apply_far(self, out, aux):
        """XLA epilogue: add the far-class contributions to the kernel's
        near-DSS output.  ``aux``: (n_aux, E) raw source rows; rolls run
        over the full element axis exactly as in RollExchange._dss_T_2d
        (wrapped lanes are zeroed by the class masks).

        The result is rebuilt with ONE row concat — ``.at[rows].add``
        would materialize a full (n, E) copy per touched slot (measured
        ~0.1 ms each at 100k elements), while the adds fuse into the
        concat's single write.
        """
        oe, ov, oi = self.oe, self.ov, self.oi
        eo, el = self.eo_rel, self.el
        edge_blks = [out[oe + eo[f]: oe + eo[f] + el[f]] for f in range(4)]
        for d_f, s_f, delta, flip, mask in self._far_edge:
            r0 = self._aux_row[("e", s_f)]
            src = jnp.roll(aux[r0:r0 + el[s_f]], -delta, axis=1)
            if flip:
                src = src[::-1, :]
            edge_blks[d_f] = edge_blks[d_f] + jnp.where(
                mask[None, :], src, 0.0)
        vert_rows = [out[ov + v: ov + v + 1] for v in range(4)]
        for d_s, s_s, delta, mask in self._far_vert:
            r0 = self._aux_row[("v", s_s)]
            src = jnp.roll(aux[r0:r0 + 1], -delta, axis=1)
            vert_rows[d_s] = vert_rows[d_s] + jnp.where(
                mask[None, :], src, 0.0)
        return jnp.concatenate(edge_blks + vert_rows + [out[oi:]], axis=0)

    def far_rows(self, aux):
        """Compact far-class contributions in DESTINATION-row layout.

        ``aux``: (n_aux, E) raw pre-DSS source rows from the kernel.
        Returns (n_far, E): for each far dst edge slot an (ne, E) block,
        then one row per far dst vertex slot — the rolled, masked class
        sums ready to be ADDED to the near-DSS output at static sublane
        offsets.  Rolls touch only the few aux rows (cheap XLA), unlike
        :meth:`apply_far`, which rebuilds the whole (n, E) array; a
        consumer kernel (fused-CG kernel B) adds these rows in VMEM while
        it streams Ap anyway, so the corrected Ap is never materialized.
        """
        E, el = aux.shape[1], self.el
        e_pos = {d: i for i, d in enumerate(self.far_e_dst)}
        v_pos = {d: i for i, d in enumerate(self.far_v_dst)}
        eblk = [jnp.zeros((el[d], E), jnp.float32)
                for d in self.far_e_dst]
        for d_f, s_f, delta, flip, mask in self._far_edge:
            r0 = self._aux_row[("e", s_f)]
            src = jnp.roll(aux[r0:r0 + el[s_f]], -delta, axis=1)
            if flip:
                src = src[::-1, :]
            i = e_pos[d_f]
            eblk[i] = eblk[i] + jnp.where(mask[None, :], src, 0.0)
        vrows = [jnp.zeros((1, E), jnp.float32) for _ in self.far_v_dst]
        for d_s, s_s, delta, mask in self._far_vert:
            r0 = self._aux_row[("v", s_s)]
            src = jnp.roll(aux[r0:r0 + 1], -delta, axis=1)
            j = v_pos[d_s]
            vrows[j] = vrows[j] + jnp.where(mask[None, :], src, 0.0)
        return jnp.concatenate(eblk + vrows, axis=0)

    def add_far(self, ap, far):
        """In-kernel add of :meth:`far_rows` output into an (n, TE) tile.

        Row bookkeeping only (slices + one sublane concat in VMEM) —
        requires edges-first layout (enforced in __init__), where the
        local row order is [edge slots | vertices | interior].
        """
        ov, oi = self.ov, self.oi
        eo, el = self.eo_rel, self.el
        eblk = [ap[self.oe + eo[f]: self.oe + eo[f] + el[f]]
                for f in range(4)]
        for d in self.far_e_dst:
            r0 = self._far_dst_row[("e", d)]
            eblk[d] = eblk[d] + far[r0:r0 + el[d]]
        vrows = [ap[ov + v: ov + v + 1] for v in range(4)]
        for d in self.far_v_dst:
            r0 = self._far_dst_row[("v", d)]
            vrows[d] = vrows[d] + far[r0:r0 + 1]
        return jnp.concatenate(eblk + vrows + [ap[oi:]], axis=0)

    def dot_window(self, K_ref, u_win):
        """V = [K0;K1;K2] @ u_win at the configured precision.

        ``u_win`` may be bfloat16 (exactly-representable operand, e.g. a
        bf16-stored search direction): the 'high' path then needs only the
        two K-split passes (u_lo = 0 identically).
        """
        n = self.n
        dn = (((1,), (0,)), ((), ()))
        if self.precision == "high":
            K_hi, K_lo = K_ref[:3 * n], K_ref[3 * n:]
            if u_win.dtype == jnp.bfloat16:
                V = jax.lax.dot_general(
                    K_hi, u_win, dn, preferred_element_type=jnp.float32)
                return V + jax.lax.dot_general(
                    K_lo, u_win, dn, preferred_element_type=jnp.float32)
            u_hi = u_win.astype(jnp.bfloat16)
            u_lo = (u_win - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            V = jax.lax.dot_general(
                K_hi, u_hi, dn, preferred_element_type=jnp.float32)
            V = V + jax.lax.dot_general(
                K_hi, u_lo, dn, preferred_element_type=jnp.float32)
            return V + jax.lax.dot_general(
                K_lo, u_hi, dn, preferred_element_type=jnp.float32)
        if u_win.dtype == jnp.bfloat16:
            u_win = u_win.astype(jnp.float32)
        return jax.lax.dot_general(
            K_ref[:], u_win, dn,
            preferred_element_type=jnp.float32, precision=self.prec,
        )                                                # (3n, TE + 2Hb)

    def affine_reduce(self, a_win, V):
        """S = sum_c a_c V_c on the window."""
        n = self.n
        return (a_win[0:1] * V[:n] + a_win[1:2] * V[n:2 * n]
                + a_win[2:3] * V[2 * n:])

    def roll_dss(self, S, m_ref):
        """Complete roll-class DSS of the window-wide local result ``S``.

        Per-dst-slot accumulation, then one sublane concat (no scatters);
        returns the (n, TE) center block of the exchanged result.  Class
        masks come from ``mask_kinds``: synthesized in-register from the
        tile's global element iota where the mask is periodic, read from
        the ``m_ref`` operand rows otherwise.
        """
        TE, Hb = self.TE, self.Hb
        oe, ov, oi = self.oe, self.ov, self.oi
        eo, el = self.eo_rel, self.el
        masked_src = self.lane_masker(TE, m_ref)
        kinds = self.mask_kinds
        edge_out = [S[oe + eo[f]: oe + eo[f] + el[f], Hb:Hb + TE]
                    for f in range(4)]
        for ci, (d_f, s_f, delta, flip) in enumerate(self.edge_classes):
            s0 = Hb + delta
            src = S[oe + eo[s_f]: oe + eo[s_f] + el[s_f], s0:s0 + TE]
            if flip:
                src = src[::-1]
            edge_out[d_f] = edge_out[d_f] + masked_src(src, kinds[ci])
        vert_out = [S[ov + v: ov + v + 1, Hb:Hb + TE] for v in range(4)]
        for cj, (d_s, s_s, delta) in enumerate(self.vert_classes):
            s0 = Hb + delta
            src = S[ov + s_s: ov + s_s + 1, s0:s0 + TE]
            vert_out[d_s] = vert_out[d_s] + masked_src(
                src, kinds[self.n_e + cj])
        return jnp.concatenate(
            edge_out + vert_out + [S[oi:, Hb:Hb + TE]], axis=0)

    # ---- block specs -----------------------------------------------------

    def halo_triple(self, rows: int):
        """(left, center, right) BlockSpecs for one (rows, E) operand.

        Halo refs are (rows, Hb) blocks directly left/right of the center
        block (border blocks clamp onto real data; every contribution that
        could read a clamped lane is zeroed by its class mask).
        """
        k, G, TE, Hb = self.k, self.G, self.TE, self.Hb
        return [
            pl.BlockSpec((rows, Hb),
                         _im32(lambda i: (0, jnp.maximum(i * k - 1, 0))),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, TE), _im32(lambda i: (0, i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rows, Hb),
                _im32(lambda i: (0, jnp.minimum((i + 1) * k, G * k - 1))),
                memory_space=pltpu.VMEM),
        ]

    def center_spec(self, rows: int):
        return pl.BlockSpec((rows, self.TE), _im32(lambda i: (0, i)),
                            memory_space=pltpu.VMEM)

    def const_specs(self):
        """Specs for the (K, mask) constant operands."""
        return [
            pl.BlockSpec((self.KT.shape[0], self.n), _im32(lambda i: (0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((self.n_mask_rows, self.TE),
                         _im32(lambda i: (0, i)),
                         memory_space=pltpu.VMEM),
        ]


def affine_tile_window(n: int, n_rhs: int) -> int:
    """Default VMEM lane-window budget for the batched affine kernel.

    Resident per-lane f32 rows: the stacked u window (k*n), the output
    center (k*n), per-RHS transients (V 3n + S n, sequential so counted
    once), the affine window (3) and masks.  Sized to ~11 MB of the
    16 MB scoped-vmem stack, floored to the 128-lane tiler granularity.
    """
    rows = (2 * n_rhs + 5) * n
    win = int(11.0e6 / (4 * rows)) // 128 * 128
    return max(win, 384)


def make_far_update_kernel(prep, *, target_win: int = 8192,
                           interpret: bool = False):
    """Aliased far-row update: add far-class DSS contributions in place.

    The far-class epilogue previously ran in XLA (``prep.apply_far``):
    roll the (n_aux, E) raw source rows, mask, and REBUILD the whole
    (n, E) output with a row concat — a full extra read+write of the
    result array (~2 HBM passes, the measured 1.3-2 ms "far tax" at 1M
    elements).  This kernel eliminates the rebuild:

    - the output buffer is **aliased in place** (``input_output_aliases``)
      and the grid covers only the leading ``rows_t`` rows (edge blocks +
      vertices, padded to the 8-row f32 sublane tile) — the interior
      rows, ~60% of the array at p=8, are never touched (uncovered
      output blocks of an aliased buffer retain their contents);
    - the far-class **rolls become shifted window reads**: the aux rows
      stream through a (n_aux, TU + 2·Hfb) halo window exactly like the
      main kernel's u window, and each class reads its source block at
      lane offset ``Hfb + delta`` — no XLA roll, no materialized rolled
      copies.  Lanes whose true source crosses the array edge are zeroed
      by the class masks (procedural where periodic, streamed rows
      otherwise), which also covers the clamped border blocks.

    Traffic: ``rows_t`` read + ``rows_t`` written + ~1.25 aux windows +
    mask rows ≈ 1.1 passes of the (n, E) array vs ~2-3 for the XLA
    epilogue, and the near kernel keeps its small (Hb=128) halo window.

    Returns ``update(out, aux) -> (n, E)`` (f32 only), or ``None`` when
    inapplicable (no far classes, verts-last layout, or no admissible
    (TU, Hfb) tiling for the aux window).
    """
    if not prep.has_far or prep.oe != 0:
        return None
    n, E = prep.n, prep.E
    ov, oi = prep.ov, prep.oi
    eo, el = prep.eo_rel, prep.el
    deltas = ([abs(c[2]) for c in prep._far_edge]
              + [abs(c[2]) for c in prep._far_vert])
    tile = fused_affine_tile_shape(E, max(deltas), target_win)
    if tile is None:
        return None
    TU, Hfb = tile
    G2, k2 = E // TU, TU // Hfb
    rows_t = min(n, -(-oi // 8) * 8)
    n_aux = prep.n_aux
    far_edge = [(d, s, int(dl), bool(f))
                for d, s, dl, f, _m in prep._far_edge]
    far_vert = [(d, s, int(dl)) for d, s, dl, _m in prep._far_vert]
    kinds = prep.far_mask_kinds
    aux_row = prep._aux_row

    def kernel(o_ref, aL, aC, aR, m_ref, out_ref):
        aux_win = jnp.concatenate([aL[:], aC[:], aR[:]], axis=1)
        masked_src = prep.lane_masker(TU, m_ref)
        eblk = [o_ref[eo[f]:eo[f] + el[f]] for f in range(4)]
        ci = 0
        for d_f, s_f, delta, flip in far_edge:
            r0 = aux_row[("e", s_f)]
            src = aux_win[r0:r0 + el[s_f], Hfb + delta:Hfb + delta + TU]
            if flip:
                src = src[::-1]
            eblk[d_f] = eblk[d_f] + masked_src(src, kinds[ci])
            ci += 1
        vrows = [o_ref[ov + v:ov + v + 1] for v in range(4)]
        for d_s, s_s, delta in far_vert:
            r0 = aux_row[("v", s_s)]
            src = aux_win[r0:r0 + 1, Hfb + delta:Hfb + delta + TU]
            vrows[d_s] = vrows[d_s] + masked_src(src, kinds[ci])
            ci += 1
        parts = eblk + vrows
        if rows_t > oi:
            parts.append(o_ref[oi:rows_t])
        out_ref[:] = jnp.concatenate(parts, axis=0)

    o_spec = pl.BlockSpec((rows_t, TU), _im32(lambda i: (0, i)),
                          memory_space=pltpu.VMEM)
    aux_specs = [
        pl.BlockSpec((n_aux, Hfb),
                     _im32(lambda i: (0, jnp.maximum(i * k2 - 1, 0))),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_aux, TU), _im32(lambda i: (0, i)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (n_aux, Hfb),
            _im32(lambda i: (0, jnp.minimum((i + 1) * k2, G2 * k2 - 1))),
            memory_space=pltpu.VMEM),
    ]
    m_spec = pl.BlockSpec((prep.n_far_mask_rows, TU),
                          _im32(lambda i: (0, i)),
                          memory_space=pltpu.VMEM)

    def update(out, aux):
        if out.dtype != jnp.float32:
            raise ValueError("far-update kernel is float32-only")
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, E), out.dtype),
            grid=(G2,),
            in_specs=[o_spec] + aux_specs + [m_spec],
            out_specs=o_spec,
            input_output_aliases={0: 0},
            interpret=interpret,
        )(out, aux, aux, aux, prep.M_far)

    update._tile = (TU, Hfb)
    update._rows_t = rows_t
    update._no_hoist = True
    return update


def make_fused_affine_laplacian_T(exchange, Kcat, a, *,
                                  n_rhs: int = 1,
                                  precision: str = "highest",
                                  target_win: int | None = None,
                                  max_halo="auto",
                                  far_mode: str = "auto",
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

    ``n_rhs > 1``: the batched twin of the general kernel's multi-RHS
    mode — acts on ``n_rhs`` sublane-stacked (n, E) L-vectors as one
    (k*n, E) array, amortizing the class-mask stream, the affine window
    and the kernel-launch boundary across the batch (per-RHS dot/DSS
    work is unchanged; the affine factors themselves are tiny, so the
    amortization is smaller than the general kernel's).  Full halo only
    for k > 1 (no far split); batched RHS arise from
    :func:`..solver.cg.cg_batched` / ``Poisson.solve_local_batch``.

    ``far_mode``: how far-split classes (when ``max_halo`` engages) are
    applied — 'kernel' = the aliased in-place far-row update
    (:func:`make_far_update_kernel`), 'xla' = the concat-rebuild
    epilogue (``prep.apply_far``), 'auto' = kernel when buildable.
    """
    from ..utils.hoist import ensure_recursion_headroom

    ensure_recursion_headroom()
    if n_rhs < 1:
        raise ValueError(f"n_rhs must be >= 1, got {n_rhs}")
    k_rhs = n_rhs
    if target_win is None:
        target_win = (_scale_win(4608, Kcat.shape[0]) if k_rhs == 1
                      else affine_tile_window(Kcat.shape[0], k_rhs))
    if k_rhs > 1:
        max_halo = None       # far split is single-RHS machinery
    prep = _AffineFusedPrep(exchange, Kcat, a, precision, target_win,
                            max_halo)
    n, E, G = prep.n, prep.E, prep.G
    KT, M, aT = prep.KT, prep.M, prep.aT
    kn = k_rhs * n
    if far_mode not in ("auto", "kernel", "xla"):
        raise ValueError(f"unknown far_mode {far_mode!r}")
    far_update = None
    if prep.has_far and far_mode != "xla":
        far_update = make_far_update_kernel(prep, interpret=interpret)
        if far_update is None and far_mode == "kernel":
            raise ValueError("far_mode='kernel' requested but no "
                             "admissible far-update tiling exists")

    def kernel(uL_ref, uC_ref, uR_ref, aL_ref, aC_ref, aR_ref, K_ref,
               m_ref, out_ref, *aux_ref):
        a_win = jnp.concatenate([aL_ref[:], aC_ref[:], aR_ref[:]], axis=1)
        outs = []
        for j in range(k_rhs):
            sl = slice(j * n, (j + 1) * n)
            u_win = jnp.concatenate(
                [uL_ref[sl], uC_ref[sl], uR_ref[sl]], axis=1)
            V = prep.dot_window(K_ref, u_win)
            S = prep.affine_reduce(a_win, V)
            outs.append(prep.roll_dss(S, m_ref))
            if aux_ref:
                aux_ref[0][:] = prep.aux_extract(S)
        out = outs[0] if k_rhs == 1 else jnp.concatenate(outs, axis=0)
        out_ref[:] = out.astype(out_ref.dtype)

    specs = (prep.halo_triple(kn) + prep.halo_triple(3)
             + prep.const_specs())
    out_spec = prep.center_spec(kn)

    def apply_local_dss(uT):
        if uT.shape != (kn, E):
            raise ValueError(
                f"expected ({kn}, {E}) sublane-stacked input "
                f"(n_rhs={k_rhs}), got {uT.shape}")
        shapes = jax.ShapeDtypeStruct((kn, E), uT.dtype)
        o_specs = out_spec
        if prep.has_far:
            shapes = (shapes,
                      jax.ShapeDtypeStruct((prep.n_aux, E), jnp.float32))
            o_specs = (out_spec, prep.center_spec(prep.n_aux))
        res = pl.pallas_call(
            kernel,
            out_shape=shapes,
            grid=(G,),
            in_specs=specs,
            out_specs=o_specs,
            interpret=interpret,
        )(uT, uT, uT, aT, aT, aT, KT, M)
        if prep.has_far:
            out, aux = res
            if far_update is not None and out.dtype == jnp.float32:
                return far_update(out, aux)
            return prep.apply_far(out, aux).astype(uT.dtype)
        return res

    apply_local_dss._prep = prep      # introspection (tests, bench)
    apply_local_dss._n_rhs = k_rhs
    apply_local_dss._far_update = far_update
    # hoisting Pallas operands to runtime jit parameters aborts the TPU
    # runtime (see utils/hoist.py) — keep captures as inline literals
    apply_local_dss._no_hoist = True
    return apply_local_dss


def make_fused_affine_block_kernel(exchange, Kcat, *,
                                   precision: str = "highest",
                                   target_win: int | None = None,
                                   interpret: bool = False):
    """Per-shard variant of :func:`make_fused_affine_laplacian_T`.

    Built for ``shard_map`` bodies (:func:`..parallel.halo.
    make_sharded_fused_operator`): the affine factors and class masks
    arrive as *runtime operands* — each shard runs the same traced kernel
    on its own halo-extended element block with its own slices of the
    global factor/mask arrays.  Full halo only (no far split).

    ``exchange`` may be a lightweight view (``n_loc``/``ne``/offsets/
    ``edge_classes``/``vert_classes``/``E`` = the extended block size).
    Returns ``f(uT, aT, M) -> (n, E) f32`` with ``uT`` (n, E),
    ``aT`` (3, E) affine factor scales, ``M`` (C, E) f32 class masks in
    ``stack_class_masks`` order (C >= 1; pass one zero row if classless).
    """
    from ..utils.hoist import ensure_recursion_headroom

    ensure_recursion_headroom()
    if target_win is None:
        target_win = _scale_win(4608, Kcat.shape[0])
    prep = _AffineFusedPrep(exchange, Kcat, None, precision, target_win,
                            max_halo=None, external_operands=True)
    n, E, G = prep.n, prep.E, prep.G
    KT = prep.KT

    def kernel(uL_ref, uC_ref, uR_ref, aL_ref, aC_ref, aR_ref, K_ref,
               m_ref, out_ref):
        u_win = jnp.concatenate([uL_ref[:], uC_ref[:], uR_ref[:]], axis=1)
        a_win = jnp.concatenate([aL_ref[:], aC_ref[:], aR_ref[:]], axis=1)
        V = prep.dot_window(K_ref, u_win)
        S = prep.affine_reduce(a_win, V)
        out_ref[:] = prep.roll_dss(S, m_ref).astype(out_ref.dtype)

    specs = (prep.halo_triple(n) + prep.halo_triple(3) + prep.const_specs())
    out_spec = prep.center_spec(n)

    def apply_block(uT, aT, M):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n, E), uT.dtype),
            grid=(G,),
            in_specs=specs,
            out_specs=out_spec,
            interpret=interpret,
        )(uT, uT, uT, aT, aT, aT, KT, M)

    apply_block._prep = prep
    apply_block._no_hoist = True
    return apply_block


def general_tile_window(n: int, n_rhs: int) -> int:
    """Default VMEM lane-window budget for the general fused kernel.

    Resident per-lane f32 rows: the u window (k*n) + factor window (3n)
    + output center (k*n) + per-RHS transients (grads 2n, flux 2n, S n).
    Sized to ~11 MB of the 16 MB scoped-vmem stack, floored to the
    128-lane granularity the tiler needs (11.5 MB left the k=4 general
    kernel 5% over the stack at the 100k padding — measured compile
    OOM, round 3).
    """
    rows = (2 * n_rhs + 8) * n
    win = int(11.0e6 / (4 * rows)) // 128 * 128
    return max(win, 384)


def make_fused_general_laplacian_T(exchange, Gf, Dhat, *,
                                   n_rhs: int = 1,
                                   precision: str = "highest",
                                   target_win: int | None = None,
                                   max_halo="auto",
                                   far_mode: str = "auto",
                                   interpret: bool = False):
    """Fused transposed apply+DSS kernel for GENERAL (curved) meshes,
    with optional multi-RHS sublane stacking.

    The affine kernel (:func:`make_fused_affine_laplacian_T`) collapses
    the geometric factors to 3 scalars per element; curved isoparametric
    meshes (e.g. the Helmholtz config, BASELINE.md) keep full (3, n, E)
    factor slabs, and the unfused XLA path additionally materializes the
    (2n, E) grads/flux intermediates between the two derivative dots
    (~4 extra HBM passes).  This kernel keeps the intermediates in VMEM:

        grads = Dhat_h @ u_j           (2n, W) on the halo window
        flux  = [g0 ur + g1 us; g1 ur + g2 us]
        S_j   = Dhat_h^T @ flux        (n, W)
        out_j = roll-class DSS of S_j  (n, TE)

    and — the multi-RHS point — reads the factor window ONCE per element
    tile for all ``n_rhs`` sublane-stacked right-hand sides: per-RHS HBM
    traffic falls from ~(2 + 3) passes to ~(2 + 3/k), which is the one
    lever that beats the single-RHS bandwidth roofline (the affine
    factors are too small to matter; the general slabs are ~60% of the
    apply's traffic).  Batched RHS arise naturally from multi-field
    problems (the squirmer's dpn=2 vector Laplacian,
    ``examples/squirmer-axisymmetric.py:229-245``) and batched solves
    (:func:`..solver.cg.cg_batched`).

    ``Gf``: (E, 3, n) lex-flattened geometric factors (f32).
    ``Dhat``: (2n, n) stacked derivative in LEX column order (hier
    permutation applied here).  Returns ``f(uT) -> (k*n, E)`` acting on
    ``n_rhs`` sublane-stacked (n, E) transposed L-vectors (a contiguous
    reshape of (k, n, E)); each slice is fully DSS-exchanged.

    ``max_halo``/``far_mode``: as in
    :func:`make_fused_affine_laplacian_T` — single-RHS kernels can split
    large-offset roll classes out of the window (1M-element row strides)
    into the aliased far-row update kernel; multi-RHS kernels stay
    full-halo (pad or use the panel element order,
    :func:`..parallel.partition.panel_order`).
    """
    import numpy as np

    from ..utils.hoist import ensure_recursion_headroom

    ensure_recursion_headroom()
    if n_rhs < 1:
        raise ValueError(f"n_rhs must be >= 1, got {n_rhs}")
    Dhat_np = np.asarray(Dhat, dtype=np.float64)
    n = Dhat_np.shape[1]
    if target_win is None:
        target_win = general_tile_window(n, n_rhs)
    if n_rhs > 1:
        max_halo = None       # far split is single-RHS machinery
    prep = _AffineFusedPrep(exchange, None, None, precision, target_win,
                            max_halo=max_halo)
    E, G, TE = prep.E, prep.G, prep.TE
    k = n_rhs
    if far_mode not in ("auto", "kernel", "xla"):
        raise ValueError(f"unknown far_mode {far_mode!r}")
    far_update = None
    if prep.has_far and far_mode != "xla":
        far_update = make_far_update_kernel(prep, interpret=interpret)
        if far_update is None and far_mode == "kernel":
            raise ValueError("far_mode='kernel' requested but no "
                             "admissible far-update tiling exists")

    Dhat_h = Dhat_np[:, exchange.hier]                       # (2n, n)
    Dh_c = prep.prec_const(Dhat_h)
    DhT_c = prep.prec_const(np.ascontiguousarray(Dhat_h.T))  # (n, 2n)
    Gf_np = np.asarray(Gf, dtype=np.float32)                 # (E, 3, n)
    gT = jnp.asarray(np.ascontiguousarray(
        Gf_np.transpose(1, 2, 0).reshape(3 * n, E)))         # (3n, E)
    M = prep.M

    def kernel(uL, uC, uR, gL, gC, gR, dh_ref, dht_ref, m_ref, out_ref,
               *aux_ref):
        u_win = jnp.concatenate([uL[:], uC[:], uR[:]], axis=1)
        g_win = jnp.concatenate([gL[:], gC[:], gR[:]], axis=1)
        g0, g1, g2 = g_win[:n], g_win[n:2 * n], g_win[2 * n:]
        outs = []
        for j in range(k):
            uj = u_win[j * n:(j + 1) * n]
            grads = prep.prec_dot(dh_ref, 2 * n, uj)         # (2n, W)
            ur, us = grads[:n], grads[n:]
            flux = jnp.concatenate(
                [g0 * ur + g1 * us, g1 * ur + g2 * us], axis=0)
            S = prep.prec_dot(dht_ref, n, flux)              # (n, W)
            outs.append(prep.roll_dss(S, m_ref))
            if aux_ref:
                aux_ref[0][:] = prep.aux_extract(S)
        out = outs[0] if k == 1 else jnp.concatenate(outs, axis=0)
        out_ref[:] = out.astype(out_ref.dtype)

    d_rows, dt_rows = Dh_c.shape[0], DhT_c.shape[0]
    specs = (prep.halo_triple(k * n) + prep.halo_triple(3 * n) + [
        pl.BlockSpec((d_rows, n), _im32(lambda i: (0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dt_rows, 2 * n), _im32(lambda i: (0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((prep.n_mask_rows, TE), _im32(lambda i: (0, i)),
                     memory_space=pltpu.VMEM),
    ])
    out_spec = prep.center_spec(k * n)

    def apply_local_dss(uT):
        if uT.shape != (k * n, E):
            raise ValueError(
                f"expected ({k * n}, {E}) sublane-stacked input "
                f"(n_rhs={k}), got {uT.shape}")
        shapes = jax.ShapeDtypeStruct((k * n, E), uT.dtype)
        o_specs = out_spec
        if prep.has_far:
            shapes = (shapes,
                      jax.ShapeDtypeStruct((prep.n_aux, E), jnp.float32))
            o_specs = (out_spec, prep.center_spec(prep.n_aux))
        res = pl.pallas_call(
            kernel,
            out_shape=shapes,
            grid=(G,),
            in_specs=specs,
            out_specs=o_specs,
            interpret=interpret,
        )(uT, uT, uT, gT, gT, gT, Dh_c, DhT_c, M)
        if prep.has_far:
            out, aux = res
            if far_update is not None and out.dtype == jnp.float32:
                return far_update(out, aux)
            return prep.apply_far(out, aux).astype(uT.dtype)
        return res

    apply_local_dss._prep = prep      # introspection (tests, bench)
    apply_local_dss._n_rhs = k
    apply_local_dss._far_update = far_update
    # hoisting Pallas operands to runtime jit parameters aborts the TPU
    # runtime (see utils/hoist.py) — keep captures as inline literals
    apply_local_dss._no_hoist = True
    return apply_local_dss


def make_fused_cg_kernels(exchange, Kcat, a, *,
                          precision: str = "high",
                          p_dtype=None,
                          target_win: int | None = None,
                          max_halo="auto",
                          defer_x: bool = False,
                          interpret: bool = False):
    """Two Pallas kernels fusing one whole PCG iteration (affine meshes).

    The CG loop on L-vectors costs one operator apply plus ~12 HBM passes
    of vector arithmetic per iteration (measured 0.81 ms/iter at p=8/100k
    vs 0.27 ms for the apply alone — BASELINE.md).  A CG iteration has two
    unavoidable global-reduction sync points (alpha needs <p, Ap>; beta
    needs <r', z'>), so the minimal fusion is two kernels per iteration:

    ``kA(r, p, inv, x, beta, alpha_prev) -> (p', Ap', x', denom_parts)``
        direction update ``p' = inv*r + beta*p`` computed on the halo
        window, the assembled-K matmul + affine reduce + in-VMEM roll DSS
        of :func:`make_fused_affine_laplacian_T` applied to ``p'``, the
        per-tile partial sums of ``denom = <p', A p'>``, AND the
        *previous* iteration's solution update ``x' = x + alpha_prev p``
        (kernel A reads p for the beta recurrence anyway, so the x update
        rides along; x therefore lags one direction behind — drivers add
        the final ``alpha * p`` term once after the loop).  The
        denominator uses the *pre-DSS* identity
        ``p^T A p = sum_{e,i} p_ei S_ei`` (valid for any consistent L-
        vector ``p``; S is the local pre-exchange result), so no
        multiplicity-weight array is ever read here.

    ``kB(r, Ap', inv, w_free, alpha) -> (r', rz_p, rn2_p)``
        the residual update and both weighted reductions of the iteration
        tail in one HBM pass; ``z' = inv*r'`` lives only in VMEM (never
        materialized).  ``w_free`` must be the inverse-multiplicity dot
        weights zeroed on Dirichlet rows — with ``inv`` likewise masked,
        no separate free-mask array is needed anywhere (p is masked by
        induction; Dirichlet rows of r may accumulate values but never
        enter any reduction or update).

    Far-class halo split: when the auto rule splits large-offset roll
    classes out of the VMEM window (1M-element regime, H ~ sqrt(E)), kA
    returns ``Ap`` as the pair ``(Ap_near, far_rows)`` — the near-DSS
    result plus the compact (n_far, E) rolled far contributions — and kB
    adds the far rows in VMEM while it streams Ap for the r update.  The
    corrected Ap is never materialized in HBM (denominator partials use
    the pre-DSS identity, so they are complete without it); drivers pass
    kA's Ap to kB opaquely, so the split is invisible to them.

    ``defer_x=True`` removes the solution update from kernel A entirely
    (x is neither read nor written per iteration — the largest remaining
    per-iteration traffic item, 2 f32 passes).  kA then has the signature
    ``kA(r, p, inv, beta) -> (p', Ap', denom_parts)`` and the *driver*
    (:func:`..solver.cg.cg_fused` with ``defer_x=m``) retains the last m
    search directions in the loop carry and applies
    ``x += sum_j alpha_j p_j`` once per m iterations as one fused XLA
    pass — amortized ``(2 + m/2)/m`` passes instead of 2 (0.75 at m=8
    with bf16 directions).  The m slots are ordinary carried arrays
    written at static unroll positions, so no scalar-prefetch indexing
    or in-place aliasing is involved anywhere.

    ``p_dtype=jnp.bfloat16`` stores the search direction in bf16 (halves
    its HBM traffic; requires ``precision='high'``, where the matmul then
    needs only the two K-split passes).  ``target_win`` defaults smaller
    than the plain apply kernel's (1536 vs 4608): kernel A holds ~4x the
    per-lane VMEM state, and measured throughput at p=8/104k peaks near
    (TE=1152, Hb=128) - 0.25 ms vs 0.43 ms at the 3072-lane window.  x and r always stay float32:
    Ap' is computed from the *stored* (rounded) p', so the r recurrence
    tracks the x updates exactly and full f32 accuracy is attainable.

    Returns ``(kA, kB, G)`` with ``G`` the number of partial-sum tiles.
    Scalars (alpha, beta) are passed as (1, 1) float32 arrays.
    """
    if p_dtype is not None and jnp.dtype(p_dtype) != jnp.bfloat16:
        raise ValueError(f"p_dtype must be None or bfloat16, got {p_dtype}")
    p_bf16 = p_dtype is not None
    if p_bf16 and precision != "high":
        raise ValueError("p_dtype=bfloat16 requires precision='high'")
    if target_win is None:
        # kernel A holds ~4x the plain apply kernel's per-lane VMEM
        # state (r/p/inv windows + x + the stored direction); measured
        # p=8/104k on v5e: bf16 state fits a 3072-lane window (0.46
        # ms/iter, the sweet spot — 4352 overflows the 16 MB scoped
        # stack), f32 state needs 1536; scaled down for higher orders
        target_win = _scale_win(3072 if p_bf16 else 1536, Kcat.shape[0])

    from ..utils.hoist import ensure_recursion_headroom

    ensure_recursion_headroom()
    prep = _AffineFusedPrep(exchange, Kcat, a, precision, target_win,
                            max_halo, cheap_far=True)
    n, E, G, TE, Hb = prep.n, prep.E, prep.G, prep.TE, prep.Hb
    KT, M, aT = prep.KT, prep.M, prep.aT
    p_store = jnp.bfloat16 if p_bf16 else jnp.float32

    # partial-sum outputs: one (G, 1) SMEM array whose FULL shape is the
    # block (Mosaic only allows blocks equal to the array dims or
    # 8x128-divisible); each grid step writes its own row via program_id
    smem_out = pl.BlockSpec((G, 1), _im32(lambda i: (0, 0)),
                            memory_space=pltpu.SMEM)

    if defer_x:
        def kernel_a_d(rL, rC, rR, pL, pC, pR, iL, iC, iR, aL, aC, aR,
                       K_ref, m_ref, sc_ref, po_ref, apo_ref, d_ref,
                       *aux_ref):
            beta = sc_ref[0, 0]
            r_win = jnp.concatenate([rL[:], rC[:], rR[:]], axis=1)
            p_win = jnp.concatenate([pL[:], pC[:], pR[:]], axis=1)
            i_win = jnp.concatenate([iL[:], iC[:], iR[:]], axis=1)
            a_win = jnp.concatenate([aL[:], aC[:], aR[:]], axis=1)
            pn = (i_win.astype(jnp.float32) * r_win
                  + beta * p_win.astype(jnp.float32))
            # Ap must be computed from the *stored* direction: round first
            pn_st = pn.astype(p_store)
            V = prep.dot_window(K_ref, pn_st)
            S = prep.affine_reduce(a_win, V)
            po_ref[:] = pn_st[:, Hb:Hb + TE]
            apo_ref[:] = prep.roll_dss(S, m_ref)
            d_ref[pl.program_id(0), 0] = jnp.sum(
                pn_st[:, Hb:Hb + TE].astype(jnp.float32)
                * S[:, Hb:Hb + TE])
            if aux_ref:
                aux_ref[0][:] = prep.aux_extract(S)

        smem_beta = pl.BlockSpec((1, 1), _im32(lambda i: (0, 0)),
                                 memory_space=pltpu.SMEM)
        d_specs = (prep.halo_triple(n) + prep.halo_triple(n)
                   + prep.halo_triple(n) + prep.halo_triple(3)
                   + prep.const_specs() + [smem_beta])
        d_out_shapes = [
            jax.ShapeDtypeStruct((n, E), p_store),
            jax.ShapeDtypeStruct((n, E), jnp.float32),
            jax.ShapeDtypeStruct((G, 1), jnp.float32),
        ]
        d_out_specs = [prep.center_spec(n), prep.center_spec(n), smem_out]
        if prep.has_far:
            d_out_shapes.append(
                jax.ShapeDtypeStruct((prep.n_aux, E), jnp.float32))
            d_out_specs.append(prep.center_spec(prep.n_aux))

        def kA_d(r, p, inv, beta):
            sc = jnp.asarray(beta, jnp.float32).reshape(1, 1)
            res = pl.pallas_call(
                kernel_a_d,
                out_shape=tuple(d_out_shapes),
                grid=(G,),
                in_specs=d_specs,
                out_specs=tuple(d_out_specs),
                interpret=interpret,
            )(r, r, r, p, p, p, inv, inv, inv, aT, aT, aT, KT, M, sc)
            if prep.has_far:
                p_new, Ap, dparts, aux = res
                return p_new, (Ap, prep.far_rows(aux)), dparts
            return res
        kB = _build_cg_kernel_b(prep, interpret)
        kA_d._prep = kB._prep = prep  # introspection (tests, bench)
        kA_d._defer_x = True
        return kA_d, kB, G

    def kernel_a(rL, rC, rR, pL, pC, pR, iL, iC, iR, aL, aC, aR,
                 x_ref, K_ref, m_ref, sc_ref, po_ref, apo_ref, xo_ref,
                 d_ref, *aux_ref):
        beta = sc_ref[0, 0]
        alpha_prev = sc_ref[0, 1]
        r_win = jnp.concatenate([rL[:], rC[:], rR[:]], axis=1)
        p_win = jnp.concatenate([pL[:], pC[:], pR[:]], axis=1)
        i_win = jnp.concatenate([iL[:], iC[:], iR[:]], axis=1)
        a_win = jnp.concatenate([aL[:], aC[:], aR[:]], axis=1)
        p32 = p_win.astype(jnp.float32)
        xo_ref[:] = x_ref[:] + alpha_prev * p32[:, Hb:Hb + TE]
        pn = i_win.astype(jnp.float32) * r_win + beta * p32
        # Ap must be computed from the *stored* direction: round first
        pn_st = pn.astype(p_store)
        V = prep.dot_window(K_ref, pn_st)
        S = prep.affine_reduce(a_win, V)
        po_ref[:] = pn_st[:, Hb:Hb + TE]
        apo_ref[:] = prep.roll_dss(S, m_ref)
        d_ref[pl.program_id(0), 0] = jnp.sum(
            pn_st[:, Hb:Hb + TE].astype(jnp.float32) * S[:, Hb:Hb + TE])
        if aux_ref:
            aux_ref[0][:] = prep.aux_extract(S)

    smem_pair = pl.BlockSpec((1, 2), _im32(lambda i: (0, 0)),
                             memory_space=pltpu.SMEM)
    a_specs = (prep.halo_triple(n) + prep.halo_triple(n)
               + prep.halo_triple(n) + prep.halo_triple(3)
               + [prep.center_spec(n)] + prep.const_specs()
               + [smem_pair])
    a_out_shapes = [
        jax.ShapeDtypeStruct((n, E), p_store),
        jax.ShapeDtypeStruct((n, E), jnp.float32),
        jax.ShapeDtypeStruct((n, E), jnp.float32),
        jax.ShapeDtypeStruct((G, 1), jnp.float32),
    ]
    a_out_specs = [prep.center_spec(n), prep.center_spec(n),
                   prep.center_spec(n), smem_out]
    if prep.has_far:
        a_out_shapes.append(
            jax.ShapeDtypeStruct((prep.n_aux, E), jnp.float32))
        a_out_specs.append(prep.center_spec(prep.n_aux))

    def kA(r, p, inv, x, beta, alpha_prev):
        sc = jnp.stack([jnp.asarray(beta, jnp.float32),
                        jnp.asarray(alpha_prev, jnp.float32)]).reshape(1, 2)
        res = pl.pallas_call(
            kernel_a,
            out_shape=tuple(a_out_shapes),
            grid=(G,),
            in_specs=a_specs,
            out_specs=tuple(a_out_specs),
            interpret=interpret,
        )(r, r, r, p, p, p, inv, inv, inv, aT, aT, aT, x, KT, M, sc)
        if prep.has_far:
            # the near-DSS Ap travels WITH its compact far rows; kernel B
            # adds them in VMEM while streaming Ap for the r update, so
            # the corrected Ap is never materialized in HBM (the
            # apply_far concat rebuild costs ~2 full passes at 1M el)
            p_new, Ap, x_new, dparts, aux = res
            return p_new, (Ap, prep.far_rows(aux)), x_new, dparts
        return res

    kB = _build_cg_kernel_b(prep, interpret)
    kA._prep = kB._prep = prep        # introspection (tests, bench)
    kA._defer_x = False
    return kA, kB, G


def _build_cg_kernel_b(prep, interpret: bool):
    """CG iteration tail kernel, shared by the affine and general fused
    CG factories (kernel B never touches the geometric factors):
    ``kB(r, Ap, inv, w_free, alpha) -> (r', rz_parts, rn2_parts)`` with
    z = inv*r' kept in VMEM and both weighted reductions per tile; adds
    kernel A's compact far rows into the Ap stream when the far split is
    active."""
    n, E, G = prep.n, prep.E, prep.G

    smem_scalar = pl.BlockSpec((1, 1), _im32(lambda i: (0, 0)),
                               memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec((G, 1), _im32(lambda i: (0, 0)),
                            memory_space=pltpu.SMEM)

    def kernel_b(r_ref, ap_ref, i_ref, w_ref, *rest):
        if prep.has_far:
            far_ref, alpha_ref, ro_ref, rz_ref, rn_ref = rest
            ap = prep.add_far(ap_ref[:], far_ref[:])
        else:
            alpha_ref, ro_ref, rz_ref, rn_ref = rest
            ap = ap_ref[:]
        alpha = alpha_ref[0, 0]
        r_new = r_ref[:] - alpha * ap
        ro_ref[:] = r_new
        w = w_ref[:].astype(jnp.float32)
        z = i_ref[:].astype(jnp.float32) * r_new
        g = pl.program_id(0)
        rz_ref[g, 0] = jnp.sum(w * r_new * z)
        rn_ref[g, 0] = jnp.sum(w * r_new * r_new)

    cs_n = prep.center_spec(n)
    b_specs = [cs_n, cs_n, cs_n, cs_n]
    if prep.has_far:
        b_specs.append(prep.center_spec(prep.n_far))
    b_specs.append(smem_scalar)
    b_out_shapes = (
        jax.ShapeDtypeStruct((n, E), jnp.float32),
        jax.ShapeDtypeStruct((G, 1), jnp.float32),
        jax.ShapeDtypeStruct((G, 1), jnp.float32),
    )
    b_out_specs = (cs_n, smem_out, smem_out)

    def kB(r, Ap, inv, w_free, alpha):
        alpha = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
        args = (r, Ap, inv, w_free, alpha)
        if prep.has_far:
            Ap, far = Ap
            args = (r, Ap, inv, w_free, far, alpha)
        return pl.pallas_call(
            kernel_b,
            out_shape=b_out_shapes,
            grid=(G,),
            in_specs=b_specs,
            out_specs=b_out_specs,
            interpret=interpret,
        )(*args)

    return kB


def make_fused_cg_kernel_single(exchange, Kcat, a, *,
                                precision: str = "high",
                                p_dtype=None,
                                target_win: int | None = None,
                                defer_x: bool = False,
                                interpret: bool = False):
    """ONE Pallas kernel per PCG iteration (affine meshes, full halo).

    The two-kernel pair of :func:`make_fused_cg_kernels` is forced by
    the two global reductions of a textbook PCG iteration: beta needs
    ``<r', z'>`` of the *updated* residual, which needs alpha, which
    needs ``<p, Ap>``.  One kernel per iteration suffices when the
    residual update is deferred into the *next* iteration's kernel
    (computed on the halo window from the carried pre-update r and Ap,
    exactly like the lagged x update).  Per iteration::

        kAB(r, Ap, p, x, inv, w_free, alpha_prev, beta) ->
            (r', p', Ap', x', parts)

        r'   = r - alpha_prev * Ap          (deferred residual update)
        z'   = inv * r'                     (window, never stored)
        p'   = z' + beta * p
        Ap'  = A p'                         (assembled-K + roll DSS)
        x'   = x + alpha_prev * p           (lagged, as in the pair)
        parts: (G, 5) per-tile partials [denom, c1, c2, e1, e2]::

            denom = <p', A p'>       (pre-DSS identity, exact)
            e1    = <r', inv r'>_w   (rz of the iterate just formed)
            e2    = <r', r'>_w       (rn2 of the same — stopping test)
            c1    = <r', inv Ap'>_w
            c2    = <Ap', inv Ap'>_w

    ``alpha = e1/denom`` and the stopping test use the EXACT direct
    reductions (r' lives in VMEM anyway; the extra dots are free).
    Only beta needs a value the kernel cannot have — ``<r'', z''>`` of
    the not-yet-formed next residual — and gets the one-step quadratic
    prediction ``rz'' = e1 - 2 a c1 + a^2 c2`` (exact algebra; its fp
    cancellation error is one-step-deep, anchored each iteration by the
    exact e1, so nothing accumulates — measured ~1e-6 relative beta
    perturbation, the same order as bf16-direction rounding).

    vs the kernel pair this removes kernel B's r/Ap/inv/w streams and
    its r write in exchange for reading Ap as a halo window (+1 pass)
    and w in kernel A (+0.5): ~9.6 -> ~8.2 f32-equivalent HBM passes
    per iteration at p=8 (bf16 p/inv/w), plus one fewer kernel-launch
    boundary per iteration.

    Frozen iterations (alpha = beta = 0) pin r, x and the exact dots
    bit-for-bit (the kernel recomputes them from the pinned r).  The
    stopping test sees each residual one iteration later than the
    pair — worst case one extra (frozen-equivalent) iteration.

    ``defer_x=True`` additionally drops x from the kernel
    (``kAB(r, Ap, p, inv, w_free, alpha_prev, beta) ->
    (r', p', Ap', parts)``); the driver retains the last m directions
    and catches x up once per m iterations (see
    :func:`make_fused_cg_kernels`).

    Full halo only (no far-class split): at 1M elements the padded
    full-halo tiling is the measured-best CG-kernel config
    (BASELINE.md round-2h); pad the exchange with ``fused_pad=True``.

    Returns ``(kAB, G)``.
    """
    if p_dtype is not None and jnp.dtype(p_dtype) != jnp.bfloat16:
        raise ValueError(f"p_dtype must be None or bfloat16, got {p_dtype}")
    p_bf16 = p_dtype is not None
    if p_bf16 and precision != "high":
        raise ValueError("p_dtype=bfloat16 requires precision='high'")
    if target_win is None:
        # holds the kernel-pair A state plus an Ap f32 window and a w
        # center row-block; measured-safe defaults one notch below the
        # pair's (3072/1536); scaled down for higher orders
        target_win = _scale_win(2304 if p_bf16 else 1280, Kcat.shape[0])

    from ..utils.hoist import ensure_recursion_headroom

    ensure_recursion_headroom()
    prep = _AffineFusedPrep(exchange, Kcat, a, precision, target_win,
                            max_halo=None)
    n, E, G, TE, Hb = prep.n, prep.E, prep.G, prep.TE, prep.Hb
    KT, M, aT = prep.KT, prep.M, prep.aT
    p_store = jnp.bfloat16 if p_bf16 else jnp.float32

    smem_pair = pl.BlockSpec((1, 2), _im32(lambda i: (0, 0)),
                             memory_space=pltpu.SMEM)
    smem_parts = pl.BlockSpec((G, 5), _im32(lambda i: (0, 0)),
                              memory_space=pltpu.SMEM)

    def body(refs, x_ref):
        """Shared iteration core; x_ref is None in defer_x mode."""
        (rL, rC, rR, apL, apC, apR, pL, pC, pR, iL, iC, iR,
         aL, aC, aR, w_ref, K_ref, m_ref, sc_ref) = refs
        alpha_prev = sc_ref[0, 0]
        beta = sc_ref[0, 1]
        ap_win = jnp.concatenate([apL[:], apC[:], apR[:]], axis=1)
        r_win = (jnp.concatenate([rL[:], rC[:], rR[:]], axis=1)
                 - alpha_prev * ap_win)                # deferred r update
        i_win = jnp.concatenate([iL[:], iC[:], iR[:]], axis=1)
        a_win = jnp.concatenate([aL[:], aC[:], aR[:]], axis=1)
        p32 = jnp.concatenate([pL[:], pC[:], pR[:]],
                              axis=1).astype(jnp.float32)
        i32w = i_win.astype(jnp.float32)
        pn = i32w * r_win + beta * p32
        # Ap must be computed from the *stored* direction: round first
        pn_st = pn.astype(p_store)
        V = prep.dot_window(K_ref, pn_st)
        S = prep.affine_reduce(a_win, V)
        Ap_new = prep.roll_dss(S, m_ref)               # (n, TE)
        r_new = r_win[:, Hb:Hb + TE]
        x_new = (None if x_ref is None
                 else x_ref[:] + alpha_prev * p32[:, Hb:Hb + TE])
        w = w_ref[:].astype(jnp.float32)
        inv_c = i32w[:, Hb:Hb + TE]
        invAp = inv_c * Ap_new
        invr = inv_c * r_new
        denom = jnp.sum(pn_st[:, Hb:Hb + TE].astype(jnp.float32)
                        * S[:, Hb:Hb + TE])
        c1 = jnp.sum(w * r_new * invAp)
        c2 = jnp.sum(w * Ap_new * invAp)
        e1 = jnp.sum(w * r_new * invr)
        e2 = jnp.sum(w * r_new * r_new)
        return (r_new, pn_st[:, Hb:Hb + TE], Ap_new, x_new,
                (denom, c1, c2, e1, e2))

    def write_parts(parts_ref, parts):
        g = pl.program_id(0)
        for j, v in enumerate(parts):
            parts_ref[g, j] = v

    base_specs = (prep.halo_triple(n) + prep.halo_triple(n)
                  + prep.halo_triple(n) + prep.halo_triple(n)
                  + prep.halo_triple(3) + [prep.center_spec(n)]
                  + prep.const_specs() + [smem_pair])
    cs_n = prep.center_spec(n)

    if defer_x:
        def kernel_d(rL, rC, rR, apL, apC, apR, pL, pC, pR, iL, iC, iR,
                     aL, aC, aR, w_ref, K_ref, m_ref, sc_ref,
                     ro_ref, po_ref, apo_ref, parts_ref):
            refs = (rL, rC, rR, apL, apC, apR, pL, pC, pR, iL, iC, iR,
                    aL, aC, aR, w_ref, K_ref, m_ref, sc_ref)
            r_new, p_new, Ap_new, _, parts = body(refs, None)
            ro_ref[:] = r_new
            po_ref[:] = p_new
            apo_ref[:] = Ap_new
            write_parts(parts_ref, parts)

        out_shapes = (jax.ShapeDtypeStruct((n, E), jnp.float32),
                      jax.ShapeDtypeStruct((n, E), p_store),
                      jax.ShapeDtypeStruct((n, E), jnp.float32),
                      jax.ShapeDtypeStruct((G, 5), jnp.float32))
        out_specs = (cs_n, cs_n, cs_n, smem_parts)

        def kAB_d(r, Ap, p, inv, w_free, alpha_prev, beta):
            sc = jnp.stack([jnp.asarray(alpha_prev, jnp.float32),
                            jnp.asarray(beta, jnp.float32)]).reshape(1, 2)
            return pl.pallas_call(
                kernel_d,
                out_shape=out_shapes,
                grid=(G,),
                in_specs=base_specs,
                out_specs=out_specs,
                interpret=interpret,
            )(r, r, r, Ap, Ap, Ap, p, p, p, inv, inv, inv, aT, aT, aT,
              w_free, KT, M, sc)

        kAB_d._prep = prep
        kAB_d._single = True
        kAB_d._defer_x = True
        kAB_d._no_hoist = True
        return kAB_d, G

    def kernel(rL, rC, rR, apL, apC, apR, pL, pC, pR, iL, iC, iR,
               aL, aC, aR, w_ref, x_ref, K_ref, m_ref, sc_ref,
               ro_ref, po_ref, apo_ref, xo_ref, parts_ref):
        refs = (rL, rC, rR, apL, apC, apR, pL, pC, pR, iL, iC, iR,
                aL, aC, aR, w_ref, K_ref, m_ref, sc_ref)
        r_new, p_new, Ap_new, x_new, parts = body(refs, x_ref)
        ro_ref[:] = r_new
        po_ref[:] = p_new
        apo_ref[:] = Ap_new
        xo_ref[:] = x_new
        write_parts(parts_ref, parts)

    specs = (prep.halo_triple(n) + prep.halo_triple(n)
             + prep.halo_triple(n) + prep.halo_triple(n)
             + prep.halo_triple(3) + [prep.center_spec(n), cs_n]
             + prep.const_specs() + [smem_pair])
    out_shapes = (jax.ShapeDtypeStruct((n, E), jnp.float32),
                  jax.ShapeDtypeStruct((n, E), p_store),
                  jax.ShapeDtypeStruct((n, E), jnp.float32),
                  jax.ShapeDtypeStruct((n, E), jnp.float32),
                  jax.ShapeDtypeStruct((G, 5), jnp.float32))
    out_specs = (cs_n, cs_n, cs_n, cs_n, smem_parts)

    def kAB(r, Ap, p, x, inv, w_free, alpha_prev, beta):
        sc = jnp.stack([jnp.asarray(alpha_prev, jnp.float32),
                        jnp.asarray(beta, jnp.float32)]).reshape(1, 2)
        return pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(G,),
            in_specs=specs,
            out_specs=out_specs,
            interpret=interpret,
        )(r, r, r, Ap, Ap, Ap, p, p, p, inv, inv, inv, aT, aT, aT,
          w_free, x, KT, M, sc)

    kAB._prep = prep
    kAB._single = True
    kAB._defer_x = False
    kAB._no_hoist = True
    return kAB, G


def make_fused_cg_kernels_general(exchange, Gf, Dhat, *,
                                  n_rhs: int = 1,
                                  precision: str = "high",
                                  p_dtype=None,
                                  target_win: int | None = None,
                                  max_halo="auto",
                                  interpret: bool = False):
    """Two Pallas kernels fusing one PCG iteration on GENERAL meshes.

    The curved-mesh twin of :func:`make_fused_cg_kernels`: kernel A
    computes the apply through the in-VMEM derivative-dot chain of
    :func:`make_fused_general_laplacian_T` (full (3, n, E) factor slabs
    read on the halo window) instead of the affine assembled-K matmul;
    kernel B is the shared factor-free tail.  The unfused general CG
    iteration costs ~9 apply passes (grads/flux materialization) + ~12
    vector passes; the fused pair streams ~16.  ``max_halo`` enables
    the far-class split of :func:`make_fused_cg_kernels` (kernel A
    emits aux raw rows; kernel B adds the compact far rows in VMEM) —
    the escape hatch for large-offset roll classes at 1M-element scale;
    the panel element order remains the zero-cost alternative.

    Same driver contract as the affine factory (consumed unchanged by
    :func:`..solver.cg.cg_fused`):

        kA(r, p, inv, x, beta, alpha_prev) -> (p', Ap', x', denom_parts)
        kB(r, Ap', inv, w_free, alpha)     -> (r', rz_p, rn2_p)

    ``p_dtype=jnp.bfloat16`` stores the search direction in bf16
    (requires ``precision='high'``); x and r stay float32, and Ap is
    computed from the stored direction so full f32 accuracy is
    attainable.  ``defer_x`` is not offered here (the x update is a
    smaller fraction of this kernel's traffic).

    ``n_rhs=k`` batches k independent CG solves through the kernels
    (driver: :func:`..solver.cg.cg_fused_batched`): r/p/x/Ap stack k
    sublane blocks of n rows ((k, n, E) reshaped to (k*n, E)), while
    the factor window, the inverse diagonal, the dot weights, and the
    class masks stream ONCE for all k; beta/alpha arrive as (k,)
    vectors and the partial sums return (G, k).  Per-RHS the factor
    traffic (~3 of the iteration's ~15 passes) amortizes by 1/k and
    the per-dispatch latency by k.  The VMEM window shrinks ~k-fold —
    large-offset roll classes (lex-ordered big meshes) may be
    inadmissible at k > 2; panel element orders keep H small.
    """
    import numpy as np

    from ..utils.hoist import ensure_recursion_headroom

    ensure_recursion_headroom()
    if p_dtype is not None and jnp.dtype(p_dtype) != jnp.bfloat16:
        raise ValueError(f"p_dtype must be None or bfloat16, got {p_dtype}")
    p_bf16 = p_dtype is not None
    if p_bf16 and precision != "high":
        raise ValueError("p_dtype=bfloat16 requires precision='high'")
    if n_rhs < 1:
        raise ValueError(f"n_rhs must be >= 1, got {n_rhs}")
    k_rhs = n_rhs
    if target_win is None:
        # kernel A holds ~(7k + 8)n rows of per-lane state (k r/p
        # windows + x/outs, one shared inv/factor window, transients)
        base = 2048 if p_bf16 else 1024
        target_win = max(int(base * 15 / (7 * k_rhs + 8)) // 128 * 128,
                         384)

    prep = _AffineFusedPrep(exchange, None, None, precision, target_win,
                            max_halo=max_halo, cheap_far=True)
    n, E, G, TE, Hb = prep.n, prep.E, prep.G, prep.TE, prep.Hb
    M = prep.M
    p_store = jnp.bfloat16 if p_bf16 else jnp.float32
    n_aux = prep.n_aux

    Dhat_np = np.asarray(Dhat, dtype=np.float64)[:, exchange.hier]
    Dh_c = prep.prec_const(Dhat_np)                          # (2n, n)
    DhT_c = prep.prec_const(np.ascontiguousarray(Dhat_np.T))
    Gf_np = np.asarray(Gf, dtype=np.float32)
    gT = jnp.asarray(np.ascontiguousarray(
        Gf_np.transpose(1, 2, 0).reshape(3 * n, E)))         # (3n, E)

    def kernel_a(rL, rC, rR, pL, pC, pR, iL, iC, iR, gL, gC, gR,
                 x_ref, dh_ref, dht_ref, m_ref, sc_ref,
                 po_ref, apo_ref, xo_ref, d_ref, *aux_ref):
        g_win = jnp.concatenate([gL[:], gC[:], gR[:]], axis=1)
        g0, g1, g2 = g_win[:n], g_win[n:2 * n], g_win[2 * n:]
        i_win = jnp.concatenate([iL[:], iC[:], iR[:]], axis=1)
        i32w = i_win.astype(jnp.float32)
        # full-window concat once + per-RHS value slices (see the affine
        # batched kernel: ref row-slices at j*n feed the lane concat
        # mismatched sublane offsets at some tilings)
        r_full = jnp.concatenate([rL[:], rC[:], rR[:]], axis=1)
        p_full = jnp.concatenate([pL[:], pC[:], pR[:]], axis=1)
        for j in range(k_rhs):
            sl = slice(j * n, (j + 1) * n)
            beta = sc_ref[j, 0]
            alpha_prev = sc_ref[j, 1]
            r_win = r_full[sl]
            p_win = p_full[sl]
            p32 = p_win.astype(jnp.float32)
            xo_ref[sl] = x_ref[sl] + alpha_prev * p32[:, Hb:Hb + TE]
            pn = i32w * r_win + beta * p32
            # Ap must be computed from the *stored* direction
            pn_st = pn.astype(p_store)
            grads = prep.prec_dot(dh_ref, 2 * n, pn_st)      # (2n, W)
            ur, us = grads[:n], grads[n:]
            flux = jnp.concatenate(
                [g0 * ur + g1 * us, g1 * ur + g2 * us], axis=0)
            S = prep.prec_dot(dht_ref, n, flux)              # (n, W)
            po_ref[sl] = pn_st[:, Hb:Hb + TE]
            apo_ref[sl] = prep.roll_dss(S, m_ref)
            d_ref[pl.program_id(0), j] = jnp.sum(
                pn_st[:, Hb:Hb + TE].astype(jnp.float32)
                * S[:, Hb:Hb + TE])
            if aux_ref:
                aux_ref[0][j * n_aux:(j + 1) * n_aux] = prep.aux_extract(S)

    smem_sc = pl.BlockSpec((k_rhs, 2), _im32(lambda i: (0, 0)),
                           memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec((G, k_rhs), _im32(lambda i: (0, 0)),
                            memory_space=pltpu.SMEM)
    d_rows, dt_rows = Dh_c.shape[0], DhT_c.shape[0]
    kn = k_rhs * n
    a_specs = (prep.halo_triple(kn) + prep.halo_triple(kn)
               + prep.halo_triple(n) + prep.halo_triple(3 * n)
               + [prep.center_spec(kn)] + [
                   pl.BlockSpec((d_rows, n), _im32(lambda i: (0, 0)),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((dt_rows, 2 * n), _im32(lambda i: (0, 0)),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((prep.n_mask_rows, TE),
                                _im32(lambda i: (0, i)),
                                memory_space=pltpu.VMEM),
               ] + [smem_sc])
    a_out_shapes = [
        jax.ShapeDtypeStruct((kn, E), p_store),
        jax.ShapeDtypeStruct((kn, E), jnp.float32),
        jax.ShapeDtypeStruct((kn, E), jnp.float32),
        jax.ShapeDtypeStruct((G, k_rhs), jnp.float32),
    ]
    a_out_specs = [prep.center_spec(kn), prep.center_spec(kn),
                   prep.center_spec(kn), smem_out]
    if prep.has_far:
        a_out_shapes.append(
            jax.ShapeDtypeStruct((k_rhs * n_aux, E), jnp.float32))
        a_out_specs.append(prep.center_spec(k_rhs * n_aux))

    def kA(r, p, inv, x, beta, alpha_prev):
        sc = jnp.stack(
            [jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (k_rhs,)),
             jnp.broadcast_to(jnp.asarray(alpha_prev, jnp.float32),
                              (k_rhs,))], axis=1)            # (k, 2)
        res = pl.pallas_call(
            kernel_a,
            out_shape=tuple(a_out_shapes),
            grid=(G,),
            in_specs=a_specs,
            out_specs=tuple(a_out_specs),
            interpret=interpret,
        )(r, r, r, p, p, p, inv, inv, inv, gT, gT, gT, x,
          Dh_c, DhT_c, M, sc)
        if prep.has_far:
            p_new, Ap, x_new, dparts, aux = res
            far = (prep.far_rows(aux) if k_rhs == 1
                   else _far_rows_batched(prep, aux, k_rhs))
            return p_new, (Ap, far), x_new, dparts
        return res

    if k_rhs == 1:
        kB = _build_cg_kernel_b(prep, interpret)
    else:
        kB = _build_cg_kernel_b_batched(prep, k_rhs, interpret)
    kA._prep = kB._prep = prep        # introspection (tests, bench)
    kA._defer_x = False
    kA._n_rhs = k_rhs
    kA._no_hoist = kB._no_hoist = True
    return kA, kB, G


def make_fused_cg_kernels_batched(exchange, Kcat, a, *,
                                  n_rhs: int,
                                  precision: str = "high",
                                  p_dtype=None,
                                  target_win: int | None = None,
                                  max_halo="auto",
                                  defer_x: bool = False,
                                  interpret: bool = False):
    """Batched-RHS affine fused CG kernels (k solves per invocation).

    The affine twin of ``make_fused_cg_kernels_general(n_rhs=k)``:
    kernel A loops k sublane-stacked r/p/x blocks over ONE shared
    assembled-K constant, affine-factor window, inverse diagonal and
    class-mask stream, with per-RHS (k,) beta/alpha scalars and (G, k)
    denominator partials; kernel B is the shared batched tail.
    Driver: :func:`..solver.cg.cg_fused_batched`.  Amortized per RHS:
    the inv/w/mask streams (~2.5 of ~9.5 passes) and the per-dispatch
    latency; the affine factors themselves are already tiny.

    ``max_halo`` (lane blocks, 'auto', or None for full halo): the
    far-class split of :func:`make_fused_cg_kernels` — kernel A emits
    per-RHS aux raw rows, Ap travels as ``(Ap_near, far_rows)`` with
    (k*n_far, E) stacked far rows, kernel B adds each RHS's rows in
    VMEM.  The batched windows shrink ~k-fold, so the split's window
    relief matters MORE here than in the single-RHS kernels (the
    measured k>=4 losses were degenerate-window costs — BASELINE.md
    round-2h).

    ``defer_x=True`` drops the solution update from kernel A entirely
    (``kA(r, p, inv, beta) -> (p', Ap', denom_parts)`` with beta a (k,)
    vector) — the driver retains the last m stacked directions and
    catches each RHS's x up once per m iterations
    (``cg_fused_batched(defer_x=m)``), exactly like the single-RHS
    deferred mode (a measured 1M-scale win there: BASELINE round-2h/2n).
    """
    import numpy as np  # noqa: F401  (parallel structure with general)

    from ..utils.hoist import ensure_recursion_headroom

    ensure_recursion_headroom()
    if p_dtype is not None and jnp.dtype(p_dtype) != jnp.bfloat16:
        raise ValueError(f"p_dtype must be None or bfloat16, got {p_dtype}")
    p_bf16 = p_dtype is not None
    if p_bf16 and precision != "high":
        raise ValueError("p_dtype=bfloat16 requires precision='high'")
    if n_rhs < 1:
        raise ValueError(f"n_rhs must be >= 1, got {n_rhs}")
    k_rhs = n_rhs
    if target_win is None:
        base = 3072 if p_bf16 else 1536
        target_win = max(int(base * 10 / (7 * k_rhs + 3)) // 128 * 128,
                         384)

    prep = _AffineFusedPrep(exchange, Kcat, a, precision, target_win,
                            max_halo=max_halo, cheap_far=True)
    n, E, G, TE, Hb = prep.n, prep.E, prep.G, prep.TE, prep.Hb
    KT, M, aT = prep.KT, prep.M, prep.aT
    p_store = jnp.bfloat16 if p_bf16 else jnp.float32
    kn = k_rhs * n
    n_aux = prep.n_aux

    def kernel_a(rL, rC, rR, pL, pC, pR, iL, iC, iR, aL, aC, aR,
                 x_ref, K_ref, m_ref, sc_ref, po_ref, apo_ref, xo_ref,
                 d_ref, *aux_ref):
        a_win = jnp.concatenate([aL[:], aC[:], aR[:]], axis=1)
        i_win = jnp.concatenate([iL[:], iC[:], iR[:]], axis=1)
        i32w = i_win.astype(jnp.float32)
        # concat the full stacked windows ONCE, slice per-RHS at value
        # level: ref row-slices at j*n (not sublane-aligned) feed the
        # lane concat operands mismatched sublane offsets, which Mosaic
        # rejects ("result/input offset mismatch on non-concat
        # dimension") at some tilings
        r_full = jnp.concatenate([rL[:], rC[:], rR[:]], axis=1)
        p_full = jnp.concatenate([pL[:], pC[:], pR[:]], axis=1)
        for j in range(k_rhs):
            sl = slice(j * n, (j + 1) * n)
            beta = sc_ref[j, 0]
            r_win = r_full[sl]
            p_win = p_full[sl]
            p32 = p_win.astype(jnp.float32)
            if x_ref is not None:
                alpha_prev = sc_ref[j, 1]
                xo_ref[sl] = x_ref[sl] + alpha_prev * p32[:, Hb:Hb + TE]
            pn = i32w * r_win + beta * p32
            pn_st = pn.astype(p_store)
            V = prep.dot_window(K_ref, pn_st)
            S = prep.affine_reduce(a_win, V)
            po_ref[sl] = pn_st[:, Hb:Hb + TE]
            apo_ref[sl] = prep.roll_dss(S, m_ref)
            d_ref[pl.program_id(0), j] = jnp.sum(
                pn_st[:, Hb:Hb + TE].astype(jnp.float32)
                * S[:, Hb:Hb + TE])
            if aux_ref:
                aux_ref[0][j * n_aux:(j + 1) * n_aux] = prep.aux_extract(S)

    def kernel_a_d(rL, rC, rR, pL, pC, pR, iL, iC, iR, aL, aC, aR,
                   K_ref, m_ref, sc_ref, po_ref, apo_ref, d_ref,
                   *aux_ref):
        kernel_a(rL, rC, rR, pL, pC, pR, iL, iC, iR, aL, aC, aR,
                 None, K_ref, m_ref, sc_ref, po_ref, apo_ref, None,
                 d_ref, *aux_ref)

    sc_cols = 1 if defer_x else 2
    smem_sc = pl.BlockSpec((k_rhs, sc_cols), _im32(lambda i: (0, 0)),
                           memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec((G, k_rhs), _im32(lambda i: (0, 0)),
                            memory_space=pltpu.SMEM)
    a_specs = (prep.halo_triple(kn) + prep.halo_triple(kn)
               + prep.halo_triple(n) + prep.halo_triple(3)
               + ([] if defer_x else [prep.center_spec(kn)])
               + prep.const_specs()
               + [smem_sc])
    a_out_shapes = [
        jax.ShapeDtypeStruct((kn, E), p_store),
        jax.ShapeDtypeStruct((kn, E), jnp.float32),
    ]
    a_out_specs = [prep.center_spec(kn), prep.center_spec(kn)]
    if not defer_x:
        a_out_shapes.append(jax.ShapeDtypeStruct((kn, E), jnp.float32))
        a_out_specs.append(prep.center_spec(kn))
    a_out_shapes.append(jax.ShapeDtypeStruct((G, k_rhs), jnp.float32))
    a_out_specs.append(smem_out)
    if prep.has_far:
        a_out_shapes.append(
            jax.ShapeDtypeStruct((k_rhs * n_aux, E), jnp.float32))
        a_out_specs.append(prep.center_spec(k_rhs * n_aux))

    if defer_x:
        def kA_d(r, p, inv, beta):
            sc = jnp.broadcast_to(
                jnp.asarray(beta, jnp.float32), (k_rhs,)).reshape(
                    k_rhs, 1)
            res = pl.pallas_call(
                kernel_a_d,
                out_shape=tuple(a_out_shapes),
                grid=(G,),
                in_specs=a_specs,
                out_specs=tuple(a_out_specs),
                interpret=interpret,
            )(r, r, r, p, p, p, inv, inv, inv, aT, aT, aT, KT, M, sc)
            if prep.has_far:
                p_new, Ap, dparts, aux = res
                return p_new, (Ap, _far_rows_batched(prep, aux, k_rhs)), \
                    dparts
            return res

        kB = _build_cg_kernel_b_batched(prep, k_rhs, interpret)
        kA_d._prep = kB._prep = prep
        kA_d._defer_x = True
        kA_d._n_rhs = k_rhs
        kA_d._no_hoist = kB._no_hoist = True
        return kA_d, kB, G

    def kA(r, p, inv, x, beta, alpha_prev):
        sc = jnp.stack(
            [jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (k_rhs,)),
             jnp.broadcast_to(jnp.asarray(alpha_prev, jnp.float32),
                              (k_rhs,))], axis=1)
        res = pl.pallas_call(
            kernel_a,
            out_shape=tuple(a_out_shapes),
            grid=(G,),
            in_specs=a_specs,
            out_specs=tuple(a_out_specs),
            interpret=interpret,
        )(r, r, r, p, p, p, inv, inv, inv, aT, aT, aT, x, KT, M, sc)
        if prep.has_far:
            p_new, Ap, x_new, dparts, aux = res
            return p_new, (Ap, _far_rows_batched(prep, aux, k_rhs)), \
                x_new, dparts
        return res

    kB = _build_cg_kernel_b_batched(prep, k_rhs, interpret)
    kA._prep = kB._prep = prep
    kA._defer_x = False
    kA._n_rhs = k_rhs
    kA._no_hoist = kB._no_hoist = True
    return kA, kB, G


def _far_rows_batched(prep, aux, k_rhs: int):
    """Per-RHS :meth:`_AffineFusedPrep.far_rows` over (k*n_aux, E)
    stacked aux rows -> (k*n_far, E) stacked far destination rows."""
    n_aux = prep.n_aux
    return jnp.concatenate(
        [prep.far_rows(aux[j * n_aux:(j + 1) * n_aux])
         for j in range(k_rhs)], axis=0)


def _build_cg_kernel_b_batched(prep, k_rhs: int, interpret: bool):
    """Batched CG tail kernel: k sublane-stacked residual blocks share
    one inverse-diagonal and one dot-weight stream; alpha is (k,) and
    the weighted reductions return (G, k) partials.  With the far split
    active, kernel A's per-RHS compact far rows are added into each
    RHS's Ap block in VMEM (see :func:`_build_cg_kernel_b`)."""
    n, E, G = prep.n, prep.E, prep.G
    kn = k_rhs * n
    n_far = prep.n_far

    smem_al = pl.BlockSpec((k_rhs, 1), _im32(lambda i: (0, 0)),
                           memory_space=pltpu.SMEM)
    smem_out = pl.BlockSpec((G, k_rhs), _im32(lambda i: (0, 0)),
                            memory_space=pltpu.SMEM)

    def kernel_b(r_ref, ap_ref, i_ref, w_ref, *rest):
        if prep.has_far:
            far_ref, al_ref, ro_ref, rz_ref, rn_ref = rest
        else:
            far_ref = None
            al_ref, ro_ref, rz_ref, rn_ref = rest
        w = w_ref[:].astype(jnp.float32)
        iw = i_ref[:].astype(jnp.float32)
        g = pl.program_id(0)
        for j in range(k_rhs):
            sl = slice(j * n, (j + 1) * n)
            alpha = al_ref[j, 0]
            ap = ap_ref[sl]
            if far_ref is not None:
                ap = prep.add_far(
                    ap, far_ref[j * n_far:(j + 1) * n_far])
            r_new = r_ref[sl] - alpha * ap
            ro_ref[sl] = r_new
            z = iw * r_new
            rz_ref[g, j] = jnp.sum(w * r_new * z)
            rn_ref[g, j] = jnp.sum(w * r_new * r_new)

    cs_kn = prep.center_spec(kn)
    cs_n = prep.center_spec(n)
    b_specs = [cs_kn, cs_kn, cs_n, cs_n]
    if prep.has_far:
        b_specs.append(prep.center_spec(k_rhs * n_far))
    b_specs.append(smem_al)
    b_out_shapes = (
        jax.ShapeDtypeStruct((kn, E), jnp.float32),
        jax.ShapeDtypeStruct((G, k_rhs), jnp.float32),
        jax.ShapeDtypeStruct((G, k_rhs), jnp.float32),
    )
    b_out_specs = (cs_kn, smem_out, smem_out)

    def kB(r, Ap, inv, w_free, alpha):
        al = jnp.asarray(alpha, jnp.float32).reshape(k_rhs, 1)
        args = (r, Ap, inv, w_free, al)
        if prep.has_far:
            Ap, far = Ap
            args = (r, Ap, inv, w_free, far, al)
        return pl.pallas_call(
            kernel_b,
            out_shape=b_out_shapes,
            grid=(G,),
            in_specs=b_specs,
            out_specs=b_out_specs,
            interpret=interpret,
        )(*args)

    return kB


def supported() -> bool:
    """True when the default JAX backend compiles Pallas TPU kernels."""
    return jax.default_backend() == "tpu"
