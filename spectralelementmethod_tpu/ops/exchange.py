"""Local-vector (L-vector) storage and structured DSS exchange.

The fastest TPU formulation of direct stiffness summation.  Arbitrary-index
scatter/gather is pathologically slow on TPU (measured ~25 ms for a p=8,
20k-element apply vs ~1 ms for its matmuls), so the hot path never touches a
global vector.  Fields live **element-local** with duplicated shared DOFs
("L-vectors", shape ``(E, n_loc[, k])`` in *hierarchical* node order:
vertices, then the 4 edge interiors, then the cell interior — the reference's
ordering, ``sem/geometry.py:197-212``), and DSS becomes:

* **edge-interior exchange**: each conforming interior edge is shared by
  exactly 2 elements; summing contributions is one row-take by neighbor
  index (+ an orientation flip where needed) and a static-slice add;
* **vertex exchange**: vertices have variable valence; a scatter-add over
  only ``4E`` values (20x smaller than the naive full scatter) plus a
  gather-back.

An L-vector is *consistent* when all copies of a shared DOF hold the same
value; ``dss()`` maps arbitrary local contributions to a consistent sum,
and weighted dots (1/multiplicity) reproduce global inner products exactly,
so Krylov iterations on L-vectors are identical to global-vector iterations.

This is the domain's halo-exchange structure: sharding the element axis
turns the neighbor row-take into an ICI exchange.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class LocalExchange:
    """Precomputed DSS-exchange structure for a Discretization.

    Requires a conforming single-geometry quad mesh.  Anisotropic node
    grids (``shape[0] != shape[1]``, the reference's tensor bases are
    anisotropic throughout — ``sem/basis_functions.py:683-697``) are
    supported: the four hierarchical edge slots then have per-slot
    lengths ``[m1-2, m1-2, m0-2, m0-2]`` and face pairs must connect
    equal-length slots (guaranteed on a conforming mesh of one geometry).
    The structured :class:`RollExchange` fast path and the fused Pallas
    kernels handle anisotropic grids too (per-slot edge lengths; classes
    only pair equal-length slots); ``make_exchange`` falls back here for
    anisotropic meshes whose roll classes would carry edge tails.
    """

    def __init__(self, disc, pad_to: int | None = None,
                 layout: str = "edges-first"):
        geometry = disc.geometry
        m0, m1 = disc.shape
        self.disc = disc
        E = disc.E
        #: padded element count (>= disc.E) — pad rows are inert no-op
        #: elements so the element axis divides a device-mesh shard count
        Ep = E if pad_to is None else int(pad_to)
        if Ep < E:
            raise ValueError(f"pad_to={Ep} < E={E}")
        self.E, self.m = Ep, m0
        self.E_real = E
        self.n_loc = disc.n_loc
        self.is_square = m0 == m1
        #: edge-interior nodes per face slot, hierarchical edge order
        #: (faces normal to axis 0 first — they run along axis 1)
        self.edge_len = (m1 - 2, m1 - 2, m0 - 2, m0 - 2)
        #: per-slot offsets within the edge block
        self.edge_off = tuple(
            int(o) for o in np.concatenate(
                [[0], np.cumsum(self.edge_len[:-1])]))
        #: square-grid convenience (slot-uniform length); None when
        #: anisotropic — square-only consumers must check is_square
        self.ne = m0 - 2 if self.is_square else None
        self.n_edge_block = int(sum(self.edge_len))

        # local node order: blocks at lane-aligned offsets.  "edges-first"
        # = [edge interiors | vertices | cell interior] so every exchange
        # block slice starts at lane offset 0 or neb (the vertex-first
        # hierarchical order forces offset-4 lane slices, which cost a
        # cross-lane relayout per dss on TPU); "verts-first" keeps the
        # reference hierarchical order (sem/geometry.py:197-212).
        hier0 = geometry.hierarchical_node_order
        neb = self.n_edge_block
        if layout == "edges-first":
            order = np.concatenate(
                [hier0[4:4 + neb], hier0[:4], hier0[4 + neb:]])
            self.off_edge, self.off_vert = 0, neb
        elif layout == "verts-first":
            order = np.asarray(hier0)
            self.off_vert, self.off_edge = 0, 4
        else:
            raise ValueError(f"unknown layout {layout!r}")
        self.layout = layout
        self.off_int = neb + 4
        #: the active local node order (lex index -> L-vector column)
        self.hier = order
        #: (Ep, n_loc) global node ids in the local order
        #: (pad rows alias node 0; their values never enter any reduction)
        self.gather_hier = np.zeros((Ep, self.n_loc), dtype=np.int64)
        self.gather_hier[:E] = disc.gather_nodes[:, order]

        # ---- edge pairing -------------------------------------------------
        nb_lin = np.arange(Ep * 4, dtype=np.int32)  # default: self
        has_nb = np.zeros((Ep, 4), dtype=bool)
        flip = np.zeros((Ep, 4), dtype=bool)

        def slot_nodes(e_idx, f_idx):
            """Global node ids of the edge-interior nodes of slots (e, f)
            sharing one slot id f (so one static length)."""
            o = self.off_edge + self.edge_off[f_idx]
            return self.gather_hier[e_idx, o:o + self.edge_len[f_idx]]

        pairs = disc.mesh.face_pairs()
        if pairs.size:
            i, fi, j, fj = pairs.T
            bad_len = np.asarray(self.edge_len)[fi] != np.asarray(
                self.edge_len)[fj]
            if np.any(bad_len):
                b = int(np.nonzero(bad_len)[0][0])
                raise ValueError(
                    f"faces ({i[b]},{fi[b]})<->({j[b]},{fj[b]}) have "
                    f"different node counts (non-conforming orders)")
            # conformity + orientation per (fi, fj) slot combination
            # (slots fix the static slice length)
            for f_a in range(4):
                for f_b in range(4):
                    sel = (fi == f_a) & (fj == f_b)
                    if not np.any(sel) or self.edge_len[f_a] == 0:
                        continue
                    mine = slot_nodes(i[sel], f_a)
                    theirs = slot_nodes(j[sel], f_b)
                    same = np.all(mine == theirs, axis=1)
                    rev = np.all(mine == theirs[:, ::-1], axis=1)
                    bad = ~(same | rev)
                    if np.any(bad):
                        b = int(np.nonzero(bad)[0][0])
                        raise ValueError(
                            f"faces ({i[sel][b]},{f_a})<->"
                            f"({j[sel][b]},{f_b}) are not conforming")
                    fl = rev & ~same
                    flip[i[sel], f_a] = fl
                    flip[j[sel], f_b] = fl
            nb_lin[i * 4 + fi] = j * 4 + fj
            nb_lin[j * 4 + fj] = i * 4 + fi
            has_nb[i, fi] = True
            has_nb[j, fj] = True

        self._pairs_np = pairs
        self._nb_lin_np = nb_lin
        self._has_nb_np = has_nb
        self._flip_np = flip
        self.nb_lin = jnp.asarray(nb_lin)
        self.has_nb = jnp.asarray(has_nb[..., None])      # (E, 4, 1)
        self.flip = jnp.asarray(flip[..., None])          # (E, 4, 1)

        # ---- node-level edge-exchange gather ------------------------------
        # recv index: for edge-interior column c of element e, the flat
        # (element, column) position of the partner copy (self when no
        # neighbor); orientation flips are folded into the index.  One
        # flat gather then serves any (an)isotropic slot layout.
        cols = np.arange(self.n_loc, dtype=np.int64)
        recv_col = np.tile(cols, (Ep, 1))
        erow = np.arange(Ep, dtype=np.int64)[:, None]
        recv_row = np.tile(erow, (1, self.n_loc))
        for f in range(4):
            l_f = self.edge_len[f]
            if l_f == 0:
                continue
            o = self.off_edge + self.edge_off[f]
            nb = nb_lin[np.arange(Ep) * 4 + f]
            j_e, j_f = nb // 4, nb % 4
            # partner slot offset per element (same length by conformity)
            o_j = (self.off_edge
                   + np.asarray(self.edge_off, dtype=np.int64)[j_f])
            t = np.arange(l_f, dtype=np.int64)[None, :]
            t_j = np.where(flip[:, f][:, None], l_f - 1 - t, t)
            recv_row[:, o:o + l_f] = j_e[:, None]
            recv_col[:, o:o + l_f] = o_j[:, None] + t_j
        oe, neb = self.off_edge, self.n_edge_block
        self._edge_recv_flat = jnp.asarray(
            (recv_row * self.n_loc + recv_col)[:, oe:oe + neb].reshape(-1))
        edge_mask = np.zeros((Ep, neb), dtype=bool)
        for f in range(4):
            o = self.edge_off[f]
            edge_mask[:, o:o + self.edge_len[f]] = has_nb[:, f][:, None]
        self._edge_recv_mask = jnp.asarray(edge_mask)

        # ---- vertex numbering --------------------------------------------
        # pad-row vertex copies get fresh singleton ids so they never join
        # a real vertex's reduction or multiplicity
        vert_g = self.gather_hier[:E, self.off_vert:self.off_vert + 4]
        uniq, inv_real = np.unique(vert_g.ravel(), return_inverse=True)
        self.n_vertices = uniq.size + 4 * (Ep - E)
        inv = np.concatenate([
            inv_real,
            uniq.size + np.arange(4 * (Ep - E), dtype=inv_real.dtype),
        ])
        self._vert_gid_np = inv.astype(np.int64)
        self.vert_gid = jnp.asarray(inv.astype(np.int32))  # (Ep*4,)

        # ---- multiplicity weights (host-side: a device round-trip here
        # costs minutes through a remote-TPU tunnel) -----------------------
        mult = np.ones((Ep, self.n_loc))
        if self.n_edge_block > 0:
            # edge-interior nodes of faces with a neighbor appear twice
            mult[:, self.off_edge:self.off_edge + self.n_edge_block] += (
                np.repeat(has_nb, self.edge_len, axis=1)
            )
        vert_counts = np.bincount(inv, minlength=self.n_vertices)
        mult[:, self.off_vert:self.off_vert + 4] = (
            vert_counts[inv].reshape(Ep, 4)
        )
        self.multiplicity = mult
        weights = 1.0 / mult
        weights[E:] = 0.0     # pad rows never contribute to inner products
        # kept host-side; device copies materialize lazily per dtype in
        # _weights_as (an eager f64 copy is a 648MB transfer at 1M
        # elements that f32 solves never use)
        self._weights_np = weights

    # -- conversions -------------------------------------------------------

    def local_from_global(self, u_global) -> np.ndarray:
        """(n_nodes[, k]) -> (E, n_loc[, k]) consistent L-vector."""
        return np.asarray(u_global)[self.gather_hier]

    def global_from_local(self, uL) -> np.ndarray:
        """Consistent (E, n_loc[, k]) L-vector -> global (n_nodes[, k])."""
        uL = np.asarray(uL)[:self.E_real]
        out_shape = (self.disc.n_nodes,) + uL.shape[2:]
        out = np.zeros(out_shape, dtype=uL.dtype)
        out[self.gather_hier[:self.E_real].ravel()] = uL.reshape(
            (-1,) + uL.shape[2:]
        )
        return out

    # -- the exchange ------------------------------------------------------

    def dss(self, vL):
        """Direct stiffness summation on an L-vector.

        ``vL``: (E, n_loc) or (E, n_loc, k) arbitrary local contributions;
        returns the consistent summed L-vector (every copy of a shared DOF
        holds the total).  Jit-compatible.
        """
        if vL.ndim == 2:
            return self._dss_2d(vL)
        return jnp.stack(
            [self._dss_2d(vL[..., c]) for c in range(vL.shape[-1])],
            axis=-1,
        )

    def _dss_2d(self, vL):
        E, n = vL.shape
        neb = self.n_edge_block

        oe, ov = self.off_edge, self.off_vert
        if neb > 0:
            # node-level partner gather (index folds slot layout + flips;
            # handles anisotropic slot lengths uniformly)
            recv = vL.reshape(-1)[self._edge_recv_flat].reshape(E, neb)
            edges = vL[:, oe:oe + neb] + jnp.where(
                self._edge_recv_mask, recv, 0.0)
            vL = vL.at[:, oe:oe + neb].set(edges)

        verts = vL[:, ov:ov + 4].reshape(E * 4)
        summed = jnp.zeros((self.n_vertices,), vL.dtype).at[
            self.vert_gid
        ].add(verts)
        vL = vL.at[:, ov:ov + 4].set(summed[self.vert_gid].reshape(E, 4))

        return vL

    def dot(self, uL, vL):
        """Global inner product from consistent L-vectors (1/mult weights)."""
        prod = uL * vL
        w = self._weights_as(prod.dtype)
        if prod.ndim == 3:
            w = w[..., None]
        return jnp.sum(prod * w)

    # -- transposed (n_loc, E) storage ------------------------------------
    #
    # Elements-in-lanes layout: an (E, n_loc) f32 array pads its minor dim
    # 81 -> 128 at p=8 (58% wasted bandwidth on every elementwise op);
    # (n_loc, E) pads only sublanes (81 -> 88, 9%), and the affine apply
    # becomes accumulating (n, n) @ (n, E) matmuls.  Measured ~1.4x faster
    # apply+DSS at p=8 / 100k elements on v5e.

    def local_T_from_global(self, u_global) -> np.ndarray:
        """(n_nodes,) -> (n_loc, E) consistent transposed L-vector."""
        return np.ascontiguousarray(self.local_from_global(u_global).T)

    def global_from_local_T(self, uT) -> np.ndarray:
        """Consistent (n_loc, E) transposed L-vector -> global (n_nodes,)."""
        return self.global_from_local(np.asarray(uT).T)

    def dss_T(self, vT):
        """DSS on a transposed (n_loc, E) L-vector.

        Generic fallback: transpose-wraps :meth:`dss` (two relayout
        copies); :class:`RollExchange` overrides with a native transposed
        exchange.
        """
        return self.dss(vT.T).T

    def dot_T(self, uT, vT):
        """Global inner product from consistent transposed L-vectors."""
        prod = uT * vT
        return jnp.sum(prod * self._weights_as(prod.dtype, transposed=True))

    @property
    def weights(self):
        """(E, n_loc) inverse-multiplicity dot weights (float64 view)."""
        return self._weights_as(np.float64)

    def _weights_as(self, dtype, transposed: bool = False):
        """Dtype-cast device weights, cached (a fresh cast per dot costs a
        full array pass inside every CG iteration; an uncached host
        transfer costs far more)."""
        cache = getattr(self, "_w_cache", None)
        if cache is None:
            cache = self._w_cache = {}
        key = (jnp.dtype(dtype).name, transposed)
        if key not in cache:
            import jax

            w = self._weights_np.astype(dtype)
            if transposed:
                w = np.ascontiguousarray(w.T)
            # materialize OUTSIDE any active trace: jnp.asarray inside a
            # jit trace returns a tracer, which must not be cached
            with jax.ensure_compile_time_eval():
                cache[key] = jnp.asarray(w)
        return cache[key]

    def norm(self, uL):
        return jnp.sqrt(self.dot(uL, uL))


class RollExchange(LocalExchange):
    """DSS via constant-element-offset roll classes (structured fast path).

    Arbitrary-index gather/scatter dominates DSS cost on TPU (measured ~10x
    the apply matmuls at p=8, 100k elements), while ``jnp.roll`` along the
    element axis is nearly free.  On meshes built from structured patches
    (all the reference's meshes: square, donut, tube are transfinite) every
    face pair and vertex partnership falls into a handful of *classes*
    ``(dst_slot, src_slot, element_offset, flip)``; each class's exchange is
    one roll + mask + add.  Pairs/partners outside any large-enough class go
    through a small residual gather+scatter ("tail"), so the result equals
    :meth:`LocalExchange.dss` on any conforming mesh (up to fp summation
    order).

    Under element-axis sharding the rolls become XLA collective-permutes
    over the mesh axis — the halo exchange this structure is designed for.
    """

    #: keep a (dst_slot, src_slot, delta, flip) class when it covers at
    #: least this fraction of faces/vertex-copies (else it joins the tail)
    MIN_CLASS_FRACTION = 0.02

    def __init__(self, disc, pad_to: int | None = None,
                 layout: str = "edges-first",
                 min_class_fraction: float | None = None):
        """``min_class_fraction`` overrides :data:`MIN_CLASS_FRACTION`.

        The default keeps only large classes (each class costs an O(E)
        roll pass in the XLA dss, so tiny ones are cheaper as tail
        gathers).  Panel-ordered meshes (:func:`..parallel.partition.
        panel_order`) pass ``0.0``: their cross-panel-boundary pairs form
        small but *uniform* classes (one per boundary direction) that
        must stay classes — the fused kernels require zero tails and
        route the large-offset classes through the compact far-class
        epilogue.
        """
        super().__init__(disc, pad_to=pad_to, layout=layout)
        E, ne = self.E, self.ne
        if min_class_fraction is None:
            min_count = max(8, int(self.MIN_CLASS_FRACTION * E))
        else:
            min_count = max(1, int(float(min_class_fraction) * E))

        # ---- edge classes ------------------------------------------------
        pairs = self._pairs_np
        if pairs.size:
            i, fi, j, fj = pairs.T
            fl = self._flip_np[i, fi]
            # both directions of each pair
            dst = np.concatenate([i * 4 + fi, j * 4 + fj])
            src = np.concatenate([j * 4 + fj, i * 4 + fi])
            flips = np.concatenate([fl, fl])
        else:
            dst = src = np.zeros(0, dtype=np.int64)
            flips = np.zeros(0, dtype=bool)

        self.edge_classes = []   # (dst_slot, src_slot, delta, flip, mask)
        tail = np.ones(dst.size, dtype=bool)
        if dst.size:
            d_e, d_f = dst // 4, dst % 4
            s_e, s_f = src // 4, src % 4
            delta = s_e - d_e
            keys = ((d_f * 4 + s_f) * (4 * E + 1) + (delta + 2 * E)
                    ) * 2 + flips
            uniq, counts = np.unique(keys, return_counts=True)
            for key, cnt in zip(uniq[counts >= min_count],
                                counts[counts >= min_count]):
                sel = keys == key
                mask = np.zeros(E, dtype=bool)
                mask[d_e[sel]] = True
                # mask stays HOST numpy: device consumers (dss jit
                # traces) convert to constants for free, while reading a
                # device-resident mask back (the fused-kernel preps do)
                # measured ~12 s per array through the remote tunnel
                self.edge_classes.append((
                    int(d_f[sel][0]), int(s_f[sel][0]),
                    int(delta[sel][0]), bool(flips[sel][0]),
                    mask,
                ))
                tail[sel] = False
        self.edge_tail_dst = jnp.asarray(dst[tail])
        self.edge_tail_src = jnp.asarray(src[tail])
        self.edge_tail_flip = jnp.asarray(flips[tail][:, None])
        self.n_edge_tail = int(tail.sum())

        # ---- vertex classes ----------------------------------------------
        # partner table: for each vertex copy, the other copies of its
        # global vertex (vectorized construction via group sorting)
        gid = self._vert_gid_np
        order = np.argsort(gid, kind="stable")
        counts = np.bincount(gid, minlength=self.n_vertices)
        Vmax = int(counts.max()) if counts.size else 1
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        # members matrix (n_vertices, Vmax), sentinel = -1
        members = np.full((self.n_vertices, Vmax), -1, dtype=np.int64)
        pos_in_group = np.arange(gid.size) - starts[gid[order]]
        members[gid[order], pos_in_group] = order
        # partners of each copy: all group members except itself
        my_pos = np.empty(gid.size, dtype=np.int64)
        my_pos[order] = pos_in_group
        partners = np.full((gid.size, max(Vmax - 1, 1)), -1, dtype=np.int64)
        col = np.zeros(gid.size, dtype=np.int64)
        for t in range(Vmax):
            m = members[gid, t]                   # (copies,)
            valid = (m >= 0) & (m != np.arange(gid.size))
            partners[valid, col[valid]] = m[valid]
            col[valid] += 1

        cp = np.repeat(np.arange(gid.size), partners.shape[1])
        pr = partners.ravel()
        valid = pr >= 0
        cp, pr = cp[valid], pr[valid]
        d_e, d_s = cp // 4, cp % 4
        s_e, s_s = pr // 4, pr % 4
        delta = s_e - d_e

        self.vert_classes = []   # (dst_slot, src_slot, delta, mask)
        vtail = np.ones(cp.size, dtype=bool)
        if cp.size:
            keys = (d_s * 4 + s_s) * (4 * E + 1) + (delta + 2 * E)
            uniq, counts2 = np.unique(keys, return_counts=True)
            for key in uniq[counts2 >= min_count]:
                sel = keys == key
                mask = np.zeros(E, dtype=bool)
                mask[d_e[sel]] = True
                self.vert_classes.append((
                    int(d_s[sel][0]), int(s_s[sel][0]),
                    int(delta[sel][0]), mask,
                ))
                vtail[sel] = False
        self.vert_tail_dst = jnp.asarray(cp[vtail])
        self.vert_tail_src = jnp.asarray(pr[vtail])
        self.n_vert_tail = int(vtail.sum())
        if not self.is_square and self.n_edge_tail:
            # the tail path reshapes the edge block as (E*4, ne) —
            # slot-uniform only; anisotropic meshes must be fully
            # class-covered (make_exchange falls back to LocalExchange)
            raise NotImplementedError(
                "anisotropic RollExchange requires zero edge tails "
                f"(got {self.n_edge_tail}); use LocalExchange")

    @property
    def tail_fraction(self) -> float:
        """Fraction of exchange work not covered by roll classes."""
        total = 2 * len(self._pairs_np) + 4 * self.E
        if total == 0:
            return 0.0
        return (self.n_edge_tail + self.n_vert_tail) / total

    def dss(self, vL):
        # 2D fast path: keep (E, n) arrays 2D throughout.  A trailing
        # size-1 component axis forces XLA into 1-lane layouts on every
        # roll/slice (measured ~1.5x slower at p=8, 100k elements).
        if vL.ndim == 2:
            return self._dss_2d(vL)
        return jnp.stack(
            [self._dss_2d(vL[..., c]) for c in range(vL.shape[-1])],
            axis=-1,
        )

    def _dss_2d(self, vL):
        E, n = vL.shape
        ne, neb = self.ne, self.n_edge_block
        eo, el = self.edge_off, self.edge_len

        oe, ov = self.off_edge, self.off_vert
        # ---- edges (per-slot offsets: slot lengths differ when the cell
        # node grid is anisotropic; class pairs connect equal lengths) ----
        if neb > 0:
            F = vL[:, oe:oe + neb]                     # (E, sum edge_len)
            recv = jnp.zeros_like(F)
            for d_f, s_f, delta, flip, mask in self.edge_classes:
                src = jnp.roll(
                    vL[:, oe + eo[s_f]: oe + eo[s_f] + el[s_f]], -delta,
                    axis=0)
                if flip:
                    src = jnp.flip(src, axis=1)
                src = jnp.where(mask[:, None], src, 0.0)
                recv = recv.at[:, eo[d_f]:eo[d_f] + el[d_f]].add(src)
            if self.n_edge_tail:
                Ff = F.reshape(E * 4, ne)
                tr = Ff[self.edge_tail_src]
                tr = jnp.where(self.edge_tail_flip, jnp.flip(tr, axis=1),
                               tr)
                recv = recv.reshape(E * 4, ne).at[
                    self.edge_tail_dst].add(tr).reshape(E, neb)
            edges = F + recv
        else:
            edges = None

        # ---- vertices ----------------------------------------------------
        V = vL[:, ov:ov + 4]                           # (E, 4)
        vsum = V
        for d_s, s_s, delta, mask in self.vert_classes:
            src = jnp.roll(V[:, s_s], -delta, axis=0)  # (E,)
            vsum = vsum.at[:, d_s].add(jnp.where(mask, src, 0.0))
        if self.n_vert_tail:
            Vf = V.reshape(E * 4)
            add = jnp.zeros((E * 4,), vL.dtype).at[
                self.vert_tail_dst].add(Vf[self.vert_tail_src])
            vsum = vsum + add.reshape(E, 4)

        if self.layout == "edges-first" and edges is not None:
            # single lane-concat rebuild: [edges | verts | interior]
            return jnp.concatenate([edges, vsum, vL[:, self.off_int:]],
                                   axis=1)
        if edges is not None:
            vL = vL.at[:, oe:oe + neb].set(edges)
        return vL.at[:, ov:ov + 4].set(vsum)

    def dss_T(self, vT):
        """Native transposed-layout DSS: rolls run along the lane
        (element) axis of (n_loc, E) arrays; see :meth:`LocalExchange.dss_T`.
        """
        if vT.ndim == 2:
            return self._dss_T_2d(vT)
        return jnp.stack(
            [self._dss_T_2d(vT[..., c]) for c in range(vT.shape[-1])],
            axis=-1,
        )

    def _dss_T_2d(self, vT):
        n, E = vT.shape
        ne, neb = self.ne, self.n_edge_block
        eo, el = self.edge_off, self.edge_len
        oe, ov = self.off_edge, self.off_vert

        if neb > 0:
            F = vT[oe:oe + neb]                        # (sum edge_len, E)
            recv = jnp.zeros_like(F)
            for d_f, s_f, delta, flip, mask in self.edge_classes:
                src = jnp.roll(vT[oe + eo[s_f]: oe + eo[s_f] + el[s_f]],
                               -delta, axis=1)
                if flip:
                    src = src[::-1, :]
                src = jnp.where(mask[None, :], src, 0.0)
                recv = recv.at[eo[d_f]:eo[d_f] + el[d_f]].add(src)
            if self.n_edge_tail:
                # residual pairs: lane gathers are slow — go through the
                # (E*4, ne) row form for the tail only (small by class
                # construction)
                Ff = F.reshape(4, ne, E).transpose(2, 0, 1).reshape(
                    E * 4, ne)
                tr = Ff[self.edge_tail_src]
                tr = jnp.where(self.edge_tail_flip, jnp.flip(tr, axis=1),
                               tr)
                add = jnp.zeros_like(Ff).at[self.edge_tail_dst].add(tr)
                recv = recv + add.reshape(E, 4, ne).transpose(
                    1, 2, 0).reshape(neb, E)
            edges = F + recv
        else:
            edges = None

        V = vT[ov:ov + 4]                              # (4, E)
        vsum = V
        for d_s, s_s, delta, mask in self.vert_classes:
            src = jnp.roll(V[s_s], -delta)
            vsum = vsum.at[d_s].add(jnp.where(mask, src, 0.0))
        if self.n_vert_tail:
            Vf = V.T.reshape(E * 4)
            add = jnp.zeros((E * 4,), vT.dtype).at[
                self.vert_tail_dst].add(Vf[self.vert_tail_src])
            vsum = vsum + add.reshape(E, 4).T

        if self.layout == "edges-first" and edges is not None:
            return jnp.concatenate([edges, vsum, vT[self.off_int:]],
                                   axis=0)
        if edges is not None:
            vT = vT.at[oe:oe + neb].set(edges)
        return vT.at[ov:ov + 4].set(vsum)


class PairScatterExchange:
    """Dimension-generic L-vector DSS in **lexicographic** local order.

    The 2D production exchanges (:class:`LocalExchange` /
    :class:`RollExchange`) are quad-specific: edge-slot pairing plus a
    vertex scatter over slot-blocked hierarchical storage.  This class
    covers any conforming single-geometry NCube mesh — in particular 3D
    hexahedra, where shared DOFs come in three kinds: face interiors
    (always 2 copies), edge interiors and vertices (variable valence).
    The split is by *multiplicity*, not topology:

    * copies with multiplicity 2 exchange through one flat partner
      gather (3D face interiors dominate the shared-DOF count, so the
      bulk of the exchange is a single gather + add);
    * copies with multiplicity >= 3 scatter-add into a compacted array
      (one slot per distinct shared node) and gather back;
    * multiplicity-1 copies (element interiors, domain boundary) are
      untouched.

    Orientation bookkeeping — the 8 ways a hex face can glue to its
    neighbor — falls out of the global node ids for free: partners are
    matched per *node*, not per face.

    Net-new TPU design (the reference is 2D-only and serial;
    ``sem/geometry.py:25-29`` marks 3D as future work).  Reference
    behavior matched: scipy COO duplicate summation
    (``sem/discrete.py:478-500``) generalized to hexahedra.
    """

    def __init__(self, disc, pad_to: int | None = None):
        self.disc = disc
        E = disc.E
        Ep = E if pad_to is None else int(pad_to)
        if Ep < E:
            raise ValueError(f"pad_to={Ep} < E={E}")
        self.E, self.E_real = Ep, E
        self.n_loc = n = disc.n_loc
        self.shape = tuple(disc.shape)

        gather = np.zeros((Ep, n), dtype=np.int64)
        gather[:E] = disc.gather_nodes
        #: (Ep, n_loc) global node ids, lexicographic local order
        #: (pad rows alias node 0; their values never enter reductions)
        self.gather_lex = gather

        gids = gather.reshape(-1).copy()
        if Ep > E:
            # fresh singleton ids for pad copies: they must never join a
            # real node's reduction or multiplicity
            gids[E * n:] = disc.n_nodes + np.arange((Ep - E) * n)
        mult = np.bincount(gids)
        m_copy = mult[gids]

        two = np.nonzero(m_copy == 2)[0]
        order = np.argsort(gids[two], kind="stable")
        st = two[order].reshape(-1, 2)
        self._pair_idx = jnp.asarray(np.concatenate([st[:, 0], st[:, 1]]))
        self._pair_partner = jnp.asarray(
            np.concatenate([st[:, 1], st[:, 0]]))

        hi = np.nonzero(m_copy >= 3)[0]
        uniq, seg = np.unique(gids[hi], return_inverse=True)
        self._multi_idx = jnp.asarray(hi)
        self._multi_seg = jnp.asarray(seg.astype(np.int32))
        self._n_multi = int(uniq.size)

        w = (1.0 / m_copy).reshape(Ep, n)
        w[E:] = 0.0
        self._weights_np = w

    # -- conversions -------------------------------------------------------

    def local_from_global(self, u_global) -> np.ndarray:
        """(n_nodes[, k]) -> (E, n_loc[, k]) consistent L-vector."""
        return np.asarray(u_global)[self.gather_lex]

    def global_from_local(self, uL) -> np.ndarray:
        """Consistent (E, n_loc[, k]) L-vector -> global (n_nodes[, k])."""
        uL = np.asarray(uL)[:self.E_real]
        out_shape = (self.disc.n_nodes,) + uL.shape[2:]
        out = np.zeros(out_shape, dtype=uL.dtype)
        out[self.gather_lex[:self.E_real].reshape(-1)] = uL.reshape(
            (-1,) + uL.shape[2:])
        return out

    # -- the exchange ------------------------------------------------------

    def dss(self, vL):
        """Direct stiffness summation on an (E, n_loc[, k]) L-vector."""
        import jax

        v = jnp.asarray(vL)
        flat = v.reshape((self.E * self.n_loc,) + v.shape[2:])
        pair_sum = flat[self._pair_idx] + flat[self._pair_partner]
        seg = jax.ops.segment_sum(
            flat[self._multi_idx], self._multi_seg,
            num_segments=self._n_multi)
        out = flat.at[self._pair_idx].set(pair_sum)
        out = out.at[self._multi_idx].set(seg[self._multi_seg])
        return out.reshape(v.shape)

    def dot(self, uL, vL):
        """Global inner product from consistent L-vectors."""
        prod = uL * vL
        w = self._weights_as(prod.dtype)
        if prod.ndim == 3:
            w = w[..., None]
        return jnp.sum(prod * w)

    @property
    def weights(self):
        """(E, n_loc) inverse-multiplicity dot weights (float64 view)."""
        return self._weights_as(np.float64)

    _weights_as = LocalExchange._weights_as

    def norm(self, uL):
        return jnp.sqrt(self.dot(uL, uL))


class BoxRollExchange3D(PairScatterExchange):
    """Tensor-product plane-roll DSS for structured box hex meshes.

    On a structured grid DSS factorizes axis-by-axis: exchanging the two
    FULL (m x m) face planes of axis a with the a-neighbors (one
    element-axis roll each way), then repeating for the other two axes,
    accumulates every shared-DOF sum — edge DOFs through two stages,
    vertex DOFs through three.  Six plane rolls (~6/m of one HBM pass)
    replace the node-level pair/segment gathers of
    :class:`PairScatterExchange`, which dominate 3D DSS cost on TPU the
    same way 2D gathers did before :class:`RollExchange`.

    Requires (validated in ``__init__`` from the mesh, raising
    ``NotImplementedError`` so :func:`make_exchange` falls back):

    * every face pair connects face ``2a+1`` (axis-a high) of element
      ``e`` to face ``2a`` of element ``e + delta_a`` with ONE uniform
      positive ``delta_a`` per axis (lexicographic box element order);
    * identity node orientation across every pair (axis-aligned
      generators produce this; rotated gluings do not).
    """

    def __init__(self, disc, pad_to: int | None = None):
        super().__init__(disc, pad_to=pad_to)
        mesh = disc.mesh
        if mesh.ndim != 3 or len(self.shape) != 3:
            raise NotImplementedError("BoxRollExchange3D is 3D-only")
        E = self.E_real
        pairs = np.asarray(mesh.face_pairs())
        g = self.gather_lex[:E].reshape((E,) + self.shape)

        self.deltas: list[int] = []
        mask_lo = np.zeros((3, self.E), bool)   # has a -a neighbor
        mask_hi = np.zeros((3, self.E), bool)   # has a +a neighbor
        covered = 0
        for a in range(3):
            lo_f, hi_f = 2 * a, 2 * a + 1
            sel = ((np.minimum(pairs[:, 1], pairs[:, 3]) == lo_f)
                   & (np.maximum(pairs[:, 1], pairs[:, 3]) == hi_f))
            sub = pairs[sel]
            covered += int(sel.sum())
            if sub.size == 0:
                raise NotImplementedError(f"axis {a} has no face pairs")
            hi_first = sub[:, 1] == hi_f
            e_hi = np.where(hi_first, sub[:, 0], sub[:, 2])
            e_lo = np.where(hi_first, sub[:, 2], sub[:, 0])
            deltas = e_lo - e_hi
            d = int(deltas[0])
            if d <= 0 or not np.all(deltas == d):
                raise NotImplementedError(
                    f"axis {a} face-pair offsets are not one uniform "
                    f"positive delta (use a lexicographic box order)")
            plane_hi = np.take(g[e_hi], -1, axis=1 + a)
            plane_lo = np.take(g[e_lo], 0, axis=1 + a)
            if not np.array_equal(plane_hi, plane_lo):
                raise NotImplementedError(
                    f"axis {a} face gluing is not identity-oriented")
            self.deltas.append(d)
            mask_hi[a, e_hi] = True
            mask_lo[a, e_lo] = True
        if covered != len(pairs):
            raise NotImplementedError(
                "mesh has face pairs outside the axis-aligned box "
                "pattern")
        self._mask_lo = jnp.asarray(mask_lo)
        self._mask_hi = jnp.asarray(mask_hi)

    def dss(self, vL):
        """Plane-roll DSS on an (E, n_loc[, k]) L-vector."""
        v = jnp.asarray(vL)
        u = v.reshape((self.E,) + self.shape + v.shape[2:])
        extra = v.ndim - 2                      # trailing component axes
        for a in range(3):
            d = self.deltas[a]
            ml = self._mask_lo[a].reshape((-1,) + (1,) * (2 + extra))
            mh = self._mask_hi[a].reshape((-1,) + (1,) * (2 + extra))
            idx = (slice(None),) + (slice(None),) * a
            lo = u[idx + (0,)]
            hi = u[idx + (self.shape[a] - 1,)]
            recv_lo = jnp.where(ml, jnp.roll(hi, d, axis=0), 0.0)
            recv_hi = jnp.where(mh, jnp.roll(lo, -d, axis=0), 0.0)
            u = u.at[idx + (0,)].add(recv_lo)
            u = u.at[idx + (self.shape[a] - 1,)].add(recv_hi)
        return u.reshape(v.shape)

    def dss_T(self, vT):
        """Plane-roll DSS on an (n_loc, E) TRANSPOSED L-vector.

        Same six plane exchanges as :meth:`dss` but with elements in the
        trailing (lane) axis: every slice and roll then runs on fully
        occupied 128-lane rows instead of the (E, p1, p1, p1) layout's
        p1-wide trailing dim (p1/128 lane occupancy) — the 3D analogue
        of the 2D ``RollExchange.dss_T`` transposed fast path.
        """
        v = jnp.asarray(vT)
        u = v.reshape(self.shape + (self.E,))
        for a in range(3):
            d = self.deltas[a]
            ml, mh = self._mask_lo[a], self._mask_hi[a]       # (E,)
            idx = (slice(None),) * a
            lo = u[idx + (0,)]
            hi = u[idx + (self.shape[a] - 1,)]
            recv_lo = jnp.where(ml, jnp.roll(hi, d, axis=-1), 0.0)
            recv_hi = jnp.where(mh, jnp.roll(lo, -d, axis=-1), 0.0)
            u = u.at[idx + (0,)].add(recv_lo)
            u = u.at[idx + (self.shape[a] - 1,)].add(recv_hi)
        return u.reshape(v.shape)


def _make_exchange_impl(disc, threshold: float = 0.25,
                  pad_to: int | None = None,
                  layout: str = "edges-first",
                  fused_pad: bool = False,
                  fused_pad_min_e: int = 20000,
                  min_class_fraction: float | None = None):
    """Best exchange structure for ``disc``: roll classes when they cover
    enough of the mesh, generic gather otherwise.  ``pad_to`` pads the
    element axis with inert elements (for shard-divisible counts).

    ``fused_pad=True`` re-pads a tail-free roll exchange so the fused
    transposed Pallas apply+DSS kernel
    (:func:`..ops.pallas_kernels.make_fused_affine_laplacian_T`) has an
    admissible lane tiling; only applied at ``E >= fused_pad_min_e``
    (the kernel targets ~4k-lane tiles — padding tiny meshes to that
    size would dwarf them, and the XLA path is fine there).
    """
    if len(disc.shape) != 2:
        # 3D (and any non-quad NCube): plane-roll DSS on structured box
        # meshes, multiplicity-split pair/scatter exchange otherwise
        try:
            return BoxRollExchange3D(disc, pad_to=pad_to)
        except NotImplementedError:
            return PairScatterExchange(disc, pad_to=pad_to)
    try:
        ex = RollExchange(disc, pad_to=pad_to, layout=layout,
                          min_class_fraction=min_class_fraction)
    except NotImplementedError:
        # anisotropic node grid with edge tails: the roll fast path
        # needs full class coverage there — generic exchange instead
        return LocalExchange(disc, pad_to=pad_to, layout=layout)
    used_mcf = min_class_fraction
    if (min_class_fraction is None
            and (ex.n_edge_tail or ex.n_vert_tail)):
        # tails may be small *uniform* classes below the default size
        # threshold (panel-ordered meshes: one cross-panel-boundary class
        # per direction).  Zero tails unlocks the fused kernels, which
        # route large-offset classes through the compact far epilogue —
        # worth a bounded number of extra roll classes.
        ex2 = RollExchange(disc, pad_to=pad_to, layout=layout,
                          min_class_fraction=0.0)
        if (not (ex2.n_edge_tail or ex2.n_vert_tail)
                and len(ex2.edge_classes) + len(ex2.vert_classes) <= 64):
            ex = ex2
            used_mcf = 0.0
    if ex.tail_fraction > threshold:
        return LocalExchange(disc, pad_to=pad_to, layout=layout)
    if (fused_pad and pad_to is None and ex.E >= fused_pad_min_e
            and not (ex.n_edge_tail or ex.n_vert_tail)):
        from .pallas_kernels import (fused_affine_pad,
                                     fused_affine_tile_shape)

        deltas = ([abs(c[2]) for c in ex.edge_classes]
                  + [abs(c[2]) for c in ex.vert_classes])
        H = max(deltas) if deltas else 1
        Hb_full = -(-H // 128) * 128
        new_pad = None
        if (3 * Hb_full <= 6912
                and fused_affine_tile_shape(ex.E, H) is None):
            # FULL-halo tiling inadmissible.  The plain affine kernel
            # could fall back to the far-class split, but the general/
            # batched/fused-CG kernels cannot (no far split), and the
            # full-halo window is the measured-fastest plain apply —
            # pad to a multiple of 12*Hb: divisible by tile sizes near
            # every window target (affine 4608-lane and the smaller
            # n_rhs-dependent general windows), costing <= ~1.3% extra
            # elements.  Rebuild with the SAME effective
            # min_class_fraction that produced this exchange
            # (panel-ordered meshes need the 0.0 retry's zero tails).
            step = 12 * Hb_full
            new_pad = -(-ex.E // step) * step
        elif (fused_affine_tile_shape(ex.E, H) is None
              and fused_affine_tile_shape(ex.E, min(H, 128)) is None):
            # halo too wide for any full window (H > 2176): near-halo
            # admissibility (far split) is the only fused option
            new_pad = fused_affine_pad(ex.E, min(H, 128))
        if new_pad is not None:
            ex3 = RollExchange(disc, pad_to=new_pad, layout=layout,
                               min_class_fraction=used_mcf)
            if not (ex3.n_edge_tail or ex3.n_vert_tail):
                ex = ex3
    return ex


def make_exchange(disc, **kw):
    """Stage-accounted wrapper of the exchange factory (see
    :func:`_make_exchange_impl` for the selection rules; host exchange
    construction is a top setup-time sink tracked by utils.stages)."""
    from ..utils.stages import stage

    with stage("exchange/build"):
        return _make_exchange_impl(disc, **kw)
