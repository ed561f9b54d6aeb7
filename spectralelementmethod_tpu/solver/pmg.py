"""Two-level p-multigrid preconditioner for the L-vector CG path.

The reference solves its systems with a sparse direct factorization of
the statically-condensed matrix (``sem/discrete.py:502-528``) — viable
at its ~135-element scale, hopeless at 10^5-10^6 elements.  The
TPU-native replacement is matrix-free PCG, whose point-Jacobi iteration
count grows like ``p * nx`` (thousands at bench scale).  This module
cuts that multiplicatively with the classic spectral-element two-level
scheme (Lottes & Fischer 2005 lineage): smooth the high-order modes
element-locally, correct the rest on a low-order (p_c in {1, 2}) space
sharing the same mesh.

Everything maps to TPU strengths:

* **transfers** are one ``(n_c, n_f) @ (n_f, E)`` MXU matmul each —
  the coarse basis evaluated at the fine GLL lattice, tensorized and
  permuted to the L-vector node order at setup;
* **smoothing** is fixed-degree Chebyshev acceleration of any SPD
  element-local preconditioner (point Jacobi or the FDM additive
  Schwarz of :mod:`.fdm`) — pure polynomial in ``B A``, so the V-cycle
  stays linear and symmetric and plain CG applies (no flexible variant
  needed);
* the **coarse level** is built from the same affine factors ``a`` of
  :func:`..ops.sumfac.affine_factorization` with order-``p_c``
  reference matrices — no new geometry work; on uniform tensor-product
  meshes (``rectangle_mesh``) it is solved **exactly** by global fast
  diagonalization: one host eigendecomposition per axis at setup, two
  dense ``(N, N)`` grid matmuls per application.  The exact coarse
  solve makes iteration counts h-independent (~O(10)) where Jacobi
  needs thousands.  Non-tensor affine meshes fall back to a fixed-degree
  Chebyshev coarse sweep (documented h-dependence).

Construction is host-side; the returned closure is pure jnp on
``(n_f, E)`` transposed L-vectors and composes with
:func:`..models.poisson.Poisson.solve_local(precond="pmg")`.
"""

from __future__ import annotations

from contextlib import nullcontext

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.stages import stage as _host_stage


def _mm(mm_precision):
    """Matmul-precision context for the V-cycle's own matmuls.

    The coarse FDM eigen-transforms and the restrict/prolong matmuls
    run through plain ``@``/einsum, which on TPU default to single-pass
    bf16 MXU inputs (~3 decimal digits).  The operator applies inside
    the cycle were always built at 'highest', so these were the only
    low-precision links in the preconditioner chain — enough to make
    the 100k/1M f32 converged solve marginal (round-5 root-cause,
    BASELINE.md round-5a).  These matmuls are tiny next to the smoother
    applies (coarse grids, (n_f, n_c) transfer operators), so full f32
    precision costs nothing measurable.  ``None`` = legacy backend
    default (kept for A/B probes).
    """
    return (nullcontext() if mm_precision is None
            else jax.default_matmul_precision(mm_precision))


def _staged_factory(fn):
    """Account a preconditioner factory's host+compile wall-clock
    (utils.stages "precond/pmg-build") — a tracked setup-time sink."""
    import functools

    @functools.wraps(fn)
    def inner(*a, **kw):
        with _host_stage("precond/pmg-build"):
            return fn(*a, **kw)
    return inner


# ---------------------------------------------------------------------------
# Chebyshev acceleration of an SPD preconditioner


def chebyshev_smoother(A, B, lmax: float, lmin: float, degree: int):
    """Fixed-degree Chebyshev iteration for ``A z = r`` (zero start).

    ``A``/``B`` are the operator and an SPD preconditioner application
    (Jacobi inverse-diagonal, FDM Schwarz, ...); the iteration targets
    the interval ``[lmin, lmax]`` of ``B A``'s spectrum.  The result is
    a fixed polynomial ``z = p(B A) B r``, hence linear and symmetric
    whenever A and B are — safe inside a CG preconditioner (unlike
    stationary relaxation with an adaptive step).  ``degree`` applies of
    A and B each.
    """
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    def S(r):
        d = (1.0 / theta) * B(r)
        z = d
        rho = 1.0 / sigma
        res = r
        for _ in range(degree - 1):
            res = res - A(d)
            rho_new = 1.0 / (2.0 * sigma - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / delta) * B(res)
            z = z + d
            rho = rho_new
        return z

    return S


def estimate_lmax(A, B, shape, dtype=np.float32, iters: int = 30,
                  safety: float = 1.05) -> float:
    """Power-iteration estimate of ``lmax(B A)`` (masked subspace).

    Deterministic start vector; one jitted ``fori_loop`` of ``iters``
    applications at setup time.  ``B A`` is similar to the symmetric
    ``B^1/2 A B^1/2``, so the norm-growth factor converges to the true
    spectral radius; ``safety`` pads the estimate (Chebyshev bounds must
    cover the top eigenvalue).
    """
    from ..utils.hoist import hoist_closure

    rng = np.random.RandomState(0)
    v0 = jnp.asarray(rng.standard_normal(shape).astype(dtype))

    # hoist the operator closures' captured arrays into runtime jit
    # arguments: baked as inline HLO literals they blow the compile
    # payload past remote-compile transport limits at 1M elements
    BA_pure, BA_c = hoist_closure(lambda v: B(A(v)), v0)
    BA_c = tuple(BA_c)

    @jax.jit
    def run(v, consts):
        def body(i, carry):
            v, _ = carry
            w = BA_pure(v, *consts).astype(v.dtype)
            nrm = jnp.sqrt(jnp.sum(w * w)).astype(v.dtype)
            return w / nrm, nrm

        return jax.lax.fori_loop(0, iters, body,
                                 (v, jnp.asarray(1.0, v.dtype)))

    _, lam = run(v0, BA_c)
    return float(lam) * safety


# ---------------------------------------------------------------------------
# Exact coarse solve on uniform tensor-product grids


class GridFDM:
    """Global fast-diagonalization solve of the coarse operator.

    On a uniform tensor-product mesh the assembled affine coarse
    operator separates exactly: ``A_c = a0 K_x (x) M_y + a2 M_x (x)
    K_y`` with 1D assembled GLL stiffness/lumped-mass matrices along
    each element row/column (the cross-element sum of Kronecker
    products factorizes axis by axis).  One generalized symmetric
    eigendecomposition per axis (host, at setup) then inverts the free
    sub-block with two dense grid matmuls:

        u = S_x [ (S_x^T G S_y) / (a0 lam_x_i + a2 lam_y_j) ] S_y^T

    Use :meth:`try_build`; it returns ``None`` unless every
    precondition verifiably holds (uniform affine factors, no mixed
    term, tensor element numbering, per-side-uniform Dirichlet data) —
    callers then fall back to the Chebyshev coarse sweep.
    """

    def __init__(self, P0, P1, nx, ny, Sx, Sy, lamx, lamy, a0, a2,
                 fx0, fx1, fy0, fy1, Er, Ec):
        self.p0, self.p1 = P0, P1
        self.nx, self.ny = nx, ny
        self.Sx, self.Sy = Sx, Sy
        self.lam = a0 * np.asarray(lamx)[:, None] + \
            a2 * np.asarray(lamy)[None, :]
        self.fx0, self.fx1, self.fy0, self.fy1 = fx0, fx1, fy0, fy1
        self.Er, self.Ec = Er, Ec
        self._inv_lam = jnp.asarray((1.0 / self.lam).astype(np.float32))
        self.Sx = jnp.asarray(np.asarray(Sx, np.float32))
        self.Sy = jnp.asarray(np.asarray(Sy, np.float32))

    # -- L-vector <-> grid ---------------------------------------------------

    def _to_grid(self, rc, xp=jnp):
        """Consistent hier L-vector (n_c, Ec) -> grid (N0, N1).

        ``xp=np`` runs the same index gymnastics in pure numpy —
        ``try_build`` uses it so the free-mask analysis never round-trips
        the device (a single d2h read through the remote tunnel measured
        12-100 s, which dominated the pmg build)."""
        p0, p1, nx, ny = self.p0, self.p1, self.nx, self.ny
        lex = rc[self._lex_rows][:, :self.Er].reshape(
            p0 + 1, p1 + 1, nx, ny)
        core = xp.transpose(lex[:p0, :p1], (2, 0, 3, 1)).reshape(
            nx * p0, ny * p1)
        east = xp.transpose(lex[p0, :p1, -1, :], (1, 0)).reshape(
            1, ny * p1)
        north = xp.transpose(lex[:p0, p1, :, -1], (1, 0)).reshape(
            nx * p0, 1)
        ne = lex[p0, p1, -1, -1].reshape(1, 1)
        return xp.concatenate([
            xp.concatenate([core, north], axis=1),
            xp.concatenate([east, ne], axis=1),
        ], axis=0)

    def _from_grid(self, G):
        """Grid (N0, N1) -> consistent hier L-vector (n_c, Ec)."""
        p0, p1, nx, ny = self.p0, self.p1, self.nx, self.ny
        rows = []
        for a in range(p0 + 1):
            cols = []
            for b in range(p1 + 1):
                cols.append(G[a:a + (nx - 1) * p0 + 1:p0,
                              b:b + (ny - 1) * p1 + 1:p1])
            rows.append(jnp.stack(cols, axis=0))
        lex = jnp.stack(rows, axis=0)               # (p0+1, p1+1, nx, ny)
        flat = lex.reshape((p0 + 1) * (p1 + 1), self.Er)
        if self.Ec > self.Er:
            flat = jnp.pad(flat, ((0, 0), (0, self.Ec - self.Er)))
        return flat[self._hier_rows]

    #: matmul precision of the eigen-transforms (see :func:`_mm`)
    _mmp = "float32"

    def __call__(self, rc):
        with _mm(self._mmp):
            G = self._to_grid(rc)
            Gf = G[self.fx0:self.fx1, self.fy0:self.fy1]
            t = self.Sx.T @ Gf @ self.Sy
            t = t * self._inv_lam
            Uf = self.Sx @ t @ self.Sy.T
            U = jnp.zeros_like(G)
            U = U.at[self.fx0:self.fx1, self.fy0:self.fy1].set(Uf)
            return self._from_grid(U)

    # -- construction ----------------------------------------------------------

    @staticmethod
    def _assemble_1d(khat, what, n_el):
        """Global 1D assembled stiffness (dense) and lumped mass (diag)."""
        p = khat.shape[0] - 1
        N = n_el * p + 1
        K = np.zeros((N, N))
        m = np.zeros(N)
        for e in range(n_el):
            s = slice(e * p, e * p + p + 1)
            K[s, s] += khat
            m[e * p:e * p + p + 1] += what
        return K, m

    @staticmethod
    def _side_interval(fgrid):
        """Free index interval of an outer-product grid mask, or None."""
        fx = fgrid.any(axis=1)
        fy = fgrid.any(axis=0)
        if not np.array_equal(fgrid, fx[:, None] & fy[None, :]):
            return None
        ivs = []
        for f in (fx, fy):
            idx = np.nonzero(f)[0]
            if idx.size == 0 or not np.array_equal(
                    idx, np.arange(idx[0], idx[-1] + 1)):
                return None
            ivs.append((int(idx[0]), int(idx[-1] + 1)))
        return ivs

    @classmethod
    def try_build(cls, ex_c, basis_c, a, free_c_np, hier):
        """GridFDM for (ex_c, coarse basis, affine factors) or None."""
        Er = ex_c.E_real
        a = np.asarray(a)[:Er]
        scale = np.abs(a).max() + 1e-300
        if (np.abs(a - a[0]).max() > 1e-10 * scale
                or np.abs(a[0, 1]) > 1e-10 * scale):
            return None                      # non-uniform or sheared cells
        a0, a2 = float(a[0, 0]), float(a[0, 2])
        nm = np.asarray(ex_c.gather_hier[:Er])
        # back to lexicographic local order
        inv_hier = np.argsort(hier)
        nm = nm[:, inv_hier].reshape(Er, *basis_c.coeff_shape)
        p0, p1 = nm.shape[1] - 1, nm.shape[2] - 1
        # infer the tensor element numbering e = i * ny + j
        adj1 = (nm[:-1, 0, -1] == nm[1:, 0, 0])
        ny = int(np.argmin(adj1)) + 1 if not adj1.all() else Er
        if Er % ny:
            return None
        nx = Er // ny
        expect = np.ones(Er - 1, bool)
        expect[ny - 1::ny] = False
        if not np.array_equal(adj1, expect):
            return None
        if not np.array_equal(nm.reshape(nx, ny, p0 + 1, p1 + 1)
                              [:-1, :, -1, :],
                              nm.reshape(nx, ny, p0 + 1, p1 + 1)
                              [1:, :, 0, :]):
            return None
        # grid Dirichlet data must be per-side uniform (outer product)
        obj = cls.__new__(cls)
        obj.p0, obj.p1, obj.nx, obj.ny = p0, p1, nx, ny
        obj.Er, obj.Ec = Er, ex_c.E
        lex_rows = inv_hier
        obj._lex_rows = np.asarray(lex_rows)
        obj._hier_rows = np.asarray(hier)
        fgrid = np.asarray(obj._to_grid(
            np.ascontiguousarray(free_c_np.T.astype(np.float32)),
            xp=np))
        fgrid = fgrid > 0.5
        ivs = cls._side_interval(fgrid)
        if ivs is None:
            return None
        (fx0, fx1), (fy0, fy1) = ivs
        # 1D eigenpairs on the free sub-blocks
        out = []
        for d, n_el, (i0, i1) in ((0, nx, (fx0, fx1)), (1, ny, (fy0, fy1))):
            sub = basis_c.get_subbasis(d)
            w1 = np.asarray(basis_c.quad_rule.weights[d], np.float64)
            D1 = np.asarray(sub.D1, np.float64)
            khat = D1.T @ np.diag(w1) @ D1
            K, m = cls._assemble_1d(0.5 * (khat + khat.T), w1, n_el)
            K, m = K[i0:i1, i0:i1], m[i0:i1]
            ms = 1.0 / np.sqrt(m)
            lam, Q = np.linalg.eigh(ms[:, None] * K * ms[None, :])
            out.append((np.maximum(lam, 1e-300), ms[:, None] * Q))
        (lamx, Sx), (lamy, Sy) = out
        obj.__init__(p0, p1, nx, ny, Sx, Sy, lamx, lamy, a0, a2,
                     fx0, fx1, fy0, fy1, Er, ex_c.E)
        obj._lex_rows = np.asarray(lex_rows)
        obj._hier_rows = np.asarray(hier)
        return obj


class GridFDM2DLattice:
    """Order-independent exact tensor-grid coarse solve (2D).

    :class:`GridFDM` infers the tensor element numbering ``e = i*ny + j``
    from adjacency — which any host partitioner (panel, Morton, RCM)
    destroys even though the underlying mesh is still a perfect tensor
    grid.  This variant maps through the **global node lattice** the way
    :class:`GridFDM3D` does: coordinates of the coarse nodes are sorted
    into per-axis value lists; if they fill a full lattice, each L-vector
    slot gets a grid position (``grid_of_slot``) and the solve is a
    scatter-set / two dense eigen-transform matmuls / gather — no element
    ordering assumed.  Operates on transposed ``(n_c, Ec)`` L-vectors
    (the 2D pmg layout).  This is what lets the config-5 pipeline
    (imported mesh, panel-partitioned, sharded) keep h-independent
    iteration counts.
    """

    def __init__(self, grid_of_slot, dims, free_iv, Sx, Sy, lam, Er, E):
        self.dims = dims
        (self.fx0, self.fx1), (self.fy0, self.fy1) = free_iv
        self.Er, self.E = Er, E
        self._gos = jnp.asarray(grid_of_slot)            # (Er, n_c) int
        # float64 masters; cast per call to the vector dtype
        self.Sx = jnp.asarray(np.asarray(Sx, np.float64))
        self.Sy = jnp.asarray(np.asarray(Sy, np.float64))
        self._inv_lam = jnp.asarray(1.0 / np.asarray(lam, np.float64))

    #: matmul precision of the eigen-transforms (see :func:`_mm`)
    _mmp = "float32"

    def __call__(self, rc):
        with _mm(self._mmp):
            N0, N1 = self.dims
            flat = jnp.zeros(N0 * N1, rc.dtype).at[
                self._gos.reshape(-1)].set(
                rc[:, :self.Er].T.reshape(-1))
            G = flat.reshape(N0, N1)
            Gf = G[self.fx0:self.fx1, self.fy0:self.fy1]
            Sx = self.Sx.astype(rc.dtype)
            Sy = self.Sy.astype(rc.dtype)
            t = (Sx.T @ Gf @ Sy) * self._inv_lam.astype(rc.dtype)
            Uf = Sx @ t @ Sy.T
            U = jnp.zeros_like(G).at[
                self.fx0:self.fx1, self.fy0:self.fy1].set(Uf)
            out = U.reshape(-1)[self._gos].T             # (n_c, Er)
            if self.E > self.Er:
                out = jnp.pad(out, ((0, 0), (0, self.E - self.Er)))
            return out

    @classmethod
    def try_build(cls, ex_c, disc_c, basis_c, a, free_c_np):
        """Lattice coarse solve for (ex_c, coarse basis), or None.

        ``a``: (>=Er, 3) affine factors of the FINE level (coarse reuse);
        ``free_c_np``: (Ec, n_c) free mask in the coarse local order.
        """
        Er = ex_c.E_real
        a = np.asarray(a)[:Er]
        scale = np.abs(a).max() + 1e-300
        if (np.abs(a - a[0]).max() > 1e-10 * scale
                or np.abs(a[0, 1]) > 1e-10 * scale):
            return None                      # non-uniform or sheared
        a0, a2 = float(a[0, 0]), float(a[0, 2])
        p0 = basis_c.coeff_shape[0] - 1
        p1 = basis_c.coeff_shape[1] - 1

        gix = np.asarray(ex_c.gather_hier[:Er])          # (Er, n_c)
        used = np.unique(gix.reshape(-1))
        xy = np.asarray(disc_c.mesh.nodes)[:, used]      # (2, Nu)
        axes_vals, axis_idx = [], []
        span = np.abs(xy).max() + 1.0
        for d in range(2):
            v = np.round(xy[d] / span * 1e12)
            vals = np.unique(v)
            axes_vals.append(vals)
            axis_idx.append(np.searchsorted(vals, v))
        dims = tuple(len(v) for v in axes_vals)
        if int(np.prod(dims)) != used.size:
            return None                      # not a full lattice
        grid_flat_of_used = axis_idx[0] * dims[1] + axis_idx[1]
        if np.unique(grid_flat_of_used).size != used.size:
            return None
        lut = np.full(used.max() + 1, -1, dtype=np.int64)
        lut[used] = grid_flat_of_used
        grid_of_slot = lut[gix]
        if (grid_of_slot < 0).any():
            return None
        n_el = []
        for Nd, pc in zip(dims, (p0, p1)):
            if (Nd - 1) % pc:
                return None
            n_el.append((Nd - 1) // pc)

        # free mask must be an outer product of contiguous intervals
        fflat = np.zeros(int(np.prod(dims)), bool)
        fflat[grid_of_slot.reshape(-1)] = free_c_np[:Er].reshape(-1)
        fgrid = fflat.reshape(dims)
        ivs = GridFDM._side_interval(fgrid)
        if ivs is None:
            return None

        out = []
        for d, (i0, i1) in zip(range(2), ivs):
            sub = basis_c.get_subbasis(d)
            w1 = np.asarray(basis_c.quad_rule.weights[d], np.float64)
            D1 = np.asarray(sub.D1, np.float64)
            khat = D1.T @ np.diag(w1) @ D1
            K, m = GridFDM._assemble_1d(0.5 * (khat + khat.T), w1,
                                        n_el[d])
            K, m = K[i0:i1, i0:i1], m[i0:i1]
            ms = 1.0 / np.sqrt(m)
            lam, Q = np.linalg.eigh(ms[:, None] * K * ms[None, :])
            out.append((np.maximum(lam, 1e-300), ms[:, None] * Q))
        (lamx, Sx), (lamy, Sy) = out
        lam = a0 * lamx[:, None] + a2 * lamy[None, :]
        return cls(grid_of_slot, dims, ivs, Sx, Sy, lam, Er, ex_c.E)


class GridFDM3D:
    """Exact tensor-grid coarse solve for 3D box meshes.

    3D twin of :class:`GridFDM`, but mapped through the **global node
    lattice** instead of slice reconstruction: the 3D L-vector path
    stores lexicographic ``(E, n)`` vectors whose gather ids, on a
    uniform box mesh, form a coordinate lattice — one host pass derives
    ``grid_of_slot`` (slot -> lattice position), and the device mapping
    is a scatter-set/gather pair of size E*n_c (consistent L-vectors
    make duplicate writes equal-valued).  The separable solve is three
    per-axis eigen transforms each way over the free sub-box:

        u = (Sx x Sy x Sz) [ t / (a0 lx_i + a1 ly_j + a2 lz_k) ]

    Use :meth:`try_build` (None unless every precondition verifiably
    holds: uniform affine diagonal factors, zero cross factors, a full
    coordinate lattice, outer-product contiguous free intervals).
    """

    def __init__(self, grid_of_slot, dims, free_iv, S_axes, lam3, Er, E):
        self.dims = dims
        (self.fx0, self.fx1), (self.fy0, self.fy1), (self.fz0, self.fz1) \
            = free_iv
        self.Er, self.E = Er, E
        self._gos = jnp.asarray(grid_of_slot)            # (Er, n_c) int
        # float64 masters; cast per-call to the vector dtype (the 3D
        # path runs f64 on CPU/reference checks, f32 on TPU)
        self.S = [jnp.asarray(np.asarray(s, np.float64)) for s in S_axes]
        self._inv_lam = jnp.asarray(1.0 / np.asarray(lam3, np.float64))

    #: matmul precision of the eigen-transforms (see :func:`_mm`)
    _mmp = "float32"

    def __call__(self, rc):
        with _mm(self._mmp):
            N0, N1, N2 = self.dims
            flat = jnp.zeros(N0 * N1 * N2, rc.dtype).at[
                self._gos.reshape(-1)].set(rc[:self.Er].reshape(-1))
            G = flat.reshape(N0, N1, N2)
            Gf = G[self.fx0:self.fx1, self.fy0:self.fy1,
                   self.fz0:self.fz1]
            Sx, Sy, Sz = (s.astype(rc.dtype) for s in self.S)
            inv_lam = self._inv_lam.astype(rc.dtype)

            # forward/backward are separable per axis with different B's
            t = jnp.einsum("ia,abc->ibc", Sx.T, Gf)
            t = jnp.einsum("jb,ibc->ijc", Sy.T, t)
            t = jnp.einsum("kc,ijc->ijk", Sz.T, t)
            t = t * inv_lam
            t = jnp.einsum("ia,abc->ibc", Sx, t)
            t = jnp.einsum("jb,ibc->ijc", Sy, t)
            Uf = jnp.einsum("kc,ijc->ijk", Sz, t)
            U = jnp.zeros_like(G).at[
                self.fx0:self.fx1, self.fy0:self.fy1,
                self.fz0:self.fz1].set(Uf)
            out = U.reshape(-1)[self._gos]
            if self.E > self.Er:
                out = jnp.pad(out, ((0, self.E - self.Er), (0, 0)))
            return out

    @classmethod
    def try_build(cls, ex_c, disc_c, free_c_np, G_c=None):
        """GridFDM3D for the coarse level, or None if inadmissible.

        ``G_c``: optional precomputed ``disc_c.laplacian_factors(None)``
        (the factory already holds it; recomputing is a full numpy pass
        over the coarse elements)."""
        Er = ex_c.E_real
        basis_c = disc_c.basis
        W = np.asarray(basis_c.weight_grid()).reshape(-1)
        sumW = float(W.sum())
        if G_c is None:
            G_c = disc_c.laplacian_factors(None)
        Gf = np.asarray(G_c, np.float64).reshape(Er, 6, -1)
        scale = np.abs(Gf).max() + 1e-300
        a = np.empty(3)
        for k, c in enumerate((0, 3, 5)):
            ac = Gf[:, c, :].sum(axis=1) / sumW
            if (np.abs(Gf[:, c, :] - ac[:, None] * W[None, :]).max()
                    > 1e-10 * scale
                    or np.abs(ac - ac[0]).max() > 1e-10 * scale):
                return None                  # non-affine or non-uniform
            a[k] = ac[0]
        for c in (1, 2, 4):
            if np.abs(Gf[:, c, :]).max() > 1e-10 * scale:
                return None                  # sheared cells
        p1 = basis_c.coeff_shape[0]
        if any(s != p1 for s in basis_c.coeff_shape):
            return None
        pc = p1 - 1

        # coordinate lattice of the referenced coarse nodes
        gix = np.asarray(ex_c.gather_lex[:Er])              # (Er, n_c)
        used = np.unique(gix.reshape(-1))
        xyz = np.asarray(disc_c.mesh.nodes)[:, used]        # (3, Nu)
        axes_vals, axis_idx = [], []
        span = np.abs(xyz).max() + 1.0
        for d in range(3):
            v = xyz[d]
            vals = np.unique(np.round(v / span * 1e12))
            idx = np.searchsorted(vals, np.round(v / span * 1e12))
            axes_vals.append(vals)
            axis_idx.append(idx)
        dims = tuple(len(v) for v in axes_vals)
        if int(np.prod(dims)) != used.size:
            return None                      # not a full lattice
        grid_flat_of_used = (axis_idx[0] * dims[1] + axis_idx[1]) \
            * dims[2] + axis_idx[2]
        if np.unique(grid_flat_of_used).size != used.size:
            return None
        lut = np.full(used.max() + 1, -1, dtype=np.int64)
        lut[used] = grid_flat_of_used
        grid_of_slot = lut[gix]
        if (grid_of_slot < 0).any():
            return None
        # per-axis element counts must tile the lattice at order pc
        n_el = []
        for Nd in dims:
            if (Nd - 1) % pc:
                return None
            n_el.append((Nd - 1) // pc)

        # free mask must be an outer product of contiguous intervals
        fflat = np.zeros(int(np.prod(dims)), bool)
        fflat[grid_of_slot.reshape(-1)] = free_c_np[:Er].reshape(-1)
        fgrid = fflat.reshape(dims)
        fx = fgrid.any(axis=(1, 2))
        fy = fgrid.any(axis=(0, 2))
        fz = fgrid.any(axis=(0, 1))
        if not np.array_equal(
                fgrid, fx[:, None, None] & fy[None, :, None]
                & fz[None, None, :]):
            return None
        ivs = []
        for f in (fx, fy, fz):
            idx = np.nonzero(f)[0]
            if idx.size == 0 or not np.array_equal(
                    idx, np.arange(idx[0], idx[-1] + 1)):
                return None
            ivs.append((int(idx[0]), int(idx[-1] + 1)))

        # 1D eigenpairs on each free interval
        w1 = np.asarray(basis_c.subbases[0].quad_wts, np.float64)
        D1 = np.asarray(basis_c.subbases[0].D1, np.float64)
        khat = D1.T @ np.diag(w1) @ D1
        S_axes, lams = [], []
        for d in range(3):
            K, m = GridFDM._assemble_1d(0.5 * (khat + khat.T), w1, n_el[d])
            i0, i1 = ivs[d]
            K, m = K[i0:i1, i0:i1], m[i0:i1]
            ms = 1.0 / np.sqrt(m)
            lam, Q = np.linalg.eigh(ms[:, None] * K * ms[None, :])
            lams.append(np.maximum(lam, 1e-300))
            S_axes.append(ms[:, None] * Q)
        lam3 = (a[0] * lams[0][:, None, None]
                + a[1] * lams[1][None, :, None]
                + a[2] * lams[2][None, None, :])
        return cls(grid_of_slot, dims, ivs, S_axes, lam3, Er, ex_c.E)


@_staged_factory
def make_pmg_preconditioner_3d(disc, ex_f, A_f, free_global, diag_global,
                               *,
                               p_coarse: int = 2,
                               degree: int = 3,
                               alpha: float = 4.0,
                               coarse: str = "auto",
                               coarse_degree: int = 24,
                               coarse_interval: float = 100.0,
                               dtype=np.float64,
                               mm_precision: str | None = "float32",
                               lmax_iters: int = 30,
                               lmax_safety: float = 1.05):
    """Two-level p-MG V-cycle on the 3D lexicographic (E, n) L-vectors.

    3D twin of :func:`make_pmg_preconditioner` for the
    :meth:`..models.poisson.Poisson._solve_local_3d` path: coarse level
    from the shared-node order-``p_coarse`` mesh
    (:func:`..mesh.porder.mesh_with_order`) discretized directly (no
    affine-factor reuse — the coarse Discretization recomputes exact
    factors), transfers as one ``(E, n_f) @ (n_f, n_c)`` matmul each
    way, Chebyshev-Jacobi smoothing, and the exact
    :class:`GridFDM3D` tensor-lattice coarse solve on box meshes
    (Chebyshev fallback elsewhere).
    """
    from ..basis import gll_basis_3d
    from ..core.discretization import Discretization
    from ..mesh.porder import mesh_with_order
    from ..ops import sumfac
    from ..ops.exchange import make_exchange
    from .cg import jacobi_preconditioner

    if disc.mesh.ndim != 3:
        raise ValueError("make_pmg_preconditioner_3d is 3D-only")
    basis_f = disc.basis

    mesh_c = mesh_with_order(disc.mesh, p_coarse)
    basis_c = gll_basis_3d(p_coarse)
    disc_c = Discretization(mesh_c, basis_c)
    ex_c = make_exchange(disc_c)
    Er, Ef, Ec = ex_f.E_real, ex_f.E, ex_c.E
    n_f, n_c = ex_f.n_loc, ex_c.n_loc
    shape_c = tuple(disc_c.shape)

    G_c_np = disc_c.laplacian_factors(None)     # computed ONCE, reused
    G_c = jnp.asarray(G_c_np, dtype=dtype)
    D_c = [jnp.asarray(basis_c.subbases[d].D1, dtype=dtype)
           for d in range(3)]
    free_c_np = np.asarray(free_global, bool)[ex_c.gather_lex]
    free_c = jnp.asarray(free_c_np)

    def A_c(uL):
        uL = jnp.where(free_c, uL, 0.0)
        ue = uL.reshape((Ec,) + shape_c)
        ve = sumfac.laplacian_apply_local_3d(ue, G_c, *D_c)
        return jnp.where(free_c, ex_c.dss(ve.reshape(Ec, n_c)), 0.0)

    d_c = sumfac.laplacian_diag_local_host_3d(
        np.asarray(G_c_np),
        *[np.asarray(basis_c.subbases[d].D1) for d in range(3)])
    dg = np.zeros(disc.mesh.n_nodes)
    np.add.at(dg, np.asarray(ex_c.gather_lex[:Er]).ravel(),
              d_c.reshape(Er, -1).ravel())
    B_c = jacobi_preconditioner(
        jnp.asarray(dg[ex_c.gather_lex], dtype=dtype), free_c)

    # transfers: coarse basis at the fine GLL lattice, tensorized (lex)
    P = np.ones((1, 1))
    for d in range(3):
        P1 = np.asarray(basis_c.subbases[d](
            basis_f.subbases[d].nodes), np.float64)
        P = np.kron(P, P1)                                # (n_f, n_c) lex
    P_d = jnp.asarray(P, dtype=dtype)
    w_f = jnp.asarray(ex_f._weights_as(np.dtype(dtype)))
    free_f = jnp.asarray(np.asarray(free_global, bool)[ex_f.gather_lex])

    def restrict(r):
        with _mm(mm_precision):
            loc = ((w_f * r)[:Er] @ P_d)
            if Ec > Er:
                loc = jnp.pad(loc, ((0, Ec - Er), (0, 0)))
            return jnp.where(free_c, ex_c.dss(loc), 0.0)

    def prolong(ec):
        with _mm(mm_precision):
            ef = ec[:Er] @ P_d.T
            if Ef > Er:
                ef = jnp.pad(ef, ((0, Ef - Er), (0, 0)))
            return jnp.where(free_f, ef, 0.0)

    diagL_f = jnp.asarray(
        np.asarray(diag_global)[np.asarray(ex_f.gather_lex)], dtype=dtype)
    B_f = jacobi_preconditioner(diagL_f, free_f)
    lmax_f = estimate_lmax(A_f, B_f, (Ef, n_f), dtype=dtype,
                           iters=lmax_iters, safety=lmax_safety)
    S_f = chebyshev_smoother(A_f, B_f, lmax_f, lmax_f / alpha, degree)

    grid = None
    if coarse in ("auto", "fdm"):
        grid = GridFDM3D.try_build(ex_c, disc_c, free_c_np, G_c=G_c_np)
        if grid is None and coarse == "fdm":
            raise ValueError(
                "coarse='fdm' needs a uniform box lattice with "
                "outer-product Dirichlet data")
    if grid is not None:
        grid._mmp = mm_precision
        C = grid
        coarse_kind = "fdm"
    else:
        lmax_c = estimate_lmax(A_c, B_c, (Ec, n_c), dtype=dtype,
                               iters=lmax_iters, safety=lmax_safety)
        C = chebyshev_smoother(A_c, B_c, lmax_c,
                               lmax_c / coarse_interval, coarse_degree)
        coarse_kind = "chebyshev"

    def M(r):
        z = S_f(r)
        ec = C(restrict(r - A_f(z)))
        z = z + prolong(ec)
        return z + S_f(r - A_f(z))

    M._coarse_kind = coarse_kind
    M._levels = (int(basis_f.coeff_shape[0]) - 1, p_coarse)
    M._lmax_f = lmax_f
    M._restrict, M._prolong, M._coarse = restrict, prolong, C
    M._A_c = A_c
    return M


# ---------------------------------------------------------------------------
# The preconditioner factory


@_staged_factory
def make_pmg_preconditioner(disc, ex_f, Gf, A_f, free_global, diag_global,
                            *,
                            p_coarse: int | None = None,
                            smoother: str = "jacobi",
                            degree: int = 3,
                            alpha: float = 4.0,
                            coarse: str = "auto",
                            coarse_degree: int = 24,
                            coarse_interval: float = 100.0,
                            dtype=np.float32,
                            cycle_dtype=None,
                            coeff_fn=None,
                            reaction_fn=None,
                            coarse_pad_to=None,
                            cycle_backend: str = "auto",
                            mm_precision: str | None = "float32",
                            lmax_iters: int = 30,
                            lmax_safety: float = 1.05):
    """Symmetric two-level p-MG V-cycle preconditioner on 'ne' L-vectors.

    Parameters
    ----------
    disc : fine Discretization (2D, single geometry).
    ex_f : fine exchange (provides hier order, weights, dss_T, padding).
    Gf : (E, 3, n_f) fine geometric factor fields.  Affine meshes get
        the fast coarse construction (per-element scales reused with
        order-p_c reference matrices, :func:`..ops.sumfac.
        affine_factorization`) and the exact :class:`GridFDM` coarse
        solve where admissible; curved/variable-coefficient meshes get
        a rediscretized coarse level (the coarse Discretization's own
        general factors) with the Chebyshev coarse sweep.
    A_f : masked fine operator on (n_f, E) transposed L-vectors — kept
        for API compatibility/introspection; the V-cycle builds its own
        fine apply in ``cycle_dtype`` so an f64 outer solve never pays
        f64 V-cycle matmuls.
    free_global : (n_nodes,) bool — global non-Dirichlet mask.
    diag_global : (n_nodes,) fine assembled operator diagonal.
    p_coarse : coarse polynomial order (must divide the fine order).
        None = dimension-appropriate measured default (1 in 2D —
        BASELINE.md round-4a sweep; 2 in 3D).
    smoother : "jacobi" (Chebyshev-accelerated point Jacobi) or "fdm"
        (Chebyshev-accelerated FDM additive Schwarz, :mod:`.fdm` —
        stronger on intra-element modes, ~2 extra matmuls per apply).
    degree : Chebyshev smoothing degree (applies of A per half-sweep).
    alpha : smoothing targets ``[lmax/alpha, lmax]``.
    coarse : "fdm" forces the exact tensor-grid solve (ValueError if
        inadmissible), "chebyshev" forces the iterative fallback,
        "auto" tries fdm first (affine meshes only).
    coarse_degree / coarse_interval : Chebyshev fallback parameters
        (degree applies over ``[lmax_c/coarse_interval, lmax_c]``).
    dtype : dtype of the vectors the returned ``M`` consumes/returns
        (the outer CG dtype; float64 supported).
    cycle_dtype : internal V-cycle arithmetic dtype (default float32):
        with a float64 outer solve the V-cycle still runs in f32 — the
        preconditioner only steers search directions, and f64 matmuls
        are ~8x slower on TPU (mirrors the GMRES-IR mixed-precision
        ladder, :mod:`.gmres`).  Pass ``np.float64`` for an exact-dtype
        cycle (CPU/reference checks).
    coeff_fn : optional callable(x, y) — diffusivity for the
        rediscretized (curved) coarse operator; None = 1.  Ignored on
        the affine path (the affine scales already carry it).
    reaction_fn : optional callable(x, y) — reaction/shift k(x) of a
        Helmholtz-type operator ``-div(c grad u) + k u``; adds the
        collocated coarse mass term ``k detJxW`` to the coarse operator
        and its diagonal, and the matching fine term to the V-cycle's
        internal fine apply.
    cycle_backend : operator backend for the V-cycle's internal fine and
        coarse applies ('auto' = fused Pallas on TPU; 'xla' forces the
        unfused path — also a debugging isolate for kernel-vs-math
        questions).
    coarse_pad_to : optional padded coarse element count.  Sharded
        callers pass the fine exchange's (shard-divisible) padded E so
        the transfers are pure per-element matmuls with no cross-shard
        slice/pad reshaping — padding is inert (zero dot weights,
        pad-inert DSS), so the V-cycle shards by XLA propagation with
        the coarse halo exchange riding the same collective-permutes as
        the fine level (VERDICT round-3 item 2).

    Returns ``M`` with introspection attributes ``M._coarse_kind``
    (``"fdm"``/``"chebyshev"``) and ``M._levels``.
    """
    from ..basis import gll_basis_2d
    from ..core.discretization import Discretization
    from ..mesh.porder import mesh_with_order
    from ..ops import sumfac
    from ..ops.exchange import make_exchange
    from .cg import jacobi_preconditioner

    if disc.mesh.ndim == 3:
        # unified entry (VERDICT round-3 item 6): dispatch to the 3D
        # factory — it rediscretizes the coarse level itself, so Gf and
        # the 2D-only knobs don't apply
        if smoother != "jacobi":
            raise NotImplementedError("3D pmg smoother is jacobi-Chebyshev")
        if coeff_fn is not None or reaction_fn is not None:
            raise NotImplementedError(
                "3D pmg: coefficient/reaction coarse terms TODO")
        return make_pmg_preconditioner_3d(
            disc, ex_f, A_f, free_global, diag_global,
            p_coarse=2 if p_coarse is None else p_coarse,
            degree=degree, alpha=alpha, coarse=coarse,
            coarse_degree=coarse_degree, coarse_interval=coarse_interval,
            dtype=dtype, mm_precision=mm_precision,
            lmax_iters=lmax_iters, lmax_safety=lmax_safety)
    if disc.mesh.ndim != 2:
        raise NotImplementedError("pmg supports 2D and 3D meshes")
    if p_coarse is None:
        p_coarse = 1
    out_dtype = np.dtype(dtype)
    cyc = np.dtype(cycle_dtype) if cycle_dtype is not None else np.dtype(
        np.float32)

    basis_f = disc.basis
    W_f = basis_f.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(np.asarray(Gf), W_f)

    # ---- coarse level ------------------------------------------------------
    mesh_c = mesh_with_order(disc.mesh, p_coarse)
    basis_c = gll_basis_2d(p_coarse)
    disc_c = Discretization(mesh_c, basis_c)
    ex_c = make_exchange(disc_c, pad_to=coarse_pad_to)
    if ex_c.E_real != ex_f.E_real:
        raise AssertionError("fine/coarse exchanges disagree on E_real")
    Er, Ef, Ec = ex_f.E_real, ex_f.E, ex_c.E
    n_f, n_c = ex_f.n_loc, ex_c.n_loc

    W_c = basis_c.weight_grid().reshape(-1)
    Dhat_c = sumfac.make_stacked_derivative(
        np.asarray(basis_c.get_D1_matrix(0)),
        np.asarray(basis_c.get_D1_matrix(1)))
    free_c_np = np.asarray(free_global, bool)[ex_c.gather_hier]
    free_c = jnp.asarray(np.ascontiguousarray(free_c_np.T))

    # coarse reaction mass (Helmholtz shift), collocated: k * detJxW_c
    kM_c_T = None
    if reaction_fn is not None:
        xc = [disc_c.x_coeffs[:, d] for d in range(2)]
        kM_c_np = np.zeros((Ec, n_c))
        kM_c_np[:Er] = (np.broadcast_to(
            np.asarray(reaction_fn(*xc)), disc_c.detJxW.shape)
            * disc_c.detJxW).reshape(Er, -1)[:, ex_c.hier]
        kM_c_T = jnp.asarray(
            np.ascontiguousarray(kM_c_np.T).astype(cyc))

    if exact:
        # affine: coarse factors are the per-element scales times the
        # order-p_c weight grid — no coarse geometry recompute
        Gc_np = (a[:Er, :, None] * W_c[None, None, :]).astype(cyc)
        structure_c = "affine"
        # coarse Jacobi diagonal: affine element-matrix diagonals
        Kcat_c = sumfac.make_affine_element_matrices(Dhat_c, W_c,
                                                     order=ex_c.hier)
        dblk = np.stack([np.diag(Kcat_c[:, i * n_c:(i + 1) * n_c])
                         for i in range(3)])                   # (3, n_c)
        d_loc = a[:Er] @ dblk                                  # (Er, n_c)
    else:
        # curved / variable-coefficient: rediscretize on the coarse
        # mesh — the coarse Discretization computes its own exact
        # isoparametric factors at order p_coarse
        xc = [disc_c.x_coeffs[:, d] for d in range(2)]
        coeff_c = None
        if coeff_fn is not None:
            coeff_c = np.broadcast_to(
                np.asarray(coeff_fn(*xc)), disc_c.detJxW.shape)
        Gc_np = np.asarray(
            disc_c.laplacian_factors(coeff_c), cyc).reshape(Er, 3, -1)
        structure_c = "general"
        d_loc = sumfac.laplacian_diag_local_host(
            Gc_np.reshape(Er, 3, *disc_c.shape),
            np.asarray(basis_c.get_D1_matrix(0)),
            np.asarray(basis_c.get_D1_matrix(1))
        ).reshape(Er, -1)[:, ex_c.hier]

    lap_c = sumfac.make_local_laplacian_operator(
        ex_c, Gc_np, Dhat_c, free_c, structure=structure_c,
        backend=cycle_backend,
        vector_layout="ne", assume_masked_input=True)
    if kM_c_T is None:
        A_c = lap_c
    else:
        def A_c(u):
            return jnp.where(free_c,
                             lap_c(u) + ex_c.dss_T(kM_c_T * u), 0.0)

    if reaction_fn is not None:
        d_loc = d_loc + np.asarray(kM_c_np[:Er])
    d_glob = np.zeros(disc.mesh.n_nodes)
    np.add.at(d_glob, np.asarray(ex_c.gather_hier[:Er]), d_loc)
    diagL_c = np.ascontiguousarray(
        d_glob[ex_c.gather_hier].T).astype(cyc)                # (n_c, Ec)
    B_c = jacobi_preconditioner(jnp.asarray(diagL_c), free_c)

    # ---- transfers -----------------------------------------------------------
    P = np.ones((1, 1))
    for d in range(2):
        P1 = np.asarray(basis_c.get_subbasis(d)(
            basis_f.get_subbasis(d).nodes), np.float64)
        P = np.kron(P, P1)                                    # lex x lex
    P = P[np.ix_(np.asarray(ex_f.hier), np.asarray(ex_c.hier))]
    P_d = jnp.asarray(P.astype(cyc))                          # (n_f, n_c)
    w_f = jnp.asarray(np.asarray(
        ex_f._weights_as(cyc, transposed=True)))
    free_f_np = np.asarray(free_global, bool)[ex_f.gather_hier]
    free_f = jnp.asarray(np.ascontiguousarray(free_f_np.T))

    if Ec == Ef:
        # matched paddings (sharded callers): pure per-element matmuls —
        # no slice/pad, so each transfer shards trivially over elements.
        # Padding columns stay zero throughout: w_f is zero there, DSS
        # is pad-inert, and the coarse operators carry zero pad factors.
        def restrict(r):
            with _mm(mm_precision):
                return jnp.where(free_c,
                                 ex_c.dss_T(P_d.T @ (w_f * r)), 0.0)

        def prolong(ec):
            with _mm(mm_precision):
                return jnp.where(free_f, P_d @ ec, 0.0)
    else:
        def restrict(r):
            with _mm(mm_precision):
                loc = P_d.T @ (w_f * r)[:, :Er]
                if Ec > Er:
                    loc = jnp.pad(loc, ((0, 0), (0, Ec - Er)))
                return jnp.where(free_c, ex_c.dss_T(loc), 0.0)

        def prolong(ec):
            with _mm(mm_precision):
                ef = P_d @ ec[:, :Er]
                if Ef > Er:
                    ef = jnp.pad(ef, ((0, 0), (0, Ef - Er)))
                return jnp.where(free_f, ef, 0.0)

    # ---- internal fine apply (cycle dtype) -----------------------------------
    # the V-cycle's own fine operator: same math as A_f, arithmetic in
    # cycle_dtype (an f64 outer ladder never pays f64 V-cycle matmuls)
    lap_f_cyc = sumfac.make_local_laplacian_operator(
        ex_f, np.asarray(Gf, dtype=cyc), sumfac.make_stacked_derivative(
            np.asarray(basis_f.get_D1_matrix(0)),
            np.asarray(basis_f.get_D1_matrix(1))),
        free_f, structure="auto", backend=cycle_backend,
        vector_layout="ne", assume_masked_input=True)
    if reaction_fn is None:
        A_f_cyc = lap_f_cyc
    else:
        xf = [disc.x_coeffs[:, d] for d in range(2)]
        kM_f_np = np.zeros((Ef, n_f))
        kM_f_np[:Er] = (np.broadcast_to(
            np.asarray(reaction_fn(*xf)), disc.detJxW.shape)
            * disc.detJxW).reshape(Er, -1)[:, ex_f.hier]
        kM_f_T = jnp.asarray(
            np.ascontiguousarray(kM_f_np.T).astype(cyc))

        def A_f_cyc(u):
            return jnp.where(free_f,
                             lap_f_cyc(u) + ex_f.dss_T(kM_f_T * u), 0.0)

    # ---- smoother ------------------------------------------------------------
    if smoother == "fdm":
        from .fdm import make_fdm_preconditioner

        B_f = make_fdm_preconditioner(ex_f, np.asarray(Gf), basis_f,
                                      free_f, dtype=cyc,
                                      vector_layout="ne")
    elif smoother == "jacobi":
        diagL_f = np.ascontiguousarray(
            np.asarray(diag_global)[ex_f.gather_hier].T).astype(cyc)
        B_f = jacobi_preconditioner(jnp.asarray(diagL_f), free_f)
    else:
        raise ValueError(f"unknown smoother {smoother!r}")
    lmax_f = estimate_lmax(A_f_cyc, B_f, (n_f, Ef), dtype=cyc,
                           iters=lmax_iters, safety=lmax_safety)
    S_f = chebyshev_smoother(A_f_cyc, B_f, lmax_f, lmax_f / alpha, degree)

    # ---- coarse solve ----------------------------------------------------------
    grid = None
    if coarse in ("auto", "fdm") and exact and reaction_fn is None:
        grid = GridFDM.try_build(ex_c, basis_c, a,
                                 np.asarray(free_c_np), ex_c.hier)
        if grid is None:
            # partitioned element orders (panel/Morton/RCM) break the
            # tensor-numbering inference but not the node lattice
            grid = GridFDM2DLattice.try_build(
                ex_c, disc_c, basis_c, a, np.asarray(free_c_np))
    if grid is None and coarse == "fdm":
        raise ValueError(
            "coarse='fdm' needs a uniform affine tensor-product mesh "
            "with per-side-uniform Dirichlet data and no reaction term")
    if grid is not None:
        grid._mmp = mm_precision
        C = grid
        coarse_kind = "fdm"
    else:
        lmax_c = estimate_lmax(A_c, B_c, (n_c, Ec), dtype=cyc,
                               iters=lmax_iters, safety=lmax_safety)
        C = chebyshev_smoother(A_c, B_c, lmax_c,
                               lmax_c / coarse_interval, coarse_degree)
        coarse_kind = "chebyshev"

    # ---- symmetric V-cycle -----------------------------------------------------
    def _cycle(r):
        z = S_f(r)
        ec = C(restrict(r - A_f_cyc(z)))
        z = z + prolong(ec)
        return z + S_f(r - A_f_cyc(z))

    if out_dtype == cyc:
        M = _cycle
    else:
        def M(r):
            return _cycle(r.astype(cyc)).astype(out_dtype)

    M._coarse_kind = coarse_kind
    M._levels = (int(np.asarray(basis_f.coeff_shape)[0] - 1), p_coarse)
    M._lmax_f = lmax_f
    M._restrict, M._prolong, M._coarse = restrict, prolong, C
    M._A_c = A_c
    M._S_f = S_f
    M._cycle_dtype = cyc
    return M
