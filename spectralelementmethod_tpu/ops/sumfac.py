"""Sum-factorized matrix-free operator kernels (JAX, element-batched).

This is the compute core mandated by the north star (BASELINE.json): the
reference's per-element assembled rank-4 operators
(``examples/poisson.py:180-193``, applied via dense matvecs) become one
batched chain of small matmuls over the whole element axis:

    u_global --gather--> (E, p, p) --D-matmuls--> parametric gradient
    --G-weighting--> fluxes --D^T-matmuls--> local residual --scatter-add-->

Everything here is jit-compatible and shards over the element axis.
FLOP count per Laplacian apply: E * (8 * p1^3 + 6 * p1^2) for p1 = p + 1
(four (p1 x p1)@(p1 x p1) matmuls + pointwise G application).
"""

from __future__ import annotations

import jax.numpy as jnp


def gather(u, gather_nodes, shape):
    """(n_nodes,) -> (E, *shape) element-local values."""
    return u[gather_nodes].reshape((-1,) + tuple(shape))


def scatter_add(vals, gather_nodes, n_nodes):
    """(E, *shape) -> (n_nodes,) direct stiffness summation.

    Device-side scatter-add; the TPU equivalent of scipy COO
    duplicate-summation assembly (reference ``sem/discrete.py:478-500``).
    """
    flat = vals.reshape(-1)
    return jnp.zeros(n_nodes, dtype=vals.dtype).at[
        gather_nodes.reshape(-1)
    ].add(flat)


def grad_2d(ue, D0, D1):
    """Parametric gradient of (E, p0, p1) local fields: (ur, us)."""
    ur = jnp.einsum("mj,ejn->emn", D0, ue, precision="highest")
    us = jnp.einsum("nk,emk->emn", D1, ue, precision="highest")
    return ur, us


def grad_transpose_2d(fr, fs, D0, D1):
    """Adjoint of :func:`grad_2d`: v = D0^T fr + fs D1."""
    v = jnp.einsum("mp,emq->epq", D0, fr, precision="highest")
    v += jnp.einsum("nq,epn->epq", D1, fs, precision="highest")
    return v


def laplacian_apply_local(ue, G, D0, D1):
    """Local weak Laplacian: v_e = B_e^T (G . B_e u_e).

    ``G``: (E, 3, p0, p1) packed [G00, G01, G11] geometric factors
    (:meth:`Discretization.laplacian_factors`).
    """
    ur, us = grad_2d(ue, D0, D1)
    fr = G[:, 0] * ur + G[:, 1] * us
    fs = G[:, 1] * ur + G[:, 2] * us
    return grad_transpose_2d(fr, fs, D0, D1)


def laplacian_apply(u, gather_nodes, G, D0, D1, n_nodes):
    """Global matrix-free weak Laplacian: scatter(local(gather(u)))."""
    ue = gather(u, gather_nodes, G.shape[-2:])
    ve = laplacian_apply_local(ue, G, D0, D1)
    return scatter_add(ve, gather_nodes, n_nodes)


def laplacian_diag_local(G, D0, D1):
    """Diagonal of the local weak Laplacian (for Jacobi preconditioning).

    K[(p,q),(p,q)] = sum_m G00[m,q] D0[m,p]^2
                   + 2 G01[p,q] D0[p,p] D1[q,q]
                   + sum_n G11[p,n] D1[n,q]^2
    """
    d0 = jnp.einsum("emq,mp->epq", G[:, 0], D0**2, precision="highest")
    d1 = jnp.einsum("epn,nq->epq", G[:, 2], D1**2, precision="highest")
    cross = 2.0 * G[:, 1] * jnp.diag(D0)[:, None] * jnp.diag(D1)[None, :]
    return d0 + d1 + cross


def laplacian_diag_local_host(G, D0, D1):
    """Numpy twin of :func:`laplacian_diag_local` for host precompute.

    The Jacobi diagonal is setup data consumed on host (masking, local
    gathers) — computing it on device forces a device->host read of the
    scattered (n_nodes,) vector, which through a remote-TPU tunnel is
    minutes-slow at ~25 MB (observed: the 100k-element bench stalled ~10
    minutes on exactly this read).
    """
    import numpy as np

    G = np.asarray(G)
    D0 = np.asarray(D0)
    D1 = np.asarray(D1)
    d0 = np.einsum("emq,mp->epq", G[:, 0], D0**2)
    d1 = np.einsum("epn,nq->epq", G[:, 2], D1**2)
    cross = 2.0 * G[:, 1] * np.diag(D0)[:, None] * np.diag(D1)[None, :]
    return d0 + d1 + cross


def grad_3d(ue, D0, D1, D2):
    """Parametric gradient of (E, p0, p1, p2) local fields (3D extension;
    the reference is 2D-only, ``sem/geometry.py:25-29``)."""
    u0 = jnp.einsum("ma,eabc->embc", D0, ue, precision="highest")
    u1 = jnp.einsum("nb,eabc->eanc", D1, ue, precision="highest")
    u2 = jnp.einsum("kc,eabc->eabk", D2, ue, precision="highest")
    return u0, u1, u2


def grad_transpose_3d(f0, f1, f2, D0, D1, D2):
    """Adjoint of :func:`grad_3d`."""
    v = jnp.einsum("mp,emqr->epqr", D0, f0, precision="highest")
    v += jnp.einsum("nq,epnr->epqr", D1, f1, precision="highest")
    v += jnp.einsum("kr,epqk->epqr", D2, f2, precision="highest")
    return v


def laplacian_apply_local_3d(ue, G, D0, D1, D2):
    """Local 3D weak Laplacian; ``G``: (E, 6, *shape) packed upper
    triangle [G00, G01, G02, G11, G12, G22] (``laplacian_factors``)."""
    u0, u1, u2 = grad_3d(ue, D0, D1, D2)
    f0 = G[:, 0] * u0 + G[:, 1] * u1 + G[:, 2] * u2
    f1 = G[:, 1] * u0 + G[:, 3] * u1 + G[:, 4] * u2
    f2 = G[:, 2] * u0 + G[:, 4] * u1 + G[:, 5] * u2
    return grad_transpose_3d(f0, f1, f2, D0, D1, D2)


def grad_3d_T(uT, D0, D1, D2):
    """Parametric gradient in the TRANSPOSED (p0, p1, p2, E) layout.

    Elements ride the trailing (lane) axis, so every contraction and
    elementwise op runs on full 128-lane rows — the 3D analogue of the
    2D (n, E) fast path (the (E, p0, p1, p2) layout leaves the p2-wide
    trailing dim at p2/128 lane occupancy).
    """
    u0 = jnp.einsum("ma,abce->mbce", D0, uT, precision="highest")
    u1 = jnp.einsum("nb,abce->ance", D1, uT, precision="highest")
    u2 = jnp.einsum("kc,abce->abke", D2, uT, precision="highest")
    return u0, u1, u2


def grad_transpose_3d_T(f0, f1, f2, D0, D1, D2):
    """Adjoint of :func:`grad_3d_T`."""
    v = jnp.einsum("mp,mqre->pqre", D0, f0, precision="highest")
    v += jnp.einsum("nq,pnre->pqre", D1, f1, precision="highest")
    v += jnp.einsum("kr,pqke->pqre", D2, f2, precision="highest")
    return v


def laplacian_apply_local_3d_affine_T(uT, aT, W3, D0, D1, D2):
    """Affine local 3D weak Laplacian, transposed (n_loc, E) storage.

    ``uT``: (n_loc, E) lex-ordered; ``aT``: (6, E) per-element factor
    scales (:func:`affine_factorization` transposed); ``W3``: (p0, p1,
    p2) weight grid.  Returns (n_loc, E).
    """
    shape = W3.shape
    n_loc = uT.shape[0]
    u = uT.reshape(shape + (-1,))
    u0, u1, u2 = grad_3d_T(u, D0, D1, D2)
    s = aT.astype(uT.dtype)
    w = W3.astype(uT.dtype)[..., None]
    f0 = w * (s[0] * u0 + s[1] * u1 + s[2] * u2)
    f1 = w * (s[1] * u0 + s[3] * u1 + s[4] * u2)
    f2 = w * (s[2] * u0 + s[4] * u1 + s[5] * u2)
    v = grad_transpose_3d_T(f0, f1, f2, D0, D1, D2)
    return v.reshape(n_loc, -1)


def laplacian_apply_local_3d_T(uT, G_T, D0, D1, D2):
    """General local 3D weak Laplacian, transposed (n_loc, E) storage.

    ``G_T``: (6,) + shape + (E,) packed upper-triangle factors
    (``laplacian_factors`` transposed to elements-last).
    """
    shape = G_T.shape[1:4]
    n_loc = uT.shape[0]
    u = uT.reshape(shape + (-1,))
    u0, u1, u2 = grad_3d_T(u, D0, D1, D2)
    f0 = G_T[0] * u0 + G_T[1] * u1 + G_T[2] * u2
    f1 = G_T[1] * u0 + G_T[3] * u1 + G_T[4] * u2
    f2 = G_T[2] * u0 + G_T[4] * u1 + G_T[5] * u2
    v = grad_transpose_3d_T(f0, f1, f2, D0, D1, D2)
    return v.reshape(n_loc, -1)


def assembled_1d_stiffness(D, w):
    """1D assembled GLL stiffness ``K = D^T diag(w) D`` (float64)."""
    import numpy as np

    D = np.asarray(D, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64).reshape(-1)
    return D.T @ (w[:, None] * D)


def laplacian_apply_local_3d_separable(ue, a, K0, K1, K2, w0, w1, w2):
    """Separable affine local 3D weak Laplacian (diagonal-mass tensor
    form).

    For affine cells with ZERO cross factors (axis-aligned boxes:
    ``a1 = a2 = a4 = 0``) and the GLL-collocated quadrature (diagonal
    mass), the weak Laplacian factorizes exactly:

        A_e = a0 K0 (x) W1 (x) W2 + a3 W0 (x) K1 (x) W2
            + a5 W0 (x) W1 (x) K2

    with 1D assembled stiffness matrices ``Kd = Dd^T diag(wd) Dd`` and
    diagonal 1D masses ``Wd = diag(wd)``.  Three (p1, p1) matmuls and an
    elementwise combine replace the 6-matmul grad -> flux -> grad^T
    pipeline — half the FLOPs and none of the six (E, *shape) flux/grad
    intermediates (the 3D apply is fusion/HBM-bound, measured 4.4 ms vs
    a ~1 ms traffic floor at p=8/19683 el).

    ``a``: (E, 6) packed scales (only 0, 3, 5 used — caller must verify
    the cross terms vanish); ``wd``: 1D weights.
    """
    w12 = (w1[:, None] * w2[None, :]).astype(ue.dtype)
    w02 = (w0[:, None] * w2[None, :]).astype(ue.dtype)
    w01 = (w0[:, None] * w1[None, :]).astype(ue.dtype)
    s = a.reshape(a.shape[:2] + (1, 1, 1)).astype(ue.dtype)
    # accumulate term by term (v += ...) instead of materializing all
    # three weighted tensors and a 3-way add: gives XLA one fewer live
    # (E, *shape) intermediate per term to fuse into the combine
    v = (s[:, 0] * w12[None, None]) * jnp.einsum(
        "mp,epqr->emqr", K0, ue, precision="highest")
    v = v + (s[:, 3] * w02[None, :, None]) * jnp.einsum(
        "nq,epqr->epnr", K1, ue, precision="highest")
    v = v + (s[:, 5] * w01[None, :, :, None]) * jnp.einsum(
        "kr,epqr->epqk", K2, ue, precision="highest")
    return v


def laplacian_apply_local_3d_separable_T(uT, aT, K0, K1, K2, w0, w1, w2):
    """Separable affine local 3D weak Laplacian, TRANSPOSED storage.

    The (n_loc, E) twin of :func:`laplacian_apply_local_3d_separable`:
    elements ride the trailing (lane) axis so every contraction and
    elementwise op runs on full 128-lane rows (the (E, p0, p1, p2)
    layout leaves the p2-wide trailing dim at p2/128 lane occupancy).
    ``uT``: (n_loc, E) lex-ordered; ``aT``: (6, E) scales (only rows
    0, 3, 5 used — caller must verify the cross terms vanish).
    """
    shape = (len(w0), len(w1), len(w2))
    n_loc = uT.shape[0]
    u = uT.reshape(shape + (-1,))
    w12 = (w1[:, None] * w2[None, :])[None, :, :, None].astype(uT.dtype)
    w02 = (w0[:, None] * w2[None, :])[:, None, :, None].astype(uT.dtype)
    w01 = (w0[:, None] * w1[None, :])[:, :, None, None].astype(uT.dtype)
    t0 = jnp.einsum("ma,abce->mbce", K0, u,
                    precision="highest") * w12
    t1 = jnp.einsum("nb,abce->ance", K1, u,
                    precision="highest") * w02
    t2 = jnp.einsum("kc,abce->abke", K2, u,
                    precision="highest") * w01
    s = aT.astype(uT.dtype)
    v = s[0] * t0.reshape(n_loc, -1) + s[3] * t1.reshape(n_loc, -1) \
        + s[5] * t2.reshape(n_loc, -1)
    return v


def laplacian_apply_local_3d_affine(ue, a, W3, D0, D1, D2):
    """Affine-mesh local 3D weak Laplacian.

    For affine hexes every factor field is the quadrature weight grid
    scaled per element (``G_i(e) = a_i(e) * W3``,
    :func:`affine_factorization` with 6 packed components), so the apply
    never streams the six (E, *shape) factor slabs from HBM — at p=8
    they are 6 of the ~8 HBM passes of the general 3D apply.  ``a``:
    (E, 6) scales; ``W3``: (p0, p1, p2) weight grid.
    """
    u0, u1, u2 = grad_3d(ue, D0, D1, D2)
    s = a.reshape(a.shape[:2] + (1, 1, 1)).astype(ue.dtype)
    w = W3.astype(ue.dtype)
    f0 = w * (s[:, 0] * u0 + s[:, 1] * u1 + s[:, 2] * u2)
    f1 = w * (s[:, 1] * u0 + s[:, 3] * u1 + s[:, 4] * u2)
    f2 = w * (s[:, 2] * u0 + s[:, 4] * u1 + s[:, 5] * u2)
    return grad_transpose_3d(f0, f1, f2, D0, D1, D2)


def laplacian_apply_3d(u, gather_nodes, G, D0, D1, D2, n_nodes):
    """Global matrix-free 3D weak Laplacian."""
    ue = u[gather_nodes].reshape((-1,) + G.shape[-3:])
    ve = laplacian_apply_local_3d(ue, G, D0, D1, D2)
    return scatter_add(ve, gather_nodes, n_nodes)


def laplacian_diag_local_host_3d(G, D0, D1, D2):
    """Numpy host diagonal of the local 3D weak Laplacian."""
    import numpy as np

    G = np.asarray(G)
    D0, D1, D2 = (np.asarray(D) for D in (D0, D1, D2))
    d = np.einsum("emqr,mp->epqr", G[:, 0], D0**2)
    d += np.einsum("epnr,nq->epqr", G[:, 3], D1**2)
    d += np.einsum("epqk,kr->epqr", G[:, 5], D2**2)
    dd0 = np.diag(D0)[:, None, None]
    dd1 = np.diag(D1)[None, :, None]
    dd2 = np.diag(D2)[None, None, :]
    d += 2.0 * G[:, 1] * dd0 * dd1
    d += 2.0 * G[:, 2] * dd0 * dd2
    d += 2.0 * G[:, 4] * dd1 * dd2
    return d


def mass_apply_local(ue, detJxW):
    """Local weak identity (mass) operator on the GLL-collocated rule:
    diagonal, M_e u_e = detJxW * u_e (reference ``Me`` KroneckerArray,
    ``examples/squirmer-axisymmetric.py:253-254``)."""
    return detJxW * ue


def masked(u, free_mask):
    """Zero entries not in the free set (Dirichlet elimination helper)."""
    return jnp.where(free_mask, u, 0.0)


def make_poisson_operator(gather_nodes, G, D0, D1, n_nodes, free_mask):
    """Return jitted ``A(u)`` = weak Laplacian restricted to free DOFs.

    Dirichlet DOFs are eliminated symmetrically: input entries on the
    boundary are zeroed, and output rows on the boundary are zeroed, so the
    operator acts as [A_ff 0; 0 0] — CG then solves A_ff u_f = r_f.

    The returned callable is not itself jitted: it is traced inside the
    (jitted) Krylov loop, avoiding a second compilation.
    """

    def apply(u):
        u = masked(u, free_mask)
        v = laplacian_apply(u, gather_nodes, G, D0, D1, n_nodes)
        return masked(v, free_mask)

    return apply


def make_stacked_derivative(D0, D1):
    """Dhat (2n, n): both directional nodal derivatives as ONE shared matrix.

    Dhat = [D0 (x) I; I (x) D1] so that (Dhat @ u_flat) stacks [ur; us].
    At moderate p this turns the element apply into two large
    ``(E, n) @ (n, 2n)`` matmuls — MXU-shaped (K = n = (p+1)^2 = 81 at
    p=8) instead of the K=p+1=9 contractions of the per-axis form.  ~4.5x
    more raw FLOPs, but the apply is HBM-bound on TPU so wall-clock wins;
    see bench.py.
    """
    import numpy as np

    n0, n1 = D0.shape[0], D1.shape[0]
    Dr = np.kron(np.asarray(D0), np.eye(n1, dtype=np.asarray(D0).dtype))
    Ds = np.kron(np.eye(n0, dtype=np.asarray(D1).dtype), np.asarray(D1))
    return np.concatenate([Dr, Ds], axis=0)


def laplacian_apply_fused(u, gather_nodes, Gf, Dhat, n_nodes):
    """Matrix-free weak Laplacian via the stacked derivative matrix.

    ``Gf``: (E, 3, n) flattened geometric factors [G00, G01, G11];
    ``Dhat``: (2n, n) from :func:`make_stacked_derivative`.
    Numerically identical to :func:`laplacian_apply` (same quadrature),
    different matmul shapes.
    """
    n = Dhat.shape[1]
    ue = u[gather_nodes.reshape(-1)].reshape(-1, n)     # (E, n)
    grads = jnp.einsum("en,mn->em", ue, Dhat,
                       precision="highest")             # (E, 2n)
    ur, us = grads[:, :n], grads[:, n:]
    fr = Gf[:, 0] * ur + Gf[:, 1] * us
    fs = Gf[:, 1] * ur + Gf[:, 2] * us
    flux = jnp.concatenate([fr, fs], axis=1)            # (E, 2n)
    ve = jnp.einsum("em,mn->en", flux, Dhat, precision="highest")
    return jnp.zeros(n_nodes, dtype=u.dtype).at[
        gather_nodes.reshape(-1)
    ].add(ve.reshape(-1))


def affine_factorization(Gf, W, rel_tol: float | None = None):
    """Rank-1 factorization ``G_i(e) = a_i(e) * W`` of geometric factors.

    For affine cells (parallelograms: constant Jacobian) each factor field
    is exactly the quadrature weight grid scaled per element; the apply
    then never reads the (E, 3, n) factor arrays from HBM (~40% of its
    traffic at p=8).  Returns ``(a (E, 3), exact: bool)`` where ``exact``
    is True when every element satisfies the factorization to ``rel_tol``.
    """
    import numpy as np

    Gf = np.asarray(Gf)
    if rel_tol is None:
        # floor at 1e-12: high-aspect fine meshes (e.g. 80 x 1280 cells)
        # accumulate ~3x 100*eps of f64 rounding through the fused-GEMM
        # geometry pipeline while genuinely curved meshes sit at 1e-3+
        # relative — a 6.7e-14 residual must not silently disable the
        # whole affine family (it cost config-5 its exact coarse solve)
        rel_tol = max(100 * np.finfo(Gf.dtype).eps, 1e-12)
    W = np.asarray(W).reshape(-1)
    sumWW = float(W @ W)
    a = Gf @ W / sumWW                       # (E, 3) least-squares scales
    resid = Gf - a[..., None] * W
    scale = np.abs(Gf).max() + 1e-300
    exact = bool(np.abs(resid).max() <= rel_tol * scale)
    return a, exact


def make_affine_element_matrices(Dhat, W, order=None):
    """Assembled reference-element stiffness blocks for affine meshes.

    For an affine cell the local weak Laplacian collapses to
    ``A_e = a0(e) K0 + a1(e) K1 + a2(e) K2`` with three FIXED (n, n)
    matrices ``K0 = Dr^T diag(W) Dr``, ``K1 = Dr^T W Ds + Ds^T W Dr``,
    ``K2 = Ds^T diag(W) Ds`` and the per-element scales from
    :func:`affine_factorization`.  One (E, n) @ (n, 3n) matmul replaces
    the grad -> weight -> grad^T two-dot pipeline: ~25% fewer FLOPs and
    one less (E, 2n) HBM round-trip.

    Returns ``Kcat`` of shape (n, 3n) = [K0 | K1 | K2] (symmetric blocks),
    rows/columns permuted by ``order`` if given (L-vector node order).
    Built in float64 regardless of input dtype; cast at use site.
    """
    import numpy as np

    Dhat = np.asarray(Dhat, dtype=np.float64)
    W = np.asarray(W, dtype=np.float64).reshape(-1)
    n = Dhat.shape[1]
    Dr, Ds = Dhat[:n], Dhat[n:]
    WDr, WDs = W[:, None] * Dr, W[:, None] * Ds
    K0 = Dr.T @ WDr
    K1 = Dr.T @ WDs + Ds.T @ WDr
    K2 = Ds.T @ WDs
    if order is not None:
        ix = np.ix_(order, order)
        K0, K1, K2 = K0[ix], K1[ix], K2[ix]
    return np.concatenate([K0, K1, K2], axis=1)


def _pad_factors_to_exchange(Gf, exchange):
    """Zero-pad (E_real, ...) per-element factors to the exchange's padded
    element count.  Pad rows are inert (zero factors -> zero local
    contributions; the exchange's masks/weights already exclude them) —
    without this, operators built against a padded exchange read
    short arrays, which on the Pallas path is an out-of-bounds DMA
    (observed as a fatal TPU runtime abort on v5e)."""
    import numpy as np

    E_ex = exchange.E
    if int(Gf.shape[0]) == E_ex:
        return Gf
    if int(Gf.shape[0]) > E_ex:
        raise ValueError(
            f"factors have {Gf.shape[0]} rows > exchange E={E_ex}")
    pad = [(0, E_ex - int(Gf.shape[0]))] + [(0, 0)] * (Gf.ndim - 1)
    if isinstance(Gf, np.ndarray):
        return np.pad(Gf, pad)
    return jnp.pad(jnp.asarray(Gf), pad)


def make_local_laplacian_operator(exchange, Gf, Dhat, free_local=None,
                                  backend: str = "auto",
                                  precision: str = "highest",
                                  compute_dtype=None,
                                  structure: str = "auto",
                                  vector_layout: str = "en",
                                  assume_masked_input: bool = False,
                                  fused_target_win: int | None = None):
    """Weak Laplacian acting on hierarchical L-vectors (E, n).

    The production TPU formulation: no global vector in the loop —
    two large MXU matmuls (via ``Dhat`` with columns permuted into the
    hierarchical order) + pointwise geometric factors + structured DSS
    exchange (:class:`..ops.exchange.LocalExchange`).

    ``Gf``: (E, 3, n) lex-flattened geometric factors. ``free_local``:
    optional (E, n) bool mask for symmetric Dirichlet elimination.
    ``backend``: 'auto' (fused Pallas kernel on TPU, XLA einsums
    elsewhere), 'pallas', 'pallas-interpret' (CPU testing), or 'xla'.
    ``precision``: XLA dot precision for the derivative matmuls —
    'highest' (6-pass f32 emulation, reference-grade), 'high' (3-pass),
    or 'default' (fastest; bf16 inputs on the MXU, ~3 digits).
    ``compute_dtype``: optional reduced dtype (e.g. ``jnp.bfloat16``) for
    the matmul inputs; accumulation stays float32 and the result is cast
    back to the vector dtype.  Halves matmul HBM traffic and uses
    single-pass MXU — for preconditioner applies and tolerance-limited
    solves.
    ``structure``: 'auto' detects all-affine meshes and uses the rank-1
    compressed factors (:func:`affine_factorization`); 'general' forces
    the full (E, 3, n) factor read; 'affine' requires affinity.
    ``vector_layout``: 'en' operates on (E, n) L-vectors; 'ne' on
    transposed (n, E) storage — elements in lanes, which cuts the f32
    lane padding from 81->128 to a 9% sublane pad at p=8 and turns the
    affine apply into accumulating (n, n) @ (n, E) matmuls (~1.4x faster
    apply+DSS on v5e).  ``free_local`` must be given in the same layout.
    ``assume_masked_input=True`` skips the input Dirichlet mask pass
    (a full extra HBM round-trip per apply): valid whenever every input
    already satisfies the mask — true by induction for CG iterates when
    the preconditioner masks its output and x0 is masked.
    """
    import numpy as np

    Gf = _pad_factors_to_exchange(Gf, exchange)
    if vector_layout == "ne":
        return _make_local_laplacian_operator_T(
            exchange, Gf, Dhat, free_local, backend=backend,
            precision=precision, compute_dtype=compute_dtype,
            structure=structure, assume_masked_input=assume_masked_input,
            fused_target_win=fused_target_win)
    if vector_layout != "en":
        raise ValueError(f"unknown vector_layout {vector_layout!r}")

    # operate in Gf's dtype (Dhat often arrives float64 from numpy setup)
    Dhat_h = jnp.asarray(np.asarray(Dhat)[:, exchange.hier],
                         dtype=Gf.dtype)
    n = Dhat_h.shape[1]

    affine_a = None
    if structure in ("auto", "affine"):
        Wgrid = exchange.disc.basis.weight_grid().reshape(-1)  # lex order
        a, exact = affine_factorization(np.asarray(Gf), Wgrid)
        if exact:
            dt = jnp.dtype(Gf.dtype)
            affine_a = (jnp.asarray(a, dtype=dt),
                        jnp.asarray(Wgrid, dtype=dt))
        elif structure == "affine":
            raise ValueError("mesh is not affine but structure='affine'")

    if backend == "auto":
        # Measured on v5e (p=8, 100k elements): the Pallas kernel wins in
        # isolation (0.58 vs 0.80 ms) but composing it with the DSS
        # exchange forces layout copies at the pallas_call boundary
        # (7.9 ms total vs 0.93 ms for pure-XLA apply+dss, which fuses
        # end to end).  Until the kernel absorbs the exchange, auto = XLA;
        # 'pallas' remains available explicitly.
        backend = "xla"

    if backend in ("pallas", "pallas-interpret"):
        from . import pallas_kernels

        Gf_d = jnp.asarray(Gf)
        g0, g1, g2 = Gf_d[:, 0], Gf_d[:, 1], Gf_d[:, 2]
        interp = backend == "pallas-interpret"

        def local_apply(uL):
            return pallas_kernels.fused_laplacian_local(
                uL, g0, g1, g2, Dhat_h, interpret=interp
            )
    elif backend == "xla" and affine_a is not None:
        # assembled-K form: out = a0 (u K0) + a1 (u K1) + a2 (u K2) with
        # one (E, n) @ (n, 3n) matmul (K blocks are symmetric, fixed).
        a_d, _ = affine_a
        a0, a1, a2 = a_d[:, 0:1], a_d[:, 1:2], a_d[:, 2:3]   # (E, 1)
        Kcat = make_affine_element_matrices(
            np.asarray(Dhat), exchange.disc.basis.weight_grid(),
            order=exchange.hier)
        Kcat_d = jnp.asarray(Kcat, dtype=Gf.dtype)
        if compute_dtype is not None:
            import jax

            cd = jnp.dtype(compute_dtype)
            Kcat_b = Kcat_d.astype(cd)

            def local_apply(uL):
                out_dtype = uL.dtype
                V = jax.lax.dot_general(
                    uL.astype(cd), Kcat_b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                            # (E, 3n) f32
                return (a0 * V[:, :n] + a1 * V[:, n:2 * n]
                        + a2 * V[:, 2 * n:]).astype(out_dtype)
        else:
            def local_apply(uL):
                V = jnp.einsum("en,nm->em", uL, Kcat_d,
                               precision=precision)          # (E, 3n)
                return (a0 * V[:, :n] + a1 * V[:, n:2 * n]
                        + a2 * V[:, 2 * n:])
    elif backend == "xla":
        if compute_dtype is not None:
            import jax

            cd = jnp.dtype(compute_dtype)
            Dhat_b = Dhat_h.astype(cd)
            g0 = jnp.asarray(Gf)[:, 0].astype(cd)
            g1 = jnp.asarray(Gf)[:, 1].astype(cd)
            g2 = jnp.asarray(Gf)[:, 2].astype(cd)

            def local_apply(uL):
                out_dtype = uL.dtype
                ub = uL.astype(cd)
                grads = jax.lax.dot_general(
                    ub, Dhat_b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                         # (E, 2n) f32
                ur, us = grads[:, :n], grads[:, n:]
                fr = (g0 * ur + g1 * us).astype(cd)
                fs = (g1 * ur + g2 * us).astype(cd)
                flux = jnp.concatenate([fr, fs], axis=1)
                return jax.lax.dot_general(
                    flux, Dhat_b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(out_dtype)
        else:
            def local_apply(uL):
                grads = jnp.einsum("en,mn->em", uL, Dhat_h,
                                   precision=precision)  # (E, 2n) lex rows
                ur, us = grads[:, :n], grads[:, n:]
                fr = Gf[:, 0] * ur + Gf[:, 1] * us
                fs = Gf[:, 1] * ur + Gf[:, 2] * us
                flux = jnp.concatenate([fr, fs], axis=1)
                return jnp.einsum("em,mn->en", flux, Dhat_h,
                                  precision=precision)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    def apply(uL):
        if free_local is not None:
            uL = jnp.where(free_local, uL, 0.0)
        ve = local_apply(uL)
        ve = exchange.dss(ve)
        if free_local is not None:
            ve = jnp.where(free_local, ve, 0.0)
        return ve

    # auto-policy introspection (tests/test_auto_policy.py)
    apply._structure = "affine" if affine_a is not None else "general"
    apply._backend = backend
    return apply


def _make_local_laplacian_operator_T(exchange, Gf, Dhat, free_local=None,
                                     backend: str = "auto",
                                     precision: str = "highest",
                                     compute_dtype=None,
                                     structure: str = "auto",
                                     assume_masked_input: bool = False,
                                     fused_target_win: int | None = None):
    """Transposed (n, E) variant of :func:`make_local_laplacian_operator`.

    Affine meshes: ``S = sum_c Kc @ (a_c * u)`` — the assembled per-term
    element matrices ``Kc`` are symmetric, so the transposed apply is three
    accumulating ``(n, n) @ (n, E)`` matmuls with the per-element affine
    scalars fused into the operand; on TPU the matmuls AND the roll-class
    DSS fuse into one Pallas kernel when the exchange structure admits it
    (:func:`..ops.pallas_kernels.make_fused_affine_laplacian_T` — measured
    0.30 vs 0.40 ms at p=8 / 100k elements f32 ``highest`` on v5e).
    General meshes: left-applied stacked derivative XLA matmuls with
    (3, n, E) geometric factors.

    ``backend``: 'auto' (fused Pallas kernel when admissible, else XLA),
    'fused' (require the fused kernel), 'fused-interpret' (CPU testing),
    or 'xla'.
    """
    import jax
    import numpy as np

    dt = jnp.dtype(Gf.dtype)
    Dhat_h = jnp.asarray(np.asarray(Dhat)[:, exchange.hier], dtype=dt)
    n = Dhat_h.shape[1]

    affine_a = None
    if structure in ("auto", "affine"):
        Wgrid = exchange.disc.basis.weight_grid().reshape(-1)
        a, exact = affine_factorization(np.asarray(Gf), Wgrid)
        if exact:
            affine_a = a
        elif structure == "affine":
            raise ValueError("mesh is not affine but structure='affine'")

    if backend in ("fused", "fused-interpret", "auto"):
        from . import pallas_kernels

        fused_ok = (
            compute_dtype is None
            and precision in ("highest", "high", "default")
            and dt == jnp.float32
            and exchange.layout == "edges-first"
            and hasattr(exchange, "edge_classes")
            and not (exchange.n_edge_tail or exchange.n_vert_tail)
        )
        if backend == "auto":
            fused_ok = fused_ok and pallas_kernels.supported()
        if backend != "auto":
            # the fused kernels compute in f32; an explicit request with
            # f64 factors or a compute_dtype override would silently
            # return f64-typed output with only f32 accuracy
            if dt != jnp.float32:
                raise ValueError(
                    f"fused-T backend requires float32 factors, got {dt}")
            if compute_dtype is not None:
                raise ValueError(
                    "fused-T backend does not support compute_dtype "
                    f"overrides (got {compute_dtype}); use precision=")
        if fused_ok or backend != "auto":
            try:
                win_kw = ({} if fused_target_win is None
                          else {"target_win": int(fused_target_win)})
                if affine_a is not None:
                    Kcat = make_affine_element_matrices(
                        np.asarray(Dhat), Wgrid, order=exchange.hier)
                    local_dss = pallas_kernels.make_fused_affine_laplacian_T(
                        exchange, Kcat, affine_a, precision=precision,
                        interpret=backend == "fused-interpret", **win_kw)
                else:
                    # curved/general meshes: the full-factor fused kernel
                    # — measured 0.453 vs 0.712 ms XLA (1.57x) at
                    # p=8/100k f32 `highest` on v5e.  Full halo only (no
                    # far split): on 'auto', fall back to XLA when the
                    # achievable window is degenerate (halo redundancy
                    # 2*Hb/TE > 0.75, the empirical loss regime)
                    local_dss = pallas_kernels.make_fused_general_laplacian_T(
                        exchange, Gf, Dhat, precision=precision,
                        interpret=backend == "fused-interpret", **win_kw)
                    prep_g = local_dss._prep
                    if (backend == "auto"
                            and 2 * prep_g.Hb / prep_g.TE > 0.75):
                        raise ValueError(
                            f"degenerate general-fused window "
                            f"(TE={prep_g.TE}, Hb={prep_g.Hb})")
            except ValueError:
                if backend != "auto":   # explicit request: surface it
                    raise
            else:
                def apply_fused(uT):
                    if free_local is not None and not assume_masked_input:
                        uT = jnp.where(free_local, uT, 0.0)
                    vT = local_dss(uT)
                    if free_local is not None:
                        vT = jnp.where(free_local, vT, 0.0)
                    return vT

                # keep kernel operands as inline literals when callers
                # hoist closures (see utils.hoist.hoist_closure)
                apply_fused._no_hoist = True
                apply_fused._kernel = local_dss   # introspection (bench)
                apply_fused._structure = (
                    "affine" if affine_a is not None else "general")
                apply_fused._backend = "fused"
                return apply_fused
    elif backend != "xla":
        raise ValueError(f"unknown backend {backend!r}")

    if affine_a is not None:
        Kcat = make_affine_element_matrices(
            np.asarray(Dhat), exchange.disc.basis.weight_grid(),
            order=exchange.hier)
        Ks = [jnp.asarray(Kcat[:, c * n:(c + 1) * n], dtype=dt)
              for c in range(3)]
        aT = jnp.asarray(np.ascontiguousarray(np.asarray(affine_a).T),
                         dtype=dt)                      # (3, E)
        if compute_dtype is not None:
            cd = jnp.dtype(compute_dtype)
            Ks_c = [K.astype(cd) for K in Ks]

            def local_apply(uT):
                out_dtype = uT.dtype
                S = None
                for c in range(3):
                    X = (uT * aT[c]).astype(cd)
                    T = jax.lax.dot_general(
                        Ks_c[c], X, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    S = T if S is None else S + T
                return S.astype(out_dtype)
        else:
            def local_apply(uT):
                S = None
                for c in range(3):
                    T = jnp.einsum("nm,me->ne", Ks[c], uT * aT[c],
                                   precision=precision)
                    S = T if S is None else S + T
                return S
    else:
        # general path: gT[c] = (n, E) factor slabs
        Gf_np = np.asarray(Gf)                          # (E, 3, n)
        gT = jnp.asarray(
            np.ascontiguousarray(Gf_np.transpose(1, 2, 0)), dtype=dt)
        if compute_dtype is not None:
            cd = jnp.dtype(compute_dtype)
            Dhat_c = Dhat_h.astype(cd)

            def local_apply(uT):
                out_dtype = uT.dtype
                grads = jax.lax.dot_general(
                    Dhat_c, uT.astype(cd), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (2n, E) f32
                ur, us = grads[:n], grads[n:]
                fr = (gT[0] * ur + gT[1] * us).astype(cd)
                fs = (gT[1] * ur + gT[2] * us).astype(cd)
                flux = jnp.concatenate([fr, fs], axis=0)
                return jax.lax.dot_general(
                    Dhat_c, flux, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(out_dtype)
        else:
            def local_apply(uT):
                grads = jnp.einsum("mn,ne->me", Dhat_h, uT,
                                   precision=precision)  # (2n, E)
                ur, us = grads[:n], grads[n:]
                fr = gT[0] * ur + gT[1] * us
                fs = gT[1] * ur + gT[2] * us
                flux = jnp.concatenate([fr, fs], axis=0)
                return jnp.einsum("mn,me->ne", Dhat_h, flux,
                                  precision=precision)

    def apply(uT):
        if free_local is not None and not assume_masked_input:
            uT = jnp.where(free_local, uT, 0.0)
        vT = local_apply(uT)
        vT = exchange.dss_T(vT)
        if free_local is not None:
            vT = jnp.where(free_local, vT, 0.0)
        return vT

    # auto-policy introspection (tests/test_auto_policy.py)
    apply._structure = "affine" if affine_a is not None else "general"
    apply._backend = "xla"
    return apply


def _chunked_batched_apply(f_chunk, f_rem, n_rhs, chunk, n, E):
    """Apply a batched kernel in chunks of ``chunk`` RHS (+ a remainder
    kernel): sequential launches inside one jit keep each kernel's VMEM
    lane window large (see the measured policy note at the call site).
    Acts on the same (n_rhs*n, E) sublane-stacked array as a whole-batch
    kernel."""
    n_full = n_rhs // chunk

    def apply(U):
        if U.shape != (n_rhs * n, E):
            raise ValueError(
                f"expected ({n_rhs * n}, {E}) sublane-stacked input "
                f"(n_rhs={n_rhs}), got {U.shape}")
        outs = [f_chunk(U[c * chunk * n:(c + 1) * chunk * n])
                for c in range(n_full)]
        if f_rem is not None:
            outs.append(f_rem(U[n_full * chunk * n:]))
        return jnp.concatenate(outs, axis=0)

    apply._prep = f_chunk._prep
    apply._n_rhs = n_rhs
    apply._chunk = chunk
    apply._no_hoist = True
    return apply


def make_multi_rhs_laplacian_T(exchange, Gf, Dhat, n_rhs: int,
                               free_local=None,
                               backend: str = "auto",
                               precision: str = "highest",
                               compute_dtype=None,
                               structure: str = "general",
                               assume_masked_input: bool = False):
    """Batched-RHS transposed weak Laplacian: (k, n, E) -> (k, n, E).

    All ``n_rhs`` right-hand sides ride one operator read: on general
    (curved) meshes the (3, n, E) geometric-factor slabs are ~60% of the
    apply's HBM traffic, and the fused kernel
    (:func:`..ops.pallas_kernels.make_fused_general_laplacian_T`) streams
    them once per element tile for all k sublane-stacked RHS — per-RHS
    traffic ~(2 + 3/k) passes instead of ~5 (plus the XLA path's grads/
    flux materialization).  Multi-RHS batches arise from multi-field
    problems (dpn > 1 vector operators) and batched solves
    (:func:`..solver.cg.cg_batched`).  Net-new vs the reference (serial
    per-element, one RHS: ``sem/discrete.py:502-528``).

    ``backend``: 'auto' (fused kernel when admissible on TPU, else XLA
    vmap), 'fused', 'fused-interpret', or 'xla'.  ``structure``: 'auto'
    detects affine meshes and routes them through the batched AFFINE
    fused kernel (``make_fused_affine_laplacian_T(n_rhs=k)`` — shared
    mask/affine streams, one launch per tile for the whole batch);
    'general' forces the full-factor kernel, 'affine' requires an affine
    mesh.  ``free_local``: optional (n, E) mask applied per RHS.
    """
    import jax

    from . import pallas_kernels

    Gf = _pad_factors_to_exchange(Gf, exchange)
    n = exchange.n_loc
    E = exchange.E
    dt = jnp.dtype(Gf.dtype)

    fused = None
    if compute_dtype is not None:
        # reduced matmul-input dtype is an XLA-path knob (the fused
        # kernel manages precision itself); route through the vmapped
        # single-RHS operator
        if backend in ("fused", "fused-interpret"):
            raise ValueError("fused backends do not support "
                             f"compute_dtype (got {compute_dtype})")
        backend = "xla"
    if backend in ("auto", "fused", "fused-interpret"):
        import numpy as np

        affine_a = None
        if structure in ("auto", "affine"):
            Wgrid = exchange.disc.basis.weight_grid().reshape(-1)
            a, exact = affine_factorization(np.asarray(Gf), Wgrid)
            if exact:
                affine_a = a
            elif structure == "affine":
                raise ValueError("mesh is not affine but "
                                 "structure='affine'")
        affine = affine_a is not None
        want = backend != "auto" or (dt == jnp.float32
                                     and pallas_kernels.supported())
        if backend != "auto" and dt != jnp.float32:
            raise ValueError(
                f"fused backend requires float32 factors, got {dt}")
        if want:
            try:
                if affine:
                    # chunk the batch at k=2 for the multi-pass dot
                    # precisions: the k-fold-shrunk VMEM window inflates
                    # the halo-window MXU work faster than the shared
                    # mask/affine streams amortize (measured at p=8/100k
                    # `highest`: 0.33 ms/RHS at k=2 vs 0.46 at k=4, 0.54
                    # at k=8, 0.91 vmapped-XLA; at `default` the dots are
                    # single-pass and whole-batch streaming wins: 0.28 at
                    # k=8 — scripts/measure_batched_affine.py)
                    chunk = (2 if precision in ("highest", "high")
                             and n_rhs > 2 else n_rhs)
                    Kcat = make_affine_element_matrices(
                        np.asarray(Dhat), Wgrid, order=exchange.hier)
                    mk = pallas_kernels.make_fused_affine_laplacian_T
                    fused = mk(exchange, Kcat, affine_a, n_rhs=chunk,
                               precision=precision,
                               interpret=backend == "fused-interpret")
                    if chunk != n_rhs:
                        rem = n_rhs % chunk
                        f_rem = (mk(exchange, Kcat, affine_a, n_rhs=rem,
                                    precision=precision,
                                    interpret=backend
                                    == "fused-interpret")
                                 if rem else None)
                        fused = _chunked_batched_apply(
                            fused, f_rem, n_rhs, chunk, n, E)
                else:
                    fused = pallas_kernels.make_fused_general_laplacian_T(
                        exchange, Gf, Dhat, n_rhs=n_rhs,
                        precision=precision,
                        interpret=backend == "fused-interpret")
                prep_f = fused._prep
                if (backend == "auto" and n_rhs > 1
                        and 2 * prep_f.Hb / prep_f.TE > 0.75):
                    # batched kernels are full-halo only; when the
                    # k-fold-shrunk VMEM window leaves the halo
                    # redundancy in the measured loss regime, the
                    # vmapped XLA path wins (use panel element order
                    # to shrink the halo instead)
                    raise ValueError(
                        f"degenerate batched-fused window "
                        f"(TE={prep_f.TE}, Hb={prep_f.Hb})")
            except ValueError:
                fused = None
                if backend != "auto":
                    raise
    elif backend != "xla":
        raise ValueError(f"unknown backend {backend!r}")

    if fused is not None:
        def apply(U):
            if U.shape != (n_rhs, n, E):
                raise ValueError(f"expected ({n_rhs}, {n}, {E}) batched "
                                 f"L-vectors, got {U.shape}")
            if free_local is not None and not assume_masked_input:
                U = jnp.where(free_local, U, 0.0)
            V = fused(U.reshape(n_rhs * n, E)).reshape(n_rhs, n, E)
            if free_local is not None:
                V = jnp.where(free_local, V, 0.0)
            return V

        apply._no_hoist = True
        apply._fused = fused
        return apply

    one = _make_local_laplacian_operator_T(
        exchange, Gf, Dhat, free_local, backend="xla",
        precision=precision, compute_dtype=compute_dtype,
        structure=structure, assume_masked_input=assume_masked_input)
    return jax.vmap(one)


def element_apply_flops(E: int, p0: int, p1: int) -> int:
    """FLOPs of one batched Laplacian element apply (matmuls + pointwise)."""
    matmul = 2 * E * (2 * p0 * p0 * p1 + 2 * p0 * p1 * p1)
    pointwise = 6 * E * p0 * p1
    return matmul + pointwise
