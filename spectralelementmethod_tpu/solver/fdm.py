"""Fast-diagonalization (FDM) additive-Schwarz preconditioner.

The reference preconditions nothing — it uses a sparse direct solve on the
statically-condensed system (``sem/discrete.py:502-528``).  The TPU-native
replacement for that direct solve is matrix-free CG, and the classical SEM
preconditioner for it is element-local fast diagonalization (Lottes &
Fischer 2005 overlapping-Schwarz / Nek5000 lineage):

* per element, approximate the weak Laplacian by a **separable** surrogate
  ``A_e ≈ a0_e (K ⊗ M) + a1_e (M ⊗ K)`` with the reference 1D GLL
  stiffness ``K = D^T diag(w) D`` and (lumped) mass ``M = diag(w)``, and
  per-element strength coefficients ``a0 = sum(G00)/sum(W)``,
  ``a1 = sum(G11)/sum(W)`` (exact for affine axis-aligned cells);
* one host-side generalized eigendecomposition ``K S = M S Λ``
  (B-orthonormal, (p+1)x(p+1)) diagonalizes every element's surrogate;
* the element solve is then two small shared matmuls and an elementwise
  scale: ``A_e^{-1} r = (S ⊗ S) [ (S^T ⊗ S^T) r / (a0 λ_i + a1 λ_j) ]``.

On L-vectors the whole preconditioner is two `(E, n) @ (n, n)` MXU matmuls
(the hierarchical<->lexicographic node permutations are *folded into* the
dense transform matrices, so no gathers appear anywhere) plus the
multiplicity-weighted DSS average that makes the additive Schwarz sum
symmetric (weighted RAS: ``M = sum_e R_e^T W A_e^{-1} W R_e``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def gll_fdm_eig(nodes: np.ndarray, weights: np.ndarray, D1: np.ndarray):
    """B-orthonormal eigenpairs of the 1D GLL stiffness/mass pencil.

    Returns ``(lam (p1,), S (p1, p1))`` with ``K S = diag(w) S diag(lam)``
    and ``S^T diag(w) S = I``.
    """
    import scipy.linalg as sla

    w = np.asarray(weights, dtype=np.float64)
    K = np.asarray(D1, dtype=np.float64).T @ np.diag(w) @ np.asarray(
        D1, dtype=np.float64)
    K = 0.5 * (K + K.T)
    lam, S = sla.eigh(K, np.diag(w))
    return lam, S


def make_fdm_preconditioner(exchange, G, basis, free_local=None,
                            dtype=np.float32, shift_rel: float = 1e-8,
                            vector_layout: str = "en"):
    """Weighted additive-Schwarz FDM preconditioner on L-vectors.

    Parameters
    ----------
    exchange : LocalExchange / RollExchange
        Provides the hierarchical node order, multiplicity weights and dss.
    G : (E, 3, p1, p1) or (E, 3, n) geometric factors [G00, G01, G11].
    basis : TensorProductQS (square shape).
    free_local : optional (E, n) bool mask (Dirichlet elimination) in the
        same layout as the vectors.
    shift_rel : relative clamp for the singular constant-mode eigenvalue.
    vector_layout : 'en' for (E, n) L-vectors, 'ne' for transposed (n, E)
        storage (the production layout — elements in lanes; the two dense
        transforms become left matmuls and the exchange uses dss_T).

    Returns ``M(r)`` mapping a consistent hierarchical L-vector residual to
    the preconditioned residual (symmetric positive definite).

    Measured on Poisson p=8 (16x16 elements): 287 CG iterations to 1e-10
    vs 772 with point-Jacobi, at ~half an operator apply per M apply.
    (A coarse vertex solve / overlapping extension would cut further —
    tracked as future work.)
    """
    b0 = basis.subbases[0]
    p1 = b0.n_nodes
    n = p1 * p1
    E = exchange.E

    lam, S = gll_fdm_eig(b0.nodes, b0.quad_wts, b0.D1)

    # per-element separable strengths (pad rows -> 1: inert, invertible)
    Gf = np.asarray(G, dtype=np.float64).reshape(np.asarray(G).shape[0],
                                                 3, -1)
    sumW = float(np.sum(np.asarray(basis.weight_grid())))
    a0 = np.ones(E)
    a1 = np.ones(E)
    a0[:Gf.shape[0]] = Gf[:, 0, :].sum(axis=1) / sumW
    a1[:Gf.shape[0]] = Gf[:, 2, :].sum(axis=1) / sumW

    # eigenvalue grid; each element's singular constant mode (lam=0 twice)
    # gets the smallest *positive* eigenvalue instead — clamping it tiny
    # (huge inverse) was measured to destroy the preconditioner (828 its),
    # while this choice reaches 287
    Dgrid = a0[:, None, None] * lam[:, None] + a1[:, None, None] * lam[None, :]
    flat = Dgrid.reshape(E, n)
    pos_min = np.where(flat > shift_rel * flat.max(axis=1, keepdims=True),
                       flat, np.inf).min(axis=1, keepdims=True)
    invD = np.where(
        flat > shift_rel * flat.max(axis=1, keepdims=True),
        1.0 / np.maximum(flat, 1e-300), 1.0 / pos_min,
    )

    # dense transforms with the hierarchical<->lex permutation folded in:
    #   fwd[:, h] : hier L-vector -> eigen coefficients
    #   bwd[h, :] : eigen coefficients -> hier L-vector
    hier = exchange.hier
    fwd = np.kron(S.T, S.T)            # (n_eig, n_lex)
    fwd = fwd[:, hier]                 # accept hier input
    bwd = np.kron(S, S)[hier, :]       # produce hier output

    if vector_layout == "en":
        fwd_d = jnp.asarray(fwd.T.copy(), dtype=dtype)  # (n_hier, n_eig)
        bwd_d = jnp.asarray(bwd.T.copy(), dtype=dtype)  # (n_eig, n_hier)
        invD_d = jnp.asarray(invD, dtype=dtype)
        w_d = exchange.weights.astype(dtype)

        def M(r):
            if free_local is not None:
                r = jnp.where(free_local, r, 0.0)
            t = (r * w_d) @ fwd_d              # (E, n) eigen coords
            t = t * invD_d
            z = (t @ bwd_d) * w_d
            z = exchange.dss(z)
            if free_local is not None:
                z = jnp.where(free_local, z, 0.0)
            return z
    elif vector_layout == "ne":
        fwd_d = jnp.asarray(fwd, dtype=dtype)           # (n_eig, n_hier)
        bwd_d = jnp.asarray(bwd, dtype=dtype)           # (n_hier, n_eig)
        invD_T = jnp.asarray(np.ascontiguousarray(invD.T), dtype=dtype)
        w_T = jnp.asarray(
            np.ascontiguousarray(np.asarray(exchange.weights).T),
            dtype=dtype)

        def M(r):
            if free_local is not None:
                r = jnp.where(free_local, r, 0.0)
            t = fwd_d @ (r * w_T)              # (n_eig, E)
            t = t * invD_T
            z = (bwd_d @ t) * w_T
            z = exchange.dss_T(z)
            if free_local is not None:
                z = jnp.where(free_local, z, 0.0)
            return z
    else:
        raise ValueError(f"unknown vector_layout {vector_layout!r}")

    return M


def make_fdm_preconditioner_3d(exchange, G, basis, free_local=None,
                               dtype=np.float64, shift_rel: float = 1e-8):
    """3D FDM additive Schwarz on lexicographic (E, n) L-vectors.

    Separable surrogate ``A_e ≈ a0 (K⊗M⊗M) + a1 (M⊗K⊗M) + a2 (M⊗M⊗K)``
    with per-element strengths from the diagonal factor slabs
    (``G``: (E, 6, *shape) packed upper triangle — indices 0/3/5).
    Unlike the 2D version, the eigen transforms are applied
    **sum-factorized** (three (p1, p1) axis matmuls each way): the dense
    Kronecker matrix would be (p1^3)^2 and cost ~13x the operator apply
    at p=8, while the factored form costs ~half an apply.  The 3D
    L-vector path stores lexicographic order, so no permutation folding
    is needed.
    """
    b0 = basis.subbases[0]
    p1 = b0.n_nodes
    shape = (p1, p1, p1)
    n = p1 ** 3
    E = exchange.E

    lam, S = gll_fdm_eig(b0.nodes, b0.quad_wts, b0.D1)

    Gf = np.asarray(G, dtype=np.float64).reshape(
        np.asarray(G).shape[0], 6, -1)
    sumW = float(np.sum(np.asarray(basis.weight_grid())))
    a = np.ones((3, E))
    for c, gi in enumerate((0, 3, 5)):
        a[c, :Gf.shape[0]] = Gf[:, gi, :].sum(axis=1) / sumW

    Dgrid = (a[0][:, None, None, None] * lam[:, None, None]
             + a[1][:, None, None, None] * lam[None, :, None]
             + a[2][:, None, None, None] * lam[None, None, :])
    flat = Dgrid.reshape(E, n)
    cut = shift_rel * flat.max(axis=1, keepdims=True)
    pos_min = np.where(flat > cut, flat, np.inf).min(axis=1, keepdims=True)
    invD = np.where(flat > cut, 1.0 / np.maximum(flat, 1e-300),
                    1.0 / pos_min).reshape((E,) + shape)

    St_d = jnp.asarray(S.T, dtype=dtype)
    S_d = jnp.asarray(S, dtype=dtype)
    invD_d = jnp.asarray(invD, dtype=dtype)
    w_d = jnp.asarray(np.asarray(exchange.weights), dtype=dtype)

    def axis_transform(t, B):
        # apply B on each of the three trailing axes
        t = jnp.einsum("ia,eabc->eibc", B, t)
        t = jnp.einsum("jb,eibc->eijc", B, t)
        return jnp.einsum("kc,eijc->eijk", B, t)

    def M(r):
        if free_local is not None:
            r = jnp.where(free_local, r, 0.0)
        t = (r * w_d).reshape((E,) + shape)
        t = axis_transform(t, St_d) * invD_d
        z = axis_transform(t, S_d).reshape(E, n) * w_d
        z = exchange.dss(z)
        if free_local is not None:
            z = jnp.where(free_local, z, 0.0)
        return z

    return M
