"""Batched static condensation (Schur complement) direct solver.

TPU-native re-design of the reference's static-condensation pipeline
(``DOFManagerSC``, ``sem/discrete.py:283-528``): instead of a serial Python
loop doing one dense LAPACK solve per element plus a scipy sparse direct
solve, everything is batched over the element axis:

* per-element Schur complements via one batched ``jnp.linalg.solve`` on
  (E, n_int, n_int) blocks (MXU-friendly),
* global condensed system assembled DENSE over the exterior DOFs and
  solved with one batched LU — at spectral orders the condensed system is
  small (exterior DOFs only), so a dense MXU factorization beats a host
  sparse solve,
* interior back-substitution as a second batched solve.

Local DOF ordering convention (parity with the reference,
``sem/discrete.py:561-576``): hierarchical node order (exterior nodes
first), ``dofs_per_node`` interleaved: ``ldof = node_hier * dpn + c``.

Supports non-finite (inf/nan) entries in *constrained exterior* rows/cols,
which the axisymmetric operators produce on the symmetry axis (reference
``check_finite=False`` + comment, ``sem/discrete.py:465-468``): constrained
rows/cols are overwritten with identity before the dense solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CondensedSystem(NamedTuple):
    """Static DOF-indexing data for a batched SC solve."""

    ext_dof_gidx: np.ndarray   # (E, n_ext_ldof) global condensed-dof index
    n_ext_dofs: int            # size of the condensed global system
    n_ext_ldof: int            # exterior local dofs per element
    n_int_ldof: int            # interior local dofs per element


#: Dense condensed-system memory budget.  The global Schur system is
#: assembled DENSE — O(n_ext_dofs^2) — which is the right trade at
#: reference scale (E~1e2-1e3: one batched MXU LU beats a host sparse
#: solve) but cannot grow to large meshes: at f32, 65k exterior DOFs
#: already cost 17 GB.  2 GiB leaves room for the LU workspace on a
#: 16 GB-HBM v5e chip.
DENSE_BYTES_LIMIT = 2 << 30


def build_condensed_indexing(disc, dofs_per_node: int,
                             max_dense_bytes: int | None = None
                             ) -> CondensedSystem:
    """Exterior-DOF numbering for a Discretization.

    Exterior nodes (element-boundary nodes) are numbered consecutively by
    ascending global node id; interior nodes stay element-private.  This
    replaces the reference's exterior-first mesh renumbering
    (``_do_static_condensation``, ``sem/discrete.py:314-359``) without
    mutating the mesh.

    Raises ``ValueError`` when the dense condensed system would exceed
    ``max_dense_bytes`` (default :data:`DENSE_BYTES_LIMIT`) — at that
    scale use the matrix-free path instead (Jacobi/FDM-preconditioned
    :func:`..solver.cg.cg`, e.g. ``Poisson.solve_local``, or the
    squirmer's ``linear_solver="gmres-ir"`` which only *preconditions*
    with per-element condensation and never assembles globally).
    """
    geometry = disc.geometry
    n_ext_nodes_loc = geometry.n_exterior_nodes
    hier = geometry.hierarchical_node_order
    gather_hier = disc.gather_nodes[:, hier]
    ext_global = np.unique(gather_hier[:, :n_ext_nodes_loc])
    node_to_ext = np.full(disc.n_nodes, -1, dtype=np.int64)
    node_to_ext[ext_global] = np.arange(ext_global.size)
    ext_node_gidx = node_to_ext[gather_hier[:, :n_ext_nodes_loc]]
    assert (ext_node_gidx >= 0).all()

    dpn = dofs_per_node
    E = disc.E
    n_ext_ldof = n_ext_nodes_loc * dpn
    ext_dof_gidx = (
        ext_node_gidx[:, :, None] * dpn + np.arange(dpn)[None, None, :]
    ).reshape(E, n_ext_ldof)

    n_ext_dofs = int(ext_global.size * dpn)
    budget = DENSE_BYTES_LIMIT if max_dense_bytes is None else max_dense_bytes
    dense_bytes = n_ext_dofs * n_ext_dofs * 4        # f32 assembly
    if dense_bytes > budget:
        raise ValueError(
            f"dense condensed system needs {dense_bytes / 2**30:.1f} GiB "
            f"({n_ext_dofs} exterior DOFs squared) > budget "
            f"{budget / 2**30:.1f} GiB. Static condensation assembles "
            "O(n_ext^2) dense; at this scale use the matrix-free solvers "
            "(Poisson.solve_local CG, or squirmer linear_solver='gmres-ir') "
            "or pass max_dense_bytes explicitly to override.")
    return CondensedSystem(
        ext_dof_gidx=ext_dof_gidx.astype(np.int32),
        n_ext_dofs=n_ext_dofs,
        n_ext_ldof=n_ext_ldof,
        n_int_ldof=(geometry.n_nodes - n_ext_nodes_loc) * dpn,
    )


def condense_local(lmat, lrhs, n_ext: int):
    """Batched per-element Schur complement.

    ``lmat`` (E, nd, nd), ``lrhs`` (E, nd) in hierarchical-interleaved
    order (exterior dofs first).  Returns (sc_mat (E, ne, ne),
    sc_rhs (E, ne), Kii, Kie) with Kii/Kie kept for back-substitution.
    Parity: ``compute_local_sc_system``, ``sem/discrete.py:438-476``.
    """
    ext = slice(None, n_ext)
    itr = slice(n_ext, None)
    Kee = lmat[:, ext, ext]
    Kei = lmat[:, ext, itr]
    Kie = lmat[:, itr, ext]
    Kii = lmat[:, itr, itr]
    fe = lrhs[:, ext]
    fi = lrhs[:, itr]
    # sc_tmp = Kei Kii^-1  (solve Kii^T X^T = Kei^T)
    sc_tmp = jnp.linalg.solve(
        jnp.swapaxes(Kii, 1, 2), jnp.swapaxes(Kei, 1, 2)
    )
    sc_tmp = jnp.swapaxes(sc_tmp, 1, 2)
    sc_mat = Kee - sc_tmp @ Kie
    sc_rhs = fe - (sc_tmp @ fi[..., None])[..., 0]
    return sc_mat, sc_rhs, Kii, Kie


def assemble_dense(sc_mat, sc_rhs, ext_dof_gidx, n_ext_dofs: int,
                   rhs_extra=None):
    """Scatter condensed element blocks into the dense global system.

    Parity: ``assemble_global_sc_system`` (``sem/discrete.py:478-500``)
    with a dense target instead of COO.
    """
    E, ne, _ = sc_mat.shape
    gi = ext_dof_gidx
    flat = (gi[:, :, None] * n_ext_dofs + gi[:, None, :]).reshape(-1)
    A = jnp.zeros(n_ext_dofs * n_ext_dofs, dtype=sc_mat.dtype).at[flat].add(
        sc_mat.reshape(-1)
    ).reshape(n_ext_dofs, n_ext_dofs)
    b = jnp.zeros(n_ext_dofs, dtype=sc_rhs.dtype).at[gi.reshape(-1)].add(
        sc_rhs.reshape(-1)
    )
    if rhs_extra is not None:
        b = b + rhs_extra
    return A, b


def solve_condensed(A, b, free_mask):
    """Dense solve of the condensed system with constrained DOFs pinned.

    Constrained rows/cols are replaced by identity (their solution entries
    are forced to 0 — Newton increments vanish on essential BCs).  This
    also neutralizes inf/nan rows the axisymmetric operators put on
    Dirichlet-constrained axis DOFs (``sem/discrete.py:465-468``).
    """
    n = A.shape[0]
    free = free_mask
    # zero constrained rows & cols, then put 1 on their diagonal
    A = jnp.where(free[:, None] & free[None, :], A, 0.0)
    A = A + jnp.diag(jnp.where(free, 0.0, 1.0))
    # non-finite guards: anything left non-finite would poison the LU
    A = jnp.where(jnp.isfinite(A), A, 0.0)
    b = jnp.where(free, b, 0.0)
    return jnp.linalg.solve(A, b)


def back_substitute(Kii, Kie, fi, x_ext_local):
    """Batched interior solve: x_i = Kii^-1 (f_i - Kie x_e).

    Parity: ``_solve_interior_dofs`` (``sem/discrete.py:513-524``).
    """
    rhs = fi - (Kie @ x_ext_local[..., None])[..., 0]
    return jnp.linalg.solve(Kii, rhs[..., None])[..., 0]


def schur_solve(lmat, lrhs, csys: CondensedSystem, free_mask,
                rhs_extra=None):
    """Full batched static-condensation solve.

    Parameters
    ----------
    lmat : (E, nd, nd), lrhs : (E, nd)
        Local systems, hierarchical-interleaved DOF order.
    csys : CondensedSystem
    free_mask : (n_ext_dofs,) bool
        False on essential-BC condensed DOFs (solution forced to 0 there).
    rhs_extra : optional (n_ext_dofs,)
        Extra global RHS (e.g. Neumann contour integrals, the reference's
        ``cint``, ``examples/squirmer-axisymmetric.py:340``).

    Returns
    -------
    x_ext : (n_ext_dofs,) condensed solution
    x_loc : (E, nd) full local solution (exterior + interior parts)

    One-shot composition of :func:`schur_factor` + :func:`schur_apply`;
    for repeated solves against ONE matrix (e.g. the preconditioner
    applies inside a Krylov loop) factor once and apply per right-hand
    side (O(E n_int^3 + n_ext^3) factor vs O(E n_int^2 + n_ext^2) apply).
    """
    return schur_apply(schur_factor(lmat, csys, free_mask), lrhs, csys,
                       rhs_extra)


class SchurFactors(NamedTuple):
    """Reusable factorization of a batched static-condensation system.

    Holds EXPLICIT inverses, not LU factors: a triangular ``lu_solve``
    with one right-hand side is a length-n sequential dependency chain —
    on TPU the (n_ext, n_ext) global solve measured ~33 ms per Krylov
    vector inside the squirmer's GMRES-IR (97% of the warm Newton
    wall-clock).  Inverting once per factorization (triangular solves
    against the full identity are blocked and MXU-utilized) turns every
    apply into plain matvecs.  Both routes carry the same f32
    ``O(kappa eps)`` error, and the GMRES-IR outer loop verifies against
    the f64 residual regardless.
    """

    sc_tmp: jax.Array     # (E, n_ext, n_int) = Kei Kii^-1
    Kie: jax.Array        # (E, n_int, n_ext)
    Kii_inv: jax.Array    # (E, n_int, n_int) explicit inverse of Kii
    A_inv: jax.Array      # (n_ext_dofs,)^2 inverse of the pinned system
    free_mask: jax.Array  # (n_ext_dofs,) bool


def schur_factor(lmat, csys: CondensedSystem, free_mask) -> SchurFactors:
    """Factor the condensation pipeline once for many right-hand sides.

    The GMRES-IR preconditioner applies the same f32 condensation solve to
    every Krylov vector; re-deriving the Schur complement and dense LU per
    vector cost O(E n_int^3 + n_ext^3) each time (measured: it dominated
    the squirmer's Newton wall-clock).  Factoring once per Newton step
    leaves only triangular solves + small matmuls in the hot loop.
    """
    ne = csys.n_ext_ldof
    ext = slice(None, ne)
    itr = slice(ne, None)
    Kee = lmat[:, ext, ext]
    Kei = lmat[:, ext, itr]
    Kie = lmat[:, itr, ext]
    Kii = lmat[:, itr, itr]
    sc_tmp = jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(Kii, 1, 2), jnp.swapaxes(Kei, 1, 2)),
        1, 2)
    sc_mat = Kee - sc_tmp @ Kie

    gi = jnp.asarray(csys.ext_dof_gidx)
    nx = csys.n_ext_dofs
    flat = (gi[:, :, None] * nx + gi[:, None, :]).reshape(-1)
    A = jnp.zeros(nx * nx, dtype=sc_mat.dtype).at[flat].add(
        sc_mat.reshape(-1)).reshape(nx, nx)
    free = free_mask
    A = jnp.where(free[:, None] & free[None, :], A, 0.0)
    A = A + jnp.diag(jnp.where(free, 0.0, 1.0))
    A = jnp.where(jnp.isfinite(A), A, 0.0)

    A_inv = jnp.linalg.inv(A)
    Kii_inv = jnp.linalg.inv(Kii)
    return SchurFactors(sc_tmp, Kie, Kii_inv, A_inv, free)


def schur_apply(f: SchurFactors, lrhs, csys: CondensedSystem,
                rhs_extra=None):
    """Solve with a prebuilt :class:`SchurFactors` (one RHS pass).

    Same result as :func:`schur_solve` on the factored matrix.
    """
    ne = csys.n_ext_ldof
    fe = lrhs[:, :ne]
    fi = lrhs[:, ne:]
    sc_rhs = fe - (f.sc_tmp @ fi[..., None])[..., 0]
    gi = jnp.asarray(csys.ext_dof_gidx)
    b = jnp.zeros(csys.n_ext_dofs, dtype=sc_rhs.dtype).at[
        gi.reshape(-1)].add(sc_rhs.reshape(-1))
    if rhs_extra is not None:
        b = b + rhs_extra
    b = jnp.where(f.free_mask, b, 0.0)
    x_ext = f.A_inv @ b
    x_ext_local = x_ext[gi]
    rhs_i = fi - (f.Kie @ x_ext_local[..., None])[..., 0]
    x_int = (f.Kii_inv @ rhs_i[..., None])[..., 0]
    x_loc = jnp.concatenate([x_ext_local, x_int], axis=1)
    return x_ext, x_loc
