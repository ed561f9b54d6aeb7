"""Steady advection-diffusion solver (matrix-free, GMRES).

    -div(eps grad u) + c . grad u = f        on Omega
    u = g_D on Dirichlet boundaries; natural BCs elsewhere.

Beyond-reference model family: the reference solves only symmetric
(Poisson-type) scalar problems and the full Navier-Stokes squirmer; this
fills the nonsymmetric middle ground and exercises the GMRES path the
Newton-Krylov plan rests on (SURVEY.md §7 item 4).  The operator is the
sum-factorized weak Laplacian plus a collocated advection term
``(detJxW c . J^{-T} grad u)`` on L-vectors, DSS-summed like every other
operator in the framework.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.discretization import Discretization
from ..ops import sumfac
from ..solver.gmres import GMRESResult, gmres
from .poisson import BoundaryConditionMixin, _as_callable


class AdvectionDiffusionSolution(NamedTuple):
    u: np.ndarray
    gmres: GMRESResult


class AdvectionDiffusion(BoundaryConditionMixin):
    """Steady scalar transport on a discretized mesh.

    Parameters
    ----------
    disc : Discretization (dofs_per_node=1).
    velocity : callable(x, y) -> (cx, cy) or tuple of scalars.
    diffusivity : callable(x, y) or scalar (eps > 0).
    forcing : callable(x, y) or scalar.
    """

    def __init__(self, disc: Discretization, velocity=(1.0, 0.0),
                 diffusivity=1.0, forcing=0.0, dtype=np.float64):
        if disc.dpn != 1:
            raise ValueError("AdvectionDiffusion requires dofs_per_node=1")
        self.disc = disc
        self.dtype = dtype
        self.x_nodes = disc.global_gll_coords()

        xe = disc.x_coeffs[:, 0]
        ye = disc.x_coeffs[:, 1]
        if callable(velocity):
            cx, cy = velocity(xe, ye)
            cx = np.broadcast_to(np.asarray(cx, float), xe.shape)
            cy = np.broadcast_to(np.asarray(cy, float), xe.shape)
        else:
            cx = np.full_like(xe, float(velocity[0]))
            cy = np.full_like(xe, float(velocity[1]))

        eps = _as_callable(diffusivity)(xe, ye)
        G = disc.laplacian_factors(np.broadcast_to(np.asarray(eps, float),
                                                   xe.shape))
        self._G_host = np.asarray(G, dtype=dtype)
        self._G = jnp.asarray(G, dtype=dtype)

        # advection weights: detJxW * (c . invJ^T e_a) per parametric axis
        E = disc.E
        invJ = np.asarray(disc.invJ).reshape(E, 2, 2, -1)
        w2d = np.asarray(disc.detJxW).reshape(E, -1)
        cxf = cx.reshape(E, -1)
        cyf = cy.reshape(E, -1)
        self._gx = jnp.asarray(
            (cxf * invJ[:, 0, 0] + cyf * invJ[:, 0, 1]) * w2d, dtype=dtype)
        self._gy = jnp.asarray(
            (cxf * invJ[:, 1, 0] + cyf * invJ[:, 1, 1]) * w2d, dtype=dtype)

        ffun = _as_callable(forcing)
        f_gll = ffun(xe, ye)
        self._b = jnp.asarray(
            disc.scatter_add(np.broadcast_to(np.asarray(f_gll, float),
                                             xe.shape) * disc.detJxW),
            dtype=dtype,
        )
        self._dirichlet_mask = np.zeros(disc.n_nodes, dtype=bool)
        self._dirichlet_vals = np.zeros(disc.n_nodes)
        self._neumann = np.zeros(disc.n_nodes)
        self._ops = None
        self._diagL = None
        self._op_cache = {}

    # -- operator ----------------------------------------------------------

    def _build(self):
        if self._ops is not None:
            return self._ops
        from ..ops.exchange import make_exchange

        disc = self.disc
        ex = make_exchange(disc)
        Gf = self._G_host.reshape(disc.E, 3, -1)
        Dhat = sumfac.make_stacked_derivative(
            np.asarray(disc.basis.subbases[0].D1),
            np.asarray(disc.basis.subbases[1].D1))
        lap = sumfac.make_local_laplacian_operator(ex, Gf, Dhat, None)
        Dhat_h = jnp.asarray(Dhat[:, ex.hier], dtype=self.dtype)
        hier_d = jnp.asarray(np.asarray(ex.hier))
        n = disc.n_loc
        gx, gy = self._gx, self._gy

        def apply_raw(uL):
            grads = jnp.einsum("en,mn->em", uL, Dhat_h,
                               precision="highest")
            adv = gx * grads[:, :n] + gy * grads[:, n:]
            return lap(uL) + ex.dss(adv[:, hier_d])

        self._ops = (ex, apply_raw)
        return self._ops

    def _solver_ops(self):
        """Stable masked operator + Jacobi preconditioner for the GMRES
        paths, cached in ``_op_cache`` (cleared by ``set_dirichlet``) —
        fresh closures per solve would miss the hoist/jit caches and
        recompile every restart-cycle kernel."""
        from ..solver.cg import jacobi_preconditioner

        disc = self.disc
        ex, apply_raw = self._build()
        ops = self._op_cache.get("gmres_ops")
        if ops is None:
            free = jnp.asarray((~self._dirichlet_mask)[ex.gather_hier])

            def A(uL):
                uL = jnp.where(free, uL, 0.0)
                return jnp.where(free, apply_raw(uL), 0.0)

            if self._diagL is None:
                # Jacobi on the (BC-independent) symmetric-part diagonal
                de = sumfac.laplacian_diag_local(
                    self._G,
                    jnp.asarray(disc.basis.subbases[0].D1, self.dtype),
                    jnp.asarray(disc.basis.subbases[1].D1, self.dtype))
                diag = sumfac.scatter_add(
                    de, jnp.asarray(disc.gather_nodes), disc.n_nodes)
                self._diagL = jnp.asarray(
                    ex.local_from_global(np.asarray(diag))
                    .astype(self.dtype))
            M = jacobi_preconditioner(self._diagL, free)
            ops = self._op_cache["gmres_ops"] = (free, A, M)
        free, A, M = ops
        return ex, apply_raw, free, A, M

    def solve(self, tol: float = 1e-10, restart: int = 40,
              max_restarts: int = 100) -> AdvectionDiffusionSolution:
        """GMRES solve with symmetric Dirichlet elimination."""
        ex, apply_raw, free, A, M = self._solver_ops()

        b = np.asarray(self._b) + self._neumann
        u_d = np.where(self._dirichlet_mask, self._dirichlet_vals, 0.0)
        bL = jnp.asarray(ex.local_from_global(b).astype(self.dtype))
        u_dL = jnp.asarray(ex.local_from_global(u_d).astype(self.dtype))
        r = jnp.where(free, bL - apply_raw(u_dL), 0.0)

        res = gmres(A, r, M=M, tol=tol, restart=restart,
                    max_restarts=max_restarts, dot=ex.dot)
        u = ex.global_from_local(np.asarray(u_dL + res.x))
        return AdvectionDiffusionSolution(u, res)

    def solve_batch(self, forcings, tol: float = 1e-10,
                    restart: int = 40,
                    max_restarts: int = 100) -> AdvectionDiffusionSolution:
        """Solve for a batch of forcings with ONE batched-GMRES ladder
        (:func:`..solver.gmres.gmres_batched`): shared operator and
        Jacobi preconditioner, per-RHS Arnoldi/convergence state.
        ``forcings``: callables/scalars or a (k, n_nodes) nodal array.
        Returns batched ``u`` (k, n_nodes) / ``gmres`` fields.
        """
        from ..solver.gmres import gmres_batched

        disc = self.disc
        ex, apply_raw, free, A, M = self._solver_ops()

        coords = [disc.x_coeffs[:, d] for d in range(disc.mesh.ndim)]
        nodal = (not callable(forcings) and hasattr(forcings, "__len__")
                 and np.asarray(forcings[0]).ndim == 1)
        if nodal:
            forcings = np.asarray(forcings, dtype=np.float64)
        rows = []
        for f in forcings:
            f_gll = (disc.gather(np.asarray(f)) if nodal
                     else np.broadcast_to(
                         np.asarray(_as_callable(f)(*coords)),
                         disc.detJxW.shape))
            b = disc.scatter_add(
                np.asarray(f_gll * disc.detJxW)).astype(self.dtype)
            rows.append(b + self._neumann)
        u_d = np.where(self._dirichlet_mask, self._dirichlet_vals, 0.0)
        u_dL = jnp.asarray(ex.local_from_global(u_d).astype(self.dtype))
        Au_d = apply_raw(u_dL)
        R = jnp.stack([
            jnp.where(free, jnp.asarray(
                ex.local_from_global(b).astype(self.dtype)) - Au_d, 0.0)
            for b in rows])

        res = gmres_batched(A, R, M=M, tol=tol, restart=restart,
                            max_restarts=max_restarts, dot=ex.dot)
        X = np.asarray(res.x) + np.asarray(u_dL)[None]
        u = np.stack([ex.global_from_local(X[j])
                      for j in range(int(R.shape[0]))])
        return AdvectionDiffusionSolution(u, res)

    def l2_error(self, u: np.ndarray, exact) -> float:
        disc = self.disc
        ue = disc.gather(u)
        ex_v = exact(disc.x_coeffs[:, 0], disc.x_coeffs[:, 1])
        return float(np.sqrt(np.sum((ue - ex_v) ** 2 * disc.detJxW)))
