"""Variable-coefficient Helmholtz solver on curved isoparametric meshes.

BASELINE.json config 3: ``-div(c(x) grad u) + k(x) u = f`` with Dirichlet /
Neumann named boundaries.  Reuses the matrix-free sum-factorized Laplacian
kernel plus the (diagonal) GLL-collocated mass operator — the reaction term
adds one fused multiply-add, so the hot path stays the same batched matmul
chain as Poisson.

With ``k < 0`` (classical Helmholtz) the operator is symmetric indefinite;
CG is only guaranteed for ``k >= 0`` (reaction-diffusion / shifted
Laplacian).  For indefinite problems use ``solve(method="minres"...)`` —
here: CG still often works for mildly indefinite shifts, and the direct
batched-condensation path (future) is exact.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.discretization import Discretization
from ..ops import sumfac
from ..solver.cg import CGResult, cg, cg_host, jacobi_preconditioner
from .poisson import BoundaryConditionMixin, _as_callable


class HelmholtzSolution(NamedTuple):
    u: np.ndarray
    cg: CGResult


class Helmholtz(BoundaryConditionMixin):
    """-div(c grad u) + k u = f on a (possibly curved) quad mesh.

    Parameters
    ----------
    disc : Discretization (dofs_per_node=1)
    coefficient : callable(x, y) or scalar — diffusivity c (default 1)
    reaction : callable(x, y) or scalar — reaction/shift k (default 0;
        Poisson).
    forcing : callable(x, y) or scalar — right-hand side f.
    """

    def __init__(self, disc: Discretization, forcing=0.0, coefficient=1.0,
                 reaction=0.0, dtype=np.float64):
        if disc.dpn != 1:
            raise ValueError("Helmholtz requires dofs_per_node=1")
        self.disc = disc
        self.dtype = dtype

        xg = disc.global_gll_coords()
        self.x_nodes = xg
        rho, zz = disc.x_coeffs[:, 0], disc.x_coeffs[:, 1]

        self._coeff_fn = _as_callable(coefficient)
        # None when the reaction is identically zero (Poisson limit) so
        # the pmg coarse level skips the mass-term machinery
        self._reaction_fn = (
            None if (not callable(reaction) and float(reaction) == 0.0)
            else _as_callable(reaction))
        cvals = self._coeff_fn(rho, zz)
        kvals = _as_callable(reaction)(rho, zz)
        #: (E, *shape) diffusivity at the GLL nodes, or None when c == 1:
        #: boundary_flux (BoundaryConditionMixin) multiplies the gradient
        #: by this so the reported flux is of (c grad u), not grad u
        self._coeff_vals = (
            None if (not callable(coefficient) and float(coefficient) == 1.0)
            else np.broadcast_to(cvals, disc.detJxW.shape))
        G = disc.laplacian_factors(np.broadcast_to(cvals, disc.detJxW.shape))
        #: mass-weighted reaction: k * detJxW at the GLL nodes (diagonal
        #: collocated mass, reference Me convention squirmer:253-254)
        self._kM_host = np.asarray(
            np.broadcast_to(kvals, disc.detJxW.shape) * disc.detJxW,
            dtype=dtype)
        self._kM = jnp.asarray(self._kM_host)

        self._gix = jnp.asarray(disc.gather_nodes)
        # host masters + device copies: setup-path consumers (operator
        # builds, diagonals) read the host arrays — np.asarray on a
        # device-resident array costs 50-100 s through the remote-TPU
        # tunnel (round-4 setup roofline)
        self._G_host = np.asarray(G, dtype=dtype)
        self._D0_host = np.asarray(disc.basis.subbases[0].D1, dtype=dtype)
        self._D1_host = np.asarray(disc.basis.subbases[1].D1, dtype=dtype)
        self._G = jnp.asarray(self._G_host)
        self._D0 = jnp.asarray(self._D0_host)
        self._D1 = jnp.asarray(self._D1_host)

        f_gll = _as_callable(forcing)(rho, zz)
        # host master (jnp consumers promote on use): solve_local reads
        # it back on host, and device-resident reads cost minutes
        # through the tunnel
        self._b = disc.scatter_add(
            np.broadcast_to(f_gll, disc.detJxW.shape)
            * disc.detJxW).astype(dtype)

        self._dirichlet_mask = np.zeros(disc.n_nodes, dtype=bool)
        self._dirichlet_vals = np.zeros(disc.n_nodes)
        self._neumann = np.zeros(disc.n_nodes)

    def apply_operator(self, u) -> jnp.ndarray:
        """(A + k M) u, matrix-free."""
        u = jnp.asarray(u, dtype=self.dtype)
        disc = self.disc
        ue = sumfac.gather(u, self._gix, disc.shape)
        ve = sumfac.laplacian_apply_local(ue, self._G, self._D0, self._D1)
        ve = ve + self._kM * ue
        return sumfac.scatter_add(ve, self._gix, disc.n_nodes)

    def operator_diagonal(self) -> jnp.ndarray:
        de = sumfac.laplacian_diag_local(self._G, self._D0, self._D1)
        de = de + self._kM
        return sumfac.scatter_add(de, self._gix, self.disc.n_nodes)

    def solve(self, tol: float = 1e-12, max_iter: int | None = None,
              host_loop: bool = False) -> HelmholtzSolution:
        disc = self.disc
        free = jnp.asarray(~self._dirichlet_mask)
        u_d = jnp.asarray(
            np.where(self._dirichlet_mask, self._dirichlet_vals, 0.0),
            dtype=self.dtype,
        )

        def A(u):
            u = sumfac.masked(u, free)
            return sumfac.masked(self.apply_operator(u), free)

        b = self._b + jnp.asarray(self._neumann, dtype=self.dtype)
        r = sumfac.masked(b - self.apply_operator(u_d), free)
        M = jacobi_preconditioner(self.operator_diagonal(), free)
        if max_iter is None:
            max_iter = max(200, 30 * int(np.sqrt(disc.ndof)))
        solver = cg_host if host_loop else cg
        res = solver(A, r, M=M, tol=tol, max_iter=max_iter)
        u = np.asarray(u_d + res.x)
        return HelmholtzSolution(u, res)

    def solve_local(self, tol: float = 1e-12, max_iter: int | None = None,
                    host_loop: bool = False,
                    structure: str = "auto",
                    vector_layout: str = "auto",
                    backend: str = "auto",
                    precond: str = "jacobi") -> HelmholtzSolution:
        """Solve on element-local (L-vector) storage — the production TPU
        path for the curved-mesh Helmholtz config (BASELINE config 3).

        The Laplacian part rides :func:`..ops.sumfac.
        make_local_laplacian_operator` (on TPU curved meshes with
        ``backend='fused'``, the general fused kernel); the reaction term
        composes by DSS linearity as a second exchanged elementwise pass:
        ``A u = DSS(lap_local(u)) + DSS(kM . u)`` — bitwise the same
        operator as :meth:`solve`'s global-vector form.  ``backend``
        forwards to the Laplacian factory ('fused-interpret' for CPU
        kernel testing).

        ``precond``: "jacobi" (point diagonal) or "pmg" (two-level
        p-multigrid with a rediscretized coarse level carrying the
        coefficient and reaction terms — works on curved isoparametric
        meshes, :func:`..solver.pmg.make_pmg_preconditioner`; pass
        ``{"pmg": {...}}`` to tune).  pmg requires the 'ne' layout.
        """
        ctx = self._local_ops(structure, vector_layout, backend,
                              precond=precond)
        disc = self.disc
        ex, transposed = ctx["ex"], ctx["transposed"]
        to_local, free = ctx["to_local"], ctx["free"]
        A, M = ctx["A"], ctx["M"]

        b = np.asarray(self._b) + self._neumann
        u_d = np.where(self._dirichlet_mask, self._dirichlet_vals, 0.0)
        bL, u_dL = to_local(b), to_local(u_d)
        r = jnp.where(free, bL - A._raw(u_dL), 0.0)

        if max_iter is None:
            max_iter = max(200, 30 * int(np.sqrt(disc.ndof)))
        if host_loop:
            dot = ex.dot_T if transposed else ex.dot
            res = cg_host(A, r, M=M, tol=tol, max_iter=max_iter, dot=dot)
        else:
            w = ex._weights_as(np.dtype(self.dtype), transposed=transposed)
            res = cg(A, r, M=M, tol=tol, max_iter=max_iter, dot_weight=w)

        uL = u_dL + res.x
        back = ex.global_from_local_T if transposed else ex.global_from_local
        return HelmholtzSolution(back(np.asarray(uL)), res)

    def _local_ops(self, structure, vector_layout, backend,
                   precond="jacobi") -> dict:
        """Build (or fetch from ``_op_cache``) the L-vector operator,
        preconditioner, free mask and transfer closure shared by
        :meth:`solve_local` and :meth:`solve_local_batch` — setup only,
        no solve."""
        from ..ops.exchange import RollExchange, make_exchange
        from ..utils.hoist import hoist_closure  # noqa: F401 (doc link)

        disc = self.disc
        ex = getattr(self, "_exchange", None)
        if ex is None:
            ex = self._exchange = make_exchange(disc, fused_pad=True)
            self._op_cache = {}
        if vector_layout == "auto":
            vector_layout = "ne" if isinstance(ex, RollExchange) else "en"
        transposed = vector_layout == "ne"

        def to_local(u_global):
            lv = ex.local_from_global(u_global).astype(self.dtype)
            return jnp.asarray(np.ascontiguousarray(lv.T) if transposed
                               else lv)

        free_np = (~self._dirichlet_mask)[ex.gather_hier]
        free = jnp.asarray(
            np.ascontiguousarray(free_np.T) if transposed else free_np)

        key = ("A", structure, vector_layout, backend)
        A = self._op_cache.get(key)
        if A is None:
            # operator-build-time operands only (cached solves skip them)
            Gf = self._G_host.reshape(disc.E, 3, -1)
            Dhat = sumfac.make_stacked_derivative(
                self._D0_host, self._D1_host)
            kM_np = np.zeros((ex.E, ex.n_loc), dtype=self.dtype)
            kM_np[:disc.E] = self._kM_host.reshape(disc.E, -1)[
                :, ex.hier]
            kM_L = jnp.asarray(np.ascontiguousarray(kM_np.T) if transposed
                               else kM_np)
            lap = sumfac.make_local_laplacian_operator(
                ex, Gf, Dhat, None, structure=structure,
                vector_layout=vector_layout, backend=backend)
            dss = ex.dss_T if transposed else ex.dss

            def A_raw(uL):
                return lap(uL) + dss(kM_L * uL)

            def A(uL):
                return jnp.where(free, A_raw(uL), 0.0)

            # propagate the Pallas no-hoist marker: hoisting the fused
            # kernel's captured operands to runtime jit parameters aborts
            # the TPU runtime (utils/hoist.py)
            A._no_hoist = A_raw._no_hoist = getattr(
                lap, "_no_hoist", False)
            A._raw = A_raw
            A = self._op_cache.setdefault(key, A)

        if precond == "pmg" or isinstance(precond, dict):
            from ..solver.pmg import make_pmg_preconditioner

            pmg_kw = dict(precond.get("pmg", {})) if isinstance(
                precond, dict) else {}
            if not transposed:
                raise ValueError("precond='pmg' requires the 'ne' layout")
            Mk = ("M", "pmg", vector_layout,
                  tuple(sorted(pmg_kw.items())))
            M = self._op_cache.get(Mk)
            if M is None:
                pmg_kw.setdefault("coeff_fn", self._coeff_fn)
                pmg_kw.setdefault("reaction_fn", self._reaction_fn)
                Gf = np.asarray(self._G, dtype=self.dtype).reshape(
                    disc.E, 3, -1)
                M = self._op_cache[Mk] = make_pmg_preconditioner(
                    disc, ex, Gf, A, ~self._dirichlet_mask,
                    np.asarray(self.operator_diagonal()),
                    dtype=self.dtype, **pmg_kw)
        elif precond == "jacobi":
            Mk = ("M", vector_layout)
            M = self._op_cache.get(Mk)
            if M is None:
                diagL = to_local(np.asarray(self.operator_diagonal()))
                M = self._op_cache[Mk] = jacobi_preconditioner(diagL, free)
        else:
            raise ValueError(f"precond must be 'jacobi' or 'pmg', got "
                             f"{precond!r}")

        return {"ex": ex, "transposed": transposed,
                "vector_layout": vector_layout, "to_local": to_local,
                "free": free, "A": A, "M": M}

    def solve_local_batch(self, forcings, tol: float = 1e-12,
                          max_iter: int | None = None,
                          structure: str = "auto",
                          vector_layout: str = "auto",
                          backend: str = "auto") -> HelmholtzSolution:
        """Solve ``(-div(c grad) + k) u_j = f_j`` for a batch of
        forcings through ONE operator and one CG ladder
        (:func:`..solver.cg.cg_batched` whole-batch mode; see
        :meth:`..poisson.Poisson.solve_local_batch`).  ``forcings``:
        sequence of callables/scalars or a (k, n_nodes) nodal-value
        array.  The batched apply runs the XLA operator under ``vmap``
        (vmap of the Mosaic fused kernel is unaudited — ``backend``
        only steers the cached single-RHS operator).  Returns batched
        ``u`` (k, n_nodes) / ``cg`` fields.
        """
        import jax

        from ..solver.cg import cg_batched
        from .poisson import _as_callable as _asc

        backend = "xla" if backend in ("auto", "fused") else backend
        disc = self.disc
        ctx = self._local_ops(structure, vector_layout, backend)
        ex, transposed = ctx["ex"], ctx["transposed"]
        vector_layout = ctx["vector_layout"]
        to_local, free = ctx["to_local"], ctx["free"]
        A, M1 = ctx["A"], ctx["M"]

        rho, zz = disc.x_coeffs[:, 0], disc.x_coeffs[:, 1]
        nodal = (not callable(forcings) and hasattr(forcings, "__len__")
                 and np.asarray(forcings[0]).ndim == 1)
        if nodal:
            forcings = np.asarray(forcings, dtype=np.float64)
        rows = []
        for f in forcings:
            f_gll = (disc.gather(np.asarray(f)) if nodal
                     else np.broadcast_to(np.asarray(_asc(f)(rho, zz)),
                                          disc.detJxW.shape))
            b = disc.scatter_add(
                np.asarray(f_gll * disc.detJxW)).astype(self.dtype)
            rows.append(b + self._neumann)
        u_d = np.where(self._dirichlet_mask, self._dirichlet_vals, 0.0)
        u_dL = to_local(u_d)
        Au_d = A._raw(u_dL)
        R = jnp.stack([jnp.where(free, to_local(b) - Au_d, 0.0)
                       for b in rows])

        if max_iter is None:
            max_iter = max(200, 30 * int(np.sqrt(disc.ndof)))
        bk = ("A_batch", int(R.shape[0]), structure, vector_layout,
              backend)
        A_wb = self._op_cache.get(bk)
        if A_wb is None:
            A_wb = self._op_cache[bk] = jax.vmap(A)
        Mk = ("M_batch", vector_layout)
        M_wb = self._op_cache.get(Mk)
        if M_wb is None:
            M_wb = self._op_cache[Mk] = jax.vmap(M1)
        w = ex._weights_as(np.dtype(self.dtype), transposed=transposed)
        res = cg_batched(A_wb, R, M=M_wb, tol=tol, max_iter=max_iter,
                         dot_weight=w, whole_batch=True)
        back = (ex.global_from_local_T if transposed
                else ex.global_from_local)
        X = np.asarray(res.x) + np.asarray(u_dL)[None]
        u = np.stack([back(X[j]) for j in range(int(R.shape[0]))])
        return HelmholtzSolution(u, res)

    def l2_error(self, u: np.ndarray, exact: Callable) -> float:
        disc = self.disc
        ue = disc.gather(u)
        ex = exact(disc.x_coeffs[:, 0], disc.x_coeffs[:, 1])
        return float(np.sqrt(np.sum((ue - ex) ** 2 * disc.detJxW)))
