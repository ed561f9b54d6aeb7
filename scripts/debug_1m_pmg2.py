"""Round-4f probe 2: is the 1M stall the OPERATOR or the V-cycle?

Solves the identical 1M system with (a) the unfused XLA operator and
(b) the auto (fused far-split) operator, same pmg M each time.  If (a)
converges and (b) drifts, the 1M far-split fused apply is implicated.

    python scripts/debug_1m_pmg2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np  # noqa: E402


def main():
    from spectralelementmethod_tpu import config
    config.enable_compilation_cache()
    config.enable_setup_cache()

    import jax
    import jax.numpy as jnp

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.solver.cg import cg_refined
    from spectralelementmethod_tpu.solver import pmg as pmgmod

    p, nx = 8, 1024
    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
    ex = make_exchange(disc, fused_pad=True)
    print(f"[setup {time.perf_counter() - t0:.1f}s]", flush=True)

    Gf = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(prob._D0_host, prob._D1_host)
    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    dw = ex._weights_as(np.float32, transposed=True)
    diag_np = np.asarray(prob.operator_diagonal())

    bL = jnp.asarray(np.ascontiguousarray(
        ex.local_from_global(np.asarray(prob._b)).astype(np.float32).T))
    u_dL = jnp.asarray(np.ascontiguousarray(ex.local_from_global(
        np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)
    ).astype(np.float32).T))

    for backend, label in (("xla", "XLA operator + XLA cycle"),
                           ("auto", "auto (fused far-split)")):
        A = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, free, backend=backend, vector_layout="ne",
            assume_masked_input=True)
        r_cg = jax.jit(lambda f, b, u: jnp.where(f, b - A(u), 0.0))(
            free, bL, u_dL)
        r_cg.block_until_ready()
        t0 = time.perf_counter()
        M = pmgmod.make_pmg_preconditioner(
            disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np,
            cycle_backend=backend)
        rs = cg_refined(A, r_cg, M=M, tol=1e-6, max_iter=400,
                        dot_weight=dw, block=64, cycles=3)
        print(f"{label}: its={int(rs.iterations)} "
              f"issued={int(rs.issued)} "
              f"true|r|={float(rs.residual_norm):.3e} "
              f"conv={bool(rs.converged)} "
              f"[{time.perf_counter() - t0:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
