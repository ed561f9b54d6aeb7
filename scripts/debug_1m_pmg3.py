"""Round-4f probe 3: f64-outer / f32-cycle pmg at 1M.

Probe 2 showed the f32 OUTER recurrence is what drifts (XLA and fused
operators drift identically).  The framework's mixed-precision design
(pmg cycle_dtype, GMRES-IR) prescribes the fix: run the outer CG in
f64 against f64 factors while the V-cycle stays f32 (fused kernels).
This measures its/wall at 1M and the per-cycle overhead vs the f32
throughput arms.

    python scripts/debug_1m_pmg3.py
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

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.solver.cg import cg
    from spectralelementmethod_tpu.solver import pmg as pmgmod

    p, nx = 8, 1024
    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float64)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
    ex = make_exchange(disc, fused_pad=True)
    print(f"[setup {time.perf_counter() - t0:.1f}s]", flush=True)

    Gf = prob._G_host.reshape(disc.E, 3, -1)          # f64
    Dhat = sumfac.make_stacked_derivative(prob._D0_host, prob._D1_host)
    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    dw = ex._weights_as(np.float64, transposed=True)
    diag_np = np.asarray(prob.operator_diagonal())

    A = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, free, backend="xla", vector_layout="ne",
        assume_masked_input=True)
    bL = jnp.asarray(np.ascontiguousarray(
        ex.local_from_global(np.asarray(prob._b)).T))
    u_dL = jnp.asarray(np.ascontiguousarray(ex.local_from_global(
        np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)).T))
    r_cg = jax.jit(lambda f, b, u: jnp.where(f, b - A(u), 0.0))(
        free, bL, u_dL)
    r_cg.block_until_ready()
    r0 = float(jnp.sqrt(jnp.sum(dw * r_cg * r_cg)))
    print(f"|r0|_w = {r0:.4e}", flush=True)

    t0 = time.perf_counter()
    M = pmgmod.make_pmg_preconditioner(
        disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np,
        dtype=np.float64, cycle_dtype=np.float32)
    print(f"[pmg build {time.perf_counter() - t0:.1f}s]", flush=True)

    rs = cg(A, r_cg, M=M, tol=1e-6, max_iter=600, dot_weight=dw,
            block=64)
    rs.x.block_until_ready()            # warm
    t0 = time.perf_counter()
    rs = cg(A, r_cg, M=M, tol=1e-6, max_iter=600, dot_weight=dw,
            block=64)
    rs.x.block_until_ready()
    wall = time.perf_counter() - t0
    true_r = jnp.where(free, r_cg - A(rs.x), 0.0)
    trn = float(jnp.sqrt(jnp.sum(dw * true_r * true_r)))
    print(f"f64-outer/f32-cycle: its={int(rs.iterations)} "
          f"issued={int(rs.issued)} |r|={float(rs.residual_norm):.3e} "
          f"true|r|={trn:.3e} conv={bool(rs.converged)} "
          f"wall={wall:.2f}s", flush=True)


if __name__ == "__main__":
    main()
