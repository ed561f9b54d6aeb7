"""Round-5 probe 4: warm wall-clock of the production static arm.

After caching the jitted program (`_cg_refined_static_kernel`), the
second+ calls must be ONE dispatch: this times three repeats of the
exact bench composition at 100k.

    python scripts/debug_r5_pmg4.py [--elements 99856]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=99856)
    ap.add_argument("--order", type=int, default=8)
    args = ap.parse_args()

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
    from spectralelementmethod_tpu.solver.cg import cg_refined_static
    from spectralelementmethod_tpu.solver import pmg as pmgmod

    p = args.order
    nx = max(int(np.sqrt(args.elements)), 1)
    ny = max(args.elements // nx, 1)

    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
    ex = make_exchange(disc, fused_pad=True)
    print(f"[setup {time.perf_counter() - t0:.1f}s E={disc.E}]",
          flush=True)

    Gf = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(prob._D0_host, prob._D1_host)
    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    A = sumfac.make_local_laplacian_operator(
        ex, Gf, Dhat, free, backend="auto", precision="highest",
        vector_layout="ne", assume_masked_input=True)
    dw = ex._weights_as(np.float32, transposed=True)
    diag_np = np.asarray(prob.operator_diagonal())
    u_d_np = np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)

    t0 = time.perf_counter()
    with jax.enable_x64():
        Gf64 = np.asarray(prob._G_host, np.float64).reshape(disc.E, 3, -1)
        A_hi = sumfac.make_local_laplacian_operator(
            ex, Gf64, np.asarray(Dhat, np.float64), free, backend="xla",
            precision="highest", vector_layout="ne",
            assume_masked_input=True)
        bL64 = jnp.asarray(np.ascontiguousarray(
            ex.local_from_global(np.asarray(prob._b))
            .astype(np.float64).T), jnp.float64)
        u_dL64 = jnp.asarray(np.ascontiguousarray(
            ex.local_from_global(u_d_np).astype(np.float64).T),
            jnp.float64)
        r_hi = jax.jit(
            lambda f, b, u: jnp.where(f, b - A_hi(u), 0.0))(
                free, bL64, u_dL64)
        r_hi.block_until_ready()
    print(f"[f64 anchor {time.perf_counter() - t0:.1f}s]", flush=True)

    t0 = time.perf_counter()
    M = pmgmod.make_pmg_preconditioner(
        disc, ex, Gf, A, ~prob._dirichlet_mask, diag_np)
    print(f"[pmg build {time.perf_counter() - t0:.1f}s]", flush=True)

    def run():
        return cg_refined_static(A, r_hi, A_hi=A_hi, M=M, tol=1e-6,
                                 schedule=(64, 32, 32, 64),
                                 dot_weight=dw)

    for rep in range(4):
        t0 = time.perf_counter()
        rs = run()
        rs.x.block_until_ready()
        wall = time.perf_counter() - t0
        cyc = ",".join(f"{v:.2e}" for v in rs.cycle_resnorms)
        print(f"static rep{rep}: its={int(rs.iterations)} "
              f"issued={int(rs.issued)} |r|={float(rs.residual_norm):.3e} "
              f"conv={bool(rs.converged)} stalled={rs.stalled} "
              f"wall={wall:.3f}s cyc={cyc}", flush=True)


if __name__ == "__main__":
    main()
