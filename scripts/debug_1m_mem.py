"""Round-5: HBM accounting for the 1M certified solve (what fills 16 GB?).

Steps through the certify path printing device memory_stats deltas.

    python scripts/debug_1m_mem.py
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

    dev = jax.devices()[0]

    def mem(label):
        try:
            s = dev.memory_stats()
            used = s.get("bytes_in_use", 0) / 1e9
            peak = s.get("peak_bytes_in_use", 0) / 1e9
            print(f"[mem] {label:36s} in_use={used:6.2f} GB "
                  f"peak={peak:6.2f} GB", flush=True)
        except Exception as e:               # noqa: BLE001
            print(f"[mem] {label}: unavailable ({e})", flush=True)

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson

    p, nx = 8, 1024
    t0 = time.perf_counter()
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.2 * ((x + 1) + (y + 1)))
    print(f"[setup {time.perf_counter() - t0:.0f}s]", flush=True)
    mem("after host setup")

    from spectralelementmethod_tpu.ops.exchange import make_exchange
    ex = prob._exchange = make_exchange(disc, fused_pad=True)
    prob._op_cache = {}
    mem("after exchange")

    ctx = prob._local_setup("pmg", "auto", None, "auto")
    mem("after _local_setup (A, A_raw, M pmg)")

    from spectralelementmethod_tpu.ops import sumfac
    vlayout = ctx["vector_layout"]
    A2 = sumfac.make_local_laplacian_operator(
        ex, prob._G_host.reshape(disc.E, 3, -1),
        sumfac.make_stacked_derivative(prob._D0_host, prob._D1_host),
        ctx["free_local"], backend="xla", precision="highest",
        vector_layout=vlayout, assume_masked_input=True)
    mem("after A_xla_cert build")

    with jax.enable_x64():
        Gf32 = prob._G_host.reshape(disc.E, 3, -1)
        W = np.asarray(disc.basis.weight_grid(), np.float64).reshape(-1)
        a32, exact = sumfac.affine_factorization(Gf32, W)
        print(f"affine exact={exact}", flush=True)
        Gf64 = (np.asarray(a32, np.float64)[:, :, None] * W[None, None, :])
        A_hi = sumfac.make_local_laplacian_operator(
            ex, Gf64, np.asarray(sumfac.make_stacked_derivative(
                prob._D0_host, prob._D1_host), np.float64),
            ctx["free_local"], backend="xla", precision="highest",
            vector_layout=vlayout, assume_masked_input=True)
        mem("after A_hi build")

        b = np.asarray(prob._b, np.float64) + prob._neumann
        u_d = np.where(prob._dirichlet_mask, prob._dirichlet_vals, 0.0)

        def to64(v):
            lv = ex.local_from_global(v).astype(np.float64)
            return jnp.asarray(np.ascontiguousarray(lv.T), jnp.float64)

        bL64 = to64(b)
        mem("after bL64 upload")
        u_dL64 = to64(u_d)
        mem("after u_dL64 upload")
        from spectralelementmethod_tpu.models.poisson import (
            _masked_residual)
        r_hi = _masked_residual(A_hi, ctx["free_local"], bL64, u_dL64)
        r_hi.block_until_ready()
        mem("after r_hi seed")
        u_dL_c = u_dL64.astype(np.float32)
        del bL64, u_dL64
        mem("after del staging")

        x_h = jnp.zeros_like(r_hi)
        x_h.block_until_ready()
        mem("after x_h alloc")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
