#!/usr/bin/env python
"""Benchmark: element-apply GFLOP/s and Poisson CG wall-clock (p=8, 100k el).

The BASELINE.json primary metric.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``vs_baseline`` is the speedup over the reference implementation style — a
serial per-element numpy einsum loop (how nchisholm/SpectralElementMethod
applies operators, e.g. ``examples/squirmer-axisymmetric.py:420`` /
``sem/discrete.py:486``) — measured on this host on a subsample and scaled
to the full element count.

Usage: python bench.py [--smoke] [--elements N] [--order p] [--f64]
"""

import argparse
import json
import sys
import time

import numpy as np


def build_element_data(E_target: int, p: int, dtype):
    """Structured-grid element data (gather map + geometric factors) built
    vectorized, so setup doesn't dominate the benchmark at 100k elements."""
    from spectralelementmethod_tpu.basis import gll_basis_2d

    nx = max(int(np.sqrt(E_target)), 1)
    ny = max(E_target // nx, 1)
    E = nx * ny
    p1 = p + 1

    # global node grid ids for an nx x ny structured mesh of order p
    gx, gy = nx * p + 1, ny * p + 1
    glob = np.arange(gx * gy, dtype=np.int32).reshape(gx, gy)
    i0 = (np.arange(nx) * p)[:, None, None, None]
    j0 = (np.arange(ny) * p)[None, :, None, None]
    ii = i0 + np.arange(p1)[None, None, :, None]
    jj = j0 + np.arange(p1)[None, None, None, :]
    gather = (glob[ii, jj]).reshape(E, p1 * p1)
    n_nodes = gx * gy
    dirichlet_nodes = glob[:, 0].ravel()  # south edge (well-posed CG system)

    basis = gll_basis_2d(p)
    W = basis.weight_grid()
    # affine cells, size hx x hy on [0,1]^2: G00 = detJxW / hx^2 * ... with
    # mild per-element variation so the kernel isn't constant-folded
    hx, hy = 1.0 / nx, 1.0 / ny
    detJxW = (hx / 2) * (hy / 2) * W
    rng = np.random.RandomState(0)
    scale = (1.0 + 0.1 * rng.random_sample(E))[:, None, None]
    G = np.stack(
        [
            scale * detJxW * (2 / hx) ** 2,
            np.zeros((E, p1, p1)),
            scale * detJxW * (2 / hy) ** 2,
        ],
        axis=1,
    ).astype(dtype)

    D = basis.subbases[0].D1.astype(dtype)
    return gather, G, D, n_nodes, E, dirichlet_nodes


def numpy_reference_apply(u, gather, G, D, n_nodes, n_elems_sample):
    """Reference-style serial per-element einsum apply (timed subsample)."""
    p1 = D.shape[0]
    out = np.zeros(n_nodes, dtype=u.dtype)
    t0 = time.perf_counter()
    for e in range(n_elems_sample):
        ue = u[gather[e]].reshape(p1, p1)
        ur = np.einsum("mj,jn->mn", D, ue)
        us = np.einsum("nk,mk->mn", D, ue)
        fr = G[e, 0] * ur + G[e, 1] * us
        fs = G[e, 1] * ur + G[e, 2] * us
        ve = np.einsum("mp,mq->pq", D, fr) + np.einsum("nq,pn->pq", D, fs)
        np.add.at(out, gather[e], ve.ravel())
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny sizes")
    ap.add_argument("--elements", type=int, default=100_000)
    ap.add_argument("--order", type=int, default=8)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--per-axis", action="store_true",
                    help="use the per-axis sum-factorized kernel instead of "
                         "the MXU-shaped stacked-derivative kernel")
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    if args.smoke:
        args.elements = min(args.elements, 512)
        args.reps = 5

    import jax
    import jax.numpy as jnp

    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = np.float64 if args.f64 else np.float32

    from spectralelementmethod_tpu.ops import sumfac

    gather, G, D, n_nodes, E, dirichlet_nodes = build_element_data(
        args.elements, args.order, dtype
    )
    p1 = args.order + 1

    gix_d = jnp.asarray(gather)
    G_d = jnp.asarray(G)
    D_d = jnp.asarray(D)
    rng = np.random.RandomState(1)
    u_d = jnp.asarray(rng.random_sample(n_nodes).astype(dtype))

    reps = args.reps

    Dhat_d = jnp.asarray(sumfac.make_stacked_derivative(D, D))
    Gf_d = G_d.reshape(G_d.shape[0], 3, -1)

    if args.per_axis:
        def one_apply(x):
            return sumfac.laplacian_apply(x, gix_d, G_d, D_d, D_d, n_nodes)
    else:
        def one_apply(x):
            return sumfac.laplacian_apply_fused(
                x, gix_d, Gf_d, Dhat_d, n_nodes
            )

    # Chain the applies inside ONE jitted loop: a timing that counts kernel
    # throughput, not per-dispatch host/tunnel latency.
    @jax.jit
    def apply_chain(u):
        def body(i, x):
            y = one_apply(x)
            return y * jax.lax.rsqrt(jnp.vdot(y, y).real + 1e-30)

        return jax.lax.fori_loop(0, reps, body, u)

    # warmup/compile
    apply_chain(u_d).block_until_ready()

    t0 = time.perf_counter()
    apply_chain(u_d).block_until_ready()
    t_apply = (time.perf_counter() - t0) / reps

    flops = sumfac.element_apply_flops(E, p1, p1)
    gflops = flops / t_apply / 1e9

    # HBM roofline estimate: bytes moved per apply (u gather + G + out)
    bytes_per_apply = E * p1 * p1 * np.dtype(dtype).itemsize * (1 + 3 + 1)
    gbps = bytes_per_apply / t_apply / 1e9

    # reference-style numpy baseline on a subsample
    n_sample = min(E, 256)
    u_np = np.asarray(u_d)
    t_np = numpy_reference_apply(u_np, gather, G, D, n_nodes, n_sample)
    t_np_full = t_np * E / n_sample
    vs_baseline = t_np_full / t_apply

    # CG wall-clock on the same operator (Jacobi, fixed tolerance)
    from spectralelementmethod_tpu.solver.cg import cg, jacobi_preconditioner

    diag_local = sumfac.laplacian_diag_local(G_d, D_d, D_d)
    diag = sumfac.scatter_add(diag_local, gix_d, n_nodes)
    # Dirichlet along the south edge: a well-posed SPD system for CG
    free = jnp.ones(n_nodes, dtype=bool).at[jnp.asarray(dirichlet_nodes)].set(
        False
    )

    def A(x):
        x = sumfac.masked(x, free)
        return sumfac.masked(one_apply(x), free)

    M = jacobi_preconditioner(diag, free)
    b = sumfac.masked(u_d, free)
    cg_tol = 1e-4 if dtype == np.float32 else 1e-8
    cg_iters = 100 if args.smoke else 1000
    res = cg(A, b, M=M, tol=cg_tol, max_iter=cg_iters)  # compile+warm
    res.x.block_until_ready()
    t0 = time.perf_counter()
    res = cg(A, b, M=M, tol=cg_tol, max_iter=cg_iters)
    res.x.block_until_ready()
    t_cg = time.perf_counter() - t0

    result = {
        "metric": f"element_apply_gflops_p{args.order}_{E}el",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(vs_baseline, 1),
        "extras": {
            "apply_ms": round(t_apply * 1e3, 3),
            "effective_GB_s": round(gbps, 1),
            "cg_wallclock_s": round(t_cg, 3),
            "cg_iters": int(res.iterations),
            "cg_resnorm": float(res.residual_norm),
            "elements": E,
            "order": args.order,
            "dtype": str(np.dtype(dtype)),
            "n_nodes": n_nodes,
            "device": str(jax.devices()[0]),
            "baseline": "serial per-element numpy einsum apply "
                        f"(reference style), {n_sample}-element sample",
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
