"""k=8/16 batched fused CG + high-p arms — the arithmetic-intensity road
to the MXU north star (VERDICT round-2 item 1).

Stage 1 (100k elements, p=8, f32, bf16 directions, 1000-it ladders):
per-RHS ms/iter for k in {4, 8, 16} x {full halo, far split} x
{defer_x 0, 8}, against the single-RHS record (~0.46-0.50).  Target:
<= 0.35 ms/iter/RHS, or the measured refutation table.

Stage 2 (p in {12, 16}, single RHS, DOF-matched element counts):
fused apply at 'highest'/'high' + fused-bf16p CG, reporting useful MFU
(sum-factorized FLOPs / bf16 peak) — at p>=12 the apply's arithmetic
intensity crosses the v5e machine balance, so useful MFU becomes the
honest headline the >50% target asks about.

Run ON the TPU host:  python scripts/measure_k816.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage, _build as _build_r2d, \
    _cg_operands  # noqa: E402
from measure_batched_cg_far import _arm_batched, _arm_single  # noqa: E402
from exp_pallas_scale import _time_chain  # noqa: E402

V5E_BF16_PEAK = 197e12


def _build(nx, p=8):
    """measure_round2d._build, but with the fused pad forced at ANY
    element count (the high-p arms run ~14-26k elements, below the
    default 20k fused_pad_min_e gate — p=16 was inadmissible without
    it)."""
    import numpy as np

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange

    banner(f"mesh+disc build nx={nx} p={p}")
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = make_exchange(disc, fused_pad=True, fused_pad_min_e=0)
    E = ex.E
    print(f"E_real={ex.E_real} E_pad={E}", flush=True)
    Gf = np.zeros((E, 3, disc.n_loc), np.float32)
    Gf[:disc.E] = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    return prob, ex, Gf, Dhat, a, Kcat


def stage1_batched(nx=316):
    prob, ex, Gf, Dhat, a, Kcat = _build(nx)
    b0, inv_d, wf_d = _cg_operands(prob, ex)
    it = 1000
    _arm_single("100k-single", ex, Kcat, a, b0, inv_d, wf_d, it)
    for k in (4, 8, 16):
        for halo, hname in ((None, "full"), ("auto", "split")):
            for m in (0, 8):
                _arm_batched(f"100k-k{k}-{hname}-m{m}", ex, Kcat, a,
                             b0, inv_d, wf_d, k=k, max_halo=halo,
                             iters=it, m=m)
    del prob, ex, Gf, Dhat, a, Kcat, b0, inv_d, wf_d


def _apply_arm(label, ex, Kcat, a, precision, n, E_real):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.ops import pallas_kernels

    try:
        A = pallas_kernels.make_fused_affine_laplacian_T(
            ex, Kcat, a, precision=precision)
    except ValueError as e:
        print(f"[{label}: skipped — {e}]", flush=True)
        return
    prep = A._prep
    uT = jnp.asarray(np.random.RandomState(0)
                     .standard_normal((ex.n_loc, ex.E)).astype(np.float32))

    def step(x):
        y = A(x)
        return y * jax.lax.rsqrt(jnp.vdot(y, y).real + 1e-30)

    dt = _time_chain(step, uT, iters=30)
    # useful sum-factorized FLOPs (the honest MFU numerator)
    from spectralelementmethod_tpu.ops import sumfac
    p1 = int(np.sqrt(n))
    flops = sumfac.element_apply_flops(E_real, p1, p1)
    print(json.dumps({
        "metric": f"apply[{label}]",
        "ms": round(dt * 1e3, 3),
        "gflops": round(flops / dt / 1e9, 1),
        "useful_mfu_pct": round(100 * flops / dt / V5E_BF16_PEAK, 2),
        "TE": prep.TE, "Hb": prep.Hb,
    }), flush=True)
    del A, uT


def _cg_arm(label, ex, Kcat, a, b0, inv_d, wf_d, iters=400):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    try:
        kA, kB, _ = pallas_kernels.make_fused_cg_kernels(
            ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16)
    except ValueError as e:
        print(f"[{label}: skipped — {e}]", flush=True)
        return
    prep = kA._prep

    def run():
        res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d, tol=0.0,
                       max_iter=iters, block=200, p_dtype=jnp.bfloat16)
        res.x.block_until_ready()
        return res

    run()
    t0 = time.perf_counter()
    res = run()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"cg_ms_per_iter[{label}]",
        "value": round(dt * 1e3 / max(int(res.issued), 1), 3),
        "TE": prep.TE, "Hb": prep.Hb,
        "resnorm": float(res.residual_norm),
    }), flush=True)
    del kA, kB


def stage2_highp():
    for p, nx in ((12, 160), (16, 120)):
        banner(f"high-p arm p={p} nx={nx}")
        prob, ex, Gf, Dhat, a, Kcat = _build(nx, p=p)
        n = ex.n_loc
        for precision in ("highest", "high", "default"):
            _apply_arm(f"p{p}-{precision}", ex, Kcat, a, precision, n,
                       ex.E_real)
        b0, inv_d, wf_d = _cg_operands(prob, ex)
        _cg_arm(f"p{p}-bf16p", ex, Kcat, a, b0, inv_d, wf_d)
        del prob, ex, Gf, Dhat, a, Kcat, b0, inv_d, wf_d


def main():
    stage("k-sweep 100k", stage1_batched)
    stage("high-p arms", stage2_highp)
    banner("all stages done")


if __name__ == "__main__":
    main()
