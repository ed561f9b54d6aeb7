"""Round-2d TPU measurements: kernel-B far fusion A/B at 100k and 1M.

Kernel A no longer rebuilds the far-corrected Ap in XLA (the apply_far
concat cost ~2 full passes at 1M elements); it returns (Ap_near,
far_rows) and kernel B adds the ~20 far rows in VMEM while streaming Ap
for the r update.  The auto split rule for the CG kernels (cheap_far)
now engages at cost_full >= 0.3, which splits at 100k too — measure
both halo modes at both sizes.

One process (each new process pays a device-claim stall).  Stages:

  1. 100k fused-bf16p CG: auto (split) vs full halo
  2. 1M apply: split vs full vs XLA unfused (plain kernel, apply_far
     epilogue unchanged — the A/B the round-2c crash lost)
  3. 1M fused-bf16p CG: auto (split, far-in-B) vs full halo
  4. x64 far-split compile check (the i64 RecursionError regression)

Run ON the TPU host with nothing else using the chip:

    BENCH_VERBOSE=1 python scripts/measure_round2d.py
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")


def banner(msg):
    print(f"\n===== {msg} @ {time.strftime('%H:%M:%S')} =====", flush=True)


def stage(name, fn):
    banner(name)
    t0 = time.perf_counter()
    try:
        fn()
        print(f"[stage {name}: ok in {time.perf_counter() - t0:.1f}s]",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"[stage {name}: FAILED after {time.perf_counter() - t0:.1f}s]",
              flush=True)


def _build(nx, p=8):
    import numpy as np

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange

    banner(f"mesh+disc build nx={nx}")
    mesh = rectangle_mesh(nx, nx, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = make_exchange(disc, fused_pad=True)
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


def _cg_operands(prob, ex):
    import jax.numpy as jnp
    import numpy as np

    free_np = (~prob._dirichlet_mask)[ex.gather_hier]
    free = jnp.asarray(np.ascontiguousarray(free_np.T))
    diagL = np.asarray(prob.operator_diagonal())[ex.gather_hier]
    diagT = jnp.asarray(np.ascontiguousarray(diagL.T).astype(np.float32))
    b0 = jnp.where(free, jnp.asarray(
        np.ascontiguousarray(
            prob._b[ex.gather_hier].T).astype(np.float32)), 0.0)
    aux_dt = jnp.bfloat16
    inv_d = jnp.where(
        free, 1.0 / jnp.where(diagT != 0, diagT, 1.0), 0.0).astype(aux_dt)
    wf_d = jnp.where(
        free, ex._weights_as(np.float32, transposed=True), 0.0
    ).astype(aux_dt)
    return b0, inv_d, wf_d


def _time_cg(label, ex, Kcat, a, b0, inv_d, wf_d, max_halo, iters=100):
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.solver.cg import cg_fused

    try:
        kA, kB, G = pallas_kernels.make_fused_cg_kernels(
            ex, Kcat, a, precision="high", p_dtype=jnp.bfloat16,
            max_halo=max_halo)
    except ValueError as e:
        print(f"[{label}: skipped — {e}]", flush=True)
        return
    prep = kA._prep
    print(f"{label} prep: TE={prep.TE} Hb={prep.Hb} has_far={prep.has_far} "
          f"n_aux={prep.n_aux} n_far={prep.n_far}", flush=True)

    def run():
        res = cg_fused(kA, kB, b0, inv=inv_d, w_free=wf_d,
                       tol=0.0, max_iter=iters, block=iters,
                       p_dtype=jnp.bfloat16)
        res.x.block_until_ready()
        return res

    run()                                  # compile
    t0 = time.perf_counter()
    res = run()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"cg_bf16p_ms_per_iter[{label}]",
        "value": round(dt * 1e3 / max(int(res.iterations), 1), 3),
        "iters": int(res.iterations),
        "resnorm": float(res.residual_norm),
    }), flush=True)
    del kA, kB


def _time_apply(label, A, uT, reps=20):
    import jax
    import jax.numpy as jnp

    from spectralelementmethod_tpu.utils import timing
    from spectralelementmethod_tpu.utils.hoist import hoist_closure

    A_pure, A_c = hoist_closure(A, uT)
    A_c = tuple(A_c)

    def step(x, c):
        y = A_pure(x, *c)
        return y * jax.lax.rsqrt(jnp.vdot(y, y).real + 1e-30)

    ts = timing.time_step(step, uT, reps=reps, consts=(A_c,))
    print(json.dumps({"metric": f"apply_ms[{label}]",
                      "value": round(ts["t_apply"] * 1e3, 3),
                      "reliable": ts["reliable"]}), flush=True)


def stage_100k():
    prob, ex, Gf, Dhat, a, Kcat = _build(316)
    b0, inv_d, wf_d = _cg_operands(prob, ex)
    _time_cg("100k-auto", ex, Kcat, a, b0, inv_d, wf_d, "auto")
    _time_cg("100k-full", ex, Kcat, a, b0, inv_d, wf_d, None)


def stage_1m():
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.ops import pallas_kernels

    prob, ex, Gf, Dhat, a, Kcat = _build(1000)

    rng = np.random.RandomState(0)
    uT = jnp.asarray(
        rng.standard_normal((ex.n_loc, ex.E)).astype(np.float32))
    for label, mh in (("1m-split", "auto"), ("1m-full", None)):
        banner(f"1M apply: {label}")
        try:
            A = pallas_kernels.make_fused_affine_laplacian_T(
                ex, Kcat, a, precision="highest", max_halo=mh)
            prep = A._prep
            print(f"{label} prep: TE={prep.TE} Hb={prep.Hb} "
                  f"has_far={prep.has_far}", flush=True)
            _time_apply(label, A, uT)
            del A
        except Exception:
            traceback.print_exc()
    del uT

    banner("1M fused-bf16p CG")
    b0, inv_d, wf_d = _cg_operands(prob, ex)
    _time_cg("1m-auto", ex, Kcat, a, b0, inv_d, wf_d, "auto")
    _time_cg("1m-full", ex, Kcat, a, b0, inv_d, wf_d, None)


def stage_x64_compile():
    """The round-2c crash: far-split kernel under x64 must compile."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.ops import pallas_kernels

    prob, ex, Gf, Dhat, a, Kcat = _build(32, p=2)
    A = pallas_kernels.make_fused_affine_laplacian_T(
        ex, Kcat, a, precision="highest", max_halo=1)
    assert A._prep.has_far
    uT = jnp.asarray(np.random.RandomState(0).standard_normal(
        (ex.n_loc, ex.E)).astype(np.float32))
    out = jax.jit(A)(uT)
    out.block_until_ready()
    print(json.dumps({"metric": "x64_far_split_compile_ok", "value": 1}),
          flush=True)


def main():
    stage("100k fused-bf16p CG A/B", stage_100k)
    stage("1M apply + CG A/B", stage_1m)
    stage("x64 far-split compile check", stage_x64_compile)
    banner("all stages done")


if __name__ == "__main__":
    main()
