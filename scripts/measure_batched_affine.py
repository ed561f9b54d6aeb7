"""Batched AFFINE fused apply pricing (p=8, f32, 100k elements).

``make_fused_affine_laplacian_T(n_rhs=k)`` sublane-stacks k RHS so the
class-mask stream, the affine window and the kernel launch amortize
across the batch.  The general kernel's multi-RHS mode was measured
worthwhile (factor slabs are ~60% of its traffic); the affine factors
are tiny, so the expected win here is smaller — this script prices it
so the ``make_multi_rhs_laplacian_T`` auto policy is measured, not
guessed.

Arms (one 316x316 p=8 affine mesh, fused-padded exchange):
  1. single-RHS affine fused apply           (the bench headline config)
  2. batched affine fused, k = 2, 4, 8       (per-RHS ms)
  3. vmapped XLA affine apply, k = 4         (the pre-round-2 auto path)
  4. batched affine fused 'default' (1-pass bf16 dots), k = 8
     (context: the MXU-bound regime; accuracy ~1e-3)

Run ON the TPU host, nothing else using the chip:

    python scripts/measure_batched_affine.py [nx]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage  # noqa: E402
from measure_panel import _build  # noqa: E402
from exp_pallas_scale import _time_chain  # noqa: E402

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 316


def _norm_step(A):
    import jax
    import jax.numpy as jnp

    def step(x):
        y = A(x)
        return y * jax.lax.rsqrt(jnp.vdot(y, y).real.astype(y.dtype)
                                 + 1e-30)

    return step


def _report(label, dt_ms, k=1, **kw):
    print(json.dumps({
        "metric": f"apply_ms[{label}]",
        "value": round(dt_ms, 3),
        "per_rhs_ms": round(dt_ms / k, 3),
        "nrhs": k, **kw,
    }), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.ops import pallas_kernels, sumfac

    prob, ex, Gf, Dhat, a, Kcat = _build(NX)
    n, E = ex.n_loc, ex.E
    rng = np.random.RandomState(0)

    def one_rhs():
        A = pallas_kernels.make_fused_affine_laplacian_T(ex, Kcat, a)
        uT = jnp.asarray(rng.standard_normal((n, E)).astype(np.float32))
        dt = _time_chain(_norm_step(A), uT, iters=30)
        prep = A._prep
        _report("affine-fused-k1", dt * 1e3,
                TE=prep.TE, Hb=prep.Hb)

    def batched(k, precision="highest"):
        label = f"affine-fused-k{k}" + (
            "" if precision == "highest" else f"-{precision}")
        try:
            A = pallas_kernels.make_fused_affine_laplacian_T(
                ex, Kcat, a, n_rhs=k, precision=precision)
        except ValueError as e:
            print(f"[{label}: skipped — {e}]", flush=True)
            return
        U = jnp.asarray(
            rng.standard_normal((k * n, E)).astype(np.float32))
        dt = _time_chain(_norm_step(A), U, iters=30)
        prep = A._prep
        _report(label, dt * 1e3, k=k, TE=prep.TE, Hb=prep.Hb)

    def xla_vmap(k):
        A1 = sumfac.make_local_laplacian_operator(
            ex, Gf, Dhat, vector_layout="ne", backend="xla")
        A = jax.vmap(A1)
        U = jnp.asarray(
            rng.standard_normal((k, n, E)).astype(np.float32))
        dt = _time_chain(_norm_step(A), U, iters=30)
        _report(f"xla-vmap-k{k}", dt * 1e3, k=k)

    banner(f"batched affine apply, nx={NX} (E={E}) p=8 f32")
    stage("affine fused k=1", one_rhs)
    for k in (2, 4, 8):
        stage(f"affine fused k={k}", lambda k=k: batched(k))
    stage("xla vmap k=4", lambda: xla_vmap(4))
    stage("affine fused k=8 default-precision",
          lambda: batched(8, precision="default"))


if __name__ == "__main__":
    main()
