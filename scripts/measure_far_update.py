"""Far-epilogue A/B: aliased far-row update kernel vs XLA concat rebuild.

The 1M-element fused apply pays a window-factor-2.0 halo tax at full
halo (Hb=1152 vs TE=2304) but the near-128 split was measured WORSE
(6.88-7.35 vs 5.59-5.68 ms) because the far epilogue rebuilt the whole
(81, 1M) array in XLA.  `make_far_update_kernel` replaces the rebuild
with an in-place aliased kernel touching only the edge/vertex sublane
tiles.  Arms (p=8, f32, apply + normalize per step, robust salted
timing):

  full      max_halo=None (the 5.59-5.68 ms record config)
  xla128    max_halo=128, far_mode='xla'     (the old split)
  kern128   max_halo=128, far_mode='kernel'  (the new split)

at 'highest' and 'high' dot precisions, at 1M (nx=1024) and 100k
(nx=316).  Run ON the TPU host with nothing else using the chip:

    python scripts/measure_far_update.py [nx ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage, _build  # noqa: E402

NXS = [int(v) for v in sys.argv[1:]] or [316, 1024]


def _arm(label, ex, Kcat, a, uT, precision, max_halo, far_mode):
    import jax
    import jax.numpy as jnp

    from spectralelementmethod_tpu.ops import pallas_kernels
    from spectralelementmethod_tpu.utils import timing
    from spectralelementmethod_tpu.utils.hoist import hoist_closure

    try:
        A = pallas_kernels.make_fused_affine_laplacian_T(
            ex, Kcat, a, precision=precision, max_halo=max_halo,
            far_mode=far_mode)
    except ValueError as e:
        print(f"[{label}: skipped — {e}]", flush=True)
        return
    prep = A._prep
    upd = A._far_update
    print(f"{label}: TE={prep.TE} Hb={prep.Hb} far={prep.has_far}"
          f" n_aux={prep.n_aux}"
          + (f" upd_tile={upd._tile} rows_t={upd._rows_t}" if upd
             else ""), flush=True)

    A_pure, A_c = hoist_closure(A, uT)
    A_c = tuple(A_c)

    def step(x, c):
        y = A_pure(x, *c)
        return y * jax.lax.rsqrt(jnp.sum(y * y).astype(y.dtype) + 1e-30)

    ts = timing.time_step(step, uT, reps=30, consts=(A_c,))
    print(json.dumps({
        "metric": f"apply_ms[{label}]",
        "value": round(ts["t_apply"] * 1e3, 3),
        "reliable": bool(ts["reliable"]),
    }), flush=True)


def run_nx(nx):
    import jax.numpy as jnp
    import numpy as np

    prob, ex, Gf, Dhat, a, Kcat = _build(nx)
    rng = np.random.RandomState(1)
    uT = jnp.asarray(np.ascontiguousarray(
        rng.standard_normal((ex.E, ex.n_loc)).astype(np.float32).T))
    del prob, Gf, Dhat
    for precision in ("highest", "high"):
        tag = {"highest": "hst", "high": "hi"}[precision]
        stage(f"{nx}-full-{tag}", lambda: _arm(
            f"{nx}-full-{tag}", ex, Kcat, a, uT, precision, None, "auto"))
        stage(f"{nx}-xla128-{tag}", lambda: _arm(
            f"{nx}-xla128-{tag}", ex, Kcat, a, uT, precision, 128, "xla"))
        stage(f"{nx}-kern128-{tag}", lambda: _arm(
            f"{nx}-kern128-{tag}", ex, Kcat, a, uT, precision, 128,
            "kernel"))


def main():
    for nx in NXS:
        banner(f"far-update A/B nx={nx}")
        run_nx(nx)


if __name__ == "__main__":
    main()
