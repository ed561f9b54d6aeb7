"""Panel element order vs lexicographic at 1M elements (p=8, f32).

The fused kernels' in-window halo must cover the largest roll-class
offset: lex order has vertical offsets of +-row-stride (~1000), forcing
Hb=1024 against TE=2048 (2x redundant window work at the VMEM cap).
``parallel.partition.panel_order`` regroups columns into 128-wide panels:
offsets become +-1 / +-128 in-window and one small uniform cross-panel
class per direction that rides the far epilogue (fused CG: in kernel B's
Ap stream).

Uses a 1024x1024 mesh for both arms so the comparison is apples-to-
apples (128 | 1024).  Stages:

  1. lex:    apply (full halo) + fused-bf16p CG ms/iter
  2. panel:  apply + fused-bf16p CG ms/iter, both far modes

Run ON the TPU host, nothing else using the chip:

    python scripts/measure_panel.py [nx]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage, _cg_operands, _time_cg  # noqa: E402
from exp_pallas_scale import _time_chain  # noqa: E402

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
PANEL = 128


def _build(nx, p=8, panel=0):
    import numpy as np

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange

    banner(f"mesh+disc build nx={nx} panel={panel}")
    mesh = rectangle_mesh(nx, nx, p)
    if panel:
        from spectralelementmethod_tpu.parallel.partition import (
            panel_order, reorder_elements)

        mesh = reorder_elements(mesh, panel_order(nx, nx, panel))
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    prob.set_dirichlet("ebc", lambda x, y: 0.0)
    ex = make_exchange(disc, fused_pad=True)
    E = ex.E
    deltas = sorted({abs(int(c[2])) for c in ex.edge_classes}
                    | {abs(int(c[2])) for c in ex.vert_classes})
    print(f"E_real={ex.E_real} E_pad={E} tails="
          f"{ex.n_edge_tail}+{ex.n_vert_tail} deltas={deltas} "
          f"classes={len(ex.edge_classes)}+{len(ex.vert_classes)}",
          flush=True)
    Gf = np.zeros((E, 3, disc.n_loc), np.float32)
    Gf[:disc.E] = prob._G_host.reshape(disc.E, 3, -1)
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    return prob, ex, Gf, Dhat, a, Kcat


def _time_apply(label, ex, Kcat, a, max_halo="auto"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.ops import pallas_kernels

    try:
        A = pallas_kernels.make_fused_affine_laplacian_T(
            ex, Kcat, a, precision="highest", max_halo=max_halo)
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
    print(json.dumps({
        "metric": f"apply_ms[{label}]",
        "value": round(dt * 1e3, 3),
        "TE": prep.TE, "Hb": prep.Hb, "far": prep.has_far,
    }), flush=True)
    del A, uT


def run_arm(tag, panel):
    prob, ex, Gf, Dhat, a, Kcat = _build(NX, panel=panel)
    _time_apply(f"{tag}-auto", ex, Kcat, a)
    if panel:
        _time_apply(f"{tag}-fullhalo", ex, Kcat, a, max_halo=None)
    b0, inv_d, wf_d = _cg_operands(prob, ex)
    _time_cg(f"{tag}-cg-auto", ex, Kcat, a, b0, inv_d, wf_d, "auto")
    if panel:
        _time_cg(f"{tag}-cg-fullhalo", ex, Kcat, a, b0, inv_d, wf_d, None)
    del prob, ex, Gf, Dhat, a, Kcat, b0, inv_d, wf_d


def main():
    stage("panel arm", lambda: run_arm("panel128", PANEL))
    stage("lex arm", lambda: run_arm("lex", 0))
    banner("all stages done")


if __name__ == "__main__":
    main()
