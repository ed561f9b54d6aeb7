"""3D apply layout A/B: (E, n) lexicographic vs transposed (n, E).

BASELINE round-2h flagged layout, not traffic, as the 3D bottleneck:
the (E, p1, p1, p1) layout leaves the p1-wide trailing (lane) dim at
p1/128 occupancy.  The transposed applies + ``BoxRollExchange3D.dss_T``
exist but were never priced on hardware.  Arms (p=8 box mesh, affine
separable factors, f32, apply + plane-roll DSS + normalize per step):

  en-sep    laplacian_apply_local_3d_separable + dss   (the solve path)
  ne-sep    laplacian_apply_local_3d_separable_T + dss_T
  ne-aff    laplacian_apply_local_3d_affine_T + dss_T  (6-matmul chain)
  ne-gen    laplacian_apply_local_3d_T + dss_T         (full factor slabs)

Run ON the TPU host, nothing else using the chip:

    python scripts/exp_3d_layout.py [nx] [p]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_VERBOSE", "1")

from measure_round2d import banner, stage  # noqa: E402

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 27
P = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectralelementmethod_tpu.basis import gll_basis_3d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import box_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange
    from spectralelementmethod_tpu.utils import timing
    from spectralelementmethod_tpu.utils.hoist import hoist_closure

    banner(f"3D layout A/B nx={NX} p={P}")
    mesh = box_mesh(NX, NX, NX, P)
    disc = Discretization(mesh, gll_basis_3d(P))
    prob = Poisson(disc, dtype=np.float32)
    ex = make_exchange(disc)
    E, n = ex.E, ex.n_loc
    shape = tuple(disc.shape)
    print(f"E={E} n={n} exchange={type(ex).__name__}", flush=True)

    D_d = [jnp.asarray(disc.basis.subbases[d].D1, dtype=np.float32)
           for d in range(3)]
    W3 = jnp.asarray(disc.basis.weight_grid(), dtype=np.float32)
    a_np, affine = sumfac.affine_factorization(
        prob._G_host.reshape(disc.E, 6, -1),
        np.asarray(W3).reshape(-1))
    assert affine
    if ex.E > disc.E:
        a_np = np.concatenate(
            [a_np, np.zeros((ex.E - disc.E, 6), a_np.dtype)])
    a_d = jnp.asarray(a_np, dtype=np.float32)
    aT_d = jnp.asarray(np.ascontiguousarray(a_np.T), dtype=np.float32)
    ws = [np.asarray(disc.basis.subbases[d].quad_wts) for d in range(3)]
    Ks = [jnp.asarray(sumfac.assembled_1d_stiffness(
        np.asarray(D_d[d]), ws[d]), dtype=np.float32) for d in range(3)]
    wds = [jnp.asarray(w, dtype=np.float32) for w in ws]
    G_T = jnp.asarray(np.ascontiguousarray(
        np.concatenate([prob._G_host.reshape(disc.E, 6, -1),
                        np.zeros((ex.E - disc.E, 6, n), np.float32)])
        .transpose(1, 2, 0)).reshape((6,) + shape + (ex.E,)),
        dtype=np.float32)

    rng = np.random.RandomState(1)
    uL = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))
    uT = jnp.asarray(np.ascontiguousarray(np.asarray(uL).T))

    def en_sep(u):
        ve = sumfac.laplacian_apply_local_3d_separable(
            u.reshape((E,) + shape), a_d, *Ks, *wds)
        return ex.dss(ve.reshape(E, n))

    def ne_sep(u):
        vT = sumfac.laplacian_apply_local_3d_separable_T(
            u, aT_d, *Ks, *wds)
        return ex.dss_T(vT)

    def ne_aff(u):
        vT = sumfac.laplacian_apply_local_3d_affine_T(
            u, aT_d, W3, *D_d)
        return ex.dss_T(vT)

    def ne_gen(u):
        vT = sumfac.laplacian_apply_local_3d_T(u, G_T, *D_d)
        return ex.dss_T(vT)

    def arm(label, A, v0):
        A_pure, A_c = hoist_closure(A, v0)
        A_c = tuple(A_c)

        def step(x, c):
            y = A_pure(x, *c)
            return y * jax.lax.rsqrt(
                jnp.sum(y * y).astype(y.dtype) + 1e-30)

        ts = timing.time_step(step, v0, reps=30, consts=(A_c,))
        print(json.dumps({
            "metric": f"apply3d_ms[{label}]",
            "value": round(ts["t_apply"] * 1e3, 3),
            "reliable": bool(ts["reliable"]),
        }), flush=True)

    stage("en-sep", lambda: arm("en-sep", en_sep, uL))
    stage("ne-sep", lambda: arm("ne-sep", ne_sep, uT))
    stage("ne-aff", lambda: arm("ne-aff", ne_aff, uT))
    stage("ne-gen", lambda: arm("ne-gen", ne_gen, uT))


if __name__ == "__main__":
    main()
