"""On-device bisection of the batched-affine fused CG wrong-answer bug.

tests_tpu/test_device_kernels.py::test_batched_affine_fused_cg_on_device
converges (per its own reductions) to a solution 1.8e-2 off the plain
path on real Mosaic, while the identical interpret-mode test passes —
a hardware-lowering defect somewhere in make_fused_cg_kernels_batched.
This probe compares, on hardware, each batched kernel output against
the single-RHS affine kernels on identical inputs, at both 'highest'
(f32) and 'high' + bf16p, to isolate the miscompiled component.

Run ON the TPU host with nothing else using the chip:

    python scripts/debug_batched_affine.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from spectralelementmethod_tpu.basis import gll_basis_2d  # noqa: E402
from spectralelementmethod_tpu.core.discretization import (  # noqa: E402
    Discretization)
from spectralelementmethod_tpu.mesh import rectangle_mesh  # noqa: E402
from spectralelementmethod_tpu.models.poisson import Poisson  # noqa: E402
from spectralelementmethod_tpu.ops import sumfac  # noqa: E402
from spectralelementmethod_tpu.ops.exchange import RollExchange  # noqa: E402
from spectralelementmethod_tpu.ops.pallas_kernels import (  # noqa: E402
    make_fused_cg_kernels, make_fused_cg_kernels_batched)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    s = max(np.abs(b).max(), 1e-30)
    return np.abs(a - b).max() / s


def main():
    p = 8
    mesh = rectangle_mesh(16, 8, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    ex = RollExchange(disc)
    Gf = prob._G_host.reshape(disc.E, 3, -1).astype(np.float32)
    W = disc.basis.weight_grid().reshape(-1)
    a, exact = sumfac.affine_factorization(Gf, W)
    assert exact
    Dhat = sumfac.make_stacked_derivative(
        np.asarray(prob._D0), np.asarray(prob._D1))
    Kcat = sumfac.make_affine_element_matrices(Dhat, W, order=ex.hier)
    n, E = ex.n_loc, ex.E
    rng = np.random.RandomState(41)
    Rs = [ex.dss_T(jnp.asarray(
        rng.standard_normal((n, E)).astype(np.float32))) for _ in range(2)]
    Ps = [ex.dss_T(jnp.asarray(
        rng.standard_normal((n, E)).astype(np.float32))) for _ in range(2)]
    inv = ex.dss_T(jnp.asarray(
        rng.rand(n, E).astype(np.float32))) * 0.1
    w = jnp.asarray(np.asarray(ex.weights.T, np.float32))
    betas = np.array([0.4, 1.1], np.float32)
    alphas = np.array([0.0, 0.7], np.float32)

    for label, kw, pdt in (
            ("highest/f32", dict(precision="highest"), None),
            ("high/bf16p", dict(precision="high"), jnp.bfloat16)):
        kA1, kB1, _ = make_fused_cg_kernels(
            ex, Kcat, a, max_halo=None, p_dtype=pdt, **kw)
        kAb, kBb, _ = make_fused_cg_kernels_batched(
            ex, Kcat, a, n_rhs=2, p_dtype=pdt, **kw)
        print(f"== {label}: single prep (TE={kA1._prep.TE}, "
              f"Hb={kA1._prep.Hb}) batched prep (TE={kAb._prep.TE}, "
              f"Hb={kAb._prep.Hb})", flush=True)
        pst = jnp.bfloat16 if pdt is not None else jnp.float32
        Psx = [ps.astype(pst) for ps in Ps]
        pb, apb, xb, db = kAb(
            jnp.concatenate(Rs, axis=0), jnp.concatenate(Psx, axis=0),
            inv, jnp.zeros((2 * n, E), jnp.float32),
            jnp.asarray(betas), jnp.asarray(alphas))
        Rn = []
        apj = []
        for j in range(2):
            p1, ap1, x1, d1 = kA1(Rs[j], Psx[j], inv,
                                  jnp.zeros((n, E), jnp.float32),
                                  float(betas[j]), float(alphas[j]))
            apj.append(ap1)
            sl = slice(j * n, (j + 1) * n)
            print(f"  j={j}: p' rel={rel(pb[sl], p1):.2e} "
                  f"Ap rel={rel(apb[sl], ap1):.2e} "
                  f"x rel={rel(xb[sl], x1):.2e} "
                  f"denom rel={abs(float(jnp.sum(db[:, j])) - float(jnp.sum(d1))) / abs(float(jnp.sum(d1))):.2e}",
                  flush=True)
            rn1, rz1, rn21 = kB1(Rs[j], ap1, inv, w, 0.3)
            Rn.append((rn1, float(jnp.sum(rz1)), float(jnp.sum(rn21))))
        rb, rzb, rn2b = kBb(jnp.concatenate(Rs, axis=0),
                            jnp.concatenate(apj, axis=0), inv, w,
                            jnp.asarray([0.3, 0.3], np.float32))
        for j in range(2):
            sl = slice(j * n, (j + 1) * n)
            print(f"  j={j}: kB r' rel={rel(rb[sl], Rn[j][0]):.2e} "
                  f"rz rel={abs(float(jnp.sum(rzb[:, j])) - Rn[j][1]) / abs(Rn[j][1]):.2e} "
                  f"rn2 rel={abs(float(jnp.sum(rn2b[:, j])) - Rn[j][2]) / abs(Rn[j][2]):.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
