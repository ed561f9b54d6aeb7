"""Dump compiled HLO op histograms for pallas+dss vs einsum+dss.

Development tool, not part of the suite.
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def histo(fn, *args):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    ops = collections.Counter()
    bigcopies = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = (\w+)", line)
        if not m:
            continue
        op = m.group(1)
        ops[op] += 1
        if op in ("copy", "transpose", "bitcast") and "f32[" in line:
            sizes = re.findall(r"f32\[([\d,]+)\]", line)
            for s in sizes[:1]:
                elems = np.prod([int(x) for x in s.split(",")])
                if elems > 1e6:
                    bigcopies.append((op, s))
    return ops, bigcopies, txt


def main():
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import pallas_kernels, sumfac
    from spectralelementmethod_tpu.ops.exchange import RollExchange

    p = 8
    nx = ny = 100
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    ex = RollExchange(disc)
    E, n = ex.E, ex.n_loc
    ne, neb = ex.ne, ex.n_edge_block
    oe, ov = ex.off_edge, ex.off_vert

    Gf = jnp.asarray(np.asarray(prob._G), jnp.float32).reshape(E, 3, -1)
    D = np.asarray(prob._D0)
    Dhat = sumfac.make_stacked_derivative(D, D)
    Dhat_h = jnp.asarray(Dhat[:, ex.hier], jnp.float32)
    g0, g1, g2 = [jnp.asarray(Gf[:, i]) for i in range(3)]

    uL = jnp.zeros((E, n), jnp.float32)

    def pl_local(u):
        return pallas_kernels.fused_laplacian_local(u, g0, g1, g2, Dhat_h)

    def xla_local(u):
        grads = jnp.einsum("en,mn->em", u, Dhat_h, precision="highest")
        ur, us = grads[:, :n], grads[:, n:]
        fr = g0 * ur + g1 * us
        fs = g1 * ur + g2 * us
        flux = jnp.concatenate([fr, fs], axis=1)
        return jnp.einsum("em,mn->en", flux, Dhat_h, precision="highest")

    def dss2d(vL):
        F = vL[:, oe:oe + neb]
        recv = jnp.zeros_like(F)
        for d_f, s_f, delta, flip, mask in ex.edge_classes:
            src = jnp.roll(vL[:, oe + s_f * ne: oe + (s_f + 1) * ne],
                           -delta, axis=0)
            if flip:
                src = jnp.flip(src, axis=1)
            src = jnp.where(mask[:, None], src, 0.0)
            recv = recv.at[:, d_f * ne:(d_f + 1) * ne].add(src)
        edges = F + recv
        V = vL[:, ov:ov + 4]
        vsum = V
        for d_s, s_s, delta, mask in ex.vert_classes:
            src = jnp.roll(V[:, s_s], -delta, axis=0)
            vsum = vsum.at[:, d_s].add(jnp.where(mask, src, 0.0))
        return jnp.concatenate([edges, vsum, vL[:, ex.off_int:]], axis=1)

    for name, f in [("pallas+dss", lambda u: dss2d(pl_local(u))),
                    ("xla+dss", lambda u: dss2d(xla_local(u)))]:
        ops, bigcopies, txt = histo(f, uL)
        top = {k: v for k, v in ops.most_common(14)}
        print(name, "op histo:", top, flush=True)
        print(name, "big copies/transposes:", bigcopies[:12], flush=True)
        with open(f"/tmp/hlo_{name.replace('+','_')}.txt", "w") as fh:
            fh.write(txt)


if __name__ == "__main__":
    main()
