"""Experiment: DSS exchange formulations on TPU. Dev tool."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chain(f, x0, reps=20):
    @jax.jit
    def run(x):
        def body(i, x):
            y = f(x)
            return y * jax.lax.rsqrt(jnp.vdot(y, y).astype(y.dtype) + 1e-30)
        return jax.lax.fori_loop(0, reps, body, x)

    run(x0).block_until_ready()
    t0 = time.perf_counter()
    run(x0).block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--elements", type=int, default=20000)
    ap.add_argument("--order", type=int, default=8)
    args = ap.parse_args()

    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.ops.exchange import LocalExchange

    p = args.order
    nx = max(int(np.sqrt(args.elements)), 1)
    ny = max(args.elements // nx, 1)
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    ex = LocalExchange(disc)
    E, n, ne, neb = ex.E, ex.n_loc, ex.ne, ex.n_edge_block
    print(f"E={E} n={n} device={jax.devices()[0]}")

    rng = np.random.RandomState(0)
    uL = jnp.asarray(rng.standard_normal((E, n)).astype(np.float32))

    nb_lin = np.asarray(ex.nb_lin)

    # --- edge variants ---------------------------------------------------
    def edge_base(v):
        F = v[:, 4:4 + neb].reshape(E * 4, ne)
        recv = F[ex.nb_lin].reshape(E, 4, ne)
        recv = jnp.where(ex.flip, jnp.flip(recv, axis=2), recv)
        recv = jnp.where(ex.has_nb, recv, 0.0)
        edges = F.reshape(E, 4, ne) + recv
        return v.at[:, 4:4 + neb].set(edges.reshape(E, neb))

    def edge_unique(v):
        F = v[:, 4:4 + neb].reshape(E * 4, ne)
        recv = jnp.take(F, ex.nb_lin, axis=0, unique_indices=True,
                        indices_are_sorted=False)
        recv = recv.reshape(E, 4, ne)
        recv = jnp.where(ex.flip, jnp.flip(recv, axis=2), recv)
        recv = jnp.where(ex.has_nb, recv, 0.0)
        edges = F.reshape(E, 4, ne) + recv
        return v.at[:, 4:4 + neb].set(edges.reshape(E, neb))

    # roll-based: detect constant-offset partner per face slot
    # partner element and face for each (e, f)
    nb_elem = nb_lin.reshape(E, 4) // 4
    nb_face = nb_lin.reshape(E, 4) % 4
    has = np.asarray(ex.has_nb)[..., 0]
    offsets = nb_elem - np.arange(E)[:, None]
    regular = np.zeros(4, dtype=bool)
    delta = np.zeros(4, dtype=np.int64)
    pface = np.zeros(4, dtype=np.int64)
    for f in range(4):
        m = has[:, f]
        if m.sum() == 0:
            continue
        offs = offsets[m, f]
        pf = nb_face[m, f]
        if np.all(offs == offs[0]) and np.all(pf == pf[0]):
            regular[f] = True
            delta[f] = offs[0]
            pface[f] = pf[0]
    print("regular face slots:", regular, "delta:", delta, "pface:", pface)
    flip_np = np.asarray(ex.flip)[..., 0]
    has_d = jnp.asarray(has)
    flips_const = [bool(flip_np[has[:, f], f].any()) for f in range(4)]
    print("flips:", flips_const)

    if regular.all():
        def edge_roll(v):
            Fv = v[:, 4:4 + neb].reshape(E, 4, ne)
            parts = []
            for f in range(4):
                src = jnp.roll(Fv[:, pface[f], :], -int(delta[f]), axis=0)
                if flips_const[f]:
                    src = src[:, ::-1]
                src = jnp.where(has_d[:, f][:, None], src, 0.0)
                parts.append(Fv[:, f, :] + src)
            edges = jnp.stack(parts, axis=1)
            return v.at[:, 4:4 + neb].set(edges.reshape(E, neb))
    else:
        edge_roll = None

    # --- vertex variants -------------------------------------------------
    def vert_base(v):
        verts = v[:, :4].reshape(E * 4)
        summed = jnp.zeros((ex.n_vertices,), v.dtype).at[
            ex.vert_gid].add(verts)
        return v.at[:, :4].set(summed[ex.vert_gid].reshape(E, 4))

    # partner-gather: per vertex copy, indices of the other copies
    vert_gid = np.asarray(ex.vert_gid)
    order = np.argsort(vert_gid, kind="stable")
    sorted_gid = vert_gid[order]
    starts = np.searchsorted(sorted_gid, np.arange(ex.n_vertices))
    counts = np.bincount(vert_gid, minlength=ex.n_vertices)
    V = counts.max()
    print("max valence:", V)
    partners = np.full((E * 4, V - 1), E * 4, dtype=np.int32)  # sentinel
    for c in range(E * 4):
        g = vert_gid[c]
        mem = order[starts[g]:starts[g] + counts[g]]
        others = mem[mem != c]
        partners[c, :others.size] = others
    partners_d = jnp.asarray(partners)

    def vert_partner(v):
        verts = v[:, :4].reshape(E * 4)
        vpad = jnp.concatenate([verts, jnp.zeros((1,), verts.dtype)])
        gathered = vpad[partners_d]            # (E*4, V-1)
        summed = verts + jnp.sum(gathered, axis=1)
        return v.at[:, :4].set(summed.reshape(E, 4))

    def vert_partner_unique(v):
        verts = v[:, :4].reshape(E * 4)
        vpad = jnp.concatenate([verts, jnp.zeros((1,), verts.dtype)])
        gathered = jnp.take(vpad, partners_d, axis=0)
        summed = verts + jnp.sum(gathered, axis=1)
        return v.at[:, :4].set(summed.reshape(E, 4))

    # roll-based vertices for the structured case: partners of copy (e, c)
    # are at constant element offsets when the mesh is structured
    part_elem = partners // 4
    part_copy = partners % 4
    vert_regular = True
    vdeltas = np.zeros((4, V - 1), dtype=np.int64)
    vcopies = np.zeros((4, V - 1), dtype=np.int64)
    vvalid = np.zeros((4, V - 1), dtype=bool)
    for c in range(4):
        rows = np.arange(E) * 4 + c
        for j in range(V - 1):
            pr = partners[rows, j]
            valid = pr != E * 4
            if valid.sum() == 0:
                continue
            offs = part_elem[rows[valid], j] - np.arange(E)[valid]
            cps = part_copy[rows[valid], j]
            if np.all(offs == offs[0]) and np.all(cps == cps[0]):
                vvalid[c, j] = True
                vdeltas[c, j] = offs[0]
                vcopies[c, j] = cps[0]
            else:
                vert_regular = False
    print("vertex regular:", vert_regular)
    valid_mask = jnp.asarray(partners != E * 4)

    if vert_regular:
        def vert_roll(v):
            Vv = v[:, :4]                      # (E, 4)
            outs = []
            for c in range(4):
                acc = Vv[:, c]
                for j in range(V - 1):
                    if not vvalid[c, j]:
                        continue
                    src = jnp.roll(Vv[:, vcopies[c, j]],
                                   -int(vdeltas[c, j]), axis=0)
                    m = valid_mask[c::4, j] if False else valid_mask[
                        jnp.arange(E) * 4 + c, j]
                    acc = acc + jnp.where(m, src, 0.0)
                outs.append(acc)
            return v.at[:, :4].set(jnp.stack(outs, axis=1))
    else:
        vert_roll = None

    variants = {
        "edge_base": edge_base,
        "edge_unique": edge_unique,
        "vert_base": vert_base,
        "vert_partner": vert_partner,
        "vert_partner_unique": vert_partner_unique,
    }
    if edge_roll is not None:
        variants["edge_roll"] = edge_roll
    if vert_roll is not None:
        variants["vert_roll"] = vert_roll

    for name, f in variants.items():
        t = chain(f, uL)
        print(f"{name:22s} {t * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
