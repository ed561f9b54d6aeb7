"""Profile the production apply+DSS chain: per-HLO-op times via jax.profiler.

Development tool, not part of the suite.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from spectralelementmethod_tpu.basis import gll_basis_2d
    from spectralelementmethod_tpu.core.discretization import Discretization
    from spectralelementmethod_tpu.mesh import rectangle_mesh
    from spectralelementmethod_tpu.models.poisson import Poisson
    from spectralelementmethod_tpu.ops import sumfac
    from spectralelementmethod_tpu.ops.exchange import make_exchange

    p = 8
    nx = ny = 316
    mesh = rectangle_mesh(nx, ny, p)
    disc = Discretization(mesh, gll_basis_2d(p))
    prob = Poisson(disc, dtype=np.float32)
    E = disc.E
    ex = make_exchange(disc)
    Gf = prob._G.reshape(E, 3, -1)
    D = np.asarray(prob._D0)
    Dhat = sumfac.make_stacked_derivative(D, D)
    A = sumfac.make_local_laplacian_operator(ex, Gf, Dhat, backend="xla")
    rng = np.random.RandomState(0)
    uL = jnp.asarray(rng.standard_normal((ex.E, ex.n_loc)).astype(np.float32))

    reps = 50

    @jax.jit
    def chain(u):
        def body(i, x):
            y = A(x)
            return y * jax.lax.rsqrt(jnp.vdot(y, y).astype(y.dtype) + 1e-30)
        return jax.lax.fori_loop(0, reps, body, u)

    chain(uL).block_until_ready()
    t0 = time.perf_counter()
    chain(uL).block_until_ready()
    t = (time.perf_counter() - t0) / reps
    print(f"apply+norm: {t*1e3:.3f} ms", flush=True)

    tracedir = "/tmp/jaxtrace"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        chain(uL).block_until_ready()

    # parse the trace: sum device-side op durations by name
    paths = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found", flush=True)
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    by_name = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid = ev.get("pid")
        name = ev.get("name", "")
        args = ev.get("args", {})
        # device ops have 'run_id'/'hlo' style args; keep TensorFlow Op/XLA ops
        cat = args.get("group_id", None)
        dur = ev.get("dur", 0)
        if "tid" in ev and dur > 0:
            key = name
            by_name[key] = by_name.get(key, [0, 0])
            by_name[key][0] += dur
            by_name[key][1] += 1
    items = sorted(by_name.items(), key=lambda kv: -kv[1][0])[:40]
    for name, (dur, cnt) in items:
        print(f"{dur/1e3/ (2*reps):9.4f} ms x~  {cnt:5d}  {name[:110]}",
              flush=True)


if __name__ == "__main__":
    main()
