"""Per-phase wall-clock breakdown of one warm squirmer Newton solve.

The warm Newton solve measures ~8.8 s (round-2c) at E=135, p=8 — far
above dispatch-latency accounting (~6 steps x ~5 dispatches x ~28 ms
~ 0.9 s).  This probe splits one warm step into (a) the GMRES restart
ladder (timed via a shim around solver.gmres._gmres_cycles) and (b)
everything else (f64 Jacobian assembly, f32 Schur factorization,
prelude norm, host syncs), and reports per-Newton-step wall-clock.

Run ON the TPU host, nothing else using the chip:

    python scripts/profile_squirmer.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import importlib

    from spectralelementmethod_tpu.mesh import annulus_mesh
    from spectralelementmethod_tpu.models.squirmer import Squirmer

    # `import ...solver.gmres as G` would bind the package attribute,
    # which solver/__init__.py rebinds to the gmres *function*
    G = importlib.import_module("spectralelementmethod_tpu.solver.gmres")

    t0 = time.perf_counter()
    mesh = annulus_mesh(order=8, n_theta=9, n_r=15, r_outer=100.0,
                        progression=1.35)
    sq = Squirmer(mesh, order=8)
    sq.set_initial_guess()
    print(f"[setup {time.perf_counter() - t0:.1f}s]", flush=True)

    # shim BEFORE the step builder runs (it from-imports at call time)
    orig_cycles_fn = G._gmres_cycles
    timings = {"gmres": []}

    def timed_cycles(A, M, dot, m, *extra, **kw):
        cycles = orig_cycles_fn(A, M, dot, m, *extra, **kw)

        def wrapped(k, x, b, stop, A_c, M_c, dot_c):
            t0 = time.perf_counter()
            out = cycles(k, x, b, stop, A_c, M_c, dot_c)
            jax.block_until_ready(out)
            timings["gmres"].append((k, time.perf_counter() - t0))
            return out
        return wrapped

    G._gmres_cycles = timed_cycles
    try:
        t0 = time.perf_counter()
        sq.run(1.0, beta=1.0, speed=1.0, it_max=10, tol=1e-6)
        print(f"[cold solve {time.perf_counter() - t0:.1f}s]", flush=True)

        sq.set_initial_guess()
        sq.set_boundary_conditions(speed=1.0, beta=1.0)
        n_rey = float(sq.phys_params["N_Re"])
        cint = jnp.asarray(sq.cint, dtype=sq.dtype)
        free_ext = sq._free_ext
        step = sq._step_fn

        for itn in range(8):
            timings["gmres"].clear()
            t_it = time.perf_counter()
            soln_dev = jnp.asarray(sq.soln, dtype=sq.dtype)
            dsoln = step(soln_dev, n_rey, cint, free_ext)
            total = time.perf_counter() - t_it
            sq.soln += dsoln
            du = float(np.linalg.norm(dsoln[:, 1]))
            g = list(timings["gmres"])
            t_g = sum(dt for _k, dt in g)
            print(f"[newton {itn}: total {total:.3f}s | gmres {t_g:.3f}s "
                  f"in {len(g)} batches {[(k, round(dt, 3)) for k, dt in g]}"
                  f" | rest {total - t_g:.3f}s | ||du||={du:.3e}]",
                  flush=True)
            if du < 1e-6:
                break
    finally:
        G._gmres_cycles = orig_cycles_fn


if __name__ == "__main__":
    main()
