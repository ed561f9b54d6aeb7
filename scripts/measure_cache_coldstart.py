"""Squirmer cold-start A/B: persistent compilation cache (VERDICT item 8).

Round-2i measured 119-157 s of XLA compiles on the first squirmer Newton
solve of a process.  ``config.enable_compilation_cache`` (wired into the
squirmer constructor) persists compiled executables; this script runs
the same cold solve in two FRESH subprocesses sharing one cache dir and
reports first (cache-miss) vs second (cache-hit) wall-clock.

Run ON the TPU host:  python scripts/measure_cache_coldstart.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import time

t0 = time.perf_counter()
import numpy as np

from spectralelementmethod_tpu.config import enable_x64

enable_x64()
from spectralelementmethod_tpu.mesh import annulus_mesh
from spectralelementmethod_tpu.models import squirmer as sqm

mesh = annulus_mesh(order=8, n_theta=9, n_r=15, r_outer=100.0,
                    progression=1.35, node_placement="gmsh")
sq = sqm.Squirmer(mesh, order=8)
sq.set_initial_guess()
t_build = time.perf_counter() - t0

t0 = time.perf_counter()
sq.set_boundary_conditions(speed=1.0, beta=1.0)
sq.compute_operators(1.0)
sq.solve(it_max=10, tol=1e-6, verbose=False)
t_solve = time.perf_counter() - t0
print(f"CHILD_RESULT build={t_build:.1f} first_solve={t_solve:.1f}")
"""


def run_child(cache_dir, tag):
    env = dict(os.environ, SEM_TPU_CACHE_DIR=cache_dir)
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, capture_output=True,
        text=True, cwd=os.path.join(os.path.dirname(__file__), ".."),
        timeout=3600)
    dt = time.perf_counter() - t0
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("CHILD_RESULT")]
    print(json.dumps({"arm": tag, "wallclock_s": round(dt, 1),
                      "detail": line[0] if line else None,
                      "rc": out.returncode}), flush=True)
    if out.returncode:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-4000:], file=sys.stderr)
    return dt


def main():
    cache = tempfile.mkdtemp(prefix="semcache_")
    print(f"cache dir: {cache}", flush=True)
    run_child(cache, "cold (cache miss)")
    run_child(cache, "cold process, warm cache")
    n_files = sum(len(fs) for _, _, fs in os.walk(cache))
    print(json.dumps({"cache_entries": n_files}), flush=True)


if __name__ == "__main__":
    main()
