"""End-to-end solve records via bench.py configs, one process (one
device claim).  Run ON the TPU host, nothing else using the chip:

    python scripts/measure_solve.py [--skip N]

Configs: plain Jacobi (baseline + headline apply), fused-bf16p CG,
fused-bf16p + deferred-x, p-multigrid solve at 100k, and the 1M
p-multigrid solve.  bench.py prints one JSON line per config
(cg_wallclock_s / cg_ms_per_iter / cg_iters in extras).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
os.environ.setdefault("BENCH_VERBOSE", "1")

import bench  # noqa: E402

CONFIGS = [
    [],                                                   # plain jacobi
    ["--cg-mode", "fused-bf16p"],
    ["--cg-mode", "fused-bf16p", "--defer-x", "8"],
    ["--precond", "pmg"],
    ["--elements", "1048576", "--precond", "pmg"],
    ["--elements", "1048576", "--cg-mode", "fused-bf16p",
     "--defer-x", "8"],
]


def main():
    skip = 0
    if "--skip" in sys.argv:
        skip = int(sys.argv[sys.argv.index("--skip") + 1])
    for cfg in CONFIGS[skip:]:
        print(f"\n##### bench {' '.join(cfg) or '(default)'} #####",
              flush=True)
        sys.argv = ["bench.py"] + cfg
        try:
            bench.main()
        except SystemExit as e:
            if e.code not in (0, None):
                print(f"[config failed: exit {e.code}]", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[config failed: {e!r}]", flush=True)


if __name__ == "__main__":
    main()
