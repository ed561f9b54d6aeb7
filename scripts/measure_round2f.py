"""Round-2f measurement batch — run when the TPU terminal recovers.

One process, stages ordered cheapest-first so partial runs still pay:

  1. squirmer per-phase profile (warm Newton breakdown: GMRES ladder vs
     assemble/factor/syncs) + device-resident-iterate timing
     (squirmer_warm_newton_s / squirmer_calc_speed_s after the round-2e
     D2H fix — targets: <= 3 s / <= 40 s)
  2. DMA stream-count probe (exp_dma_streams: does k-way operand
     splitting scale the ~300 GB/s single-stream copy ceiling?)
  3. panel-vs-lex A/B at 1M elements (measure_panel: fused apply + CG
     with the halo shrunk from row stride to 128 lanes)

Usage (ON the TPU host, nothing else using the chip):

    python scripts/measure_round2f.py [--skip N]
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def run(name, argv, timeout_s):
    print(f"\n##### {name} @ {time.strftime('%H:%M:%S')} #####", flush=True)
    try:
        subprocess.run([sys.executable] + argv, timeout=timeout_s,
                       cwd=os.path.join(HERE, os.pardir))
    except subprocess.TimeoutExpired:
        print(f"[{name}: TIMED OUT after {timeout_s}s]", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{name}: failed to launch — {e}]", flush=True)


def main():
    skip = 0
    if "--skip" in sys.argv:
        skip = int(sys.argv[sys.argv.index("--skip") + 1])
    stages = [
        ("squirmer profile", [os.path.join(HERE, "profile_squirmer.py")],
         3600),
        ("squirmer wall-clock", [os.path.join(HERE, "measure_round2c.py"),
                                 "--only", "squirmer"], 3600),
        ("dma streams", [os.path.join(HERE, "exp_dma_streams.py")], 3600),
        ("panel A/B 1M", [os.path.join(HERE, "measure_panel.py")], 5400),
    ]
    for name, argv, t in stages[skip:]:
        run(name, argv, t)
    print("\n##### all round-2f stages done #####", flush=True)


if __name__ == "__main__":
    main()
