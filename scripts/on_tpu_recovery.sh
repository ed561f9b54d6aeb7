#!/bin/bash
# Runs once when the TPU terminal recovers (launched by the poll loop).
# Stages ordered cheapest-first; one process on the chip at a time.
cd /root/repo
echo "### round2f batch (squirmer profile/wall-clock, DMA streams, panel A/B)"
timeout 14400 python scripts/measure_round2f.py
echo "### deferred-x fused-CG A/B"
timeout 5400 python scripts/measure_deferx.py
echo "### TPU-tier kernel tests"
timeout 3600 python -m pytest tests_tpu/ -q
echo "### solve records (plain / fused / deferred / pmg, 100k + 1M)"
timeout 10800 python scripts/measure_solve.py
echo "### general-path fused kernel + multi-RHS sweep"
timeout 5400 python scripts/measure_multirhs.py
echo "### 3D apply + solve records (p=8 hexes, jacobi vs fdm vs pmg)"
timeout 3600 python bench.py --ndim 3 --elements 20000 --order 8
timeout 3600 python bench.py --ndim 3 --elements 20000 --order 8 --precond fdm
timeout 3600 python bench.py --ndim 3 --elements 20000 --order 8 --precond pmg
echo "### all recovery stages done at $(date -u)"
# Preserve the raw measurement log in-repo even if no session is active
# when the TPU comes back (the driver snapshots the repo at round end).
mkdir -p docs/measurements
cp /tmp/tpuwatch/recovery.out \
   "docs/measurements/recovery_$(date -u +%Y%m%dT%H%M%S).log" 2>/dev/null
git add docs/measurements && git commit -q -m \
  "Record TPU recovery-batch measurement log (automated)" || true
