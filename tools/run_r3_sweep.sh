#!/bin/bash
# Round-3 scaling-evidence campaign: quiet-gated N-vs-4N pairs.
cd /root/repo
export SWEEP_ITERS=3
for i in 1 2; do
  SWEEP_PAIR=4,16 SWEEP_REPLICATE=300 python tools/bench_sweep.py baseline
done
for i in 1 2; do
  SWEEP_PAIR=8,32 SWEEP_REPLICATE=300 python tools/bench_sweep.py baseline
done
SWEEP_PAIR=4,16 SWEEP_REPLICATE=600 python tools/bench_sweep.py baseline
echo "SWEEP CAMPAIGN DONE"
