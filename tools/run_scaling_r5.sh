#!/bin/bash
# Round-5 scaling-gate replication (VERDICT r4 next-round #1): interleaved
# best-of-N 2v8 pairs at 1M (n=3), 3M (n=2), 6M (n=2), small-corpus warmups.
set -x
cd /root/repo
export EUROPA_SCALING_LEVELS=2,8 EUROPA_SCALING_WARMUP_ROWS=200000
EUROPA_SCALING_RUNS=3 EUROPA_BENCH_ROWS=1000000 python tools/scaling_bench.py
EUROPA_SCALING_RUNS=2 EUROPA_BENCH_ROWS=3000000 python tools/scaling_bench.py
EUROPA_SCALING_RUNS=2 EUROPA_BENCH_ROWS=6000000 python tools/scaling_bench.py
echo SCALING_ALL_DONE
