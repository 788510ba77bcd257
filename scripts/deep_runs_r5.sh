#!/bin/bash
# Round-5 deep scaling runs: re-measure merge @64M after the per-unit
# broadcast fix (the r4 0.525/0.585 was root-caused to a broadcast->
# shuffle plan flip past the fixed 256 MB cap), then merge_skewed @16M
# (shares the rewrite join), then the first cluster run @64M for a
# uniform scaling story. 48g heap (8g OOM'd 64M merge legs in r4).
set -x
cd /root/repo
export SPARK_GRAFT_SCALING_N=1
export SPARK_GRAFT_DEEP_REPS=3
export SPARK_DRIVER_MEMORY=48g
echo "=== MERGE DEEP 64M START $(date)"
SPARK_GRAFT_DEEP_ROWS=64000000 timeout 13000 python bench.py --scaling-merge
echo "=== MERGE DEEP DONE rc=$? $(date)"
echo "=== MERGE_SKEWED DEEP 16M START $(date)"
SPARK_GRAFT_DEEP_ROWS=16000000 timeout 5000 python bench.py --scaling-merge-skewed
echo "=== MERGE_SKEWED DEEP DONE rc=$? $(date)"
echo "=== CLUSTER DEEP 64M START $(date)"
SPARK_GRAFT_DEEP_ROWS=64000000 timeout 10000 python bench.py --scaling-cluster
echo "=== CLUSTER DEEP DONE rc=$? $(date)"
