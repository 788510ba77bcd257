#!/bin/bash
# Round-4 deep scaling runs, attempt 3: 48g heap (the 8g default OOM'd
# the 64M merge legs), merge first, skewed second, cluster last
# (cluster already clears the bar at 16M).
set -x
cd /root/repo
export SPARK_GRAFT_SCALING_N=1
export SPARK_GRAFT_DEEP_ROWS=64000000
export SPARK_GRAFT_DEEP_REPS=3
export SPARK_DRIVER_MEMORY=48g
echo "=== MERGE DEEP START $(date)"
timeout 14000 python bench.py --scaling-merge
echo "=== MERGE DEEP DONE rc=$? $(date)"
echo "=== MERGE_SKEWED DEEP START $(date)"
timeout 10000 python bench.py --scaling-merge-skewed
echo "=== MERGE_SKEWED DEEP DONE rc=$? $(date)"
echo "=== CLUSTER DEEP START $(date)"
timeout 10000 python bench.py --scaling-cluster
echo "=== CLUSTER DEEP DONE rc=$? $(date)"
