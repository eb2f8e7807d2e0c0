#!/bin/bash
# Round-6 two-parallelism scaling evidence (BASELINE.md protocol; identical
# to rounds 3-5 for cross-round comparability). Interleaved local[8]/local[32]
# runs on the identical prepped graph, min-over-runs estimator, /proc/stat
# steal deltas logged per run. Round-5 verdict "Next round #6": one extra
# interleaved kernel pair (6 vs 5) and the cleanest-pair estimator reported
# alongside min/min so the headline does not rest on one estimator choice
# in a bad window.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
export SPARK_LOCAL_DIRS=/dev/shm/graft-shuffle
export SPARK_GRAFT_SCAN_CONVS=28000000
GRAPH=${1:-/tmp/scale_graph}
LOG=${2:-/tmp/scaling_r6.jsonl}

steal() { awk '/^cpu /{print $9}' /proc/stat; }

run_one() { # cores iters algo
  local c=$1 iters=$2 algo=$3
  local s0 s1 t0 t1
  s0=$(steal); t0=$(date +%s)
  sbt -batch "runMain graft.tools.ScalingBench run $c $GRAPH $iters $algo" 2>/dev/null \
    | grep -a '"mode"' | sed 's/^\[info\] //' >> "$LOG"
  s1=$(steal); t1=$(date +%s)
  echo "{\"meta\":\"steal\",\"algo\":\"$algo\",\"cores\":$c,\"steal_delta\":$((s1 - s0)),\"wall_total\":$((t1 - t0))}" >> "$LOG"
}

# 1. parallel-structure kernel: 6 interleaved pairs (round-5 verdict #6)
for i in 1 2 3 4 5 6; do
  run_one 8 3 scan_derive
  run_one 32 3 scan_derive
done

# 2. PageRank salted iteration: 2 interleaved pairs
for i in 1 2; do
  run_one 8 12 pagerank_salted
  run_one 32 12 pagerank_salted
done

# 3. PageRank packed (CSR + codegen'd CsrExpand): 1 pair
run_one 8 12 pagerank_packed
run_one 32 12 pagerank_packed

echo '{"meta":"done"}' >> "$LOG"
