#!/bin/bash
# Round-7 scaling evidence (BASELINE.md protocol; identical kernel/input to
# rounds 1-6 for cross-round comparability). Interleaved local[8]/local[32]
# runs on the identical prepped graph, min-over-runs estimator, /proc/stat
# steal deltas logged per run.
#
# Round-6 verdict "Next round #1": run FIRST thing in the round before
# sbt/bench contention, and report a STEAL-CENSORED estimator alongside
# min/min. Censoring threshold DECLARED BEFORE MEASUREMENT (this file,
# committed before the runs): a run is "clean" iff its steal_delta <= 1000
# jiffies (prior clean runs measured 38-776; dirty runs 16k-454k).
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
export SPARK_LOCAL_DIRS=/dev/shm/graft-shuffle
export SPARK_GRAFT_SCAN_CONVS=28000000
GRAPH=${1:-/tmp/scale_graph}
LOG=${2:-/tmp/scaling_r7.jsonl}

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

if [ ! -d "$GRAPH/edges" ]; then
  s0=$(steal); t0=$(date +%s)
  sbt -batch "runMain graft.tools.ScalingBench prep 28000000 $GRAPH 32" 2>/dev/null \
    | grep -a '"mode"' | sed 's/^\[info\] //' >> "$LOG"
  s1=$(steal); t1=$(date +%s)
  echo "{\"meta\":\"steal\",\"algo\":\"prep\",\"steal_delta\":$((s1 - s0)),\"wall_total\":$((t1 - t0))}" >> "$LOG"
fi

# parallel-structure kernel: interleaved pairs (count from $3, default 4)
PAIRS=${3:-4}
for i in $(seq 1 "$PAIRS"); do
  run_one 8 3 scan_derive
  run_one 32 3 scan_derive
done

echo '{"meta":"done-r7"}' >> "$LOG"
