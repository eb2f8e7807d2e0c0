#!/bin/bash
# Round-5 scaling top-up: the earlier pagerank pairs ran under steal bursts
# of 28k-86k jiffies; scan_derive min/min sits at 0.767. More interleaved
# pairs in a quieter window, same protocol/graph/log as scaling_r5.sh.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
export SPARK_LOCAL_DIRS=/dev/shm/graft-shuffle
export SPARK_GRAFT_SCAN_CONVS=28000000
GRAPH=/tmp/scale_graph
LOG=/tmp/scaling_r5.jsonl
steal() { awk '/^cpu /{print $9}' /proc/stat; }
run_one() {
  local c=$1 iters=$2 algo=$3
  local s0 s1 t0 t1
  s0=$(steal); t0=$(date +%s)
  sbt -batch "runMain graft.tools.ScalingBench run $c $GRAPH $iters $algo" 2>/dev/null \
    | grep -a '"mode"' | sed 's/^\[info\] //' >> "$LOG"
  s1=$(steal); t1=$(date +%s)
  echo "{\"meta\":\"steal\",\"algo\":\"$algo\",\"cores\":$c,\"steal_delta\":$((s1 - s0)),\"wall_total\":$((t1 - t0))}" >> "$LOG"
}
for i in 1 2 3; do
  run_one 8 3 scan_derive
  run_one 32 3 scan_derive
done
for i in 1 2; do
  run_one 8 12 pagerank_salted
  run_one 32 12 pagerank_salted
done
run_one 8 12 pagerank_packed
run_one 32 12 pagerank_packed
echo '{"meta":"done_r5c"}' >> "$LOG"
