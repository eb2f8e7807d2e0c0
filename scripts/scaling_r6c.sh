#!/bin/bash
# Round-6 scaling top-up: the main session's 32-wide level never saw a
# clean window (per-run steal 19.7k-242k jiffies; min/min 0.765). More
# interleaved kernel pairs in hope of a quieter window, same
# protocol/graph/log as scaling_r6.sh.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=96g
export SPARK_LOCAL_DIRS=/dev/shm/graft-shuffle
export SPARK_GRAFT_SCAN_CONVS=28000000
GRAPH=/tmp/scale_graph
LOG=/tmp/scaling_r6.jsonl
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
for i in 1 2 3 4; do
  run_one 8 3 scan_derive
  run_one 32 3 scan_derive
done
echo '{"meta":"done-topup"}' >> "$LOG"
