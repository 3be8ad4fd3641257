#!/bin/bash
# Round-4 scaling + attribution campaign. Serial, detached; nothing else
# may run on the machine (BENCH/BASELINE.md methodology: host throughput
# fluctuates up to 2.6x between identical runs — only best-of-N from a
# quiet serial campaign is usable). Widths run ROUND-ROBIN so each
# rep's 2/8/32 triple shares one host window (same-window probe pairs,
# the round-3 discipline for any scaling claim).
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OUT=${1:-/tmp/scaling_results_r4.jsonl}
LOG=${OUT%.jsonl}.log
: > "$OUT"; : > "$LOG"
JOPTS="--add-exports java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED \
 --add-opens java.base/java.lang=ALL-UNNAMED \
 --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED"

one() { # cpus mult pipeline_only rep
  echo "=== cpus=$1 mult=$2 ponly=$3 rep=$4 $(date -u +%H:%M:%S) ===" >> "$LOG"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$1 \
  SPARK_GRAFT_MULT=$2 SPARK_GRAFT_PIPELINE_ONLY=$3 SPARK_GRAFT_REPS=3 \
    java -Xmx16g $JOPTS -cp "$CP" graft.Bench 2>/dev/null \
    | tee -a "$LOG" | grep '"metric"' >> "$OUT"
}

# 1) one full headline bench at 32 threads (query table + pipeline
#    stage counters at mult=1)
one 32 1 "" 0
# 2) scaling: 5 round-robin reps of {2, 8, 32} at mult=16, pipeline only
for rep in 1 2 3 4 5; do
  for c in 2 8 32; do
    one "$c" 16 1 "$rep"
  done
done
echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> "$LOG"
