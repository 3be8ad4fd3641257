#!/bin/bash
# Round-5 scaling + attribution campaign. Serial, detached; nothing else
# may run on the machine (BENCH/BASELINE.md methodology). Structure:
#   1) one full headline bench at 32t/mult=1 — exercises the NEW
#      self-attributing JSON (query_counters, calib_ms, pipeline.stages)
#   2) same-window INTERLEAVED A/B at 32t/mult=1, pipeline-only:
#      round-4 HEAD (c731aab, compiled at /tmp/old_r4) vs this HEAD —
#      the lineFacts-fusion evidence (edges-stage scan/CPU drop with
#      volumes in the same window)
#   3) scaling: 3 round-robin reps of {2, 8, 32} at mult=64 (9.6M
#      pages), pipeline only — the N-vs-4N gate number
#   4) best-effort: one {2, 8} pair at mult=128 (19.2M pages)
set -u
cd /root/repo
NEWCP="target/scala-2.13/classes:/opt/spark/jars/*"
OLDCP="/tmp/old_r4/target/scala-2.13/classes:/opt/spark/jars/*"
OUT=${1:-/tmp/scaling_results_r5.jsonl}
LOG=${OUT%.jsonl}.log
: > "$OUT"; : > "$LOG"
JOPTS="--add-exports java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens java.base/java.nio=ALL-UNNAMED \
 --add-opens java.base/java.util=ALL-UNNAMED \
 --add-opens java.base/java.lang=ALL-UNNAMED \
 --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED"

one() { # cpus mult ponly rep cp tag
  # $OUT stays machine-parseable line-delimited JSON: the run context
  # is injected INTO each JSON object (not as separator lines), and
  # stderr goes to $LOG — Bench's "[bench] FAILED <query>" traces must
  # never be discarded (a bare -1.0 sentinel is unexplainable).
  echo "=== tag=$6 cpus=$1 mult=$2 ponly=$3 rep=$4 $(date -u +%H:%M:%S) ===" >> "$LOG"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$1 \
  SPARK_GRAFT_MULT=$2 SPARK_GRAFT_PIPELINE_ONLY=$3 SPARK_GRAFT_REPS=3 \
    java -Xmx16g $JOPTS -cp "$5" graft.Bench 2>>"$LOG" \
    | tee -a "$LOG" | grep '"metric"' \
    | sed "s/^{/{\"tag\":\"$6\",\"rep\":$4,/" >> "$OUT"
}

# 1) full headline bench (new self-attributing JSON)
one 32 1 "" 0 "$NEWCP" head_full

# 2) interleaved A/B: old r4 vs HEAD, mult=1, 32t, pipeline only
for rep in 1 2; do
  one 32 1 1 "$rep" "$OLDCP" old_r4
  one 32 1 1 "$rep" "$NEWCP" head
done

# 3) scaling: 3 round-robin reps of {2, 8, 32} at mult=64
for rep in 1 2 3; do
  for c in 2 8 32; do
    one "$c" 64 1 "$rep" "$NEWCP" head_x64
  done
done

# 4) best-effort x128 pair
one 2 128 1 1 "$NEWCP" head_x128 || true
one 8 128 1 1 "$NEWCP" head_x128 || true

echo "CAMPAIGN DONE $(date -u +%H:%M:%S)" >> "$LOG"
