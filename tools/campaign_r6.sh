#!/usr/bin/env bash
# Round-6 evidence runs (executed serially, nothing else on the box;
# raw outputs committed under BENCH/raw_r6/). Reproduces the numbers
# cited in BENCH/BASELINE.md round-6 sections.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p BENCH/raw_r6

# 1. Full calib-GATED headline bench (15 headline queries + pipeline).
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' \
  | sed 's/^\[info\] //' > BENCH/raw_r6/head_full.json

# 2. docFacts same-window interleaved A/B (old = pre-docFacts commit
#    a216dcb compiled to /tmp/graft_ab_old): alternate old/new
#    pipeline-only legs at 32t/sf0.1/mult=1 and compare seconds +
#    edges-stage counters. (Run manually; results in BASELINE.md
#    §2c-r6 — parity, flat volumes.)

# 3. x64 scaling refresh: {2, 8, 32} threads on the same amplified
#    corpus (9.6M pages), pipeline-only, one attempt each.
for t in 2 8 32; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$t \
    SPARK_GRAFT_MULT=64 SPARK_GRAFT_PIPELINE_ONLY=1 \
    SPARK_GRAFT_CALIB_RETRIES=1 \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' \
    | sed 's/^\[info\] //' >> BENCH/raw_r6/scaling_x64.jsonl
done

# 4. Correctness at 10x gate scale: the FULL oracle suite at sf0.1
#    (driver gate runs sf0.01; 95 queries as of late r6).
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01"
python3 tools/compare.py /root/testdata/sf0.1 /tmp/verify_sf01

# 5. Curation-family timings at sf0.1 (late-r6 additions; additive
#    artifact — queries_override:true marks the total as non-headline).
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_QUERIES=q_dedup_exact,q_dup_clusters,q_decontaminate,q_filter_funnel,q_mix_sample,q_stratified_sample,q_pii_redact,q_url_canon,q_curated_corpus \
  SPARK_GRAFT_CALIB_RETRIES=1 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' \
  | sed 's/^\[info\] //' > BENCH/raw_r6/curation_times.json
