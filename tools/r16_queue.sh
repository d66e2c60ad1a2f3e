#!/usr/bin/env bash
# Round-16 measurement queue — strictly SEQUENTIAL sbt runs (shared
# target/ + CPU contention pollutes measurements). Each step copies its
# artifact aside; the sf0.1 bench files land LAST so the committed
# bench.json/bench_full.json stay the canonical driver-SF numbers.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo "[r16queue $(date +%H:%M:%S)] $*"; }
REL_SUBSET="q1_pricing_summary,q47,q55,q71,q89,q93,q94,q105,q109,q127,q141,q147"

run() { # run NAME -- cmd...
  local name=$1; shift; shift
  log "START $name"
  "$@" > "/tmp/r16_${name}.log" 2>&1
  local rc=$?
  log "DONE  $name rc=$rc"
  return 0
}

# 1. quiet sf0.1 bench (verdict #4): fresh post-q94-fix numbers + the
#    154-query registry; becomes the committed bench.json
run bench_sf01 -- env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench"
cp bench.json /tmp/r16_bench_sf01.json
cp bench_full.json /tmp/r16_bench_full_sf01.json

# 2. sampled audits + vector serving at the fourth decade (verdict #5, #7)
run bench_sf100t -- env SPARK_GRAFT_SF_DIR=/tmp/gensf/sf100t \
  SPARK_GRAFT_BENCH_ONLY="q106,q123,q152,q154,q35,q44,q48,q102,q111" \
  sbt -batch "runMain graft.Bench"
cp bench.json bench_sf100t_r16.json
cp bench_full.json bench_full_sf100t_r16.json

# 3. bounded-state streaming at sf100t (verdict #1) + vec write path
#    (verdict #7). TTL 180s ≈ 2 batch intervals at this scale.
run gate_sf100t -- env SPARK_GRAFT_SF_DIR=/tmp/gensf/sf100t \
  SPARK_GRAFT_GATE_STAGES="ttl,compaction,vec" SPARK_GRAFT_TTL_MS=180000 \
  sbt -batch "runMain graft.tools.GateScaleBench"
cp gate_scale.json gate_scale_sf100_bounded.json

# 4. quiet sf100 relational re-run (verdict #2)
run rel_sf100 -- env SPARK_GRAFT_SF_DIR=/tmp/gensf/sf100 \
  SPARK_GRAFT_BENCH_ONLY="$REL_SUBSET" \
  sbt -batch "runMain graft.Bench"
cp bench.json bench_sf100_rel.json
cp bench_full.json bench_full_sf100_rel.json

# 5. skew rehearsal (verdict #6): skewed sf10 lake, same relational
#    subset, byte thresholds scaled to rehearsal size
run gen_skew -- sbt -batch "runMain graft.tools.GenCorpus /tmp/gensf/sf10skew 10 --skew"
run rel_skew -- env SPARK_GRAFT_SF_DIR=/tmp/gensf/sf10skew \
  SPARK_GRAFT_BENCH_ONLY="$REL_SUBSET" \
  SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes=8m;spark.sql.adaptive.advisoryPartitionSizeInBytes=4m" \
  sbt -batch "runMain graft.Bench"
cp bench.json bench_sf10_skew.json
cp bench_full.json bench_full_sf10_skew.json

# flat-sf10 twin of step 5 under identical conf, for the skew delta
run rel_sf10_flat -- env SPARK_GRAFT_SF_DIR=/tmp/gensf/sf10 \
  SPARK_GRAFT_BENCH_ONLY="$REL_SUBSET" \
  SPARK_GRAFT_EXTRA_CONF="spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes=8m;spark.sql.adaptive.advisoryPartitionSizeInBytes=4m" \
  sbt -batch "runMain graft.Bench"
cp bench.json bench_sf10_flat_r16.json

# restore the canonical sf0.1 bench artifacts (step-1 run)
cp /tmp/r16_bench_sf01.json bench.json
cp /tmp/r16_bench_full_sf01.json bench_full.json
log "QUEUE COMPLETE"
