#!/usr/bin/env bash
# The x-scale dedup/ANN/graph/streaming battery (SCALE.md r18/r19): run
# the scale-shaped entries through the UNCHANGED driver harness against
# a ScaleGen corpus, differential-check with a per-entry oracle budget,
# and lap the bench. Usage:
#
#   tools/scale_battery.sh /tmp/graft_x100  x100            # ~20 min
#   SPARK_DRIVER_MEM=64g tools/scale_battery.sh /tmp/graft_x1000 x1000
#
# Corpora are built once with:
#   sbt "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/graft_x100 10"
#   sbt "runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/graft_x1000 100"
#
# Expected non-PASS rows: the brute-force oracle twins (all-pairs
# Jaccard: q_dedup_minhash / q_dedup_sql / q_dedup_components) report
# ORACLE TIMEOUT at x100+ by design — q_dedup_minhash is closed by
# construction instead (survivor count invariant across multipliers;
# 4,756 on the r18/r19 corpora). Every other entry must PASS and Spark
# errors must be 0.
set -euo pipefail

DIR=${1:?usage: scale_battery.sh <corpusDir> <tag>}
TAG=${2:?usage: scale_battery.sh <corpusDir> <tag>}
BUDGET=${ORACLE_BUDGET:-300}

# 38 entries: 12 dedup + 10 ANN/clustering + 8 graph + 1 spatial +
# 6 streaming + q_cusum (the r19 closed form, a cross-formulation
# differential vs DuckDB's recursive CTE). q_ewma_recursive /
# q_holt_linear (the r19 per-user folds) ride along for the same
# reason.
BATTERY="q_dedup_exact q_dedup_sql q_dedup_ngram q_dedup_simhash \
q_dedup_minhash q_dedup_components q_dedup_incremental q_dedup_indexed \
q_dedup_keep_latest q_chunk_dedup q_typo_join q_semdedup \
q_ann_exact q_ann_lsh q_ann_ivf q_ann_ivf_indexed q_ann_pq q_ann_ivfpq \
q_ann_neardup q_ann_quantized q_kmeans q_knn_classify \
q_pagerank q_triangles q_bfs_hops q_shortest_path q_kcore q_hits \
q_label_prop q_closeness q_point_in_polygon \
q_stream_windowed q_stream_dedup q_stream_sessionize q_stream_topk \
q_stream_funnel q_stream_user_totals \
q_cusum q_ewma_recursive q_holt_linear"

OUT=/tmp/verify_${TAG}_battery
rm -rf "$OUT"
echo "== Verify ($TAG) =="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify $DIR $OUT $BATTERY" \
  > "/tmp/verify_${TAG}.log" 2>&1
grep "\[verify\]" "/tmp/verify_${TAG}.log" && {
  echo "SPARK-SIDE FAILURES — see /tmp/verify_${TAG}.log"; exit 1; } || true

echo "== DuckDB differential (budget ${BUDGET}s/entry) =="
python3 "$(dirname "$0")/check_oracle.py" "$DIR" "$OUT" "$BUDGET" \
  | grep -v "NO SPARK OUTPUT"

echo "== Bench lap =="
SPARK_GRAFT_SF_DIR="$DIR" GRAFT_BENCH_OUT="target/bench_${TAG}.json" \
  sbt -batch "runMain graft.Bench $BATTERY" 2>&1 | grep '"metric"'
echo "record: target/bench_${TAG}.json"
