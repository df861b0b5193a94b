#!/bin/bash
# r15 decade campaign: measure whether the SQ8 verify prescreen
# (Vectors.sq8Admit — the map-side kill of background collisions before
# the distinct and the full-vector join-back) collapsed the r14 pair-
# family decade residual (tracked 1000x/100x ratios 23-51x for
# emb_clusters / emb_keep_best / emb_knn_purity / emb_cosine_pairs, and
# 100x absolutes ~2x worse than r13), with FORCED REPS on every row
# (SPARK_GRAFT_REPS=2 - no more cold singles), the PairProbe stage
# decomposition run at BOTH consumer taus (0.4 clusters / 0.8 sweep) so
# the FULL-generator row reconciles with the tracked queries, and the
# high-cardinality bucketed filtered-ANN layout driven end-to-end.
#
# Usage: tools/scale_r15.sh [stage]
#   build   - /tmp/sf10 (100x) + /tmp/sf100 (1000x), docs+embeddings only
#   probe   - PairProbe at tau 0.4 and 0.8, both scales
#   bench   - pair family + filtered family, reps=2, both scales
#   labels  - LabelProbe: bucketed filtered layout at 1024 labels, 100x
set -euo pipefail
cd /root/repo
STAGE="${1:-all}"

SUBSET=emb_dup_sweep,emb_clusters,emb_knn_purity,emb_keep_best,emb_lsh_load,emb_cosine_pairs,emb_knn,emb_ann_filtered,emb_ann_filtered_pq

if [ "$STAGE" = build ] || [ "$STAGE" = all ]; then
  [ -d /tmp/sf10/documents.parquet ] || SPARK_GRAFT_CPUS=24 \
    sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf10 100 documents,embeddings"
  [ -d /tmp/sf100/documents.parquet ] || SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=24 \
    sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf100 1000 documents,embeddings"
fi

if [ "$STAGE" = probe ] || [ "$STAGE" = all ]; then
  for d in /tmp/sf10 /tmp/sf100; do
    for tau in 0.4 0.8; do
      echo "=== PairProbe $d tau=$tau (campaign config: shuffle=96, AQE headroom 2048) ==="
      SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
        sbt -batch "runMain graft.sim.PairProbe $d $tau" 2>&1 | grep '\[pairprobe\]'
    done
  done
fi

if [ "$STAGE" = bench ] || [ "$STAGE" = all ]; then
  SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
    SPARK_GRAFT_REPS=2 SPARK_GRAFT_GC_EACH=1 \
    SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_ONLY="$SUBSET" \
    SPARK_GRAFT_WARMUP_DIR=/root/testdata/sf0.001 \
    SPARK_GRAFT_BENCH_OUT=/tmp/r15_100x.json \
    SPARK_GRAFT_PROVENANCE="quiet, local[24], shuffle=96, AQE initial=2048, reps=2, r15 sq8-prescreen generator (11@16+5@15 at 200k)" \
    sbt -batch "runMain graft.Bench"
  SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
    SPARK_GRAFT_REPS=2 SPARK_GRAFT_GC_EACH=1 \
    SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_ONLY="$SUBSET" \
    SPARK_GRAFT_WARMUP_DIR=/root/testdata/sf0.001 \
    SPARK_GRAFT_BENCH_OUT=/tmp/r15_1000x.json \
    SPARK_GRAFT_PROVENANCE="quiet, local[24], shuffle=96, AQE initial=2048, reps=2, r15 sq8-prescreen generator (15@19+1@18 at 2M)" \
    sbt -batch "runMain graft.Bench"
fi

if [ "$STAGE" = labels ] || [ "$STAGE" = all ]; then
  SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
    sbt -batch "runMain graft.sim.LabelProbe /tmp/sf10 1024 2" 2>&1 | grep '\[labelprobe\]'
fi
