#!/bin/bash
# r14 decade campaign: measure whether the fractional-bit LSH budget
# (Vectors.autoBitsFrac) + mass-scaled shuffle (AQE initialPartitionNum
# headroom) collapsed the r13 pair-graph decade residual (emb_dup_sweep
# 51x, emb_clusters 50x, emb_knn_purity 42x, emb_keep_best 32x for 10x
# data), and give the filtered-ANN family its first scale rows.
#
# Usage: tools/scale_r14.sh [stage]
#   build   — /tmp/sf10 (100x) + /tmp/sf100 (1000x), docs+embeddings only
#   probe   — PairProbe stage decomposition at both scales
#   bench   — weak-four + audits + filtered family at both scales
set -euo pipefail
cd /root/repo
STAGE="${1:-all}"

SUBSET=emb_dup_sweep,emb_clusters,emb_knn_purity,emb_keep_best,emb_lsh_load,emb_cosine_pairs,emb_ann_filtered,emb_ann_filtered_pq,emb_ann_filtered_recall,emb_ann_filtered_pq_recall

if [ "$STAGE" = build ] || [ "$STAGE" = all ]; then
  [ -d /tmp/sf10/documents.parquet ] || SPARK_GRAFT_CPUS=24 \
    sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf10 100 documents,embeddings"
  [ -d /tmp/sf100/documents.parquet ] || SPARK_GRAFT_CPUS=24 \
    sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf100 1000 documents,embeddings"
fi

if [ "$STAGE" = probe ] || [ "$STAGE" = all ]; then
  for d in /tmp/sf10 /tmp/sf100; do
    echo "=== PairProbe $d (campaign config: shuffle=96, AQE headroom 2048) ==="
    SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
      sbt -batch "runMain graft.sim.PairProbe $d" 2>&1 | grep '\[pairprobe\]'
  done
fi

if [ "$STAGE" = bench ] || [ "$STAGE" = all ]; then
  SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
    SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_ONLY="$SUBSET" \
    SPARK_GRAFT_WARMUP_DIR=/root/testdata/sf0.001 \
    SPARK_GRAFT_BENCH_OUT=/tmp/r14_100x.json \
    SPARK_GRAFT_PROVENANCE="quiet, local[24], shuffle=96, AQE initial=2048, r14 frac-bit generator (11@16+5@15 at 200k)" \
    sbt -batch "runMain graft.Bench"
  SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
    SPARK_GRAFT_SF_DIR=/tmp/sf100 SPARK_GRAFT_ONLY="$SUBSET" \
    SPARK_GRAFT_WARMUP_DIR=/root/testdata/sf0.001 \
    SPARK_GRAFT_BENCH_OUT=/tmp/r14_1000x.json \
    SPARK_GRAFT_PROVENANCE="quiet, local[24], shuffle=96, AQE initial=2048, r14 frac-bit generator (15@19+1@18 at 2M)" \
    sbt -batch "runMain graft.Bench"
fi
