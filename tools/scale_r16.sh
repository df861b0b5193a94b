#!/bin/bash
# r16 decade campaign: measure whether the text/mm pair-graph fixes
# (CharClassCount + NormText codegen scans, the fused corpusVerdict/
# corpusFunnel single-signal-pass, the Manku block-combination
# pigeonhole grid with the minimal-combo emit, and the one-flip LSH
# recall floor) moved the three r15 weak rows — corpus_shard (548 s /
# 12.2x), corpus_funnel (388 s / 9.7x), mm_dedup_clusters (101 s /
# 12.4x) — and re-price the emb pair family under the one-flip probe
# fan (2x probe rows, sq8-prescreened). Also re-samples
# emb_ann_filtered_pq (the r15 variance row, VERDICT #4) with reps=3.
#
# Usage: tools/scale_r16.sh [stage]
#   probe  - ShardProbe all groups, both scales
#   bench  - touched families, reps, both scales
#   pair   - emb pair family re-price (one-flip), both scales
set -euo pipefail
cd /root/repo
STAGE="${1:-all}"

TEXTSET=corpus_shard,corpus_shard_near,corpus_funnel,corpus_verdict,corpus_filter,dedup_simhash,dedup_simhash_load,dedup_simhash_audit,mm_phash,mm_phash_load,mm_phash_audit,mm_dedup_clusters,mm_keep_best,dedup_keep_best,dedup_clusters,dedup_minhash,corpus_dup_stats_near,text_quality
PAIRSET=emb_dup_sweep,emb_clusters,emb_knn_purity,emb_keep_best,emb_lsh_load,emb_cosine_pairs,emb_knn,emb_ann_filtered,emb_ann_filtered_pq

if [ "$STAGE" = probe ] || [ "$STAGE" = all ]; then
  for d in /tmp/sf10 /tmp/sf100; do
    echo "=== ShardProbe $d (campaign config) ==="
    SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
      sbt -batch "runMain graft.text.ShardProbe $d all" 2>&1 | grep '\[shardprobe\]'
  done
fi

if [ "$STAGE" = bench ] || [ "$STAGE" = all ]; then
  for d in /tmp/sf10 /tmp/sf100; do
    tag=$(basename "$d")
    SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
      SPARK_GRAFT_REPS=2 SPARK_GRAFT_GC_EACH=1 \
      SPARK_GRAFT_SF_DIR="$d" SPARK_GRAFT_ONLY="$TEXTSET" \
      SPARK_GRAFT_WARMUP_DIR=/root/testdata/sf0.001 \
      SPARK_GRAFT_BENCH_OUT=/tmp/r16_text_${tag}.json \
      SPARK_GRAFT_PROVENANCE="quiet, local[24], shuffle=96, AQE initial=2048, reps=2, r16 charclass+normtext+fused-verdict+combo-grid" \
      sbt -batch "runMain graft.Bench"
  done
fi

if [ "$STAGE" = pair ] || [ "$STAGE" = all ]; then
  for d in /tmp/sf10 /tmp/sf100; do
    tag=$(basename "$d")
    SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SHUFFLE=96 SPARK_GRAFT_INITIAL_PARTITIONS=2048 \
      SPARK_GRAFT_REPS=2 SPARK_GRAFT_GC_EACH=1 \
      SPARK_GRAFT_SF_DIR="$d" SPARK_GRAFT_ONLY="$PAIRSET" \
      SPARK_GRAFT_WARMUP_DIR=/root/testdata/sf0.001 \
      SPARK_GRAFT_BENCH_OUT=/tmp/r16_pair_${tag}.json \
      SPARK_GRAFT_PROVENANCE="quiet, local[24], shuffle=96, AQE initial=2048, reps=2, r16 one-flip floor (sq8-prescreened probe fan)" \
      sbt -batch "runMain graft.Bench"
  done
fi
