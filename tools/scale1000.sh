#!/bin/bash
# 1000x decade campaign: build /tmp/sf100 (documents + embeddings
# replicated 1000x from sf0.1 with the zero-overlap copy transforms;
# every other table copied 1x so the Tables loaders still resolve),
# then bench the scale flagships — the operators whose 100 TB story the
# repo claims (dedup pigeonhole/inverted-index family, the mm
# perceptual family on the r12 6-gram SimHash feature, ANN serving,
# the bucket-load pricing audits).
set -euo pipefail
cd /root/repo

if [ ! -d /tmp/sf100/documents.parquet ]; then
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=24 \
    sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf100 1000 documents,embeddings"
fi

FLAGSHIPS=dedup_simhash,dedup_simhash_audit,dedup_simhash_load,dedup_minhash_tune,dedup_span_removal,dedup_span_stats,dedup_clusters,mm_phash,mm_phash_load,mm_keep_best,mm_dedup_clusters,mm_shard,emb_ann_lsh,emb_ann_bitq,emb_ann_ivf_served,emb_ann_ivfpq,emb_lsh_load,emb_ann_filtered

SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=24 SPARK_GRAFT_SF_DIR=/tmp/sf100 \
  SPARK_GRAFT_ONLY="$FLAGSHIPS" \
  SPARK_GRAFT_BENCH_OUT=BENCH_queries_1000x.json \
  sbt -batch "runMain graft.Bench"
