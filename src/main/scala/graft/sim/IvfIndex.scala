package graft.sim

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — build once, query many: the production ANN
  * lifecycle (Vectors.annIvf fuses train+assign+query into one plan for
  * the benchmark/oracle path; this splits them so the expensive part is
  * amortized across query batches, which is how a 10^9-vector corpus is
  * actually served).
  *
  * Layout under `dir`:
  *   centroids/  — (cell, cvec: array<double>, cn2), nCells rows
  *   assigned/   — (vec_id, embedding, nrm) partitioned by cell=N:
  *                 a query's candidate read opens only its nProbe cell
  *                 partitions (partition pruning does the inverted-file
  *                 part of "inverted file index")
  *
  * Same quantizer contract and query arithmetic as annIvf (shared code:
  * trainCentroids / assignTo / ivfQuery) — the spec pins query() equal to
  * the fused operator on identical inputs.
  */
class IvfIndex private[sim] (val spark: SparkSession, val dir: String) {
  def centroids: DataFrame = spark.read.parquet(s"$dir/centroids")
  def assigned: DataFrame = spark.read.parquet(s"$dir/assigned")

  /** Top-k neighbors for each query vector (vec_id, embedding). */
  def query(queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame =
    Vectors.ivfQuery(broadcast(centroids), assigned,
      Vectors.withNorm(queries), k, nProbe)

  /** Metadata-FILTERED top-k for (vec_id, embedding, label) queries —
    * the persisted form of Vectors.annIvfFiltered: candidates join the
    * inverted lists on (cell, label), and when the index was built with
    * buildFiltered the assignment files are PARTITIONED by (cell, label),
    * so the filter is literal parquet partition pruning — a query's scan
    * opens only its nProbe × 1-label directories. `nProbe` is the
    * unfiltered probe budget, scaled by the index's label cardinality
    * (Vectors.adaptiveProbe — the selectivity→nProbe map); the
    * cardinality is one distinct over the partition column, answered
    * from directory metadata, never the data files.
    */
  def queryFiltered(queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val a = assigned
    val nCells = centroids.count().toInt
    // a bucketed index (built past maxLabelDirs) carries the lbk
    // partition column and a meta file with the bucket count AND the
    // label cardinality — label is a data column there, so a distinct
    // over it would full-scan every assignment file per query batch;
    // both counts are build-time properties read from one meta row. The
    // plain layout keeps the partition-column distinct (answered from
    // directory metadata, never the data files).
    if (a.columns.contains("lbk")) {
      val meta = spark.read.parquet(s"$dir/meta")
        .select(col("n_label_dirs"), col("n_labels")).head
      val probes = Vectors.adaptiveProbe(nCells, nProbe, meta.getLong(1))
      Vectors.ivfQueryFiltered(broadcast(centroids), a,
        Vectors.withNorm(queries), k, probes, meta.getInt(0))
    } else {
      val nLabels = a.select(col("label")).distinct().count()
      val probes = Vectors.adaptiveProbe(nCells, nProbe, nLabels)
      Vectors.ivfQueryFiltered(broadcast(centroids), a,
        Vectors.withNorm(queries), k, probes)
    }
  }

  def pqCodebook: DataFrame = spark.read.parquet(s"$dir/pq_codebook")
  def pqCodes: DataFrame = spark.read.parquet(s"$dir/pq_codes")

  /** Add the PQ layer (the faiss IVFPQ composition): a deterministic
    * seed codebook over the kCodes lowest-id assigned vectors plus
    * cell-PARTITIONED code files — a probed query reads m small ints
    * per candidate from only its nProbe cell partitions, instead of the
    * full vectors. The full vectors stay in `assigned/` for the exact
    * re-rank tail.
    */
  def buildPq(m: Int = 8, kCodes: Int = 16): IvfIndex = {
    val cb = Vectors.pqCodebook(assigned, m, kCodes)
    cb.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/pq_codebook")
    Vectors.pqAssign(assigned, spark.read.parquet(s"$dir/pq_codebook"), m)
      .join(assigned.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(s"$dir/pq_codes")
    this
  }

  /** IVF-PQ query: ADC over the probed cells' code partitions, exact
    * cosine re-rank of the top `rerank` survivors. `m` is a BUILD-time
    * property, so it is derived from the persisted codebook (max sub + 1,
    * one aggregate over an m·kCodes-row file) rather than taken as a
    * parameter — a build/query m mismatch would otherwise silently join
    * partial distance tables and mis-rank candidates with no error.
    */
  def queryPq(queries: DataFrame, k: Int, nProbe: Int = 4,
              rerank: Int = 32): DataFrame = {
    val cb = pqCodebook
    val m = cb.agg(max(col("sub"))).head.getInt(0) + 1
    Vectors.ivfPqQuery(broadcast(centroids), broadcast(cb), pqCodes,
      assigned, Vectors.withNorm(queries), k, nProbe, rerank, m)
  }
}

object IvfIndex {
  /** Open an existing index directory. */
  def apply(spark: SparkSession, dir: String): IvfIndex = new IvfIndex(spark, dir)

  /** Train the quantizer on `corpus` (vec_id, embedding) and persist
    * centroids + cell-partitioned assignments.
    */
  def build(corpus: DataFrame, dir: String, nCells: Int = 16,
            lloydIters: Int = 3, trainLimit: Long = 200000L): IvfIndex = {
    val spark = corpus.sparkSession
    val c = Vectors.withNorm(corpus).cache()
    val cents = Vectors.trainCentroids(c, nCells, lloydIters, trainLimit)
    Vectors.centDf(spark, cents)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    // cluster on the partition column first — same small-file stance as
    // Store.withLayout (one writer per cell dir)
    Vectors.assignTo(c, Vectors.centDf(spark, cents))
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(s"$dir/assigned")
    c.unpersist()
    new IvfIndex(spark, dir)
  }

  /** Build for FILTERED serving: `corpus` carries (vec_id, embedding,
    * label) and the assignment table is partitioned by (cell, label) —
    * the layout that turns queryFiltered's (cell, label) candidate keys
    * into parquet partition pruning at deployment scale: the label
    * predicate never reads an inadmissible row, the exact promise
    * annIvfFiltered's doc makes for the fused path. Same quantizer
    * contract (shared trainCentroids/assignTo), so the spec pins
    * queryFiltered equal to the fused operator, including after reopen.
    *
    * Past `maxLabelDirs` distinct labels the layout switches to label
    * HASH BUCKETING — partitioned by (cell, lbk = pmod(xxhash64(label),
    * maxLabelDirs)) with label kept as a data column — because the
    * plain grid is nCells·|labels| directories (10⁴ labels × 2¹⁰ cells
    * = 10⁷ small files, the classic parquet small-files failure) while
    * the bucketed grid is bounded at nCells·maxLabelDirs at any
    * cardinality. A query still prunes to its (cell, lbk) directories
    * and filters the exact label inside the ~|labels|/maxLabelDirs
    * share it read; answers are identical (spec-pinned against the
    * fused operator for both layouts).
    */
  def buildFiltered(corpus: DataFrame, dir: String, nCells: Int = 16,
                    lloydIters: Int = 0, trainLimit: Long = 200000L,
                    maxLabelDirs: Int = 256): IvfIndex = {
    val spark = corpus.sparkSession
    val c = Vectors.withNorm(corpus).cache()
    val cents = Vectors.trainCentroids(c, nCells, lloydIters, trainLimit)
    Vectors.centDf(spark, cents)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    val assigned = Vectors.assignTo(c, Vectors.centDf(spark, cents),
      carry = Seq("label"))
    val nLabels = c.agg(countDistinct(col("label"))).head.getLong(0)
    if (nLabels > maxLabelDirs) {
      assigned
        // THE PERSISTED LAYOUT CONTRACT: lbk hashes the label's STRING
        // form — Spark's xxhash64 hashes IntegerType and LongType (and
        // every other coercible type) to different values, so hashing
        // the raw column would make bucket derivation silently
        // type-sensitive: a query batch whose label column is long
        // against an index built from int32 parquet labels would derive
        // a different lbk and prune to the WRONG directories (zero /
        // wrong candidates, no error) — the plain (cell, label) layout
        // tolerates exactly this via join-key coercion, so the bucketed
        // layout must too. Canonicalizing through string makes lbk a
        // function of the label's VALUE; the query side
        // (Vectors.ivfQueryFiltered) applies the identical cast.
        .withColumn("lbk",
          pmod(xxhash64(col("label").cast("string")),
            lit(maxLabelDirs.toLong)).cast("int"))
        .repartition(col("cell"), col("lbk"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell", "lbk")
        .parquet(s"$dir/assigned")
      // the bucket count is a BUILD-time property the query side must
      // reproduce exactly — persist it rather than infer it from dir
      // names (sparse buckets would under-count). n_labels rides along:
      // in the bucketed layout label is a DATA column, so deriving the
      // cardinality at query time would full-scan every assignment file
      // per batch — at exactly the high-cardinality scale the bucketing
      // exists for.
      spark.range(1).select(lit(maxLabelDirs).as("n_label_dirs"),
          lit(nLabels).as("n_labels"))
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    } else
      assigned
        .repartition(col("cell"), col("label"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell", "label")
        .parquet(s"$dir/assigned")
    c.unpersist()
    new IvfIndex(spark, dir)
  }
}
