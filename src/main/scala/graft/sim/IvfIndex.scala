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
}
