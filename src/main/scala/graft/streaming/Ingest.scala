package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ts.Store

/** Streaming ingest — the Spark-native form of BTrDB's write buffer.
  *
  * In the reference, inserts land in the primary queue merge buffer
  * (internal/pqm/pqm.go) backed by a journal (internal/jprovider) and are
  * merged into the versioned tree on flush. Here the same roles map onto
  * Structured Streaming primitives:
  *   journal/WAL        → the stream source + checkpoint directory
  *   pqm merge buffer   → the micro-batch
  *   tree commit        → Store.insert inside foreachBatch (one version
  *                        bump per micro-batch, atomic parquet append)
  *
  * The statistical tree maintenance (qtree updating min/mean/max/count on
  * the insert path) maps to a watermarked windowed aggregation emitting
  * StatPoints in append mode once windows close.
  */
object Ingest {

  /** File-source ingest into a Store: watches `sourceDir` for parquet of
    * (uuid string, time long, value double); each micro-batch becomes one
    * version bump per distinct uuid in the batch.
    *
    * Idempotence (exactly-once into the store): foreachBatch is
    * at-least-once — after a crash the checkpoint replays the last batch —
    * so each batch is (1) written as ONE Spark job (Store.insertBatch;
    * all-or-nothing file commit, so a batch that failed mid-write left
    * nothing behind), then (2) recorded in a per-checkpoint commit marker.
    * A replayed batchId whose marker exists is skipped instead of
    * re-appended under a new version.
    */
  def intoStore(spark: SparkSession, sourceDir: String, store: Store,
                checkpoint: String, rollup: Option[graft.ts.Rollup] = None): StreamingQuery = {
    val schema = "uuid STRING, time LONG, value DOUBLE"
    val commitDir = new java.io.File(s"${store.base}/_ingest_commits/" +
      java.util.UUID.nameUUIDFromBytes(checkpoint.getBytes("UTF-8")))
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new java.io.File(commitDir, s"batch-$batchId")
        if (!marker.exists()) {
          store.insertBatch(batch)
          // maintain the statistical hierarchy on the write path, like the
          // reference's tree aggregates; delta=<batchId> makes a replayed
          // batch overwrite its own contribution instead of double-counting
          rollup.foreach(_.appendBatch(
            batch.select(col("uuid"), col("time").as("t_us"), col("value")),
            Seq("uuid"), s"b$batchId"))
          commitDir.mkdirs()
          marker.createNewFile()
          ()
        }
      }
      .start()
  }

  /** Watermarked windowed StatPoint stream: the continuously-maintained
    * level-0 rollup. `timeCol` must be a timestamp column; emits closed
    * windows only (append mode), so downstream parquet sinks stay
    * append-only and idempotent per checkpoint.
    */
  def statStream(points: DataFrame, streamCols: Seq[String], width: String,
                 watermark: String, timeCol: String = "ts"): DataFrame =
    points
      .withWatermark(timeCol, watermark)
      .groupBy(streamCols.map(col) :+ window(col(timeCol), width).as("w"): _*)
      .agg(
        min(col("value")).as("v_min"),
        avg(col("value")).as("v_mean"),
        max(col("value")).as("v_max"),
        count(lit(1)).as("v_count"))
      .select(streamCols.map(col) :+ col("w.start").as("w_start")
        :+ col("v_min") :+ col("v_mean") :+ col("v_max") :+ col("v_count"): _*)
}
