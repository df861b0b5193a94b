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
    */
  def intoStore(spark: SparkSession, sourceDir: String, store: Store,
                checkpoint: String): StreamingQuery = {
    val schema = "uuid STRING, time LONG, value DOUBLE"
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val uuids = batch.select("uuid").distinct().collect().map(_.getString(0))
        uuids.foreach { u =>
          store.insert(u, batch.filter(col("uuid") === u).select(col("time"), col("value")))
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
