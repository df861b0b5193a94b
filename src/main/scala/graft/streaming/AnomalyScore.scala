package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ts.TimeSeriesOps

/** Online anomaly scoring of the ingest stream against an offline-trained
  * per-stream profile — the production shape for streaming anomaly
  * detection: TimeSeriesOps.streamStats computes the (mean, std) profile
  * from history in batch, and the live stream is scored against it with a
  * stream-static broadcast join (the profile is metadata-scale: one row
  * per stream). No streaming state at all — each micro-batch is a
  * broadcast-hash lookup + filter, so throughput is scan-bound, and
  * retraining is just swapping the profile DataFrame.
  *
  * The z arithmetic is TimeSeriesOps.zScore, the SAME expression the batch
  * operator uses — the spec pins flag-for-flag equality when the profile
  * is trained on the full history.
  */
object AnomalyScore {

  def score(stream: Dataset[RawPoint], stats: DataFrame, zThresh: Double): DataFrame = {
    require(zThresh > 0, s"zThresh must be positive, got $zThresh")
    stream.toDF()
      .join(broadcast(stats), Seq("uuid"))
      .withColumn("z", TimeSeriesOps.zScore)
      .filter(col("std_us") > 0 && abs(col("z")) >= zThresh)
      .select(col("uuid"), col("time"), col("value"),
        graft.Quant.q6(col("z")).as("z_score"))
  }
}
