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
    * at-least-once — after a crash the checkpoint replays the last batch.
    * The protocol per batch:
    *   1. persist an INTENT file with the per-uuid versions this batch
    *      will assign (Store.nextVersions),
    *   2. write the batch as ONE all-or-nothing parquet job at exactly
    *      those versions (Store.insertBatchAt),
    *   3. append the rollup deltas (Overwrite to a writeId path — replay
    *      overwrites its own contribution),
    *   4. create the commit marker, drop the intent.
    * On replay: marker present → done, skip. Intent present without
    * marker → the job either committed fully or not at all, so comparing
    * current stream versions against the intended ones tells which; a
    * landed batch skips the re-insert (closing the crash window between
    * job commit and marker creation that a marker-only protocol leaves
    * open) but still re-runs the idempotent rollup append + marker.
    * The rollup writeId embeds the checkpoint id, so multiple ingest
    * streams maintaining one ROLLUP can never clobber each other's
    * deltas (batchIds restart at 0 per checkpoint).
    *
    * Concurrency contract: a Store accepts exactly ONE ingest stream.
    * Both Store.nextVersions (read-then-assign, no CAS) and the landed
    * check above (compares current versions against this stream's intent)
    * assume no other writer bumps versions in between — a second stream
    * writing the same Store could race duplicate versions or make a
    * replay wrongly conclude its batch landed. Fan-in belongs upstream
    * (N sources → one stream via unioned/globbed file sources), or in
    * N stores sharing one Rollup — never two streams on one Store.
    */
  def intoStore(spark: SparkSession, sourceDir: String, store: Store,
                checkpoint: String, rollup: Option[graft.ts.Rollup] = None,
                readerOptions: Map[String, String] = Map.empty): StreamingQuery = {
    val schema = "uuid STRING, time LONG, value DOUBLE"
    val ckptId = java.util.UUID.nameUUIDFromBytes(checkpoint.getBytes("UTF-8")).toString
    // markers/intents live WITH the store data (Hadoop FS, not
    // java.io.File): on HDFS/S3A a local File would resolve to a
    // driver-local path, and a replay on a fresh driver would find no
    // marker and double-insert a committed batch
    val commitDir = new org.apache.hadoop.fs.Path(s"${store.base}/_ingest_commits/$ckptId")
    val fs = commitDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Per-query version cache (sound under the single-writer contract
    // below, which this extends to "no concurrent version-bumping op of
    // ANY kind during an active ingest query"): the first batch pays one
    // full version-discovery scan; every later batch assigns versions
    // from the cache and probes ONLY never-seen uuids via the pruned
    // Store.versionsFor — a per-micro-batch full-store groupBy does not
    // survive a 100 TB store. A restarted query simply re-bootstraps.
    val verCache = scala.collection.mutable.Map.empty[String, Long]
    var bootstrapped = false
    spark.readStream.schema(schema).options(readerOptions).parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val marker = new org.apache.hadoop.fs.Path(commitDir, s"batch-$batchId")
        val intent = new org.apache.hadoop.fs.Path(commitDir, s"batch-$batchId.intent")
        if (!fs.exists(marker)) {
          // A torn line (crash mid-write) parses to nothing and is skipped:
          // the insert job only starts after the full intent is in place,
          // so a torn intent always means the batch did NOT land.
          val landed = fs.exists(intent) && {
            val in = fs.open(intent)
            val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                       finally in.close()
            val intents = text.split("\n").toSeq
              .filter(_.contains('\t')).flatMap { line =>
                val i = line.lastIndexOf('\t')
                line.substring(i + 1).trim.toLongOption.map((line.substring(0, i), _))
              }
            intents.nonEmpty && intents.forall { case (u, v) => store.version(u) >= v }
          }
          if (!landed) {
            val vers: Seq[(String, Long)] =
              if (!bootstrapped) {
                val v = store.nextVersions(batch)
                bootstrapped = true
                v
              } else {
                val batchUuids = batch.select("uuid").distinct()
                  .collect().map(_.getString(0)).toSeq
                val unseen = batchUuids.filterNot(verCache.contains)
                if (unseen.nonEmpty) {
                  val probed = store.versionsFor(unseen)
                  unseen.foreach(u => verCache(u) = probed.getOrElse(u, 0L))
                }
                batchUuids.map(u => u -> (verCache(u) + 1))
              }
            fs.mkdirs(commitDir)
            // write-then-rename so a crash can never leave a half-written
            // intent at the final path (replay parses it, see above)
            val tmp = new org.apache.hadoop.fs.Path(commitDir, s"batch-$batchId.intent.tmp")
            val out = fs.create(tmp, true)
            try out.write(vers.map { case (u, v) => s"$u\t$v" }.mkString("\n").getBytes("UTF-8"))
            finally out.close()
            if (fs.exists(intent)) fs.delete(intent, false)
            if (!fs.rename(tmp, intent)) sys.error(s"ingest: could not publish intent $intent")
            store.insertBatchAt(batch, vers)
            vers.foreach { case (u, v) => verCache(u) = v }
          }
          rollup.foreach(_.appendBatch(
            batch.select(col("uuid"), col("time").as("t_us"), col("value")),
            Seq("uuid"), s"${ckptId}_b$batchId"))
          fs.mkdirs(commitDir)
          fs.create(marker, true).close()
          if (fs.exists(intent)) fs.delete(intent, false)
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
        // same deterministic-mean contract as the batch StatPoint ops
        graft.Quant.mean6(sum(graft.Quant.us6(col("value"))), count(lit(1))).as("v_mean"),
        max(col("value")).as("v_max"),
        count(lit(1)).as("v_count"))
      .select(streamCols.map(col) :+ col("w.start").as("w_start")
        :+ col("v_min") :+ col("v_mean") :+ col("v_max") :+ col("v_count"): _*)
}
