package graft.ts

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MVCC versioned point store — the Spark-native re-expression of BTrDB's
  * copy-on-write tree versioning (internal/bstore blocktypes.go: every
  * commit creates a new root with a new version; old versions stay
  * readable) and its write path (Insert/Delete/Flush/Obliterate RPCs,
  * btrdb.proto:16-21,196-208).
  *
  * Layout (append-only, no file is ever rewritten except by compact()):
  *   base/points/     (uuid, time, value, ver)  partitioned by uuid
  *   base/tombstones/ (uuid, t_start, t_end, ver)
  *
  * Versioning is per-stream (BTrDB's versionMajor): each insert or delete
  * batch bumps the stream's version by one. Visibility of point p at
  * version V:  p.ver <= V  AND no tombstone t with  p.ver < t.ver <= V
  * covering p.time — i.e. a range delete hides only points inserted before
  * it, so insert-after-delete behaves exactly like the reference.
  *
  * Scale: appends are blind writes (no read-modify-write); reads prune on
  * the uuid partition column and push time/ver filters to parquet. The
  * tombstone side of the visibility anti-join is tiny (one row per delete
  * call) and broadcasts. compact() physically drops dead rows and rewrites
  * a stream's partition — BTrDB's tree GC, done as a deterministic batch
  * job instead of reference counting.
  */
class Store(val spark: SparkSession, val base: String) {
  private val pointsDir = s"$base/points"
  private val tombsDir  = s"$base/tombstones"

  import spark.implicits._

  private def hasData(dir: String): Boolean =
    new java.io.File(dir).exists()

  /** All raw point rows (no visibility applied). */
  def rawPoints: DataFrame =
    if (hasData(pointsDir)) spark.read.parquet(pointsDir)
    else spark.emptyDataset[(String, Long, Double, Long)]
      .toDF("uuid", "time", "value", "ver")

  def tombstones: DataFrame =
    if (hasData(tombsDir)) spark.read.parquet(tombsDir)
    else spark.emptyDataset[(String, Long, Long, Long)]
      .toDF("uuid", "t_start", "t_end", "ver")

  /** Latest committed version per stream (max over inserts and deletes). */
  def version(uuid: String): Long = {
    val p = rawPoints.filter($"uuid" === uuid).agg(max($"ver")).as[Option[Long]].first().getOrElse(0L)
    val t = tombstones.filter($"uuid" === uuid).agg(max($"ver")).as[Option[Long]].first().getOrElse(0L)
    math.max(p, t)
  }

  /** Insert a batch of (time, value) rows; returns the new stream version.
    * Mirrors InsertParams→InsertResponse(versionMajor) semantics.
    */
  def insert(uuid: String, points: DataFrame): Long = {
    val v = version(uuid) + 1
    points.select(lit(uuid).as("uuid"), col("time").cast("long").as("time"),
        col("value").cast("double").as("value"), lit(v).as("ver"))
      .write.mode(SaveMode.Append).partitionBy("uuid").parquet(pointsDir)
    v
  }

  /** Range delete [start, end) — a tombstone, not a rewrite. */
  def deleteRange(uuid: String, start: Long, end: Long): Long = {
    val v = version(uuid) + 1
    Seq((uuid, start, end, v)).toDF("uuid", "t_start", "t_end", "ver")
      .write.mode(SaveMode.Append).parquet(tombsDir)
    v
  }

  /** Obliterate: the stream disappears entirely (full-range tombstone;
    * physical removal happens at compact()).
    */
  def obliterate(uuid: String): Long =
    deleteRange(uuid, Long.MinValue, Long.MaxValue)

  /** Flush is a no-op for durability (every insert batch is already a
    * committed parquet append — the journal/pqm buffering of the reference
    * is Structured Streaming's checkpointed micro-batch, see
    * graft.streaming.Ingest); it returns the current version like the RPC.
    */
  def flush(uuid: String): Long = version(uuid)

  /** Visible points at `asOf` (None = latest). The tombstone join stays a
    * broadcast: deletes are rare events, points are the 100 TB side.
    */
  def pointsAt(asOf: Option[Long] = None): DataFrame = {
    val pts = asOf.fold(rawPoints)(v => rawPoints.filter($"ver" <= v))
    val tbs = asOf.fold(tombstones)(v => tombstones.filter($"ver" <= v))
    pts.join(broadcast(tbs),
        pts("uuid") === tbs("uuid") &&
          pts("time") >= tbs("t_start") && pts("time") < tbs("t_end") &&
          pts("ver") < tbs("ver"),
        "left_anti")
  }

  /** RawValues over the store at a version — start inclusive, end exclusive. */
  def rawValues(uuid: String, start: Long, end: Long, asOf: Option[Long] = None): DataFrame =
    pointsAt(asOf)
      .filter($"uuid" === uuid && $"time" >= start && $"time" < end)
      .select($"time", $"value")

  /** Changed time ranges between two versions (FindChangedSince): inserted
    * points and deleted ranges with fromVer < ver <= toVer, aligned to the
    * 2^res grid and gap-merged per stream.
    */
  def changes(uuid: String, fromVer: Long, toVer: Long, res: Int): DataFrame = {
    val ins = rawPoints
      .filter($"uuid" === uuid && $"ver" > fromVer && $"ver" <= toVer)
      .select(shiftleft(shiftright($"time", res), res).as("r_start"))
      .withColumn("r_end", $"r_start" + (1L << res))
    val del = tombstones
      .filter($"uuid" === uuid && $"ver" > fromVer && $"ver" <= toVer)
      .select(shiftleft(shiftright($"t_start", res), res).as("r_start"),
        (shiftleft(shiftright($"t_end" - 1, res), res) + (1L << res)).as("r_end"))
    val aligned = ins.unionByName(del).distinct()
      .withColumn("uuid", lit(uuid))
    TimeSeriesOps.mergeRanges(aligned, Seq("uuid")).drop("uuid")
  }

  /** Physically drop rows invisible at the latest version and rewrite —
    * the GC/defragmentation pass (run per uuid partition, so at scale each
    * stream compacts independently).
    */
  def compact(): Unit = {
    val live = pointsAt(None).cache()
    live.count() // materialize before overwrite
    val tmp = s"$base/points_compacted"
    live.write.mode(SaveMode.Overwrite).partitionBy("uuid").parquet(tmp)
    val fs = new java.io.File(pointsDir)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(fs)
    new java.io.File(tmp).renameTo(fs)
    live.unpersist()
  }
}

object Store {
  def apply(spark: SparkSession, base: String): Store = new Store(spark, base)
}
