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
  *   base/points/ub=N/tb=M/   (uuid, time, value, ver)
  *   base/tombstones/         (uuid, t_start, t_end, ver)
  *
  * Partitioning: `ub` = xxhash64(uuid) mod 64 (uuid bucket — bounded
  * directory fan-out at millions of streams, unlike partitioning on the
  * raw uuid) and `tb` = time >> 42 (≈51-day time buckets in µs). Every
  * per-stream read derives both partition predicates itself (the bucket
  * of a literal uuid is computable on the driver; a [start, end) range
  * maps to a [tb_lo, tb_hi] interval), so stream- AND time-scoped queries
  * prune partitions before any file is opened — at 100 TB a one-stream
  * one-day query touches 1/64th of one time bucket.
  *
  * Versioning is per-stream (BTrDB's versionMajor): each insert or delete
  * batch bumps the stream's version by one. Visibility of point p at
  * version V:  p.ver <= V  AND no tombstone t with  p.ver < t.ver <= V
  * covering p.time — i.e. a range delete hides only points inserted before
  * it, so insert-after-delete behaves exactly like the reference.
  *
  * Scale: appends are blind writes (no read-modify-write); reads prune on
  * the (ub, tb) partition columns and push uuid/time/ver filters to
  * parquet row groups. The tombstone side of the visibility anti-join is
  * tiny (one row per delete call) and broadcasts. compact() physically
  * drops dead rows and rewrites partitions — BTrDB's tree GC, done as a
  * deterministic batch job instead of reference counting.
  */
/** `maxBatchStreams` bounds the ONLY driver-resident state the store
  * keeps: the per-batch uuid→version map (nextVersions / versionsFor).
  * That map is metadata-scale — one entry per distinct stream IN THE
  * BATCH, never per point and never per stream in the store — which is
  * how the reference sizes its etcd version state too. The bound makes
  * the contract explicit for million-stream fleets: a batch touching
  * more distinct uuids than this fails loudly (split the batch; the
  * write path itself is unbounded), instead of quietly growing the
  * driver heap. The default (2^20 entries ≈ tens of MB) is far above
  * any sane micro-batch and far below driver OOM territory.
  */
class Store(val spark: SparkSession, val base: String,
            val maxBatchStreams: Int = Store.DefaultMaxBatchStreams) {
  private val pointsDir = s"$base/points"
  private val tombsDir  = s"$base/tombstones"

  import spark.implicits._
  import Store.{TimeBucketShift, UuidBuckets}

  // All filesystem control operations (existence probes, the compact swap
  // renames) go through the Hadoop FileSystem API, like MetaStore — on
  // HDFS/S3A a java.io.File probe would silently report an empty store and
  // crashed-swap recovery would never trigger.
  private val hfs = new org.apache.hadoop.fs.Path(base)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hpath(dir: String) = new org.apache.hadoop.fs.Path(dir)

  private def hasData(dir: String): Boolean = hfs.exists(hpath(dir))

  /** Partition columns for a (uuid, time, value, ver) batch, clustered
    * for the write: without the repartition, a dynamic-partition write
    * has EVERY task write EVERY (ub, tb) dir it sees — tasks × dirs tiny
    * files (the classic ingest small-file explosion; measured 10× on the
    * 500k-point bench probe). Shuffling on the partition columns first
    * means each dir is written by exactly one task, and the within-task
    * (uuid, time) sort gives parquet row groups that min/max-prune on
    * both stream and time at read time.
    */
  private def withLayout(df: DataFrame): DataFrame =
    df.withColumn("ub", pmod(xxhash64($"uuid"), lit(UuidBuckets)))
      .withColumn("tb", shiftright($"time", TimeBucketShift))
      .repartition($"ub", $"tb")
      .sortWithinPartitions($"ub", $"tb", $"uuid", $"time")

  /** Driver-side uuid bucket — same value as the Spark xxhash64 column
    * expression (XXH64 over the UTF-8 bytes, seed 42), so literal-uuid
    * reads can prune the ub partition without touching data.
    */
  private def ubOf(uuid: String): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(uuid)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
    ((h % UuidBuckets) + UuidBuckets) % UuidBuckets
  }

  /** Stream-scoped raw read with ub partition pruning. */
  private def streamPoints(uuid: String): DataFrame =
    rawPoints.filter($"ub" === ubOf(uuid) && $"uuid" === uuid)

  /** All raw point rows (no visibility applied). A missing live dir first
    * attempts crashed-swap recovery, so a compact() that died mid-rename
    * never reads as an empty store.
    */
  def rawPoints: DataFrame = {
    if (!hasData(pointsDir)) recoverCrashedSwap()
    if (hasData(pointsDir)) spark.read.parquet(pointsDir)
    else spark.emptyDataset[(String, Long, Double, Long, Long, Long)]
      .toDF("uuid", "time", "value", "ver", "ub", "tb")
  }

  def tombstones: DataFrame = {
    if (!hasData(tombsDir) && hasData(s"$base/tombstones_old"))
      recoverCrashedSwap()
    if (hasData(tombsDir)) spark.read.parquet(tombsDir)
    else spark.emptyDataset[(String, Long, Long, Long)]
      .toDF("uuid", "t_start", "t_end", "ver")
  }

  /** Latest committed version per stream (max over inserts and deletes). */
  def version(uuid: String): Long = {
    val p = streamPoints(uuid).agg(max($"ver")).as[Option[Long]].first().getOrElse(0L)
    val t = tombstones.filter($"uuid" === uuid).agg(max($"ver")).as[Option[Long]].first().getOrElse(0L)
    math.max(p, t)
  }

  /** Insert a batch of (time, value) rows; returns the new stream version.
    * Mirrors InsertParams→InsertResponse(versionMajor) semantics.
    */
  def insert(uuid: String, points: DataFrame): Long = {
    val v = version(uuid) + 1
    withLayout(points.select(lit(uuid).as("uuid"), col("time").cast("long").as("time"),
        col("value").cast("double").as("value"), lit(v).as("ver")))
      .write.mode(SaveMode.Append).partitionBy("ub", "tb").parquet(pointsDir)
    v
  }

  /** Insert a multi-stream batch of (uuid, time, value) rows in ONE parquet
    * job: each distinct uuid in the batch gets its own version bump (same
    * per-stream versionMajor semantics as insert()), computed as a join
    * instead of a driver-side loop — O(1) Spark jobs per batch instead of
    * O(#streams), which is what the streaming ingest path needs at scale.
    * The single job also gives all-or-nothing commit semantics (Spark's
    * file-commit protocol), making replays of a failed batch safe.
    */
  def insertBatch(batch: DataFrame): Unit =
    insertBatchAt(batch, nextVersions(batch))

  /** The per-uuid versions the next batch write will assign — driver-
    * collected (metadata-scale: one row per distinct uuid in the batch).
    * Exposed so an idempotent writer can persist the intent BEFORE the
    * write and later decide whether a crashed attempt committed (the write
    * is one all-or-nothing job: either every uuid reached its intended
    * version or none did).
    */
  def nextVersions(batch: DataFrame): Seq[(String, Long)] = {
    // Bootstrap fast path: with no committed points and no tombstones
    // every uuid starts at version 1 — one distinct over the batch
    // instead of two full-store aggregations plus two joins. (An empty
    // store still pays the crashed-swap probe via hasData; a dir that
    // exists takes the general path even if all its rows are dead.)
    if (!hasData(pointsDir) && !hasData(s"$base/points_old") &&
        !hasData(tombsDir) && !hasData(s"$base/tombstones_old"))
      return bounded(batch.select("uuid").distinct()
        .limit(maxBatchStreams + 1).as[String].collect().toSeq).map(_ -> 1L)
    val pv = rawPoints.groupBy("uuid").agg(max($"ver").as("pv"))
    val tv = tombstones.groupBy("uuid").agg(max($"ver").as("tv"))
    bounded(batch.select("uuid").distinct()
      .join(pv, Seq("uuid"), "left").join(tv, Seq("uuid"), "left")
      .select($"uuid",
        (greatest(coalesce($"pv", lit(0L)), coalesce($"tv", lit(0L))) + 1).as("ver"))
      .limit(maxBatchStreams + 1).as[(String, Long)].collect().toSeq)
  }

  /** The maxBatchStreams guard: the limit(max+1) on the collects above
    * bounds driver memory unconditionally; one extra row proves overflow
    * without ever materializing the full fleet.
    */
  private def bounded[T](rows: Seq[T]): Seq[T] = {
    require(rows.size <= maxBatchStreams,
      s"batch touches more than $maxBatchStreams distinct streams: the " +
        "per-batch uuid->version map is driver-resident by contract - " +
        "split the batch (or raise maxBatchStreams)")
    rows
  }

  /** Current committed version per uuid for a BOUNDED uuid set, with
    * partition pruning: the scan is restricted to the uuids' ub buckets
    * (driver-computed, literal partition filter) and the row-group
    * (uuid, time)-sorted layout min/max-prunes inside them. This is the
    * incremental complement of nextVersions' full-store discovery: an
    * ingest stream bootstraps once, then probes only uuids it has not
    * seen (graft.streaming.Ingest's version cache) — at 100 TB a
    * per-micro-batch full groupBy over the store is the difference
    * between an ingest that keeps up and one that falls behind its
    * own history.
    */
  def versionsFor(uuids: Seq[String]): Map[String, Long] = {
    if (uuids.isEmpty) return Map.empty
    // the class contract bounds DISTINCT streams per batch — a duplicate-
    // heavy caller list must not trip the guard early
    val distinctIds = bounded(uuids.distinct)
    val ubs = distinctIds.map(ubOf).distinct
    val uset = distinctIds.toSet
    val pv = rawPoints
      .filter($"ub".isin(ubs: _*)).filter($"uuid".isin(distinctIds: _*))
      .groupBy("uuid").agg(max($"ver").as("v"))
      .as[(String, Long)].collect()
    val tv = tombstones
      .filter($"uuid".isin(distinctIds: _*))
      .groupBy("uuid").agg(max($"ver").as("v"))
      .as[(String, Long)].collect()
    (pv ++ tv).filter(kv => uset(kv._1))
      .groupMapReduce(_._1)(_._2)(math.max)
  }

  /** Write a batch at pre-assigned per-uuid versions (from nextVersions)
    * in ONE parquet job — all-or-nothing file commit.
    */
  def insertBatchAt(batch: DataFrame, vers: Seq[(String, Long)]): Unit = {
    val versDf = vers.toDF("uuid", "ver")
    withLayout(batch.select($"uuid", col("time").cast("long").as("time"),
        col("value").cast("double").as("value"))
      .join(broadcast(versDf), Seq("uuid"))
      .select($"uuid", $"time", $"value", $"ver"))
      .write.mode(SaveMode.Append).partitionBy("ub", "tb").parquet(pointsDir)
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
  def obliterate(uuid: String): Long = {
    // unflushed rows must not outlive the stream: a later flush would
    // commit them ABOVE the obliterate tombstone and resurrect it
    rm(hpath(s"$base/buffer/uuid=$uuid"))
    deleteRange(uuid, Long.MinValue, Long.MaxValue)
  }

  // ---- unflushed-write buffer (the reference's PQM, opt-in) ----
  private val bufferDir = s"$base/buffer"

  /** Buffered insert — the reference's primary-queue write path
    * (internal/pqm): rows land in a per-stream staging area WITHOUT a
    * version bump and are visible to the *Merged read forms immediately,
    * the read-your-unflushed-writes semantic of
    * `pqm.MergeQueryValuesStream` (quasar.go:241–267). `flush` promotes
    * the buffer into one committed versioned batch (the reference's
    * journal→tree commit). Durability-first callers keep using insert()
    * (every batch a committed append); this path exists for the
    * reference's latency shape — points queryable before the commit.
    * Scale contract: the buffer holds only the unflushed tail (ingest
    * rate × flush interval), never corpus-scale data, so the merged
    * read's union arm stays small by construction.
    */
  def insertBuffered(uuid: String, points: DataFrame): Unit =
    points.select(lit(uuid).as("uuid"), col("time").cast("long").as("time"),
        col("value").cast("double").as("value"))
      .repartition(1)
      .write.mode(SaveMode.Append).partitionBy("uuid").parquet(bufferDir)

  /** Unflushed rows across all streams (empty frame when none; the
    * explicit schema keeps a drained buffer dir — every partition
    * flushed or obliterated — readable as empty instead of failing
    * parquet inference).
    */
  def bufferedPoints: DataFrame =
    if (hasData(bufferDir))
      spark.read.schema("time BIGINT, value DOUBLE, uuid STRING").parquet(bufferDir)
        .select($"uuid", $"time", $"value")
    else spark.emptyDataset[(String, Long, Double)].toDF("uuid", "time", "value")

  /** (versionMajor, versionMinor) — the reference's two-part version:
    * committed version plus an unflushed component. The reference's
    * minor counts journal INSERTS since the last flush (quasar.go's
    * PQM path, internal/jprovider) — and each insertBuffered call
    * commits exactly one staged file into the stream's buffer
    * partition (repartition(1) + one append job), so the file count IS
    * the buffered-insert-call count: same unit as the reference, read
    * from directory metadata without scanning a row.
    */
  def versionMerged(uuid: String): (Long, Long) = {
    val p = hpath(s"$bufferDir/uuid=$uuid")
    val minor =
      if (!hfs.exists(p)) 0L
      else hfs.listStatus(p).count(s =>
        s.isFile && s.getPath.getName.startsWith("part-")).toLong
    (version(uuid), minor)
  }

  /** rawValues with the write buffer merged in — read-your-unflushed-
    * writes. Historical reads (`rawValues` with asOf) see only committed
    * data, exactly like the reference's versioned queries, which pin a
    * major version and bypass the buffer.
    */
  def rawValuesMerged(uuid: String, start: Long, end: Long): DataFrame =
    rawValues(uuid, start, end, None)
      .unionByName(bufferedPoints
        .filter($"uuid" === uuid && $"time" >= start && $"time" < end)
        .select($"time", $"value"))

  /** Promote the stream's buffered rows to ONE committed versioned batch
    * and clear them; with an empty buffer this is the version probe it
    * always was. At-least-once across crashes: if the process dies
    * between the committed append and the buffer clear, the next flush
    * re-commits the same rows at a new version (the same replay window
    * the reference's journal recovery has, internal/jprovider).
    */
  def flush(uuid: String): Long = {
    val buf = bufferedPoints.filter($"uuid" === uuid).select($"time", $"value")
    if (buf.isEmpty) version(uuid)
    else {
      val v = insert(uuid, buf)
      rm(hpath(s"$bufferDir/uuid=$uuid"))
      v
    }
  }

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

  /** Consistent point-in-time export: the visible (uuid, time, value)
    * rows at `asOf`, written as plain parquet clustered by the store's
    * own (ub, tb) layout — the backup / downstream-handoff path. The
    * export is a snapshot BY VALUE (tombstones applied, versions
    * resolved), so the consumer needs no knowledge of the MVCC log; time
    * travel of the export itself is pinned by `asOf`. One all-or-nothing
    * partitioned job, same small-file stance as insertBatch.
    */
  def snapshot(outDir: String, asOf: Option[Long] = None): Unit =
    withLayout(pointsAt(asOf).select($"uuid", $"time", $"value", lit(0L).as("ver")))
      .select($"uuid", $"time", $"value", $"ub", $"tb")
      .write.mode(SaveMode.Overwrite).partitionBy("ub", "tb").parquet(outDir)

  /** One stream's visible points at `asOf`, with ub partition pruning —
    * the canonical per-stream read the query facade builds on.
    */
  def streamAt(uuid: String, asOf: Option[Long] = None): DataFrame =
    pointsAt(asOf).filter($"ub" === ubOf(uuid) && $"uuid" === uuid)

  /** RawValues over the store at a version — start inclusive, end
    * exclusive. Derives both partition predicates (ub from the literal
    * uuid, [tb_lo, tb_hi] from the time range) so the scan opens only the
    * stream's bucket within the touched time buckets.
    */
  def rawValues(uuid: String, start: Long, end: Long, asOf: Option[Long] = None): DataFrame = {
    if (end <= start) return pointsAt(asOf).filter(lit(false)).select($"time", $"value")
    pointsAt(asOf)
      .filter($"ub" === ubOf(uuid) &&
        $"tb" >= (start >> TimeBucketShift) && $"tb" <= ((end - 1) >> TimeBucketShift))
      .filter($"uuid" === uuid && $"time" >= start && $"time" < end)
      .select($"time", $"value")
  }

  /** Bulk stream copy — the reference's admin copy tool (btrdb/copy.go:
    * 32-113): the source's visible points over [start, end) at `asOf` are
    * inserted into `dstUuid` of `dst` (same store or another; the dest
    * uuid may equal the source's, copy.go's `dstuuid = "same"`),
    * optionally deleting the destination range first (copy.go:95-100).
    * One pruned scan feeding one versioned insert — the distributed
    * counterpart of copy.go's point channel, no driver loop — and MVCC
    * falls out: the copy commits as a single new version at the
    * destination, and `asOf` pins the source snapshot. Returns the
    * destination stream's new version.
    */
  def copyRange(srcUuid: String, dst: Store, dstUuid: String,
                start: Long, end: Long,
                deleteFirst: Boolean = false,
                asOf: Option[Long] = None): Long = {
    // Pin the source snapshot BEFORE any destination delete: the source
    // read is a lazy plan that only evaluates inside dst.insert, so in
    // the same-store/same-uuid mode (copy.go's dstuuid = "same") an
    // unpinned read after deleteFirst would see the fresh tombstone and
    // silently copy nothing. Resolving "latest" to the source's current
    // version now makes the read immune to anything the copy itself
    // commits (and is a no-op otherwise: ver <= current covers all).
    val pinned = asOf.orElse(Some(version(srcUuid)))
    if (deleteFirst) dst.deleteRange(dstUuid, start, end)
    dst.insert(dstUuid, rawValues(srcUuid, start, end, pinned))
  }

  /** Changed time ranges between two versions (FindChangedSince): inserted
    * points and deleted ranges with fromVer < ver <= toVer, aligned to the
    * 2^res grid and gap-merged per stream.
    */
  def changes(uuid: String, fromVer: Long, toVer: Long, res: Int): DataFrame = {
    val ins = streamPoints(uuid)
      .filter($"ver" > fromVer && $"ver" <= toVer)
      .select(shiftleft(shiftright($"time", res), res).as("r_start"))
      .withColumn("r_end", $"r_start" + (1L << res))
    // align-up saturates: a full-range tombstone (obliterate, t_end =
    // Long.MaxValue) must not wrap to MinValue and vanish as a degenerate
    // range — it invalidates everything
    val endCap = Long.MaxValue - (1L << res)
    val del = tombstones
      .filter($"uuid" === uuid && $"ver" > fromVer && $"ver" <= toVer)
      .select(shiftleft(shiftright($"t_start", res), res).as("r_start"),
        when($"t_end" > endCap, lit(Long.MaxValue))
          .otherwise(shiftleft(shiftright($"t_end" - 1, res), res) + (1L << res))
          .as("r_end"))
    val aligned = ins.unionByName(del).distinct()
      .withColumn("uuid", lit(uuid))
    TimeSeriesOps.mergeRanges(aligned, Seq("uuid")).drop("uuid")
  }

  /** Incremental export between two versions — the O(changed data)
    * complement of snapshot(): writes the per-stream time ranges touched
    * by inserts/deletes with vFrom < ver <= vTo (aligned to the 2^res
    * grid, gap-merged — the Changes() semantics, all streams at once) as
    * a manifest at `outDir/ranges`, and the rows VISIBLE at vTo inside
    * those ranges at `outDir/points`. A consumer holding a vFrom
    * snapshot applies it by deleting its copy of every manifest range
    * and inserting the exported rows — a pure delete arrives as a
    * manifest range with no rows. The manifest is metadata-scale
    * (changed ranges), so the row-selection join broadcasts; nothing
    * scans more than the changed versions plus the visible rows they
    * touch.
    */
  def exportChanges(outDir: String, vFrom: Long, vTo: Long, res: Int): Unit = {
    val ins = rawPoints.filter($"ver" > vFrom && $"ver" <= vTo)
      .select($"uuid", shiftleft(shiftright($"time", res), res).as("r_start"))
      .withColumn("r_end", $"r_start" + (1L << res))
    val endCap = Long.MaxValue - (1L << res)
    val del = tombstones.filter($"ver" > vFrom && $"ver" <= vTo)
      .select($"uuid", shiftleft(shiftright($"t_start", res), res).as("r_start"),
        when($"t_end" > endCap, lit(Long.MaxValue))
          .otherwise(shiftleft(shiftright($"t_end" - 1, res), res) + (1L << res))
          .as("r_end"))
    val ranges = TimeSeriesOps
      .mergeRanges(ins.unionByName(del).distinct(), Seq("uuid"))
      .localCheckpoint() // consumed twice (manifest write + semi join)
    ranges.write.mode(SaveMode.Overwrite).parquet(s"$outDir/ranges")
    val pts = pointsAt(Some(vTo))
    val rg = broadcast(ranges
      .select($"uuid".as("r_uuid"), $"c_start", $"c_end"))
    withLayout(pts
        .join(rg, pts("uuid") === rg("r_uuid") &&
          pts("time") >= rg("c_start") && pts("time") < rg("c_end"), "left_semi")
        .select($"uuid", $"time", $"value", lit(0L).as("ver")))
      .select($"uuid", $"time", $"value", $"ub", $"tb")
      .write.mode(SaveMode.Overwrite).partitionBy("ub", "tb").parquet(s"$outDir/points")
  }

  private def rm(p: org.apache.hadoop.fs.Path): Unit =
    if (hfs.exists(p)) { hfs.delete(p, true); () }

  /** Physically drop rows invisible at the latest version and rewrite —
    * the GC/defragmentation pass (run per uuid partition, so at scale each
    * stream compacts independently).
    *
    * Crash safety: the new dataset is written to the side, the old dir is
    * renamed aside (not deleted), the new one renamed in, and only then is
    * the old data removed — a failure at any step leaves either the old or
    * the new complete dataset on disk, never neither. Every rename result
    * is checked; a failed swap restores the old dir and aborts loudly.
    *
    * Tombstone pruning: a point that survives compaction is, by the
    * visibility predicate, covered by NO tombstone (at any asOf) — so once
    * the dead rows are physically gone, a tombstone hides nothing and would
    * only re-join against every future read forever. The one thing a
    * tombstone still carries is the stream's version floor: if a stream's
    * latest operation was a delete, its tombstone holds the max ver, and
    * dropping it would make the next insert REUSE a version number. So
    * pruning keeps exactly the tombstones with ver above the stream's max
    * surviving point ver (hide nothing, preserve version monotonicity) and
    * drops the rest.
    */
  /** Restore a crashed swap before doing anything else: if the live dir is
    * missing, the previous compact died between its two renames — the data
    * survives in `*_old` (pre-compact, preferred: tombstones unpruned ⇒
    * consistent) or `*_compacted`. Without this, the leftover cleanup below
    * would delete the only surviving copy.
    */
  private def recoverCrashedSwap(): Unit = {
    def restore(dst: org.apache.hadoop.fs.Path,
                candidates: Seq[org.apache.hadoop.fs.Path]): Unit =
      if (!hfs.exists(dst)) candidates.find(hfs.exists).foreach { c =>
        if (!hfs.rename(c, dst)) sys.error(s"compact: could not restore $c to $dst")
      }
    restore(hpath(pointsDir),
      Seq(hpath(s"$base/points_old"), hpath(s"$base/points_compacted")))
    // tombstones may legitimately be absent (all pruned); restoring a stale
    // *_old set is still correct — those tombstones hide nothing after a
    // completed points swap, they are merely unpruned
    restore(hpath(tombsDir), Seq(hpath(s"$base/tombstones_old")))
  }

  def compact(): Unit = {
    recoverCrashedSwap()
    val live = pointsAt(None).cache()
    live.count() // materialize fully before touching the live dir
    val keepTombs = tombstones
      .join(live.groupBy("uuid").agg(max($"ver").as("pv")), Seq("uuid"), "left")
      .filter($"pv".isNull || $"ver" > $"pv")
      .select($"uuid", $"t_start", $"t_end", $"ver")
      .cache()
    val nKeep = keepTombs.count()

    def swapIn(tmp: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path,
               old: org.apache.hadoop.fs.Path): Unit = {
      if (hfs.exists(dst) && !hfs.rename(dst, old))
        sys.error(s"compact: could not move $dst aside; store unchanged")
      if (hfs.exists(tmp) && !hfs.rename(tmp, dst)) {
        hfs.rename(old, dst) // restore
        sys.error(s"compact: could not swap in $tmp; original data restored")
      }
      rm(old)
    }

    val pTmp = hpath(s"$base/points_compacted")
    val pOld = hpath(s"$base/points_old")
    val tTmp = hpath(s"$base/tombstones_compacted")
    val tOld = hpath(s"$base/tombstones_old")
    Seq(pTmp, pOld, tTmp, tOld).foreach(rm) // leftovers of a crashed compact
    live.write.mode(SaveMode.Overwrite).partitionBy("ub", "tb").parquet(pTmp.toString)
    if (nKeep > 0)
      keepTombs.write.mode(SaveMode.Overwrite).parquet(tTmp.toString)
    live.unpersist(); keepTombs.unpersist()
    swapIn(pTmp, hpath(pointsDir), pOld)
    swapIn(tTmp, hpath(tombsDir), tOld) // tTmp absent ⇒ old dropped
  }
}

object Store {
  /** Directory fan-out bound: ub = xxhash64(uuid) mod UuidBuckets. */
  val UuidBuckets = 64
  /** tb = time >> TimeBucketShift: ≈51-day buckets at µs resolution. */
  val TimeBucketShift = 42
  /** Default bound on the per-batch driver-side uuid→version map — see
    * the maxBatchStreams doc on the class.
    */
  val DefaultMaxBatchStreams: Int = 1 << 20

  def apply(spark: SparkSession, base: String): Store = new Store(spark, base)

  def apply(spark: SparkSession, base: String, maxBatchStreams: Int): Store =
    new Store(spark, base, maxBatchStreams)
}
