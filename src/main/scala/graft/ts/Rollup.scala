package graft.ts

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hierarchical statistical rollups — the Spark-native form of BTrDB's
  * qtree internal nodes.
  *
  * The reference's K=64-ary tree stores (min, mean, max, count) per child
  * pointer at every level (qtree/operators.go OpReduce, bstore
  * blocktypes.go Coreblock), which is what makes AlignedWindows O(log n):
  * a query at pointWidth p reads tree nodes, never raw points.
  *
  * Here the same precomputation is N materialized aggregate tables at
  * increasing pointwidths. Each level stores SUM (not mean) so it is
  * exactly re-aggregable from the previous level: min/max/count/sum all
  * merge associatively. A query at pointWidth p is served from the
  * coarsest level ≤ p, re-aggregating 2^(p−l) buckets per window — at
  * 100 TB a year of ns data at level 32 is ~7 k rows per stream, so stat
  * queries never touch the raw fact table.
  *
  * Incremental maintenance: level 0 is a groupBy over the new batch only
  * (merged by bucket on read or by periodic compaction) — see
  * graft.streaming.Ingest for the streaming path.
  */
class Rollup(val spark: SparkSession, val base: String, val pointwidths: Seq[Int]) {
  require(pointwidths == pointwidths.sorted, "pointwidths must ascend")

  private def levelDir(pw: Int) = s"$base/rollup_pw$pw"

  /** Bucket aggregate of raw points at pointwidth pw. The value sum is
    * kept as exact integer micro-units (graft.Quant.us6), so every level
    * of the hierarchy re-aggregates without float drift and rollup-served
    * means are bit-identical to direct aggregation.
    *
    * v_sum2_us extends the reference's statpoint (min, mean, max, count —
    * qtree.go's node payload) with the exact SECOND moment (Σ of squared
    * µ-units, DECIMAL — squares overflow longs, the ts_stddev rule).
    * Σx² is associative like the others, so it merges exactly through
    * every level, and it is what lets the volatility family
    * (bollingerBands — rolling mean ± K·σ) serve from the hierarchy
    * bit-identically instead of stopping at the mean-only detectors.
    */
  private def bucketize(points: DataFrame, streamCols: Seq[String], pw: Int,
                        badPred: Option[Column]): DataFrame = {
    val us = graft.Quant.us6(col("value")).cast("decimal(38,0)")
    val aggs = Seq(
      min(col("value")).as("v_min"),
      max(col("value")).as("v_max"),
      sum(graft.Quant.us6(col("value"))).as("v_sum_us"),
      sum(us * us).as("v_sum2_us"),
      count(lit(1)).as("v_count")) ++
      // the ingest-FIXED predicate count (see burnRate): a plain long
      // count, associative like the others
      badPred.map(p => sum(when(p, 1L).otherwise(0L)).as("v_bad_count"))
    points.groupBy(streamCols.map(col)
        :+ shiftleft(shiftright(col("t_us"), pw), pw).as("w_start"): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a finer rollup level up to pointwidth pw — associative and
    * exact for every aggregate (integer sums, not float). SCHEMA-DRIVEN:
    * the optional moments (v_sum2_us — added after the first persisted
    * bases shipped; v_bad_count — only on predicate-carrying builds) are
    * merged only when the finer level actually has them, so compaction
    * and coarse-from-fine appends keep working on a stale base instead
    * of failing AnalysisException; the read paths that NEED a missing
    * moment fall back to raw with a rebuild-directed warning (band,
    * burnRate).
    */
  private def merge(finer: DataFrame, streamCols: Seq[String], pw: Int): DataFrame = {
    val aggs = Seq(
      min(col("v_min")).as("v_min"),
      max(col("v_max")).as("v_max"),
      sum(col("v_sum_us")).as("v_sum_us")) ++
      (if (finer.columns.contains("v_sum2_us"))
        Seq(sum(col("v_sum2_us")).cast("decimal(38,0)").as("v_sum2_us")) else Nil) ++
      Seq(sum(col("v_count")).as("v_count")) ++
      (if (finer.columns.contains("v_bad_count"))
        Seq(sum(col("v_bad_count")).as("v_bad_count")) else Nil)
    finer.groupBy(streamCols.map(col)
        :+ shiftleft(shiftright(col("w_start"), pw), pw).as("w_start"): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build (or rebuild) all levels, each from the previous — a single raw
    * scan total. Every level lives under a `delta=` subdir (the same
    * layout appendBatch extends), so a full build is just the compacted
    * `delta=base`; building clears any previous deltas (it subsumes them).
    *
    * `badPred` FIXES a bad-event predicate at ingest time: every level
    * then carries v_bad_count (the exact count of points satisfying it
    * per bucket), which is what lets burnRate() serve from the hierarchy
    * — see its doc for why the predicate must be an ingest decision. The
    * predicate's canonical SQL is persisted at `base/_bad_pred` so
    * appendBatch replays it verbatim and burnRate can verify the query's
    * predicate IS the ingested one before trusting the counts.
    */
  def build(points: DataFrame, streamCols: Seq[String],
            badPred: Option[Column] = None): Unit = {
    // Hadoop FS, not java.io.File: on HDFS/S3A a local-File delete
    // silently no-ops and stale delta= dirs would double-count every
    // bucket on read (same consistency stance as graft.ts.Store)
    writeBadPred(badPred)
    var prev: DataFrame = null
    pointwidths.zipWithIndex.foreach { case (pw, i) =>
      val level =
        if (i == 0) bucketize(points, streamCols, pw, badPred)
        else merge(prev, streamCols, pw)
      val dir = new org.apache.hadoop.fs.Path(levelDir(pw))
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(dir)) fs.delete(dir, true)
      level.write.mode(SaveMode.Overwrite).parquet(s"${levelDir(pw)}/delta=base")
      prev = spark.read.parquet(levelDir(pw))
    }
  }

  def level(pw: Int): DataFrame = { recoverCrashedSwap(pw); spark.read.parquet(levelDir(pw)) }

  /** The ingest-fixed bad predicate's canonical SQL, persisted next to
    * the levels (one tiny text file — the hierarchy's only non-parquet
    * state). None ⇔ the base was built without one.
    */
  private def badPredPath = new org.apache.hadoop.fs.Path(s"$base/_bad_pred")
  private def writeBadPred(p: Option[Column]): Unit = p match {
    case Some(c) =>
      val out = hfs.create(badPredPath, true)
      out.write(org.apache.spark.sql.graft.GraftSqlShim.canonicalSql(c)
        .getBytes("UTF-8")); out.close()
    case None => hfs.delete(badPredPath, false)
  }
  private[ts] def storedBadPred: Option[String] =
    if (!hfs.exists(badPredPath)) None
    else {
      val in = hfs.open(badPredPath)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

  private val hfs = new org.apache.hadoop.fs.Path(base)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def hpath(d: String) = new org.apache.hadoop.fs.Path(d)

  /** A compactDeltas swap that died between moving the live level aside
    * and publishing the compacted one leaves `_old`/`_compacted` but no
    * live dir — restore whichever exists (same stance as Store: both
    * states are complete and correct; `_old` is pre-compaction deltas,
    * `_compacted` their exact merge). Racing recoverers are tolerated: a
    * failed restore rename is fine if SOMEONE published a live dir, and
    * the un-restored twin is dropped so a later recovery can't resurrect
    * a stale copy (compactDeltas tolerates losing its publish rename to
    * a recoverer the same way).
    */
  private def recoverCrashedSwap(pw: Int): Unit =
    if (!hfs.exists(hpath(levelDir(pw)))) {
      val live = hpath(levelDir(pw))
      val comp = hpath(s"${levelDir(pw)}_compacted")
      val old = hpath(s"${levelDir(pw)}_old")
      Seq(comp, old).find(hfs.exists).foreach { c =>
        if (!hfs.rename(c, live) && !hfs.exists(live))
          sys.error(s"rollup: could not restore $c")
        if (hfs.exists(live)) hfs.delete(if (c == comp) old else comp, true)
      }
    }

  /** Collapse accumulated ingest deltas into one `delta=base` per level —
    * the read-efficiency complement of appendBatch. Reads only the LEVEL
    * files (never raw points), so the job is O(rollup size): at 100 TB of
    * raw data the finest level is ~2^pw smaller, and a nightly compaction
    * touches megabytes per stream, not the fact table. Each level swaps
    * independently and crash-safely (write `_compacted` → move live to
    * `_old` → publish → drop `_old`; a crash at any point leaves either
    * the old deltas or their exact merge, and level() restores it).
    *
    * Concurrency contract: call from the (single) ingest writer while no
    * batch is in flight — a delta landing between the read and the swap
    * would be dropped. READERS need no quiescing: one that observes the
    * mid-swap window (live moved aside, compacted not yet published) will
    * publish `_compacted` itself via recoverCrashedSwap; losing the
    * publish rename to such a reader is success here, not a fault — the
    * published bytes are this compaction's own merge either way. Replayed
    * micro-batches after a compaction are safe: the ingest commit markers
    * outlive it, so an absorbed delta is never re-appended.
    */
  def compactDeltas(streamCols: Seq[String]): Unit =
    pointwidths.foreach { pw =>
      recoverCrashedSwap(pw)
      val dir = hpath(levelDir(pw))
      if (hfs.exists(dir) &&
          hfs.listStatus(dir).count(_.getPath.getName.startsWith("delta=")) > 1) {
        val tmp = hpath(s"${levelDir(pw)}_compacted")
        val old = hpath(s"${levelDir(pw)}_old")
        if (hfs.exists(tmp)) hfs.delete(tmp, true)
        if (hfs.exists(old)) hfs.delete(old, true)
        // same-pw merge: re-aggregates duplicate w_start buckets across
        // deltas (associative min/max + exact integer sums — identical to
        // what every read path does on the fly)
        merge(spark.read.parquet(levelDir(pw)), streamCols, pw)
          .write.parquet(s"${tmp.toString}/delta=base")
        if (!hfs.rename(dir, old)) sys.error(s"rollup: could not move $dir aside")
        if (!hfs.rename(tmp, dir) && !(hfs.exists(dir) && !hfs.exists(tmp)))
          sys.error(s"rollup: could not publish $tmp")
        hfs.delete(old, true)
      }
    }

  /** Incrementally append one ingest batch's contribution to EVERY level —
    * the streaming-maintenance path (the reference updates its tree's
    * internal aggregates on each commit; here each micro-batch lands a
    * delta at each pointwidth, chained coarse-from-fine so the batch is
    * bucketized once). Duplicate w_start buckets across deltas are exact
    * partial aggregates: every read path re-merges buckets (min/max/sum/
    * count are associative), so deltas never need compaction for
    * correctness — a periodic build() collapses them for read efficiency.
    *
    * `writeId` makes replays idempotent: a delta lands at
    * `rollup_pw<pw>/delta=<writeId>` with Overwrite, so a replayed batch
    * (same writeId) overwrites its own delta instead of double-counting.
    */
  def appendBatch(points: DataFrame, streamCols: Seq[String], writeId: String): Unit = {
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    // replay the ingest-fixed predicate from its persisted SQL — the
    // append must count v_bad_count with EXACTLY the build's predicate
    // or merged buckets would mix two definitions of "bad"
    val badPred = storedBadPred.map(expr)
    // conform to the EXISTING base's optional moments: appending a
    // new-schema delta (v_sum2_us/v_bad_count) next to stale old-schema
    // files would make the merged column silently PARTIAL — sum()
    // ignores the old files' nulls, so band()/burnRate() would serve
    // wrong numbers while the column looks present. A stale base stays
    // uniformly stale (raw fallback, correct) until a build() rebuild.
    val baseCols: Option[Set[String]] = {
      val finest = hpath(levelDir(pointwidths.head))
      if (hfs.exists(finest)) Some(level(pointwidths.head).columns.toSet) else None
    }
    def conform(df: DataFrame): DataFrame = baseCols match {
      case Some(cols) => df.drop(df.columns
        .filter(c => c.startsWith("v_") && !cols.contains(c)): _*)
      case None => df
    }
    var prev: DataFrame = null
    pointwidths.zipWithIndex.foreach { case (pw, i) =>
      val delta =
        if (i == 0) conform(bucketize(points, streamCols, pw, badPred))
        else merge(prev, streamCols, pw)
      delta.cache()
      cached += delta
      delta.write.mode(SaveMode.Overwrite).parquet(s"${levelDir(pw)}/delta=$writeId")
      prev = delta
    }
    cached.foreach(_.unpersist())
  }

  /** Serve EXACT arbitrary-width Windows from the coarsest level whose
    * buckets tile the windows — width divisible by 2^l and `start`
    * 2^l-aligned, so every bucket lies wholly inside one window and the
    * re-aggregation is exact (integer micro-unit sums). Anything else
    * falls back to raw. This is the qtree's Windows read path: the
    * reference answers WindowsParams from internal nodes whenever the
    * window geometry permits (qtree.go QueryWindow descends only to the
    * node size that fits).
    */
  def windows(raw: => DataFrame, streamCols: Seq[String],
              start: Long, end: Long, width: Long): DataFrame = {
    val usable = pointwidths.filter(l =>
      width % (1L << l) == 0 && (start & ((1L << l) - 1)) == 0L)
    if (usable.isEmpty) TimeSeriesOps.windows(raw, streamCols, start, end, width)
    else {
      val l = usable.max
      val completeEnd = start + ((end - start) / width) * width
      val d = col("w_start") - start
      level(l)
        .filter(col("w_start") >= start && col("w_start") < completeEnd)
        .groupBy(streamCols.map(col)
          :+ (lit(start) + d - pmod(d, lit(width))).as("w_win"): _*)
        .agg(
          min(col("v_min")).as("v_min"),
          graft.Quant.mean6(sum(col("v_sum_us")), sum(col("v_count"))).as("v_mean"),
          max(col("v_max")).as("v_max"),
          sum(col("v_count")).as("v_count"))
        .withColumnRenamed("w_win", "w_start")
        .select(streamCols.map(col) :+ col("w_start") :+ col("v_min")
          :+ col("v_mean") :+ col("v_max") :+ col("v_count"): _*)
    }
  }

  /** Per-window exact (sum_us, n) summaries re-aggregated from the
    * coarsest usable level — the shared feed for the rollup-served
    * detector paths below. Same usability rule as windows(): the window
    * width must be a multiple of the level bucket and `start` must be
    * bucket-aligned, else the caller falls back to raw.
    */
  private def windowSums(pw: Int, streamCols: Seq[String],
                         start: Long, end: Long, width: Long): DataFrame = {
    val completeEnd = start + ((end - start) / width) * width
    val d = col("w_start") - start
    level(pw)
      .filter(col("w_start") >= start && col("w_start") < completeEnd)
      .groupBy(streamCols.map(col)
        :+ (lit(start) + d - pmod(d, lit(width))).as("w_win"): _*)
      .agg(sum(col("v_sum_us")).as("sum_us"), sum(col("v_count")).as("n"))
      .withColumnRenamed("w_win", "w_start")
  }

  /** Peak extraction served from the rollup hierarchy — the qtree
    * promise applied to the detector: the window means come from the
    * coarsest usable level's EXACT integer sums (identical to the raw
    * path's, by the re-aggregation invariant), so the flags are
    * bit-identical to TimeSeriesOps.peaks over raw points while reading
    * only 2^-pw of the rows. Falls back to raw when no level is usable.
    */
  def peaks(raw: => DataFrame, streamCols: Seq[String], start: Long, end: Long,
            width: Long, k: Int, minPromUs: Long): DataFrame = {
    val usable = pointwidths.filter(l =>
      width % (1L << l) == 0 && (start & ((1L << l) - 1)) == 0L)
    if (usable.isEmpty)
      TimeSeriesOps.peaks(raw, streamCols, start, end, width, k, minPromUs)
    else TimeSeriesOps.peaksOfWindowSums(
      windowSums(usable.max, streamCols, start, end, width), streamCols, k, minPromUs)
  }

  /** Savitzky–Golay smoothing served from the rollup hierarchy — same
    * contract as peaks(): the coarsest usable level's exact integer sums
    * re-aggregate into the identical window means, so the kernel output
    * is bit-identical to the raw path at 2^-pw of the rows read.
    */
  def savgol(raw: => DataFrame, streamCols: Seq[String], start: Long, end: Long,
             width: Long): DataFrame = {
    val usable = pointwidths.filter(l =>
      width % (1L << l) == 0 && (start & ((1L << l) - 1)) == 0L)
    if (usable.isEmpty)
      TimeSeriesOps.savgol(raw, streamCols, start, end, width)
    else TimeSeriesOps.savgolOfWindowSums(
      windowSums(usable.max, streamCols, start, end, width), streamCols)
  }

  /** Change points served from the rollup hierarchy — same contract as
    * peaks() above.
    */
  def changePoints(raw: => DataFrame, streamCols: Seq[String], start: Long,
                   end: Long, width: Long, k: Int, minShiftUs: Long): DataFrame = {
    val usable = pointwidths.filter(l =>
      width % (1L << l) == 0 && (start & ((1L << l) - 1)) == 0L)
    if (usable.isEmpty)
      TimeSeriesOps.changePoints(raw, streamCols, start, end, width, k, minShiftUs)
    else TimeSeriesOps.changePointsOfWindowSums(
      windowSums(usable.max, streamCols, start, end, width), streamCols, k, minShiftUs)
  }

  /** Bollinger bands served from the rollup hierarchy — the volatility
    * envelope joins the rollup-served family because the levels carry
    * the exact second moment (v_sum2_us, see bucketize): per-window
    * (Σx, Σx², n) re-aggregate associatively from bucket partials into
    * the raw path's exact integers, so roll_mean/band_lo/band_hi are
    * bit-identical to TimeSeriesOps.bollingerBands over raw points at
    * 2^-pw of the rows read. Same usability rule and raw fallback as
    * peaks().
    */
  def band(raw: => DataFrame, streamCols: Seq[String], start: Long, end: Long,
           width: Long, k: Int, nSigma: Double): DataFrame = {
    val usable = pointwidths.filter(l =>
      width % (1L << l) == 0 && (start & ((1L << l) - 1)) == 0L)
    // v_sum2_us postdates the first persisted bases: a stale level can't
    // serve the second moment, so fall back to raw (always correct)
    // instead of dying AnalysisException mid-plan; the warning names the
    // fix (a build() rebuild adds the column)
    if (usable.nonEmpty && !level(usable.max).columns.contains("v_sum2_us")) {
      org.apache.logging.log4j.LogManager.getLogger(getClass).warn(
        s"rollup level pw=${usable.max} at $base predates v_sum2_us; " +
          "band() served from RAW points — rebuild the hierarchy " +
          "(Rollup.build) to serve it from levels")
      return TimeSeriesOps.bollingerBands(raw, streamCols, start, end, width, k, nSigma)
    }
    if (usable.isEmpty)
      TimeSeriesOps.bollingerBands(raw, streamCols, start, end, width, k, nSigma)
    else {
      val completeEnd = start + ((end - start) / width) * width
      val d = col("w_start") - start
      val moments = level(usable.max)
        .filter(col("w_start") >= start && col("w_start") < completeEnd)
        .groupBy(streamCols.map(col)
          :+ (lit(start) + d - pmod(d, lit(width))).as("w_win"): _*)
        .agg(sum(col("v_sum_us")).as("s1"),
          sum(col("v_sum2_us")).cast("decimal(38,0)").as("s2"),
          sum(col("v_count")).as("n"))
        .withColumnRenamed("w_win", "w_start")
      TimeSeriesOps.bandOfWindowMoments(moments, streamCols, k, nSigma)
    }
  }

  /** Multi-window SLO burn rate served from the hierarchy — with a
    * boundary argument unlike the quantile family's impossibility:
    * n_bad is a PREDICATE aggregate, and no fixed set of per-bucket
    * moments can answer an ARBITRARY query-time predicate (min/max can
    * only prove a bucket wholly good or wholly bad, not count a mixed
    * one). A deployment that FIXES the predicate at ingest ("is_error")
    * turns bad-count into a plain associative count a level carries —
    * so that is exactly the contract here: build(badPred = Some(...))
    * stamps v_bad_count into every level and persists the predicate's
    * canonical SQL, and this serves from the coarsest usable level IFF
    * (a) the query's predicate IS the ingested one (canonical-SQL
    * equality against `base/_bad_pred` — a semantically-equal-but-
    * differently-spelled predicate conservatively falls back) and
    * (b) every requested width tiles some level. Counts re-aggregate as
    * exact longs and the fraction/burn divisions are the raw path's
    * expressions verbatim, so the output is bit-identical to
    * TimeSeriesOps.burnRate over raw points (spec-pinned) at 2^-pw of
    * the rows read — the multi-window SLO dashboard query a 100 TB
    * fleet asks at alert frequency, answered without touching the fact
    * table. Anything else — stale base, no predicate, different
    * predicate, non-tiling width — falls back to raw.
    */
  def burnRate(raw: => DataFrame, streamCols: Seq[String], start: Long,
               end: Long, widths: Seq[Long], badPred: Column,
               slo: Double): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0), s"widths must be positive: $widths")
    require(slo > 0 && slo < 1, s"slo must be in (0,1), got $slo")
    def usableFor(w: Long) = pointwidths.filter(l =>
      w % (1L << l) == 0 && (start & ((1L << l) - 1)) == 0L)
    val servable = storedBadPred.contains(
      org.apache.spark.sql.graft.GraftSqlShim.canonicalSql(badPred)) &&
      widths.forall(w => usableFor(w).nonEmpty) &&
      pointwidths.forall(l => level(l).columns.contains("v_bad_count"))
    if (!servable)
      TimeSeriesOps.burnRate(raw, streamCols, start, end, widths, badPred, slo)
    else {
      // per width: its own coarsest usable level, complete windows only
      // (the raw path's cutoff), counts re-merged to the width grid
      widths.map { w =>
        val completeEnd = start + ((end - start) / w) * w
        val d = col("w_start") - start
        level(usableFor(w).max)
          .filter(col("w_start") >= start && col("w_start") < completeEnd)
          .groupBy(streamCols.map(col)
            :+ (lit(start) + d - pmod(d, lit(w))).as("w_win"): _*)
          .agg(sum(col("v_count")).as("n_events"),
            sum(col("v_bad_count")).as("n_bad"))
          .select(streamCols.map(col) ++ Seq(lit(w).as("width_us"),
            col("w_win").as("w_start"), col("n_events"), col("n_bad"),
            graft.Quant.q6(col("n_bad").cast("double") / col("n_events").cast("double"))
              .as("bad_frac"),
            graft.Quant.q6(col("n_bad").cast("double") / col("n_events").cast("double") /
              (lit(1.0) - lit(slo))).as("burn")): _*)
      }.reduce(_.unionByName(_))
    }
  }

  /** The quantile family — boxplot quartiles, percentileWindows' type-7
    * quantiles — is where the qtree promise STOPS, and this pair of
    * methods makes that boundary executable instead of a survey
    * footnote. A rollup level stores (min, sum, max, count) per bucket;
    * order statistics do NOT re-aggregate from those moments — two
    * buckets with identical statpoints can hold different medians — so
    * there is no "usable level" for this family at ANY width/alignment:
    * these always read raw points, exactly and deliberately, rather
    * than serve a silently-wrong moment-based approximation. What the
    * hierarchy CAN serve is windows()/alignedWindows (min/mean/max/
    * count), the window-MEAN detector family (peaks/savgol/
    * changePoints — means re-aggregate exactly), and windowsApprox's
    * whole-bucket depth forms. Serving quantiles from a hierarchy would
    * require a mergeable sketch column (t-digest/KLL) added at build
    * time — a different storage contract than the reference's statpoint
    * node (qtree.go's min/mean/max/count), kept out so the rollup stays
    * bit-exact for everything it claims.
    */
  def boxplot(raw: => DataFrame, streamCols: Seq[String], start: Long,
              end: Long, width: Long, whisker: Double = 1.5): DataFrame =
    TimeSeriesOps.boxplotWindows(raw, streamCols, start, end, width, whisker)

  /** See boxplot: quantiles never rollup-serve; always the raw path. */
  def percentile(raw: => DataFrame, streamCols: Seq[String], start: Long,
                 end: Long, width: Long, ps: Seq[Double]): DataFrame =
    TimeSeriesOps.percentileWindows(raw, streamCols, start, end, width, ps)

  /** Serve depth-approximate Windows (TimeSeriesOps.windowsApprox — the
    * WindowsParams.depth semantics) from the coarsest level ≤ depth: merge
    * level buckets up to 2^depth, then assign each to the window containing
    * its start. `start` and the complete-window end should be
    * 2^depth-aligned for bit-equivalence with the raw path — an edge
    * bucket straddling the range boundary carries points the raw path's
    * [start, end) filter excludes (inherent to whole-node approximation).
    */
  def windowsApprox(streamCols: Seq[String], start: Long, end: Long,
                    width: Long, depth: Int): DataFrame = {
    val usable = pointwidths.filter(_ <= depth)
    require(usable.nonEmpty, s"no rollup level at or below depth $depth")
    // unaligned start would merge a finer-level bucket to a 2^depth bucket
    // starting BEFORE the range (emitting a window the raw path never
    // produces) or drop a straddling bucket's in-range points
    require((start & ((1L << depth) - 1)) == 0L,
      s"windowsApprox start must be 2^$depth-aligned, got $start")
    val completeEnd = start + ((end - start) / width) * width
    val buckets = merge(
      level(usable.max).filter(col("w_start") >= start && col("w_start") < completeEnd),
      streamCols, depth)
    val d = col("w_start") - start
    buckets
      .groupBy(streamCols.map(col)
        :+ (lit(start) + d - pmod(d, lit(width))).as("w_win"): _*)
      .agg(
        min(col("v_min")).as("v_min"),
        graft.Quant.mean6(sum(col("v_sum_us")), sum(col("v_count"))).as("v_mean"),
        max(col("v_max")).as("v_max"),
        sum(col("v_count")).as("v_count"))
      .withColumnRenamed("w_win", "w_start")
  }

  /** Serve AlignedWindows(pointWidth=pw) from the coarsest usable level.
    * Falls back to `raw` when pw is finer than the finest level. Output
    * schema matches TimeSeriesOps.alignedWindows.
    *
    * `invalid`: per-stream [r_start, r_end) time ranges whose rollup
    * buckets must not be trusted — rollups reflect raw INGEST only, so a
    * Store.deleteRange/obliterate after the last build leaves the
    * overlapped buckets stale (they still count the hidden points). Pass
    * the store's tombstones with ver > the rollup's build watermark
    * (Rollup.tombstoneRanges) and every window overlapping one is
    * recomputed from `raw` (the visible view) instead; all other windows
    * stay rollup-served. Tombstones are metadata-scale, so both the
    * bucket filter and the dirty-point semi-join broadcast. A periodic
    * build() over the post-delete visible view re-absorbs the ranges.
    */
  def alignedWindows(raw: => DataFrame, streamCols: Seq[String],
                     start: Long, end: Long, pw: Int,
                     invalid: Option[DataFrame] = None): DataFrame = {
    val usable = pointwidths.filter(_ <= pw)
    if (usable.isEmpty)
      TimeSeriesOps.alignedWindows(raw, streamCols, start, end, pw)
    else {
      val l = usable.max
      val width = 1L << pw
      // Rollup buckets aggregate EVERY point in their 2^l span, so a level
      // can only serve pw-windows that lie fully inside [start, end). The
      // (at most two) partial boundary windows — the pw-bucket containing an
      // unaligned `start` and the one containing an unaligned `end` — are
      // computed from raw points with the exact [start, end) filter; the
      // raw scans are single-bucket time ranges, so they partition-prune.
      val loAligned = if ((start & (width - 1)) == 0L) start
                      else ((start >> pw) + 1) << pw
      val hiAligned = (end >> pw) << pw
      if (loAligned >= hiAligned)
        TimeSeriesOps.alignedWindows(raw, streamCols, start, end, pw)
      else {
        def invRanges = invalid.map(_.select(
          streamCols.map(c => col(c).as(s"__inv_$c"))
            :+ col("r_start") :+ col("r_end"): _*))
        def keyEq = streamCols.map(c => col(c) === col(s"__inv_$c")).reduce(_ && _)
        def overlaps(bucket: Column) =
          bucket < col("r_end") && bucket + width > col("r_start")

        val fromLevel = merge(
            level(l).filter(col("w_start") >= loAligned && col("w_start") < hiAligned),
            streamCols, pw)
        val trusted = invRanges.fold(fromLevel)(inv =>
            fromLevel.join(broadcast(inv), keyEq && overlaps(col("w_start")), "left_anti"))
          .select(streamCols.map(col) :+ col("w_start") :+ col("v_min")
            :+ graft.Quant.mean6(col("v_sum_us"), col("v_count")).as("v_mean")
            :+ col("v_max") :+ col("v_count"): _*)
        // dirty interior buckets: recomputed over ALL their visible raw
        // points (a bucket is stale as a whole, not just inside the range)
        val dirty = invRanges.toSeq.map { inv =>
          val pts = raw.filter(col("t_us") >= loAligned && col("t_us") < hiAligned)
            .withColumn("__b", shiftleft(shiftright(col("t_us"), pw), pw))
          TimeSeriesOps.alignedWindows(
            pts.join(broadcast(inv), keyEq && overlaps(col("__b")), "left_semi").drop("__b"),
            streamCols, loAligned, hiAligned, pw)
        }
        (Seq((start, loAligned), (hiAligned, end))
          .filter { case (s, e) => s < e }
          .map { case (s, e) => TimeSeriesOps.alignedWindows(raw, streamCols, s, e, pw) }
          ++ dirty)
          .foldLeft(trusted)(_ unionByName _)
      }
    }
  }
}

object Rollup {
  def apply(spark: SparkSession, base: String, pointwidths: Seq[Int]): Rollup =
    new Rollup(spark, base, pointwidths)

  /** Store tombstones as invalidation ranges for alignedWindows (stream
    * key = uuid). Callers serving a rollup built at version V should pass
    * `store.tombstones.filter(col("ver") > V)` — older tombstones were
    * already absorbed by that build.
    */
  def tombstoneRanges(tombstones: DataFrame): DataFrame =
    tombstones.select(col("uuid"),
      col("t_start").as("r_start"), col("t_end").as("r_end"))
}
