package graft

import org.apache.spark.sql.functions._
import graft.ts.{Rollup, TimeSeriesOps}

/** The rollup hierarchy must answer AlignedWindows identically to a direct
  * aggregation over raw points — the invariant that lets stat queries never
  * touch the fact table (qtree's core property).
  */
class RollupSpec extends SparkSuite {

  private val T0 = 1704067200000000L
  private val T31 = 1706659200000000L
  private val STREAM = Seq("user_id", "event_type")

  test("alignedWindows from rollup == direct aggregation over raw") {
    val pts = Tables.points(spark, sfDir).cache()
    val ru = Rollup(spark, tmpDir("rollup"), Seq(24, 30, 36))
    ru.build(pts, STREAM)
    for (pw <- Seq(30, 36, 40)) {
      val direct = TimeSeriesOps.alignedWindows(pts, STREAM, T0, T31, pw)
        .orderBy("user_id", "event_type", "w_start").collect()
      val rolled = ru.alignedWindows(pts, STREAM, T0, T31, pw)
        .orderBy("user_id", "event_type", "w_start").collect()
      assert(direct.length == rolled.length, s"row count at pw=$pw")
      direct.zip(rolled).foreach { case (d, r) =>
        assert(d.getLong(0) == r.getLong(0) && d.getString(1) == r.getString(1)
          && d.getLong(2) == r.getLong(2), s"keys at pw=$pw")
        assert(d.getDouble(3) == r.getDouble(3), s"min at pw=$pw")   // exact
        assert(math.abs(d.getDouble(4) - r.getDouble(4)) <= 1e-6, s"mean at pw=$pw")
        assert(d.getDouble(5) == r.getDouble(5), s"max at pw=$pw")   // exact
        assert(d.getLong(6) == r.getLong(6), s"count at pw=$pw")
      }
    }
  }

  test("alignedWindows matches direct agg when start/end are unaligned to the serving level") {
    val pts = Tables.points(spark, sfDir).cache()
    val ru = Rollup(spark, tmpDir("rollup"), Seq(24, 30))
    ru.build(pts, STREAM)
    // bounds deliberately NOT multiples of 2^30 (nor of 2^pw): boundary
    // pw-buckets straddle the range and must be served from raw points
    val start = T0 + 12345L
    val end = T31 - 98765L
    for (pw <- Seq(30, 33)) {
      val direct = TimeSeriesOps.alignedWindows(pts, STREAM, start, end, pw)
        .orderBy("user_id", "event_type", "w_start").collect()
      val rolled = ru.alignedWindows(pts, STREAM, start, end, pw)
        .orderBy("user_id", "event_type", "w_start").collect()
      assert(direct.length == rolled.length, s"row count at pw=$pw")
      direct.zip(rolled).foreach { case (d, r) =>
        assert(d.getLong(0) == r.getLong(0) && d.getString(1) == r.getString(1)
          && d.getLong(2) == r.getLong(2), s"keys at pw=$pw")
        assert(d.getDouble(3) == r.getDouble(3), s"min at pw=$pw")
        assert(math.abs(d.getDouble(4) - r.getDouble(4)) <= 1e-6, s"mean at pw=$pw")
        assert(d.getDouble(5) == r.getDouble(5), s"max at pw=$pw")
        assert(d.getLong(6) == r.getLong(6), s"count at pw=$pw")
      }
    }
  }

  test("alignedWindows range narrower than one window is served from raw") {
    val pts = Tables.points(spark, sfDir)
    val ru = Rollup(spark, tmpDir("rollup"), Seq(24))
    ru.build(pts, STREAM)
    val start = T0 + 7L
    val end = start + (1L << 26) // < one pw=30 window
    val direct = TimeSeriesOps.alignedWindows(pts, STREAM, start, end, 30)
      .agg(coalesce(sum("v_count"), lit(0L))).first().getLong(0)
    val rolled = ru.alignedWindows(pts, STREAM, start, end, 30)
      .agg(coalesce(sum("v_count"), lit(0L))).first().getLong(0)
    assert(direct == rolled)
  }

  test("incremental appendBatch deltas serve the same answers as a full build") {
    val pts = Tables.points(spark, sfDir).cache()
    val ru = Rollup(spark, tmpDir("rollup"), Seq(24, 30))
    // land the data as three deltas instead of one build
    val splits = Seq(
      pts.filter(col("user_id") % 3 === 0),
      pts.filter(col("user_id") % 3 === 1),
      pts.filter(col("user_id") % 3 === 2))
    splits.zipWithIndex.foreach { case (b, i) => ru.appendBatch(b, STREAM, s"b$i") }
    // replay of a delta must overwrite, not double-count
    ru.appendBatch(splits(1), STREAM, "b1")
    val direct = TimeSeriesOps.alignedWindows(pts, STREAM, T0, T31, 30)
      .orderBy("user_id", "event_type", "w_start").collect()
    val rolled = ru.alignedWindows(pts, STREAM, T0, T31, 30)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(direct.length == rolled.length)
    direct.zip(rolled).foreach { case (d, r) =>
      assert(d.getLong(2) == r.getLong(2) && d.getDouble(3) == r.getDouble(3)
        && math.abs(d.getDouble(4) - r.getDouble(4)) <= 1e-6
        && d.getDouble(5) == r.getDouble(5) && d.getLong(6) == r.getLong(6))
    }
    // build() compacts: same answers afterwards
    ru.build(pts, STREAM)
    assert(ru.alignedWindows(pts, STREAM, T0, T31, 30).count() == direct.length)
  }

  test("invalidated (deleted) ranges are recomputed from raw, rest stays rollup-served") {
    import spark.implicits._
    val pts = Tables.points(spark, sfDir).cache()
    val ru = Rollup(spark, tmpDir("rollup"), Seq(24, 30))
    ru.build(pts, STREAM) // built BEFORE the delete
    val day = 86400000000L
    val (rs, re) = (T0 + 5 * day, T0 + 9 * day)
    // a range delete lands on one stream after the build
    val visible = pts.filter(!(col("user_id") === 1 && col("event_type") === "click" &&
      col("t_us") >= rs && col("t_us") < re))
    val invalid = Seq((1L, "click", rs, re)).toDF("user_id", "event_type", "r_start", "r_end")
    for (pw <- Seq(30, 36)) {
      val direct = TimeSeriesOps.alignedWindows(visible, STREAM, T0, T31, pw)
        .orderBy("user_id", "event_type", "w_start").collect()
      val rolled = ru.alignedWindows(visible, STREAM, T0, T31, pw, invalid = Some(invalid))
        .orderBy("user_id", "event_type", "w_start").collect()
      assert(direct.length == rolled.length, s"row count at pw=$pw")
      direct.zip(rolled).foreach { case (d, r) =>
        assert(d.getLong(0) == r.getLong(0) && d.getString(1) == r.getString(1)
          && d.getLong(2) == r.getLong(2), s"keys at pw=$pw")
        assert(d.getDouble(3) == r.getDouble(3) && d.getDouble(4) == r.getDouble(4)
          && d.getDouble(5) == r.getDouble(5) && d.getLong(6) == r.getLong(6),
          s"stats at pw=$pw")
      }
      // sanity: without invalidation the stale rollup DOES overcount there,
      // i.e. this test actually exercises the dirty path
      val stale = ru.alignedWindows(visible, STREAM, T0, T31, pw)
        .filter(col("user_id") === 1 && col("event_type") === "click" &&
          col("w_start") >= rs - (1L << pw) && col("w_start") < re)
        .agg(coalesce(sum("v_count"), lit(0L))).first().getLong(0)
      val trueCnt = TimeSeriesOps.alignedWindows(visible, STREAM, T0, T31, pw)
        .filter(col("user_id") === 1 && col("event_type") === "click" &&
          col("w_start") >= rs - (1L << pw) && col("w_start") < re)
        .agg(coalesce(sum("v_count"), lit(0L))).first().getLong(0)
      assert(stale > trueCnt, s"delete must actually hide points at pw=$pw")
    }
  }

  test("windowsApprox at depth 0 equals exact windows; rollup serves the same answer") {
    val pts = Tables.points(spark, sfDir).cache()
    val DAY = 86400000000L
    // depth=0 buckets are single microseconds — the approximation vanishes
    val exact = TimeSeriesOps.windows(pts, STREAM, T0, T31, DAY)
      .orderBy("user_id", "event_type", "w_start").collect()
    val approx0 = TimeSeriesOps.windowsApprox(pts, STREAM, T0, T31, DAY, 0)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(exact.length == approx0.length)
    exact.zip(approx0).foreach { case (d, r) => assert(d == r) }
    // 2^depth-aligned bounds AND width (so no bucket straddles a range
    // edge): the rollup-served path answers identically to the raw path
    val depth = 30
    val start = (T0 >> depth) << depth
    val w34 = 1L << 34 // ≈ 4.77 h, a 2^30 multiple
    val end = start + 16 * w34
    val ru = Rollup(spark, tmpDir("rollup"), Seq(24, 30))
    ru.build(pts, STREAM)
    val raw = TimeSeriesOps.windowsApprox(pts, STREAM, start, end, w34, depth)
      .orderBy("user_id", "event_type", "w_start").collect()
    val served = ru.windowsApprox(STREAM, start, end, w34, depth)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(raw.length == served.length && raw.nonEmpty)
    raw.zip(served).foreach { case (d, r) => assert(d == r) }
  }

  test("exact windows served from a level equal direct aggregation") {
    val pts = Tables.points(spark, sfDir).cache()
    val depth = 30
    val start = (T0 >> depth) << depth
    val w = 4L << depth // width = 4 buckets at level 30 → exact tiling
    val end = start + 12 * w
    val ru = Rollup(spark, tmpDir("rollup"), Seq(24, 30))
    ru.build(pts, STREAM)
    val direct = TimeSeriesOps.windows(pts, STREAM, start, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    val served = ru.windows(pts, STREAM, start, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(direct.length == served.length && direct.nonEmpty)
    direct.zip(served).foreach { case (d, r) => assert(d == r) }
    // unaligned start → raw fallback, still correct
    val fb = ru.windows(pts, STREAM, start + 7, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    val fbDirect = TimeSeriesOps.windows(pts, STREAM, start + 7, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(fb.length == fbDirect.length)
    fb.zip(fbDirect).foreach { case (d, r) => assert(d == r) }
  }

  test("peaks and change points served from a level equal the raw path") {
    // the detector paths inherit the re-aggregation invariant: level
    // (sum_us, count) partials re-sum to the raw path's exact window
    // sums, so flags, prominences, and shifts are bit-identical
    val pts = Tables.points(spark, sfDir).cache()
    val depth = 24
    val start = (T0 >> depth) << depth
    val w = 5120L << depth // ≈ 23.9 h: day-scale windows tiled by level-24 buckets
    val end = start + 28 * w
    val ru = Rollup(spark, tmpDir("rollup_det"), Seq(24, 30))
    ru.build(pts, STREAM)
    val pkRaw = TimeSeriesOps.peaks(pts, STREAM, start, end, w, 1, 0L)
      .orderBy("user_id", "event_type", "w_start").collect()
    val pkServed = ru.peaks(pts, STREAM, start, end, w, 1, 0L)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(pkRaw.length == pkServed.length && pkRaw.nonEmpty, s"${pkRaw.length}")
    pkRaw.zip(pkServed).foreach { case (d, r) => assert(d == r) }
    val cpRaw = TimeSeriesOps.changePoints(pts, STREAM, start, end, w, 1, 1L)
      .orderBy("user_id", "event_type", "w_start").collect()
    val cpServed = ru.changePoints(pts, STREAM, start, end, w, 1, 1L)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(cpRaw.length == cpServed.length && cpRaw.nonEmpty, s"${cpRaw.length}")
    cpRaw.zip(cpServed).foreach { case (d, r) => assert(d == r) }
    // unaligned start → raw fallback, still correct
    val fb = ru.peaks(pts, STREAM, start + 7, end, w, 1, 0L).collect()
    val fbRaw = TimeSeriesOps.peaks(pts, STREAM, start + 7, end, w, 1, 0L).collect()
    assert(fb.toSet == fbRaw.toSet)
    // the SG smoother inherits the same invariant (incl. NULL edges)
    val sgRaw = TimeSeriesOps.savgol(pts, STREAM, start, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    val sgServed = ru.savgol(pts, STREAM, start, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(sgRaw.length == sgServed.length && sgRaw.nonEmpty)
    sgRaw.zip(sgServed).foreach { case (d, r) => assert(d == r) }
  }

  test("bollinger band served from a level equals the raw path; burn rate on a predicate-less base falls back") {
    // the levels' exact second moment (v_sum2_us) re-sums to the raw
    // path's per-window (Σx, Σx², n), so rolling mean AND stddev bands
    // are bit-identical; this base was built WITHOUT an ingest-fixed
    // predicate, so Rollup.burnRate must equal the raw path by fallback
    // (the served regime is gated in the dedicated test below)
    val pts = Tables.points(spark, sfDir).cache()
    val depth = 24
    val start = (T0 >> depth) << depth
    val w = 5120L << depth
    val end = start + 28 * w
    val ru = Rollup(spark, tmpDir("rollup_band"), Seq(24, 30))
    ru.build(pts, STREAM)
    val bdRaw = TimeSeriesOps.bollingerBands(pts, STREAM, start, end, w, 7, 2.0)
      .orderBy("user_id", "event_type", "w_start").collect()
    val bdServed = ru.band(pts, STREAM, start, end, w, 7, 2.0)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(bdRaw.length == bdServed.length && bdRaw.nonEmpty, s"${bdRaw.length}")
    bdRaw.zip(bdServed).foreach { case (d, r) => assert(d == r) }
    // unaligned start → raw fallback, still correct
    val fb = ru.band(pts, STREAM, start + 7, end, w, 7, 2.0).collect()
    val fbRaw = TimeSeriesOps.bollingerBands(pts, STREAM, start + 7, end, w, 7, 2.0).collect()
    assert(fb.toSet == fbRaw.toSet && fb.nonEmpty)
    val brRaw = TimeSeriesOps.burnRate(pts, STREAM, start, end, Seq(w),
        col("value") > 50.0, 0.99)
      .orderBy("user_id", "event_type", "width_us", "w_start").collect()
    val brServed = ru.burnRate(pts, STREAM, start, end, Seq(w),
        col("value") > 50.0, 0.99)
      .orderBy("user_id", "event_type", "width_us", "w_start").collect()
    assert(brRaw.length == brServed.length && brRaw.nonEmpty)
    brRaw.zip(brServed).foreach { case (d, r) => assert(d == r) }
  }

  test("burn rate served from levels with an ingest-fixed predicate is bit-identical to raw") {
    val pts = Tables.points(spark, sfDir).cache()
    val depth = 24
    val start = (T0 >> depth) << depth
    val w = 5120L << depth
    val end = start + 28 * w
    val pred = col("value") > 50.0
    val ru = Rollup(spark, tmpDir("rollup_burn"), Seq(24, 30))
    ru.build(pts, STREAM, badPred = Some(pred))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "event_type", "width_us", "w_start").collect().toSeq
    val raw = rows(TimeSeriesOps.burnRate(pts, STREAM, start, end, Seq(w, 4 * w), pred, 0.99))
    // the raw argument is BY-NAME and poisoned: evaluating it means the
    // served path read the fact table — the exact thing it must not do
    val served = rows(ru.burnRate(
      sys.error("burnRate touched raw points despite a servable base"),
      STREAM, start, end, Seq(w, 4 * w), pred, 0.99))
    assert(raw.nonEmpty && raw == served)
    // a DIFFERENT query predicate must fall back to raw — the persisted
    // v_bad_count answers only the ingested predicate
    val otherPred = col("value") > 60.0
    val fb = rows(ru.burnRate(pts, STREAM, start, end, Seq(w), otherPred, 0.99))
    assert(fb == rows(TimeSeriesOps.burnRate(pts, STREAM, start, end, Seq(w), otherPred, 0.99)))
    // a non-tiling width must fall back too
    val fbw = rows(ru.burnRate(pts, STREAM, start, end, Seq(w + 1), pred, 0.99))
    assert(fbw == rows(TimeSeriesOps.burnRate(pts, STREAM, start, end, Seq(w + 1), pred, 0.99)))
  }

  test("appendBatch replays the persisted bad predicate; burn rate stays served and exact") {
    val pts = Tables.points(spark, sfDir).cache()
    val depth = 24
    val start = (T0 >> depth) << depth
    val w = 5120L << depth
    val end = start + 28 * w
    val pred = col("value") > 50.0
    val ru = Rollup(spark, tmpDir("rollup_burn_append"), Seq(24, 30))
    // build on a THIRD of the streams, append the rest in two batches —
    // the appends must count v_bad_count with the stored predicate
    ru.build(pts.filter(col("user_id") % 3 === 0), STREAM, badPred = Some(pred))
    Seq(1, 2).foreach(i =>
      ru.appendBatch(pts.filter(col("user_id") % 3 === i), STREAM, s"b$i"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "event_type", "width_us", "w_start").collect().toSeq
    val raw = rows(TimeSeriesOps.burnRate(pts, STREAM, start, end, Seq(w), pred, 0.99))
    val served = rows(ru.burnRate(
      sys.error("burnRate touched raw points despite a servable base"),
      STREAM, start, end, Seq(w), pred, 0.99))
    assert(raw.nonEmpty && raw == served)
  }

  test("stale pre-v_sum2_us base: band and burn rate fall back to raw; compaction survives") {
    val pts = Tables.points(spark, sfDir).cache()
    val depth = 24
    val start = (T0 >> depth) << depth
    val w = 5120L << depth
    val end = start + 28 * w
    val dir = tmpDir("rollup_stale")
    // hand-write the OLD level schema (pre-v_sum2_us, pre-v_bad_count) —
    // what a base persisted before those columns shipped looks like
    Seq(24, 30).foreach { pw =>
      pts.groupBy(STREAM.map(col)
          :+ shiftleft(shiftright(col("t_us"), pw), pw).as("w_start"): _*)
        .agg(min(col("value")).as("v_min"), max(col("value")).as("v_max"),
          sum(graft.Quant.us6(col("value"))).as("v_sum_us"),
          count(lit(1)).as("v_count"))
        .write.parquet(s"$dir/rollup_pw$pw/delta=base")
    }
    val ru = Rollup(spark, dir, Seq(24, 30))
    // band: no AnalysisException — raw fallback, still correct
    val bd = ru.band(pts, STREAM, start, end, w, 7, 2.0)
      .orderBy("user_id", "event_type", "w_start").collect()
    val bdRaw = TimeSeriesOps.bollingerBands(pts, STREAM, start, end, w, 7, 2.0)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(bd.nonEmpty && bd.toSeq == bdRaw.toSeq)
    // the mean-only family still serves from the stale levels
    val win = ru.windows(pts, STREAM, start, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    val winRaw = TimeSeriesOps.windows(pts, STREAM, start, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(win.nonEmpty && win.toSeq == winRaw.toSeq)
    // schema-driven merge: append + compact must not die on the old schema
    ru.appendBatch(pts.limit(0), STREAM, "noop")
    ru.compactDeltas(STREAM)
    assert(ru.windows(pts, STREAM, start, end, w).count() == winRaw.length)
  }

  test("quantile family always serves from raw — the rollup boundary is explicit") {
    // a width/alignment that windows() WOULD happily level-serve: the
    // quantile methods must still read raw points, because order
    // statistics don't re-aggregate from (min, sum, max, count)
    val pts = Tables.points(spark, sfDir).cache()
    val depth = 24
    val start = (T0 >> depth) << depth
    val w = 5120L << depth
    val end = start + 28 * w
    val ru = Rollup(spark, tmpDir("rollup_q"), Seq(24, 30))
    ru.build(pts, STREAM)
    val bxRaw = TimeSeriesOps.boxplotWindows(pts, STREAM, start, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    val bxServed = ru.boxplot(pts, STREAM, start, end, w)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(bxRaw.length == bxServed.length && bxRaw.nonEmpty)
    bxRaw.zip(bxServed).foreach { case (d, r) => assert(d == r) }
    val pcRaw = TimeSeriesOps.percentileWindows(pts, STREAM, start, end, w, Seq(0.5, 0.9))
      .orderBy("user_id", "event_type", "w_start").collect()
    val pcServed = ru.percentile(pts, STREAM, start, end, w, Seq(0.5, 0.9))
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(pcRaw.length == pcServed.length && pcRaw.nonEmpty)
    pcRaw.zip(pcServed).foreach { case (d, r) => assert(d == r) }
  }

  test("queries below the finest level fall back to raw") {
    val pts = Tables.points(spark, sfDir)
    val ru = Rollup(spark, tmpDir("rollup"), Seq(30))
    ru.build(pts, STREAM)
    val direct = TimeSeriesOps.alignedWindows(pts, STREAM, T0, T31, 24).count()
    assert(ru.alignedWindows(pts, STREAM, T0, T31, 24).count() == direct)
  }

  test("compactDeltas collapses deltas into one base without changing answers") {
    val pts = Tables.points(spark, sfDir).cache()
    val dir = tmpDir("rollup_compact")
    val ru = Rollup(spark, dir, Seq(24, 30))
    Seq(0, 1, 2).foreach(i =>
      ru.appendBatch(pts.filter(col("user_id") % 3 === i), STREAM, s"b$i"))
    val before = ru.alignedWindows(pts, STREAM, T0, T31, 30)
      .orderBy("user_id", "event_type", "w_start").collect()
    ru.compactDeltas(STREAM)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(24, 30).foreach { pw =>
      val deltas = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/rollup_pw$pw"))
        .map(_.getPath.getName).filter(_.startsWith("delta=")).toSeq
      assert(deltas == Seq("delta=base"), s"pw$pw: $deltas")
    }
    // exact integer sums: the merge is associative, so every served value
    // is bit-identical before and after compaction
    val after = ru.alignedWindows(pts, STREAM, T0, T31, 30)
      .orderBy("user_id", "event_type", "w_start").collect()
    assert(before.length == after.length && before.nonEmpty)
    before.zip(after).foreach { case (b, a) => assert(b == a) }
    // crashed swap (live dir moved aside, compacted not yet published):
    // the read path restores it
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/rollup_pw24"),
      new org.apache.hadoop.fs.Path(s"$dir/rollup_pw24_old")))
    assert(ru.level(24).count() > 0)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/rollup_pw24")))
  }
}
