package graft

import org.apache.spark.sql.functions._
import graft.ts.TimeSeriesOps

/** Semantics pinned by the reference: nearest-backward exclusive /
  * forward inclusive (qtree.go:31-33), windows emit complete windows only,
  * changed-range gap merging, as-of join visibility at equal timestamps.
  */
class TimeSeriesOpsSpec extends SparkSuite {
  import spark.implicits._

  private def pts(rows: (Long, Double)*) =
    rows.toDF("t_us", "value")
      .withColumn("uuid", lit("s"))
      .withColumn("ver", lit(1L))

  test("nearest backward is exclusive, forward inclusive") {
    val p = pts((80L, 8.0), (100L, 10.0), (120L, 12.0))
    val back = TimeSeriesOps.nearest(p, Seq("uuid"), 100L, backward = true).collect()
    assert(back.head.getLong(1) == 80L) // t=100 excluded going backward
    val fwd = TimeSeriesOps.nearest(p, Seq("uuid"), 100L, backward = false).collect()
    assert(fwd.head.getLong(1) == 100L) // t=100 included going forward
  }

  test("windows drops the trailing partial window") {
    val p = pts((0L, 1.0), (10L, 2.0), (25L, 3.0))
    // [0, 28) at width 10 → complete windows [0,10) [10,20); 25 is in the
    // partial [20,28) and must not appear
    val w = TimeSeriesOps.windows(p, Seq("uuid"), 0L, 28L, 10L)
      .orderBy("w_start").collect()
    assert(w.map(_.getLong(1)).toSeq == Seq(0L, 10L))
  }

  test("aligned windows bucket on power-of-two boundaries") {
    val p = pts((0L, 1.0), (15L, 2.0), (16L, 3.0), (31L, 4.0), (32L, 5.0))
    val w = TimeSeriesOps.alignedWindows(p, Seq("uuid"), 0L, 64L, 4)
      .orderBy("w_start").collect()
    assert(w.map(_.getLong(1)).toSeq == Seq(0L, 16L, 32L))
    assert(w.map(_.getLong(5)).toSeq == Seq(2L, 2L, 1L))
  }

  test("changes merges adjacent aligned ranges") {
    val p = pts((0L, 1.0), (17L, 2.0), (100L, 3.0))
    // res=4 → ranges [0,16) [16,32) merge; [96,112) separate
    val ch = TimeSeriesOps.changes(p, Seq("uuid"), 0L, 1L, 4)
      .orderBy("c_start").collect()
    assert(ch.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((0L, 32L), (96L, 112L)))
  }

  test("asof join sees a right point at exactly the left timestamp") {
    val left = Seq((1L, 100L, 1.0), (1L, 200L, 2.0)).toDF("user_id", "t_us", "value")
    val right = Seq((1L, 100L, 9.0), (1L, 150L, 8.0)).toDF("user_id", "t_us", "value")
    val j = TimeSeriesOps.asofJoin(left, right, Seq("user_id"))
      .orderBy("t_us").collect()
    assert(j(0).getDouble(3) == 9.0) // right@100 visible to left@100
    assert(j(1).getDouble(3) == 8.0) // latest right <= 200
  }

  test("ewma starts at the first window mean and smooths monotone steps") {
    val p = pts((5L, 10.0), (15L, 20.0), (25L, 30.0))
    val e = TimeSeriesOps.ewma(p, Seq("uuid"), 0L, 30L, 10L, 0.5)
      .orderBy("w_start").collect()
    assert(e.length == 3)
    assert(e(0).getDouble(3) == 10.0)          // s_0 = m_0
    assert(e(1).getDouble(3) == 15.0)          // 10*0.5 + 20*0.5
    assert(e(2).getDouble(3) == 22.5)          // 15*0.5 + 30*0.5
  }

  test("interpolate blends linearly, pins exact hits, nulls outside the hull") {
    val p = pts((10L, 1.0), (30L, 3.0))
    val r = TimeSeriesOps.interpolate(p, Seq("uuid"), 0L, 50L, 10L)
      .orderBy("g_t").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 10L, 20L, 30L, 40L))
    assert(r(0).isNullAt(2))                   // before first point
    assert(r(1).getDouble(2) == 1.0)           // exact hit
    assert(r(2).getDouble(2) == 2.0)           // midpoint of 1..3
    assert(r(3).getDouble(2) == 3.0)           // exact hit
    assert(r(4).isNullAt(2))                   // after last point
  }

  test("histogram bins partition each window's count") {
    val p = pts((1L, 5.0), (2L, 55.0), (3L, 57.0), (12L, 105.0))
    val h = TimeSeriesOps.histogram(p, Seq("uuid"), 0L, 20L, 10L, 50.0)
      .orderBy("w_start", "bin").collect()
    assert(h.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 1L), (0L, 1L, 2L), (10L, 2L, 1L)))
  }

  test("counter rate treats a drop as a reset (increase = new value)") {
    val p = pts((1L, 10.0), (3L, 14.0), (5L, 2.0), (7L, 5.0))
    val c = TimeSeriesOps.counterRate(p, Seq("uuid"), 0L, 10L, 10L)
      .orderBy("w_start").collect()
    assert(c.length == 1)
    // incs: first point null, +4, reset→2, +3 ⇒ increase 9
    assert(c(0).getDouble(2) == 9.0)
    assert(c(0).getLong(4) == 3L) // three non-null samples
  }

  test("lttb keeps endpoints, picks the spike, passes small series through") {
    import graft.ts.Downsample
    // a flat ramp with one spike at t=55: nOut=3 must keep first, spike, last
    val p = pts((0L, 0.0), (10L, 1.0), (20L, 2.0), (55L, 90.0), (70L, 6.0), (99L, 9.0))
    val r3 = Downsample.lttb(p, Seq("uuid"), 0L, 100L, 3)
      .orderBy("t_us").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(r3.head == (0L, 0.0) && r3.last == (99L, 9.0), s"endpoints kept: $r3")
    assert(r3.length == 3 && r3(1) == (55L, 90.0), s"spike kept: $r3")
    // nOut >= series size → identity
    val all = Downsample.lttb(p, Seq("uuid"), 0L, 100L, 10)
      .orderBy("t_us").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(all == Seq((0L, 0.0), (10L, 1.0), (20L, 2.0), (55L, 90.0), (70L, 6.0), (99L, 9.0)))
    // output size is exactly nOut when the series is larger
    assert(Downsample.lttb(p, Seq("uuid"), 0L, 100L, 4).count() == 4)
  }

  test("resample forward-fills gaps") {
    val p = Seq((1L, 5L, 1.0), (1L, 25L, 3.0)).toDF("user_id", "t_us", "value")
    val r = TimeSeriesOps.resample(p, Seq("user_id"), 0L, 40L, 10L)
      .orderBy("g_t").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 10L, 20L, 30L))
    assert(r(0).getDouble(2) == 1.0) // bucket [0,10) has the point at t=5
    assert(r(1).getDouble(2) == 1.0) // gap → carried forward
    assert(r(2).getDouble(2) == 3.0)
    assert(r(3).getDouble(2) == 3.0) // gap → carried forward
  }
}
