package graft

import org.apache.spark.sql.functions._
import graft.ts.Store

/** MVCC semantics of the versioned point store — mirrors the reference's
  * Insert/Delete/version behavior (quasar_test.go patterns: insert, query
  * at old version, delete range, insert after delete).
  */
class StoreSpec extends SparkSuite {
  import spark.implicits._

  private def mkStore = Store(spark, tmpDir("store"))

  test("insert bumps version; reads at old version are stable") {
    val st = mkStore
    val v1 = st.insert("s1", Seq((10L, 1.0), (20L, 2.0)).toDF("time", "value"))
    val v2 = st.insert("s1", Seq((30L, 3.0)).toDF("time", "value"))
    assert(v1 == 1 && v2 == 2)
    assert(st.rawValues("s1", 0, 100, Some(v1)).count() == 2)
    assert(st.rawValues("s1", 0, 100, Some(v2)).count() == 3)
    assert(st.rawValues("s1", 0, 100).count() == 3)
  }

  test("buffered writes are read-your-unflushed; flush promotes and clears") {
    val st = mkStore
    val v1 = st.insert("s1", Seq((10L, 1.0), (20L, 2.0)).toDF("time", "value"))
    st.insertBuffered("s1", Seq((30L, 3.0)).toDF("time", "value"))
    st.insertBuffered("s1", Seq((40L, 4.0), (45L, 4.5)).toDF("time", "value"))
    // merged reads see the buffer immediately; committed reads do not
    assert(st.rawValuesMerged("s1", 0, 100).count() == 5)
    assert(st.rawValues("s1", 0, 100).count() == 2)
    // two-part version: major unchanged, minor counts buffered insert
    // CALLS (the reference's journal-insert unit), not rows — two calls
    // carrying three rows report minor = 2
    assert(st.version("s1") == v1)
    assert(st.versionMerged("s1") == (v1, 2L))
    // other streams see nothing
    assert(st.rawValuesMerged("s2", 0, 100).count() == 0)
    // flush promotes to ONE committed batch and empties the buffer
    val v2 = st.flush("s1")
    assert(v2 == v1 + 1)
    assert(st.rawValues("s1", 0, 100).count() == 5)
    assert(st.versionMerged("s1") == (v2, 0L))
    // historical read at v1 excludes the promoted rows (version pinning
    // bypasses the buffer, like the reference's versioned queries)
    assert(st.rawValues("s1", 0, 100, Some(v1)).count() == 2)
    // an empty-buffer flush stays the version probe it always was
    assert(st.flush("s1") == v2)
    // obliterate drops the buffer too: unflushed rows must not resurrect
    st.insertBuffered("s1", Seq((50L, 5.0)).toDF("time", "value"))
    st.obliterate("s1")
    st.flush("s1")
    assert(st.rawValues("s1", 0, 100).count() == 0)
    assert(st.rawValuesMerged("s1", 0, 100).count() == 0)
  }

  test("range delete hides only prior points; insert-after-delete visible") {
    val st = mkStore
    val v1 = st.insert("s1", (1L to 10L).map(t => (t, t.toDouble)).toDF("time", "value"))
    val v2 = st.deleteRange("s1", 3L, 7L) // hides 3,4,5,6
    assert(st.rawValues("s1", 0, 100).count() == 6)
    assert(st.rawValues("s1", 0, 100, Some(v1)).count() == 10) // time travel
    val v3 = st.insert("s1", Seq((4L, 40.0)).toDF("time", "value"))
    val visible = st.rawValues("s1", 0, 100, Some(v3)).collect().map(r => r.getLong(0)).sorted
    assert(visible.toSeq == Seq(1L, 2L, 4L, 7L, 8L, 9L, 10L))
    assert(st.version("s1") == 3)
  }

  test("obliterate hides the whole stream; other streams untouched") {
    val st = mkStore
    st.insert("a", Seq((1L, 1.0)).toDF("time", "value"))
    st.insert("b", Seq((1L, 1.0)).toDF("time", "value"))
    st.obliterate("a")
    assert(st.rawValues("a", Long.MinValue, Long.MaxValue).count() == 0)
    assert(st.rawValues("b", 0, 100).count() == 1)
  }

  test("copyRange moves a pinned source range into another store and uuid") {
    val src = mkStore
    val v1 = src.insert("s1", (1L to 10L).map(t => (t, t.toDouble)).toDF("time", "value"))
    src.insert("s1", Seq((5L, 50.0)).toDF("time", "value")) // after the pin
    val dst = mkStore
    dst.insert("d1", Seq((4L, -4.0), (40L, -40.0)).toDF("time", "value"))
    // deleteFirst clears ONLY the copied range at the dest; the copy is
    // the source's visible view at v1 (the later 50.0 must not arrive)
    val v = src.copyRange("s1", dst, "d1", 3L, 7L, deleteFirst = true, asOf = Some(v1))
    val got = dst.rawValues("d1", Long.MinValue, Long.MaxValue, Some(v))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got == Seq((3L, 3.0), (4L, 4.0), (5L, 5.0), (6L, 6.0), (40L, -40.0)), s"$got")
    // same-store, same-uuid self-copy (copy.go's dstuuid = "same"):
    // idempotent refresh of a range from a pinned snapshot
    val v2 = src.copyRange("s1", src, "s1", 3L, 7L, deleteFirst = true, asOf = Some(v1))
    val self = src.rawValues("s1", 0L, 100L, Some(v2)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(self == (1L to 10L).map(t => (t, t.toDouble)), s"$self")
  }

  test("version discovery is bounded: an over-wide batch fails loudly") {
    // the per-batch uuid->version map is driver-resident by contract;
    // beyond maxBatchStreams the collect must refuse, not grow the heap
    val st = Store(spark, tmpDir("store_cap"), maxBatchStreams = 2)
    val ok = Seq(("a", 1L, 1.0), ("b", 2L, 2.0)).toDF("uuid", "time", "value")
    st.insertBatch(ok) // 2 streams: at the bound, fine
    assert(st.rawPoints.count() == 2)
    val wide = Seq(("a", 3L, 3.0), ("b", 4L, 4.0), ("c", 5L, 5.0))
      .toDF("uuid", "time", "value")
    val e = intercept[IllegalArgumentException] { st.insertBatch(wide) }
    assert(e.getMessage.contains("distinct streams"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      st.versionsFor(Seq("a", "b", "c")) }
    assert(e2.getMessage.contains("distinct streams"), e2.getMessage)
    // the bound is on DISTINCT streams: a duplicate-heavy list whose
    // distinct count fits must pass, not trip the guard early
    assert(st.versionsFor(Seq("a", "a", "b", "a", "b")).keySet == Set("a", "b"))
    // the store itself is NOT bounded: the same wide batch commits fine
    // on a store with the default contract
    val st2 = Store(spark, tmpDir("store_cap2"))
    st2.insertBatch(wide)
    assert(st2.rawPoints.count() == 3)
  }

  test("unpinned same-uuid copyRange with deleteFirst keeps the range") {
    // the source read is lazy and only runs inside the insert — without
    // pinning "latest" to the pre-delete version, the self-copy would see
    // its own fresh tombstone and silently copy zero points
    val st = mkStore
    st.insert("s1", (1L to 10L).map(t => (t, t.toDouble)).toDF("time", "value"))
    val v = st.copyRange("s1", st, "s1", 3L, 7L, deleteFirst = true, asOf = None)
    val got = st.rawValues("s1", 0L, 100L, Some(v)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(got == (1L to 10L).map(t => (t, t.toDouble)), s"$got")
  }

  test("changes reports inserted and deleted ranges, merged at resolution") {
    val st = mkStore
    val v1 = st.insert("s1", Seq((100L, 1.0), (101L, 1.0), (5000L, 2.0)).toDF("time", "value"))
    val v2 = st.deleteRange("s1", 4000L, 6000L)
    val ch = st.changes("s1", 0, v2, 4).orderBy("c_start").collect()
    // res=16: points at 96..112 merge into one range; delete covers 4000-6000
    assert(ch.length == 2)
    assert(ch(0).getLong(0) == 96L && ch(0).getLong(1) == 112L)
    assert(ch(1).getLong(0) <= 4000L && ch(1).getLong(1) >= 6000L)
    // between v1 and v2 only the delete range changed
    assert(st.changes("s1", v1, v2, 4).count() == 1)
  }

  test("compact preserves visible data and drops dead rows") {
    val st = mkStore
    st.insert("s1", (1L to 100L).map(t => (t, t.toDouble)).toDF("time", "value"))
    st.deleteRange("s1", 1L, 51L)
    val before = st.rawValues("s1", 0, 1000).collect().map(_.getLong(0)).sorted
    st.compact()
    val after = st.rawValues("s1", 0, 1000).collect().map(_.getLong(0)).sorted
    assert(before.toSeq == after.toSeq && after.length == 50)
    assert(st.rawPoints.count() == 50) // dead rows physically gone
  }

  test("compact prunes spent tombstones but keeps the version floor") {
    val st = mkStore
    st.insert("s1", (1L to 10L).map(t => (t, t.toDouble)).toDF("time", "value"))
    st.deleteRange("s1", 1L, 6L)   // spent after compact (dead rows dropped)
    st.insert("s1", Seq((100L, 1.0)).toDF("time", "value"))
    st.insert("s2", Seq((1L, 1.0)).toDF("time", "value"))
    val v2 = st.deleteRange("s2", 0L, 10L) // s2's LATEST op is a delete
    st.compact()
    // s1's tombstone (ver 2 < max point ver 3) is gone; s2's survives as
    // the version floor
    assert(st.tombstones.filter($"uuid" === "s1").count() == 0)
    assert(st.tombstones.filter($"uuid" === "s2").count() == 1)
    // version numbering never regresses: next insert on s2 must be > v2
    val v3 = st.insert("s2", Seq((20L, 2.0)).toDF("time", "value"))
    assert(v3 == v2 + 1)
    assert(st.rawValues("s2", 0, 100).count() == 1) // new point visible
    // and visibility across all streams is unchanged
    assert(st.rawValues("s1", 0, 1000).count() == 6)
  }

  test("a compact crashed mid-swap recovers: reads see data, re-compact keeps it") {
    val base = tmpDir("store")
    val st = Store(spark, base)
    st.insert("s1", (1L to 20L).map(t => (t, t.toDouble)).toDF("time", "value"))
    st.deleteRange("s1", 1L, 6L)
    // simulate dying between `dst.renameTo(old)` and `tmp.renameTo(dst)`:
    // live dirs gone, *_old holds the only copy
    assert(new java.io.File(s"$base/points")
      .renameTo(new java.io.File(s"$base/points_old")))
    assert(new java.io.File(s"$base/tombstones")
      .renameTo(new java.io.File(s"$base/tombstones_old")))
    // read path self-heals instead of seeing an empty store
    assert(st.rawValues("s1", 0, 100).count() == 15)
    // and a subsequent compact must not destroy the recovered data
    val st2 = Store(spark, base)
    assert(new java.io.File(s"$base/points")
      .renameTo(new java.io.File(s"$base/points_old")))
    st2.compact()
    assert(st2.rawValues("s1", 0, 100).count() == 15)
    assert(st2.rawPoints.count() == 15) // dead rows dropped by the compact
  }

  test("insertBatch gives each stream its own version bump in one job") {
    val st = mkStore
    st.insert("a", Seq((1L, 1.0)).toDF("time", "value")) // a at v1
    st.insertBatch(Seq(("a", 2L, 2.0), ("b", 1L, 1.0), ("b", 2L, 2.0))
      .toDF("uuid", "time", "value"))
    assert(st.version("a") == 2 && st.version("b") == 1)
    assert(st.rawValues("a", 0, 100, Some(1L)).count() == 1) // time travel intact
    assert(st.rawValues("a", 0, 100).count() == 2)
    assert(st.rawValues("b", 0, 100).count() == 2)
  }

  test("incremental export applied to a snapshot reproduces the target version") {
    val st = mkStore
    st.insert("a", (0L until 10L).map(t => (t, t.toDouble)).toDF("time", "value")) // v1
    st.insert("b", Seq((0L, 7.0)).toDF("time", "value")) // b@v1
    val snapDir = tmpDir("inc_base")
    st.snapshot(snapDir, Some(1L))
    st.deleteRange("a", 0L, 3L)                                   // a@v2: pure delete
    st.insert("a", Seq((20L, 20.0), (21L, 21.0)).toDF("time", "value")) // a@v3
    st.insert("b", Seq((5L, 5.0)).toDF("time", "value"))          // b@v2
    val expDir = tmpDir("inc_delta")
    st.exportChanges(expDir, 1L, 3L, res = 1)
    // apply: base rows outside every manifest range + exported rows
    val base = spark.read.parquet(snapDir).select("uuid", "time", "value")
    val ranges = spark.read.parquet(s"$expDir/ranges")
    val delta = spark.read.parquet(s"$expDir/points").select("uuid", "time", "value")
    val applied = base.join(ranges,
        base("uuid") === ranges("uuid") &&
          base("time") >= ranges("c_start") && base("time") < ranges("c_end"),
        "left_anti")
      .unionByName(delta)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val want = st.pointsAt(Some(3L)).select("uuid", "time", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(applied == want, s"applied=$applied want=$want")
    // the pure delete arrived as a manifest range with no rows under it
    assert(ranges.filter(col("uuid") === "a" && col("c_start") === 0L).count() > 0)
    assert(delta.filter(col("uuid") === "a" && col("time") < 3L).count() == 0)
  }

  test("snapshot exports the pinned visible view; later deletes don't reach it") {
    val st = mkStore
    st.insert("a", (0L until 10L).map(t => (t, t.toDouble)).toDF("time", "value"))
    val v1 = st.deleteRange("a", 0L, 3L) // visible now: t in [3, 10)
    val out = tmpDir("store_snap")
    st.snapshot(out, Some(v1))
    st.deleteRange("a", 5L, 10L) // after the snapshot — must not appear in it
    val snap = spark.read.parquet(out)
    assert(snap.columns.sorted.toSeq == Seq("tb", "time", "ub", "uuid", "value"))
    val times = snap.select("time").collect().map(_.getLong(0)).sorted.toSeq
    assert(times == (3L until 10L).toSeq, s"$times")
    // and the live store DID move on
    assert(st.rawValues("a", 0, 100).count() == 2)
  }
}
