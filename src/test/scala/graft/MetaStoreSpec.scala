package graft

import graft.ts.MetaStore

/** Stream-descriptor lifecycle: create / CAS-annotate / delete / recreate.
  * The reference allows re-creating an obliterated uuid; the recreated
  * descriptor must be visible and writable (its revision continues above
  * the delete tombstone instead of restarting at 1 and vanishing).
  */
class MetaStoreSpec extends SparkSuite {
  import spark.implicits._

  private def mk = MetaStore(spark, tmpDir("meta"))

  test("create, annotate with CAS, lookup") {
    val ms = mk
    ms.create("u1", "plant/a", Map("unit" -> "V"))
    val v2 = ms.setAnnotations("u1", 1L, Map("calib" -> Some("2026-01")))
    assert(v2 == 2L)
    intercept[IllegalArgumentException] {
      ms.setAnnotations("u1", 1L, Map("calib" -> Some("stale"))) // CAS mismatch
    }
    val d = ms.lookup("plant/").as[(String, String, Map[String, String], Map[String, String], Long)]
      .collect()
    assert(d.length == 1 && d.head._4 == Map("calib" -> "2026-01"))
  }

  test("create after delete resurrects the stream") {
    val ms = mk
    ms.create("u1", "plant/a", Map("unit" -> "V"))
    ms.setAnnotations("u1", 1L, Map("k" -> Some("v")))
    ms.delete("u1")
    assert(ms.descriptors.filter($"uuid" === "u1").count() == 0) // gone
    ms.create("u1", "plant/b", Map("unit" -> "A")) // reference allows this
    val d = ms.descriptors.filter($"uuid" === "u1")
      .as[(String, String, Map[String, String], Map[String, String], Long)]
      .collect()
    assert(d.length == 1, "recreated stream must be visible")
    assert(d.head._2 == "plant/b" && d.head._4.isEmpty)
    // and the recreated stream is writable at its current revision
    val v = ms.setAnnotations("u1", d.head._5, Map("k2" -> Some("v2")))
    assert(v == d.head._5 + 1)
  }

  test("delete requires an existing stream; double delete is rejected") {
    val ms = mk
    intercept[IllegalArgumentException] { ms.delete("ghost") }
    ms.create("u1", "c", Map.empty)
    ms.delete("u1")
    intercept[IllegalArgumentException] { ms.delete("u1") }
    // revision history stays strictly monotone: recreate continues above
    ms.create("u1", "c2", Map.empty)
    import spark.implicits._
    val revs = spark.read.parquet(s"${ms.base}/streams_meta")
      .filter($"uuid" === "u1").select($"annotationVersion")
      .as[Long].collect().sorted
    assert(revs.toSeq == Seq(1L, 2L, 3L), s"revisions were ${revs.toSeq}")
  }

  test("double create is rejected while the stream lives") {
    val ms = mk
    ms.create("u1", "c", Map.empty)
    intercept[IllegalArgumentException] { ms.create("u1", "c", Map.empty) }
  }
}
