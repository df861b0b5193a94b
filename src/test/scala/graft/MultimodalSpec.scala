package graft

import org.apache.spark.sql.functions._
import graft.mm.Multimodal

/** Multimodal plumbing: binary payload schema, partition-local decode
  * (deterministic stub), one-to-many frame sampling shape.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val assets = Multimodal.syntheticAssets(spark, docs)

  test("synthetic assets carry typed metadata and binary payloads") {
    val a = assets.cache()
    assert(a.count() == docs.count())
    val r = a.filter($"asset_id" === 0).head()
    assert(r.kind.startsWith("img/") && r.width >= 32 && r.height >= 32)
    assert(r.payload.nonEmpty)
  }

  test("decodeFeatures is deterministic and exact per payload") {
    val feats = Multimodal.decodeFeatures(assets).cache()
    assert(feats.count() == docs.count())
    // recompute one row's stub decode on the driver and compare exactly
    val row = assets.filter($"asset_id" === 1).head()
    val got = feats.filter($"asset_id" === 1).head()
    var crc = 0L
    val hist = new Array[Float](8)
    row.payload.foreach { b => crc = crc * 31 + (b & 0xff); hist((b & 0xff) % 8) += 1f }
    assert(got.n_bytes == row.payload.length.toLong)
    assert(got.checksum == crc)
    assert(got.features.toSeq == hist.toSeq)
    // histogram mass equals payload length (no byte dropped)
    assert(feats.filter(expr("aggregate(features, CAST(0 AS DOUBLE), (a, x) -> a + x) <> n_bytes"))
      .count() == 0)
  }

  test("asset dedup keeps the first copy of each payload") {
    // two verbatim re-uploads of asset 1's bytes under different ids/kinds
    val dup = Multimodal.syntheticAssets(spark,
      docs.filter($"doc_id" < 10).unionByName(
        docs.filter($"doc_id" === 1)
          .withColumn("doc_id", lit(101L))))
    val v = Multimodal.dedupAssets(dup)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(3), r.getLong(4))).toMap
    assert(v(101L) == ((true, 1L)), s"$v")
    assert(v(1L) == ((false, 1L)), s"$v")
    // dedup inspects bytes only — the differing kind column must not matter
    assert(dup.filter($"asset_id" === 101).head().kind !=
      dup.filter($"asset_id" === 1).head().kind)
  }

  test("sampleFrames explodes n evenly spaced offsets per asset") {
    val frames = Multimodal.sampleFrames(assets, 4)
    assert(frames.count() == docs.count() * 4)
    val f = frames.filter($"asset_id" === 2).orderBy($"frame_idx").collect()
    assert(f.map(_.getInt(2)).toSeq == Seq(0, 1, 2, 3))
    val offs = f.map(_.getLong(3))
    assert(offs.head == 0L && offs.sameElements(offs.sorted))
  }

  test("chunk manifest: sizes, offsets, shared fingerprints, empty assets") {
    import Multimodal.MediaRow
    import spark.implicits._
    val p130 = Array.fill[Byte](130)(7)
    val rows = Seq(
      MediaRow(1L, "img/0", 8, 8, p130),
      MediaRow(2L, "img/0", 8, 8, p130),            // identical payload
      MediaRow(3L, "img/0", 8, 8, Array[Byte]()),   // empty → no chunks
      MediaRow(4L, "img/0", 8, 8, Array.fill[Byte](130)(9)))
    val m = Multimodal.chunkManifest(rows.toDS(), 64)
      .orderBy("asset_id", "chunk_idx").collect()
    // 130 bytes at 64 → chunks of 64, 64, 2; asset 3 absent
    val a1 = m.filter(_.getLong(0) == 1L)
    assert(a1.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 0L, 64L), (1L, 64L, 64L), (2L, 128L, 2L)), a1.toSeq)
    assert(!m.exists(_.getLong(0) == 3L), "empty payload leaked a chunk")
    // identical payloads share every fingerprint; a different payload none
    val h = (id: Long) => m.filter(_.getLong(0) == id).map(_.getString(5)).toSeq
    assert(h(1L) == h(2L))
    assert(h(1L).intersect(h(4L)).isEmpty)
    // constant filler: the two full chunks of one asset also collide
    assert(h(1L).take(2).distinct.size == 1 && h(1L)(2) != h(1L)(0))
    // dedup stats over the same rows: 3×130 total bytes; distinct chunks
    // = {7-filled 64, 7-tail 2, 9-filled 64, 9-tail 2} → 132 unique
    val d = Multimodal.chunkDedupStats(rows.toDS(), 64).collect().head
    assert((d.getLong(1), d.getLong(2), d.getLong(3), d.getLong(4), d.getLong(5)) ==
      (390L, 132L, 258L, 4L, 9L), d)
  }

  test("perceptual near-dup pairs: exact copies, light retouch, no unrelated") {
    import Multimodal.MediaRow
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val retouched = base.updated(10, 'X').toString // a few bigram counts shift
    val crafted = Seq(
      MediaRow(1L, "img/0", 64, 64, base.getBytes("UTF-8")),
      MediaRow(2L, "img/0", 64, 64, base.getBytes("UTF-8")),           // exact copy
      MediaRow(3L, "img/0", 64, 64, retouched.getBytes("UTF-8")),      // near-dup
      MediaRow(4L, "img/0", 64, 64,
        "zqxjkvbnm 0123456789 !!??" .getBytes("UTF-8")),               // unrelated
      MediaRow(5L, "img/0", 64, 64, "a".getBytes("UTF-8"))).toDS()     // featureless
    val pairs = Multimodal.phashPairs(crafted)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((1L, 2L, 0L)), s"$pairs") // identical payloads: hamming 0
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L), s"$pairs") // retouch within bound
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"$pairs") // unrelated excluded
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), s"$pairs") // featureless excluded
    // engine signature == a direct driver-side replay of the quantizer
    // (6-gram md5-SimHash: per gram occurrence, lower-64 md5 bits vote
    // ±1 per signature bit; bit = sum > 0)
    val sig = crafted.toDF().filter($"asset_id" === 1)
      .select(graft.plans.TextHashes.phashSig($"payload".cast("string")).as("s"))
      .head().getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    base.toCharArray.sliding(6).foreach { g =>
      if (g.length == 6) {
        val d = md.digest(new String(g).getBytes("UTF-8"))
        var h = 0L
        var i = 15
        while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
        for (j <- 0 until 64) counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
      }
    }
    var ref = 0L
    for (j <- 0 until 64) if (counts(j) > 0) ref |= 1L << j
    assert(sig == ref, s"engine $sig vs replay $ref")
  }

  test("phashAudit splits exact copies from genuine perceptual near-dups") {
    import Multimodal.MediaRow
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val retouched = base.updated(10, 'X').toString
    val crafted = Seq(
      MediaRow(1L, "img/0", 64, 64, base.getBytes("UTF-8")),
      MediaRow(2L, "img/0", 64, 64, base.getBytes("UTF-8")),      // exact copy
      MediaRow(3L, "img/0", 64, 64, retouched.getBytes("UTF-8"))) // retouch
      .toDS()
    val audit = Multimodal.phashAudit(crafted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    assert(audit((1L, 2L)))                       // byte-identical pair
    audit.get((1L, 3L)).foreach(v => assert(!v))  // retouch: perceptual-only
    audit.get((2L, 3L)).foreach(v => assert(!v))
  }

  test("keepBestAssets keeps the largest payload per perceptual cluster") {
    import Multimodal.MediaRow
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val crafted = Seq(
      MediaRow(1L, "img/0", 64, 64, base.getBytes("UTF-8")),
      MediaRow(2L, "img/0", 64, 64, (base + "!!").getBytes("UTF-8")), // largest
      MediaRow(3L, "img/0", 64, 64, base.updated(10, 'X').getBytes("UTF-8")),
      MediaRow(4L, "img/1", 64, 64, "zz 123 456 789 000 111".getBytes("UTF-8")))
      .toDS()
    val r = Multimodal.keepBestAssets(crafted).orderBy("asset_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq
    // 1,2,3 cluster together (min id label); only the +2-byte copy keeps;
    // the unrelated asset is its own kept singleton
    assert(r == Seq((1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true)))
  }

  test("decoded features feed the similarity stack unchanged") {
    // decode → featurize → k-NN graph: the media features ARE an embedding
    // column, so the whole graft.sim surface composes onto binary assets
    val emb = Multimodal.decodeFeatures(assets)
      .select($"asset_id".as("vec_id"), $"features".as("embedding"))
    val g = graft.sim.Vectors.knnGraph(emb, 0.5, 2)
    val byV = g.collect().groupBy(_.getLong(0))
    assert(byV.nonEmpty)
    byV.values.foreach { rows =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length))
    }
  }

  test("phashLoad reports per-chunk bucket loads and candidate mass") {
    import Multimodal.MediaRow
    import spark.implicits._
    // three byte-identical payloads share every chunk: one bucket of
    // load 3 per chunk table (h+1 = 4 of them at h = 3) = C(3,2) = 3
    // candidate pairs
    val p = ("the quick brown fox " * 10).trim.getBytes("UTF-8")
    val rows = Seq(
      MediaRow(1L, "img/0", 8, 8, p),
      MediaRow(2L, "img/0", 8, 8, p.clone()),
      MediaRow(3L, "img/1", 8, 8, p.clone()))
    val r = Multimodal.phashLoad(rows.toDS()).orderBy("chunk").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    assert(r.toSeq == (0L to 3L).map(c => (c, 3L, 1L, 3L, 3L)), r.toSeq)
  }

  test("byteShard cuts the per-kind md5-ordered byte stream at capacity") {
    import Multimodal.MediaRow
    import spark.implicits._
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val sizes = Map(1L -> 100, 2L -> 50, 3L -> 30, 4L -> 70)
    val rows = Seq(
      MediaRow(1L, "img/0", 8, 8, Array.fill[Byte](100)(1)),
      MediaRow(2L, "img/0", 8, 8, Array.fill[Byte](50)(2)),
      MediaRow(3L, "img/0", 8, 8, Array.fill[Byte](30)(3)),
      MediaRow(4L, "img/1", 8, 8, Array.fill[Byte](70)(4)))
    val got = Multimodal.byteShard(rows.toDS(), 64L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // expected: per kind, prefix sums in (md5(asset_id), asset_id) order
    val exp = rows.groupBy(_.kind).flatMap { case (_, as) =>
      val ord = as.map(_.asset_id).sortBy(id => (md5hex(id.toString), id))
      ord.zip(ord.scanLeft(0L)((c, id) => c + sizes(id)))
        .map { case (id, start) =>
          id -> ((sizes(id).toLong, start / 64L, start % 64L)) }
    }
    assert(got == exp, s"got $got expected $exp")
    // the streaming-cut contract: SOME asset's tail crosses its shard
    // boundary (offset + bytes > cap) — assets are not atomic per shard
    assert(got.values.exists { case (n, _, off) => off + n > 64L })
  }
}
