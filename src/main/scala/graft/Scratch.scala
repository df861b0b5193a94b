package graft

import org.apache.spark.unsafe.types.UTF8String

/** Disposable micro-profiler for the phash/simhash inner loops (never
  * committed as a query; measurement only — guide §1).
  * Usage: runMain graft.Scratch [parquetDir] [reps]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    spark.stop()
    println(s"docs=${texts.length} chars=${texts.map(_.length.toLong).sum}")
    val u = texts.map(UTF8String.fromString)

    def time(label: String)(f: => Long): Unit = {
      var best = Long.MaxValue
      var r = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        r = f
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"${best / 1e6}%10.1f ms  $label  (sink=$r)")
    }

    // full phash
    time("phash full") {
      var acc = 0L
      var i = 0
      while (i < u.length) {
        val v = graft.plans.TextHashes.phash(u(i)); if (v != null) acc ^= v.longValue()
        i += 1
      }
      acc
    }
    // boundary scan only (code points)
    time("boundaries only") {
      var acc = 0L
      var i = 0
      while (i < u.length) {
        val s = u(i); val n = s.numBytes()
        val base = s.getBaseObject; val off = s.getBaseOffset
        var cp = 0; var j = 0
        while (j < n) {
          if ((org.apache.spark.unsafe.Platform.getByte(base, off + j) & 0xC0) != 0x80) cp += 1
          j += 1
        }
        acc += cp
        i += 1
      }
      acc
    }
    // md5 per gram, no votes
    time("md5 per gram (no votes)") {
      var acc = 0L
      var i = 0
      while (i < u.length) {
        val s = u(i); val n = s.numBytes()
        val base = s.getBaseObject; val off = s.getBaseOffset
        var cp = 0; var j = 0
        while (j < n) {
          if ((org.apache.spark.unsafe.Platform.getByte(base, off + j) & 0xC0) != 0x80) cp += 1
          j += 1
        }
        if (cp >= 6) {
          val bounds = new Array[Int](cp + 1)
          var w = 0; j = 0
          while (j < n) {
            if ((org.apache.spark.unsafe.Platform.getByte(base, off + j) & 0xC0) != 0x80) { bounds(w) = j; w += 1 }
            j += 1
          }
          bounds(cp) = n
          var sIdx = 0
          while (sIdx <= cp - 6) {
            acc ^= graft.plans.TextHashes.md5Lower64(base, off + bounds(sIdx), bounds(sIdx + 6) - bounds(sIdx))
            sIdx += 1
          }
        }
        i += 1
      }
      acc
    }
    // xxh64 per gram (dedup-hash cost model)
    time("xxh64 per gram") {
      var acc = 0L
      var i = 0
      while (i < u.length) {
        val s = u(i); val n = s.numBytes()
        val base = s.getBaseObject; val off = s.getBaseOffset
        var cp = 0; var j = 0
        while (j < n) {
          if ((org.apache.spark.unsafe.Platform.getByte(base, off + j) & 0xC0) != 0x80) cp += 1
          j += 1
        }
        if (cp >= 6) {
          val bounds = new Array[Int](cp + 1)
          var w = 0; j = 0
          while (j < n) {
            if ((org.apache.spark.unsafe.Platform.getByte(base, off + j) & 0xC0) != 0x80) { bounds(w) = j; w += 1 }
            j += 1
          }
          bounds(cp) = n
          var sIdx = 0
          while (sIdx <= cp - 6) {
            acc ^= org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              base, off + bounds(sIdx), bounds(sIdx + 6) - bounds(sIdx), 42L)
            sIdx += 1
          }
        }
        i += 1
      }
      acc
    }
    // votes only (fixed fake hash per gram)
    time("votes only (64-iter loop per gram)") {
      var acc = 0L
      var i = 0
      while (i < u.length) {
        val s = u(i); val n = s.numBytes()
        var cp = n // ascii approx
        if (cp >= 6) {
          val counts = new Array[Int](64)
          var sIdx = 0
          var h = 0x9E3779B97F4A7C15L
          while (sIdx <= cp - 6) {
            h = h * 6364136223846793005L + 1442695040888963407L
            var j = 0
            while (j < 64) {
              counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
              j += 1
            }
            sIdx += 1
          }
          var sig = 0L; var j = 0
          while (j < 64) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
          acc ^= sig
        }
        i += 1
      }
      acc
    }
    // simhash full
    time("simhash full") {
      var acc = 0L
      var i = 0
      while (i < u.length) {
        acc ^= graft.plans.TextHashes.simhash(u(i))
        i += 1
      }
      acc
    }

    // ---- prototype: memoized md5 + SWAR votes ----
    val EXPAND: Array[Long] = Array.tabulate(256) { v =>
      var x = 0L; var k = 0
      while (k < 8) { if (((v >> k) & 1) == 1) x |= 1L << (8 * k); k += 1 }
      x
    }
    val SLOT_BITS = 17
    val MASK = (1 << SLOT_BITS) - 1
    val memoLens = new Array[Int](1 << SLOT_BITS)
    val memoBytes = new Array[Byte]((1 << SLOT_BITS) * 24)
    val memoVals = new Array[Long](1 << SLOT_BITS)

    def md5Memo(base: AnyRef, off: Long, len: Int): Long = {
      if (len > 24) return graft.plans.TextHashes.md5Lower64(base, off, len)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(base, off, len, 42L)
      val slot = (h & MASK).toInt
      val bo = slot * 24
      if (memoLens(slot) == len) {
        var k = 0
        var eq = true
        while (eq && k < len) {
          if (memoBytes(bo + k) != org.apache.spark.unsafe.Platform.getByte(base, off + k)) eq = false
          k += 1
        }
        if (eq) return memoVals(slot)
      }
      val v = graft.plans.TextHashes.md5Lower64(base, off, len)
      memoLens(slot) = len
      var k = 0
      while (k < len) {
        memoBytes(bo + k) = org.apache.spark.unsafe.Platform.getByte(base, off + k)
        k += 1
      }
      memoVals(slot) = v
      v
    }

    def phash2(s: UTF8String): java.lang.Long = {
      if (s == null) return null
      val n = s.numBytes()
      val base = s.getBaseObject
      val off = s.getBaseOffset
      var cp = 0
      var i = 0
      while (i < n) {
        if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xC0) != 0x80) cp += 1
        i += 1
      }
      if (cp < 6) return null
      val bounds = new Array[Int](cp + 1)
      var w = 0
      i = 0
      while (i < n) {
        if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xC0) != 0x80) { bounds(w) = i; w += 1 }
        i += 1
      }
      bounds(cp) = n
      // SWAR positional popcount: 8 lanes of 8 bits per accumulator long,
      // one acc per hash byte; flush every 255 grams
      val ones = new Array[Int](64)
      val acc = new Array[Long](8)
      var pend = 0
      var total = 0
      var sIdx = 0
      while (sIdx <= cp - 6) {
        val a = bounds(sIdx)
        val b = bounds(sIdx + 6)
        val h = md5Memo(base, off + a, b - a)
        acc(0) += EXPAND((h & 0xff).toInt)
        acc(1) += EXPAND(((h >>> 8) & 0xff).toInt)
        acc(2) += EXPAND(((h >>> 16) & 0xff).toInt)
        acc(3) += EXPAND(((h >>> 24) & 0xff).toInt)
        acc(4) += EXPAND(((h >>> 32) & 0xff).toInt)
        acc(5) += EXPAND(((h >>> 40) & 0xff).toInt)
        acc(6) += EXPAND(((h >>> 48) & 0xff).toInt)
        acc(7) += EXPAND(((h >>> 56) & 0xff).toInt)
        pend += 1
        total += 1
        if (pend == 255) {
          var bi = 0
          while (bi < 8) {
            val v = acc(bi); acc(bi) = 0L
            var k = 0
            while (k < 8) { ones(bi * 8 + k) += ((v >>> (8 * k)) & 0xffL).toInt; k += 1 }
            bi += 1
          }
          pend = 0
        }
        sIdx += 1
      }
      var bi = 0
      while (bi < 8) {
        val v = acc(bi)
        var k = 0
        while (k < 8) { ones(bi * 8 + k) += ((v >>> (8 * k)) & 0xffL).toInt; k += 1 }
        bi += 1
      }
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (2 * ones(j) - total > 0) sig |= 1L << j
        j += 1
      }
      java.lang.Long.valueOf(sig)
    }

    time("phash2 (memo md5 + SWAR votes)") {
      var acc2 = 0L
      var i = 0
      while (i < u.length) {
        val v = phash2(u(i)); if (v != null) acc2 ^= v.longValue()
        i += 1
      }
      acc2
    }
    // equality check vs phash
    var mismatch = 0
    var i2 = 0
    while (i2 < u.length) {
      val a = graft.plans.TextHashes.phash(u(i2))
      val b = phash2(u(i2))
      if (a != b && (a == null || b == null || a.longValue() != b.longValue())) mismatch += 1
      i2 += 1
    }
    println(s"phash2 mismatches: $mismatch")
  }
}
