package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-signature expressions — the hot per-document loops of
  * corpus dedup, fused into single tight primitive passes.
  *
  * Both take the canonical normalized text (single-space-separated words,
  * see graft.text.TextFunctions.norm) and exploit its shape: a word n-gram
  * shingle joined with ' ' IS a byte slice of the normalized string, so
  * shingling + hashing needs no array materialization, no string
  * concatenation, and no per-element lambda dispatch. The equivalent
  * higher-order-function formulation (`transform(s, x -> xxhash64(x))`
  * etc.) is evaluated interpreted by Spark — per-element expression-tree
  * walks dominated the entire dedup pipeline (~10s of a 14s query at
  * sf0.1); these expressions replace it with one compiled loop per row.
  *
  * ASCII space never occurs inside a UTF-8 multibyte sequence, so raw byte
  * scanning for word boundaries is UTF-8-safe.
  */
object TextHashes {

  private val SEED = 42L // Spark's xxhash64 default seed

  /** Shared input check: SQL-registered functions must reject non-string
    * input at analysis time, not ClassCastException at runtime.
    */
  private[plans] def requireString(name: String, child: Expression): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a string input, got ${child.dataType.sql}")

  /** Word start/end offsets of `norm` (split on single spaces — the exact
    * semantics of split(norm, ' '): an empty string is one empty word).
    * Returns flat [start0, end0, start1, end1, ...].
    */
  private def wordOffsets(norm: UTF8String): Array[Int] = {
    val n = norm.numBytes()
    val base = norm.getBaseObject
    val off = norm.getBaseOffset
    var words = 1
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) words += 1
      i += 1
    }
    val bounds = new Array[Int](words * 2)
    var w = 0
    var start = 0
    i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) {
        bounds(w * 2) = start; bounds(w * 2 + 1) = i
        w += 1; start = i + 1
      }
      i += 1
    }
    bounds(w * 2) = start; bounds(w * 2 + 1) = n
    bounds
  }

  /** k-function MinHash signature over word n-gram shingles of `norm`.
    * Each shingle is hashed once (XXH64 over its byte slice); the k hash
    * functions re-mix that value with the function index as seed.
    * Duplicate shingles cannot change a minimum, so no distinct pass is
    * needed. Returns null when the document has fewer than n words.
    */
  def minhash(norm: UTF8String, n: Int, k: Int): ArrayData = {
    if (norm == null) return null
    val bounds = wordOffsets(norm)
    val words = bounds.length / 2
    if (words < n) return null
    val base = norm.getBaseObject
    val off = norm.getBaseOffset
    val mins = Array.fill(k)(Long.MaxValue)
    var s = 0
    while (s <= words - n) {
      val a = bounds(s * 2)
      val b = bounds((s + n - 1) * 2 + 1)
      val h = XXH64.hashUnsafeBytes(base, off + a, b - a, SEED)
      var j = 0
      while (j < k) {
        val m = XXH64.hashLong(h, j)
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  // reused per thread: digest instance AND input buffer (grown on demand)
  // — this sits inside the per-word loop of simhash, where a fresh byte[]
  // per word would be billions of allocations over a large corpus
  private final class Md5Ctx {
    val md: java.security.MessageDigest = java.security.MessageDigest.getInstance("MD5")
    var buf: Array[Byte] = new Array[Byte](256)
    // digest written in place — md.digest() allocates a fresh 16-byte
    // array per call, which inside phash's per-position gram loop is
    // ~40 GB of garbage per 2.5 B grams (the 1000× corpus)
    val out: Array[Byte] = new Array[Byte](16)
    // md5Lower64 memo (see md5Lower64Memo): direct-mapped, slot checked
    // by EXACT byte comparison, so a hit can never return the wrong
    // value — an xxh64 slot collision just recomputes and overwrites.
    // 2^17 slots × (4 + 24 + 8) B ≈ 4.7 MB per task thread.
    val memoLens: Array[Int] = new Array[Int](MEMO_SLOTS)
    val memoBytes: Array[Byte] = new Array[Byte](MEMO_SLOTS * MEMO_MAX_LEN)
    val memoVals: Array[Long] = new Array[Long](MEMO_SLOTS)
  }
  private val md5Local = new ThreadLocal[Md5Ctx] {
    override def initialValue(): Md5Ctx = new Md5Ctx
  }

  private final val MEMO_SLOTS = 1 << 17
  private final val MEMO_MASK = MEMO_SLOTS - 1
  private final val MEMO_MAX_LEN = 24 // 6 code points × ≤4 UTF-8 bytes

  /** md5Lower64 through a per-thread direct-mapped memo keyed on the raw
    * bytes. The hot inputs — 6-code-point phash grams, simhash words —
    * follow a Zipf law: the realized gram/word vocabulary is orders of
    * magnitude smaller than the occurrence stream (measured 45 k distinct
    * 6-grams vs 143 M positions on the 100× corpus), so nearly every call
    * is a repeat of a recent one. A bounded cache (4.7 MB/thread, fixed)
    * turns the ~146 ns MessageDigest round trip into a ~20 ns probe for
    * those repeats. EXACT by construction: a slot hit requires byte
    * equality with the stored key, an xxh64 collision or evicted slot
    * merely recomputes. Inputs longer than MEMO_MAX_LEN (or empty) go
    * straight to md5Lower64. Purely per-JVM-thread working state — no
    * result ever outlives the process or keys on an input path.
    */
  def md5Lower64Memo(base: AnyRef, off: Long, len: Int): Long = {
    if (len <= 0 || len > MEMO_MAX_LEN) return md5Lower64(base, off, len)
    val ctx = md5Local.get()
    val h = XXH64.hashUnsafeBytes(base, off, len, SEED)
    val slot = (h & MEMO_MASK).toInt
    val bo = slot * MEMO_MAX_LEN
    if (ctx.memoLens(slot) == len) {
      var k = 0
      var eq = true
      while (eq && k < len) {
        if (ctx.memoBytes(bo + k) !=
            org.apache.spark.unsafe.Platform.getByte(base, off + k)) eq = false
        k += 1
      }
      if (eq) return ctx.memoVals(slot)
    }
    val v = md5Lower64(base, off, len)
    ctx.memoLens(slot) = len
    var k = 0
    while (k < len) {
      ctx.memoBytes(bo + k) = org.apache.spark.unsafe.Platform.getByte(base, off + k)
      k += 1
    }
    ctx.memoVals(slot) = v
    v
  }

  // byte b of a hash expanded to 8 one-bit SWAR lanes (bit k of b lands
  // in bits [8k, 8k+8) of the long) — the positional-popcount table the
  // SimHash vote accumulators add per gram instead of a 64-iteration
  // scalar loop
  private final val EXPAND: Array[Long] = Array.tabulate(256) { v =>
    var x = 0L
    var k = 0
    while (k < 8) { if (((v >> k) & 1) == 1) x |= 1L << (8 * k); k += 1 }
    x
  }

  /** SimHash vote accumulator: per-bit ONES counts via SWAR positional
    * popcount — 8 table adds per 64-bit hash instead of a 64-iteration
    * ±1 loop (measured: the scalar loop was 77 ns of phash's 217 ns per
    * gram). Lanes are 8 bits wide, flushed every 255 adds; the final
    * signature bit j is (2·ones_j − total) > 0, identical to the ±1 vote
    * sum by counts_j = ones_j − (total − ones_j).
    */
  private final class VoteAcc {
    private val ones = new Array[Int](64)
    private val acc = new Array[Long](8)
    private var pend = 0
    private var total = 0
    def add(h: Long): Unit = {
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
      if (pend == 255) flush()
    }
    private def flush(): Unit = {
      var bi = 0
      while (bi < 8) {
        val v = acc(bi)
        acc(bi) = 0L
        var k = 0
        while (k < 8) { ones(bi * 8 + k) += ((v >>> (8 * k)) & 0xffL).toInt; k += 1 }
        bi += 1
      }
      pend = 0
    }
    def sig(): Long = {
      flush()
      var s = 0L
      var j = 0
      while (j < 64) { if (2 * ones(j) - total > 0) s |= 1L << j; j += 1 }
      s
    }
  }

  /** Lower 64 bits of MD5 of a byte slice, little-endian over digest bytes
    * 8..15 — the exact value of DuckDB's `md5_number_lower`, which is what
    * lets the SimHash signature be recomputed verbatim by the SQL oracle.
    */
  def md5Lower64(base: AnyRef, off: Long, len: Int): Long = {
    val ctx = md5Local.get()
    if (ctx.buf.length < len)
      // highestOneBit*2 would wrap negative past 2^30 — clamp to len
      ctx.buf = new Array[Byte](
        if (len > (1 << 30)) len else Integer.highestOneBit(len) * 2)
    org.apache.spark.unsafe.Platform.copyMemory(base, off, ctx.buf,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
    ctx.md.reset()
    ctx.md.update(ctx.buf, 0, len)
    val d = ctx.out
    ctx.md.digest(d, 0, 16)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  /** 64-bit SimHash over the words of `norm`: per word, the lower 64 MD5
    * bits (md5Lower64 — engine-portable, unlike xxhash64); each hash bit
    * votes ±1 on the corresponding signature bit; bit j of the result is 1
    * iff the sum is positive. Duplicates count (token frequency weights
    * the vote).
    */
  def simhash(norm: UTF8String): Long = {
    if (norm == null) return 0L
    val bounds = wordOffsets(norm)
    val base = norm.getBaseObject
    val off = norm.getBaseOffset
    val votes = new VoteAcc
    var w = 0
    while (w < bounds.length / 2) {
      votes.add(md5Lower64Memo(base, off + bounds(w * 2),
        bounds(w * 2 + 1) - bounds(w * 2)))
      w += 1
    }
    votes.sig()
  }

  /** Gram width of the perceptual hash: 6 code points. Chosen by
    * MEASURED bucket entropy, not guesswork — the signature saturates
    * whenever the realized n-gram vocabulary is smaller than the
    * per-document gram count (the histogram's common-mode drift then
    * outvotes per-document deviations on every bit). On the 100×
    * synthetic corpus (500k docs, ~450 chars, ~30-word vocabulary):
    * n=2 → 114 realized grams (ΣC(load,2) saturates at 12.5B candidate
    * pairs), n=4 → ~1k grams (9.3M at 50k docs), n=6 → ~45k grams and
    * ΣC(load,2) = 60.3M at 500k docs — within 1.33× of the word-level
    * SimHash table (45.5M) on the same corpus, i.e. the perceptual
    * family prices like the text family instead of 280× worse.
    */
  private final val PHASH_GRAM = 6

  /** 64-bit perceptual hash of a DECODED payload (string stand-in):
    * frequency-weighted SimHash over 6-code-point grams — per gram
    * occurrence, the lower 64 MD5 bits of its byte slice (md5Lower64,
    * the engine-portable hash) vote ±1 per signature bit; bit j is 1 iff
    * the sum is positive. Equivalently: a sign-quantized md5-seeded
    * random projection of the payload's full 6-gram histogram (each
    * distinct gram's weight vector w(g) ∈ {±1}^64 is bit j of md5(g),
    * applied with multiplicity) — the LshBuckets recipe on the n-gram
    * feature space. This replaces the round-≤11 64-bin bigram histogram
    * with self-mean quantizer, whose 64-dim feature collapsed
    * same-vocabulary corpora into a handful of buckets (measured:
    * ΣC(load,2) ≈ 12.5B candidates at 100×, vs 60.3M for this feature —
    * see PHASH_GRAM). A real deployment swaps the feature stage (DCT
    * coefficients, embedding dims), not the quantizer or the join.
    * All-integer arithmetic over md5 — DuckDB replays the bits verbatim
    * (md5_number_lower + the shared SIMHASH_SIG aggregate). Null under
    * 6 code points (no grams).
    */
  def phash(decoded: UTF8String): java.lang.Long = {
    if (decoded == null) return null
    val n = decoded.numBytes()
    val base = decoded.getBaseObject
    val off = decoded.getBaseOffset
    // code-point boundaries: UTF-8 lead bytes are anything but 10xxxxxx,
    // so a raw byte scan finds them without decoding (same trick as
    // wordOffsets; a boundary index maps gram i to byte slice
    // [bounds(i), bounds(i+PHASH_GRAM)))
    var cp = 0
    var i = 0
    while (i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xC0) != 0x80) cp += 1
      i += 1
    }
    if (cp < PHASH_GRAM) return null
    val bounds = new Array[Int](cp + 1)
    var w = 0
    i = 0
    while (i < n) {
      if ((org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xC0) != 0x80) {
        bounds(w) = i; w += 1
      }
      i += 1
    }
    bounds(cp) = n
    val votes = new VoteAcc
    var s = 0
    while (s <= cp - PHASH_GRAM) {
      val a = bounds(s)
      val b = bounds(s + PHASH_GRAM)
      votes.add(md5Lower64Memo(base, off + a, b - a))
      s += 1
    }
    java.lang.Long.valueOf(votes.sig())
  }

  /** Sorted distinct 64-bit hashes of the word n-gram shingles of `norm`
    * (one XXH64 per shingle byte-slice). The sorted-set form makes
    * intersection a linear merge walk (see intersectCount). Null when the
    * document has fewer than n words. Two distinct shingles collide with
    * probability 2^-64 — Jaccard computed over these hashes equals exact
    * string-shingle Jaccard for any realistic corpus (a pair's union is
    * ~10^2 shingles → error probability ~10^-16 per pair).
    */
  def hashedShinglesVal(norm: UTF8String, n: Int): ArrayData = {
    if (norm == null) return null
    val bounds = wordOffsets(norm)
    val words = bounds.length / 2
    if (words < n) return null
    val base = norm.getBaseObject
    val off = norm.getBaseOffset
    val hs = new Array[Long](words - n + 1)
    var s = 0
    while (s <= words - n) {
      val a = bounds(s * 2)
      val b = bounds((s + n - 1) * 2 + 1)
      hs(s) = XXH64.hashUnsafeBytes(base, off + a, b - a, SEED)
      s += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w)) { w += 1; hs(w) = hs(i) }
      i += 1
    }
    val distinct = if (w + 1 == hs.length) hs else java.util.Arrays.copyOf(hs, w + 1)
    new GenericArrayData(distinct)
  }

  /** |a ∩ b| for two sorted distinct long arrays — one merge walk. */
  def intersectCountVal(a: ArrayData, b: ArrayData): Long = {
    var i = 0
    var j = 0
    var c = 0L
    val na = a.numElements()
    val nb = b.numElements()
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Count of code points in (negate = false) or not in (negate = true)
    * an ASCII char set — one byte scan, no Matcher. A UTF-8 lead byte
    * outside ASCII is one code point never in the (ASCII) set;
    * continuation bytes are skipped, so the count equals
    * regexp_count(s, "[chars]") / "[^chars]" exactly (Java regex and
    * RE2 both treat a single-code-point class match per position, and
    * non-overlapping single-char matches are just the member count).
    */
  def charClassCountVal(s: UTF8String, set: Array[Boolean], negate: Boolean): Long = {
    val n = s.numBytes
    var i = 0
    var c = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { if (set(b) != negate) c += 1 }
      else if ((b & 0xC0) != 0x80) { if (negate) c += 1 }
      i += 1
    }
    c
  }

  /** k-function md5-prefix MinHash signature (the minhashTune recipe):
    * sig[j] = min over word n-gram shingles g of the first 16 hex chars
    * of md5("<j>|" + g) — exactly
    * `transform(sequence(0,k-1), j -> array_min(transform(sh, g ->
    * substring(md5(concat(j,'|',g)),1,16))))` but as ONE compiled byte
    * pass per document: no shingle string arrays, no per-(j,gram) concat/
    * hex/substring allocations, no interpreted lambda dispatch (measured:
    * that form was ~26 task-seconds of dedup_minhash_tune's sf0.1 cost).
    * Correctness notes pinned by Md5MinSigSpec:
    *  - duplicates cannot change a minimum, so the array_distinct in the
    *    interpreted form is irrelevant to the signature;
    *  - 16 lowercase hex chars compare lexicographically exactly as the
    *    first 8 digest bytes compare as an unsigned big-endian long, so
    *    the min is tracked as a long and hex-formatted once at the end;
    *  - a shingle IS a byte slice of the normalized text (single-space
    *    separated words), so no gram strings are ever materialized.
    * Null when the document has fewer than n words (the callers'
    * size(sh) > 0 filter becomes sig IS NOT NULL).
    */
  def md5MinSigVal(norm: UTF8String, prefixes: Array[Array[Byte]],
                   n: Int): ArrayData = {
    if (norm == null) return null
    val bounds = wordOffsets(norm)
    val words = bounds.length / 2
    if (words < n) return null
    val base = norm.getBaseObject
    val off = norm.getBaseOffset
    val k = prefixes.length
    val ctx = md5Local.get()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, -1L) // unsigned max; words >= n guarantees >= 1 shingle
    var s = 0
    while (s <= words - n) {
      val a = bounds(s * 2)
      val b = bounds((s + n - 1) * 2 + 1)
      val len = b - a
      if (ctx.buf.length < len)
        ctx.buf = new Array[Byte](
          if (len > (1 << 30)) len else Integer.highestOneBit(len) * 2)
      org.apache.spark.unsafe.Platform.copyMemory(base, off + a, ctx.buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
      var j = 0
      while (j < k) {
        ctx.md.reset()
        ctx.md.update(prefixes(j))
        ctx.md.update(ctx.buf, 0, len)
        ctx.md.digest(ctx.out, 0, 16)
        val d = ctx.out
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        if (java.lang.Long.compareUnsigned(h, mins(j)) < 0) mins(j) = h
        j += 1
      }
      s += 1
    }
    val hex = "0123456789abcdef".getBytes
    val out = new Array[AnyRef](k)
    var j = 0
    while (j < k) {
      val bs = new Array[Byte](16)
      val h = mins(j)
      var i = 0
      while (i < 16) { bs(i) = hex(((h >>> ((15 - i) * 4)) & 0xfL).toInt); i += 1 }
      out(j) = UTF8String.fromBytes(bs)
      j += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(norm: Column, n: Int, k: Int): Column =
    GraftSqlShim.column(MinHashSig(GraftSqlShim.expression(norm), n, k))

  def md5MinSig(norm: Column, n: Int, k: Int): Column =
    GraftSqlShim.column(Md5MinSig(GraftSqlShim.expression(norm), n, k))

  def simhashSig(norm: Column): Column =
    GraftSqlShim.column(SimHashSig(GraftSqlShim.expression(norm)))

  def phashSig(decoded: Column): Column =
    GraftSqlShim.column(PhashSig(GraftSqlShim.expression(decoded)))

  def hashedShingles(norm: Column, n: Int): Column =
    GraftSqlShim.column(HashedShingles(GraftSqlShim.expression(norm), n))

  def intersectCount(a: Column, b: Column): Column =
    GraftSqlShim.column(SortedIntersectCount(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  def charClassCount(s: Column, chars: String, negate: Boolean): Column =
    GraftSqlShim.column(CharClassCount(GraftSqlShim.expression(s), chars, negate))

  /** lower(trim(regexp_replace(s, "\\s+", " "))) in one byte pass —
    * the canonical normalization (TextFunctions.norm) that leads EVERY
    * text operator. Java's \s (no UNICODE_CHARACTER_CLASS) is exactly
    * the six ASCII whitespace bytes, none of which can occur inside a
    * UTF-8 multibyte sequence, so a byte scan that collapses runs to
    * one ' ' and drops leading/trailing runs reproduces
    * regexp_replace + trim byte-for-byte; the final toLowerCase is the
    * same UTF8String call Spark's Lower evaluates.
    */
  def normTextVal(s: UTF8String): UTF8String = {
    val n = s.numBytes
    val out = new Array[Byte](n)
    var i = 0
    var w = 0
    var pendingSpace = false
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      if (ws) { if (w > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out(w) = ' '; w += 1; pendingSpace = false }
        out(w) = b
        w += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, w).toLowerCase
  }

  def normText(s: Column): Column =
    GraftSqlShim.column(NormText(GraftSqlShim.expression(s)))
}

/** One-pass canonical text normalization (see TextHashes.normTextVal). */
case class NormText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.requireString(prettyName, child)
  override def dataType: DataType = StringType
  override def prettyName: String = "norm_text"

  override def nullSafeEval(input: Any): Any =
    TextHashes.normTextVal(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashes.normTextVal($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** regexp_count(s, "[chars]") (negate = false) / "[^chars]" (negate =
  * true) for an ASCII char set, as one compiled byte scan: the
  * single-code-point-class count is the only thing several quality /
  * shard-gate signals need, and Matcher.find-per-match made ONE such
  * count (punct "[^a-z0-9 ]") 25.5 s of corpus_shard's 54.9 s signal
  * scan at the 100× probe — half the operator. The oracle keeps the
  * plain regexp_count (RE2 is already linear); only the Spark-side
  * evaluation changes, so values are bit-identical by the equivalence
  * argument on charClassCountVal.
  */
case class CharClassCount(child: Expression, chars: String, negate: Boolean)
    extends UnaryExpression {
  require(chars.nonEmpty && chars.forall(_ < 128),
    s"char set must be non-empty ASCII, got '$chars'")
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.requireString(prettyName, child)
  override def dataType: DataType = LongType
  override def prettyName: String = "char_class_count"

  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(ch => t(ch) = true)
    t
  }

  override def nullSafeEval(input: Any): Any =
    TextHashes.charClassCountVal(input.asInstanceOf[UTF8String], table, negate)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charClassSet", table, "boolean[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextHashes.charClassCountVal($c, $ref, $negate)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> MinHash signature of a normalized-text column; null when the
  * document has fewer than n words.
  */
case class MinHashSig(child: Expression, n: Int, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.requireString(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    TextHashes.minhash(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.TextHashes.minhash($c, $n, $k);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<string> md5-prefix MinHash signature of a normalized-text column
  * (see TextHashes.md5MinSigVal); null when the document has fewer than n
  * words.
  */
case class Md5MinSig(child: Expression, n: Int, k: Int) extends UnaryExpression {
  require(n > 0 && k > 0, s"n=$n and k=$k must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.requireString(prettyName, child)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "md5_min_sig"

  // "<j>|" md5 input prefixes, built once per expression instance
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(j => s"$j|".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any =
    TextHashes.md5MinSigVal(input.asInstanceOf[UTF8String], prefixes, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5MinSigPrefixes", prefixes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.TextHashes.md5MinSigVal($c, $ref, $n);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct hashed word-n-gram shingles of a normalized-text column;
  * null when the document has fewer than n words.
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.requireString(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    TextHashes.hashedShinglesVal(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.plans.TextHashes.hashedShinglesVal($c, $n);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |a ∩ b| of two sorted distinct array<long> columns (merge walk). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs (sorted, distinct), " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.intersectCountVal(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.TextHashes.intersectCountVal($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit perceptual hash of a decoded-payload string column (6-gram
  * md5-SimHash, see TextHashes.phash); null when the payload has fewer
  * than six code points.
  */
case class PhashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.requireString(prettyName, child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "phash_sig"

  override def nullSafeEval(input: Any): Any =
    TextHashes.phash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("ph")
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Long $tmp = graft.plans.TextHashes.phash($c);
       |${ev.isNull} = $tmp == null;
       |${ev.value} = ${ev.isNull} ? 0L : $tmp.longValue();
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a normalized-text column. */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.requireString(prettyName, child)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    TextHashes.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextHashes.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
