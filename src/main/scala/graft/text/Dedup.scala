package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication at 100 TB scale: exact (hash groupBy), MinHash+LSH
  * (band-bucketed candidate join + exact verification), SimHash (pigeonhole
  * chunk join), and exact n-gram Jaccard (the small-scope oracle).
  *
  * Scale notes baked into the plans:
  *  - Nothing quadratic touches the full corpus: LSH/SimHash candidates come
  *    from equality self-joins on (band, bucket) keys — a plain shuffle
  *    hash join whose cost is bounded by bucket sizes, with AQE skew
  *    handling for hot buckets.
  *  - The exact-verify step runs only on the candidate pair set.
  *  - Signatures are computed with codegen'd expressions (xxhash64 inside
  *    array transforms), one pass over each document.
  */
object Dedup {

  /** Exact dedup: canonical-id assignment per md5(norm) group. Output keeps
    * every row (doc_id → keep_id), so it doubles as the dedup mapping table
    * a downstream pipeline would join against.
    */
  def exact(docs: DataFrame): DataFrame = {
    val base = TextFunctions.withBase(docs).withColumn("fp", md5(col("norm")))
    base
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
      .select(col("doc_id"), col("fp"), col("keep_id"),
        (col("doc_id") =!= col("keep_id")).as("is_dup"))
  }

  private def shingled(docs: DataFrame, n: Int): DataFrame =
    TextFunctions.withBase(docs)
      .withColumn("s", TextFunctions.wordShingles(n))
      .filter(size(col("s")) > 0)
      .select(col("doc_id"), col("s"))

  /** Exact word-n-gram Jaccard similarity pairs via an inverted-index
    * equality join (NOT a quadratic theta-join): explode distinct shingles,
    * self-join on the shingle value, count matches per pair — `inter` equals
    * `size(array_intersect(sa, sb))` because shingle arrays are distinct.
    * Only pairs sharing ≥ 1 shingle ever materialize, and the shuffle key is
    * the shingle itself, so cost is Σ df(g)² over shingles, not |docs|².
    * At corpus scale, stop-shingles (df in the millions) are the skew risk:
    * AQE skew-join splits them, and a df-cap prefilter is the standard
    * lossy knob (not applied here — the gate requires exact Jaccard).
    * `idLimit` only scopes the oracle comparison set.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, tau: Double,
                        idLimit: Option[Long] = None): DataFrame = {
    val scoped = idLimit.fold(docs)(l => docs.filter(col("doc_id") < l))
    val inv = shingled(scoped, n)
      .select(col("doc_id"), size(col("s")).as("sz"), explode(col("s")).as("g"))
    inv.select(col("doc_id").as("id_a"), col("sz").as("sza"), col("g"))
      .join(inv.select(col("doc_id").as("id_b"), col("sz").as("szb"), col("g")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  private def verifiedJaccard(pairs: DataFrame, tau: Double): DataFrame =
    pairs
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("inter") > 0)
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  /** MinHash + LSH near-dup pairs, exact-verified.
    *
    * shingle(n words) → 64 min-hashes (xxhash64 with per-function salt) →
    * 32 bands × 2 rows → band-bucket equality self-join → distinct
    * candidates → exact Jaccard ≥ tau filter. For tau=0.8 and the banding
    * (b=32, r=2), a true pair is missed with probability (1−J²)^32 ≤ 4e-9,
    * and the verify step removes all false positives, so the output equals
    * the exact-Jaccard pair set.
    */
  def minhashPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
                   bandRows: Int = 2, tau: Double = 0.8): DataFrame = {
    // One string hash per shingle; the 64 minhash functions re-mix that
    // single 8-byte hash with the function index (xxhash64 over two longs —
    // a couple of multiplies/rotates, no string bytes, no ANSI-overflow
    // arithmetic), not 64 separate salted string hashes. `hs` is referenced
    // by all 64 array_min transforms, so CollapseProject keeps it a real
    // column — string hashing happens exactly once per shingle.
    val sh = shingled(docs, n)
      .withColumn("hs", expr("transform(s, x -> xxhash64(x))"))
      .cache()
    val sigCols = (0 until numHashes).map { i =>
      expr(s"array_min(transform(hs, h -> xxhash64(h, ${i}L)))")
    }
    val bands = (0 until numHashes / bandRows).map { b =>
      val rows = (0 until bandRows).map(r => col("sig")(b * bandRows + r))
      struct(lit(b).as("band"), hash(rows: _*).as("bv"))
    }
    val buckets = sh
      .withColumn("sig", array(sigCols: _*))
      .select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bv").as("bv"))
    val cand = buckets.select(col("doc_id").as("id_a"), col("band"), col("bv"))
      .join(buckets.select(col("doc_id").as("id_b"), col("band"), col("bv")),
        Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    verifiedJaccard(
      cand
        .join(sh.select(col("doc_id").as("id_a"), col("s").as("sa")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("s").as("sb")), "id_b"),
      tau)
  }

  /** 64-bit SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    *
    * Candidate generation uses the pigeonhole principle: split the 64-bit
    * signature into (maxHamming+1) chunks — any pair within the Hamming
    * bound must agree on at least one chunk, so an equality join on
    * (chunk_idx, chunk_value) has recall 1.0 by construction; the
    * bit_count(xor) filter then removes false positives.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    // One xxhash64 per token, one fold over the hash array carrying a
    // 64-counter accumulator (±1 per bit), then one zip to assemble the
    // signature. The hash transform is the *input array* of the aggregate,
    // so it is evaluated exactly once per row even after projection
    // collapse — never inside a per-bit lambda body. (Round 1 interpolated
    // the 64-element bit-sum array into each of the 64 bit lambdas:
    // 64×64×|tokens| hashes per document. This is 1×.)
    val bitSums = "aggregate(transform(w, x -> xxhash64(x)), array_repeat(0, 64), " +
      "(acc, h) -> zip_with(acc, sequence(0, 63), " +
      "(a, j) -> a + CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END))"
    val sig = s"aggregate(zip_with($bitSums, sequence(0, 63), " +
      "(b, j) -> CASE WHEN b > 0 THEN shiftleft(CAST(1 AS BIGINT), j) " +
      "ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    val signed = TextFunctions.withBase(docs)
      .select(col("doc_id"), expr(sig).as("sig"))
      .cache()
    val chunks = (0 until nChunks).map { c =>
      struct(lit(c).as("ci"),
        expr(s"(sig >> ${c * chunkBits}) & ${(1L << chunkBits) - 1}").as("cv"))
    }
    val buckets = signed.select(col("doc_id"), col("sig"), explode(array(chunks: _*)).as("ck"))
      .select(col("doc_id"), col("sig"), col("ck.ci").as("ci"), col("ck.cv").as("cv"))
    buckets.select(col("doc_id").as("id_a"), col("sig").as("sig_a"), col("ci"), col("cv"))
      .join(buckets.select(col("doc_id").as("id_b"), col("sig").as("sig_b"), col("ci"), col("cv")),
        Seq("ci", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(expr("sig_a ^ sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
