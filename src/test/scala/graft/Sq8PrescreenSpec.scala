package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.FloatVectorDot.dot
import graft.sim.Vectors

/** The SQ8 verify-prescreen contract (Vectors.sq8Admit + Sq8Encode/Sq8Dot):
  * the prescreen is a pure WORK filter — the generator's output pair set
  * must be bit-identical to the unprescreened plan at every tau and bit
  * config, because the admission bound is rigorous (a pair whose exact
  * cosine reaches tau can never fail it). These specs pin (1) the bound
  * itself on adversarial vectors, (2) whole-generator equivalence against
  * an inline unprescreened reference on both the real corpus and planted
  * clusters, and (3) that the prescreen actually kills the background
  * collision mass it exists to kill.
  */
class Sq8PrescreenSpec extends SparkSuite {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings").cache()

  /** The generator exactly as shipped BEFORE the prescreen (same shared
    * lshHashed/lshProbeArr stages, key-only candidates, distinct, two
    * full-vector joins, exact cosine) — the equivalence baseline.
    */
  private def referencePairs(src: DataFrame, tau: Double, nTables: Int,
                             b0: Int, nUp: Int): DataFrame = {
    val e = Vectors.withNorm(src)
    val hashed = Vectors.lshHashed(e, nTables, b0, nUp, 64)
    val probe = hashed
      .withColumn("bucket", explode(Vectors.lshProbeArr(nTables, b0, nUp)))
      .select(col("vec_id").as("id_p"), col("tbl"), col("bucket"))
    val base = hashed.select(col("vec_id").as("id_q"), col("tbl"), col("bucket"))
    val cand = probe.join(base, Seq("tbl", "bucket"))
      .filter(col("id_p") =!= col("id_q"))
      .select(least(col("id_p"), col("id_q")).as("id_a"),
        greatest(col("id_p"), col("id_q")).as("id_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("nrm").as("na")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), graft.Quant.q6(col("cos")).as("cos_sim"))
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("sq8 reconstruction error never exceeds the admission envelope") {
    import spark.implicits._
    // adversarial mix: constant vectors (step = 0), huge/tiny magnitude
    // disparity, sign flips, one-hot spikes (worst case for a per-vector
    // [min,max] grid), plus seeded noise — every ordered pair checked
    val rnd = new scala.util.Random(0x5108)
    def noise(scale: Float): Array[Float] =
      Array.fill(64)(((rnd.nextDouble() - 0.5) * scale).toFloat)
    val vecs: Seq[Array[Float]] =
      Seq(Array.fill(64)(1.0f), Array.fill(64)(-3.5f),           // constant
        Array.tabulate(64)(i => if (i == 7) 1e4f else 1e-4f),    // spike
        Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)) ++ // alternating
        (0 until 8).map(_ => noise(1f)) ++
        (0 until 4).map(_ => noise(1e6f)) ++
        (0 until 4).map(_ => noise(1e-6f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val p = Vectors.sq8Payload(Vectors.withNorm(df), 64)
    val a = p.select(col("vec_id").as("id_p"), col("embedding").as("va"),
      col("codes").as("codes_p"), col("mn").as("mn_p"), col("st").as("st_p"),
      col("sumc").as("sumc_p"), col("nrm").as("nrm_p"))
    val b = p.select(col("vec_id").as("id_q"), col("embedding").as("vb"),
      col("codes").as("codes_q"), col("mn").as("mn_q"), col("st").as("st_q"),
      col("sumc").as("sumc_q"), col("nrm").as("nrm_q"))
    val dotHat = lit(64.0) * col("mn_p") * col("mn_q") +
      col("mn_p") * col("st_q") * col("sumc_q").cast("double") +
      col("mn_q") * col("st_p") * col("sumc_p").cast("double") +
      col("st_p") * col("st_q") *
        graft.plans.Sq8Quant.sq8Dot(col("codes_p"), col("codes_q")).cast("double")
    val env = lit(0.500001 * 8.0) *
        (col("st_p") * col("nrm_q") + col("st_q") * col("nrm_p")) +
      lit(0.250001 * 64.0) * col("st_p") * col("st_q") +
      lit(1e-9) * (col("nrm_p") * col("nrm_q") + lit(1.0))
    val bad = a.crossJoin(b)
      .select(col("id_p"), col("id_q"),
        (abs(dot(col("va"), col("vb")) - dotHat) - env).as("excess"))
      .filter(col("excess") > 0)
      .collect()
    assert(bad.isEmpty, s"envelope violated on ${bad.length} pairs: " +
      bad.take(5).mkString(", "))
  }

  test("prescreened generator output is bit-identical to the unprescreened plan") {
    // real corpus at the gate config — every tau the registered queries
    // use (0.4 clusters/pairs, 0.8 dup sweep) plus a high-band 0.95
    val (b0, nUp) = Vectors.autoBitsFrac(emb.count())
    for (tau <- Seq(0.4, 0.8, 0.95)) {
      val got = asSet(Vectors.cosinePairsLshBits(emb, tau, 16, b0, nUp, 64))
      val want = asSet(referencePairs(emb, tau, 16, b0, nUp))
      assert(got == want,
        s"tau=$tau: prescreen changed the pair set (got ${got.size}, want ${want.size}; " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)})")
    }
  }

  test("prescreen equivalence holds on planted clusters across bit configs") {
    import spark.implicits._
    // near-dup clusters + background, swept across uniform and
    // fractional widths including the zero-flip regime (b0 >= 16, no
    // multiprobe — the 1000x campaign shape)
    val rnd = new scala.util.Random(0xA11E)
    def unitish(): Array[Float] = Array.fill(64)((rnd.nextDouble() - 0.5).toFloat)
    val planted = (0 until 20).flatMap { c =>
      val base = unitish()
      Seq((9000L + c * 2, base.toSeq),
        (9001L + c * 2, base.map(x => x + (rnd.nextDouble() * 0.02 - 0.01).toFloat).toSeq))
    }
    val filler = (0 until 400).map(i => (i.toLong, unitish().toSeq))
    val df = (filler ++ planted).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    for ((b0, nUp) <- Seq((8, 0), (8, 10), (18, 15)); tau <- Seq(0.4, 0.8)) {
      val got = asSet(Vectors.cosinePairsLshBits(df, tau, 16, b0, nUp, 64))
      val want = asSet(referencePairs(df, tau, 16, b0, nUp))
      assert(got == want, s"config ($b0,$nUp) tau=$tau: got ${got.size} want ${want.size}")
    }
  }

  test("prescreen kills the background collision mass before the distinct") {
    // the scale claim, measured on the real corpus: raw bucket
    // collisions vs sq8Admit survivors at the dup-sweep tau — at 0.8
    // nearly every collision is a sub-threshold background pair and must
    // die map-side (r14 measured the downstream verify join-back as ~90%
    // of generator wall-clock; this is the stage that starves it)
    val (b0, nUp) = Vectors.autoBitsFrac(emb.count())
    val pay = Seq("codes", "mn", "st", "sumc", "nrm")
    val hashed = Vectors.lshHashed(
      Vectors.sq8Payload(Vectors.withNorm(emb), 64), 16, b0, nUp, 64, pay)
    val probe = hashed
      .withColumn("bucket", explode(Vectors.lshProbeArr(16, b0, nUp)))
      .select(col("vec_id").as("id_p") +: col("tbl") +: col("bucket") +:
        pay.map(c => col(c).as(s"${c}_p")): _*)
    val base = hashed
      .select(col("vec_id").as("id_q") +: col("tbl") +: col("bucket") +:
        pay.map(c => col(c).as(s"${c}_q")): _*)
    val raw = probe.join(base, Seq("tbl", "bucket"))
      .filter(col("id_p") =!= col("id_q"))
    val nRaw = raw.count()
    val nSurv = raw.filter(Vectors.sq8Admit(0.8, 64)).count()
    assert(nRaw > 0, "corpus should produce bucket collisions")
    assert(nSurv < nRaw / 2,
      s"prescreen kill rate too low: $nSurv/$nRaw survivors at tau=0.8")
  }
}
