package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for dupSpanStats' scaling (the KnnProbe/MmProbe
  * recipe): times each stage of the Σ-positions inverted-index plan in
  * isolation at a given SF dir, so a super-linear total can be pinned to
  * the stage that owes it (explode+hash scan, per-(doc,gram) aggregate,
  * gram doc-frequency aggregate, or the join-back) instead of guessed
  * at. r12 graded the 32×/10× decade ratio as a fixed-parallelism
  * spill; the r13 re-run at shuffle=256 moved nothing (388.7 → 380.2 s),
  * so the spill theory is dead and this probe exists to replace it with
  * a measured one.
  * Usage: runMain graft.text.SpanProbe <sfDir> [n=8]
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val n = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[spanprobe] ${(System.nanoTime() - t0) / 1e9}%8.2f s  $label"); r
    }
    val pos = TextFunctions.withBase(docs)
      .select(col("doc_id"), explode(TextFunctions.wordShingleSeq(n)).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("g"))
    val nPos = time("scan + explode + xxhash64 (count only)")(pos.count())
    // the r12 plan, kept inline as the measured baseline: per-(doc,gram)
    // counts → df table → join back (two corpus-sized aggregations + an
    // SMJ of two Σ-position-sized sides — none of which reduce anything
    // when long grams are nearly all unique)
    val perDocGram = pos.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
    val df = perDocGram.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val old = time("OLD shape: aggs + df join-back")(
      perDocGram.join(df, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_ngrams"),
          sum(when(col("df") >= 2, col("cnt")).otherwise(0L)).as("n_dup"))
        .count())
    val full = time("NEW shape (shipped dupSpanStats): g-window + per-doc agg")(
      Dedup.dupSpanStats(docs, n).count())
    println(s"[spanprobe] rows: positions=$nPos docsOld=$old docsNew=$full")
    spark.stop()
  }
}
