package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage probe for emb_ann_filtered_pq's 1000× variance (VERDICT-r15
  * №4: reps [83.8, 69.5, 56.1] — a 50% monotone spread no other decade
  * row shows, with the published steady riding the min). Times each
  * stage of annIvfPqFiltered in isolation, REPEATED, so the output
  * separates (a) a warm-up effect (page cache / JIT / codegen — stage
  * times fall across reps uniformly) from (b) a genuinely unstable
  * stage (one stage owns the spread at every rep). Uses the same
  * private[sim] builders the operator composes.
  * Usage: runMain graft.sim.PqProbe <sfDir> [reps=3]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf100"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = graft.GraftConf.sessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.cleaner.periodicGC.interval", "2min"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    def time[T](label: String, rep: Int)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqprobe] rep=$rep ${(System.nanoTime() - t0) / 1e9}%8.2f s  $label"); r
    }
    val (nQueries, k, nCells, nProbe, rerank, m, kCodes) = (5, 10, 16, 4, 32, 8, 16)
    for (rep <- 1 to reps) {
      val all = Vectors.withNorm(emb)
      val corpus = all.filter(col("vec_id") >= nQueries).cache()
      val cents = time("P1 trainCentroids (seed-only, lloyd=0)", rep)(
        Vectors.trainCentroids(corpus, nCells, 0, 200000L))
      val cd = Vectors.centDf(spark, cents)
      val assigned = Vectors.assignTo(corpus, cd, carry = Seq("label"))
      val cb = time("P2 pqCodebook", rep)(Vectors.pqCodebook(assigned, m, kCodes))
      val codes = Vectors.pqAssign(assigned, cb, m)
        .join(assigned.select(col("vec_id"), col("cell"), col("label")), Seq("vec_id"))
      val nCodes = time("P3 codes materialize (count)", rep)(codes.count())
      val nLabels = corpus.agg(countDistinct(col("label"))).head.getLong(0)
      val probes = Vectors.adaptiveProbe(nCells, nProbe, nLabels)
      val full = time("P4 FULL ivfPqQueryFiltered tail", rep)(
        Vectors.ivfPqQueryFiltered(cd, broadcast(cb), codes, assigned,
          all.filter(col("vec_id") < nQueries), k, probes, rerank, m).count())
      corpus.unpersist()
      println(s"[pqprobe] rep=$rep n_codes=$nCodes n_labels=$nLabels " +
        s"probes=$probes rows=$full")
    }
    spark.stop()
  }
}
