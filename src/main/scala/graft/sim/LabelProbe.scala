package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the FILTERED ANN serving path at high label
  * cardinality (VERDICT r14 stretch №8): synthetic labels vec_id % L
  * with L past maxLabelDirs force the bucketed (cell, lbk) layout, then
  * build + reopen + query-batch timings measure the end-to-end lifecycle
  * a deployment pays — including whether the adaptive-probe rule and the
  * meta-served label cardinality keep the per-batch cost flat while the
  * corpus scales underneath. Usage:
  *   runMain graft.sim.LabelProbe <sfDir> [nLabels=1024] [reps=2]
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE, SPARK_GRAFT_INITIAL_PARTITIONS
  */
object LabelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val nLabels = if (args.length > 1) args(1).toInt else 1024
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = graft.GraftConf.sessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .withColumn("label", pmod(col("vec_id"), lit(nLabels.toLong)))
    val n = emb.count()
    println(s"[labelprobe] n=$n nLabels=$nLabels (bucketed layout past 256)")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[labelprobe] ${(System.nanoTime() - t0) / 1e9}%8.2f s  $label"); r
    }
    val dir = s"/tmp/labelprobe_idx_${n}_$nLabels"
    time(s"buildFiltered (nCells=64, $nLabels labels)") {
      graft.sim.IvfIndex.buildFiltered(emb, dir, nCells = 64)
    }
    val idx = graft.sim.IvfIndex(spark, dir)
    // a 64-query batch with labels spread across the space — the serving
    // shape (each query prunes to its own (cell, lbk) directories)
    val queries = emb.filter(col("vec_id") < 64)
    (1 to reps).foreach { i =>
      time(s"queryFiltered batch of 64, k=10 (rep $i)")(
        idx.queryFiltered(queries, 10).count())
    }
    spark.stop()
  }
}
