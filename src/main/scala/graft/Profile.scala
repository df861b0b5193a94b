package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop profiler: run named SparkEntry queries N times against one SF
  * dir and print min/median seconds per query (steady-state, JIT-warm).
  * Usage: runMain graft.Profile <sfDir> <reps> [query ...] (no names = all).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.sessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = names.map { n =>
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      n -> (ts.head, ts(ts.length / 2))
    }
    out.sortBy(-_._2._1).foreach { case (n, (mn, md)) =>
      println(f"[profile] $mn%7.3f min  $md%7.3f med  $n")
    }
    spark.stop()
  }
}
