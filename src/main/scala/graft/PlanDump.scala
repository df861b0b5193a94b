package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev-loop plan auditor: print the FINAL adaptive physical plan of named
  * SparkEntry queries (the `.explain` loop the build rule prescribes).
  * Usage: runMain graft.PlanDump <sfDir> [query ...] (no names = all).
  * SPARK_GRAFT_PLAN_DIR=<dir>: additionally write each query's
  * `.explain("formatted")` output (the pre-execution plan with PushedFilters/
  * ReadSchema/codegen spans — the optimization-round deliverable shape) to
  * <dir>/<query>.txt.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val spark = GraftConf.sessionDefaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    planDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      planDir match {
        case Some(d) =>
          val formatted = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"$n.txt"), formatted)
          println(s"===== $n -> $d/$n.txt")
        case None =>
          df.collect()
          println(s"===== $n")
          println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
      }
    }
    spark.stop()
  }
}
