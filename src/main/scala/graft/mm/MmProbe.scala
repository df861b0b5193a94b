package graft.mm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: mm pair-graph size at a campaign SF (explains the
  * clusters/keep_best scaling decade — the driver→distributed
  * union-find threshold sits at 2M edges).
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val assets = Multimodal.syntheticAssets(spark,
      graft.Tables.rebalance(graft.Tables.load(spark, sfDir, "documents")))
    val t0 = System.nanoTime()
    val n = Multimodal.phashPairs(assets).count()
    println(f"[mmprobe] $sfDir pairs=$n in ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
