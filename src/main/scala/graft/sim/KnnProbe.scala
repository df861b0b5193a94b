package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe for emb_knn (VERDICT r11 item 6): decompose the 100x cost
  * into the LSH candidate-verify stage and the per-vertex rank, compare
  * the bounded two-phase rank against the naive single window on the
  * identical pair graph, and print the symmetrized degree distribution —
  * the number that decides which rank shape is safe (a single window on
  * vec_id sorts each vertex's neighbor list in one task: fine while max
  * degree is partition-sized, a hub-funnel only when it is not).
  * Usage: runMain graft.sim.KnnProbe <sfDir> [reps]
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[knnprobe] $label%-12s min=${ts.map(_._1).min}%7.2f s  rows=${ts.head._2}")
    }
    val pairs = Vectors.cosinePairsLshAuto(emb, 0.4)
    time("pairs")(pairs.count())
    time("knn_2phase")(Vectors.knnGraphLshAuto(emb, 0.4, 3).count())
    // the naive single window over the identical symmetrized frame
    def knn1w(p: DataFrame, k: Int): DataFrame = {
      val sym = p.select(explode(array(
          struct(col("id_a").as("vec_id"), col("id_b").as("nbr_id"), col("cos_sim")),
          struct(col("id_b").as("vec_id"), col("id_a").as("nbr_id"), col("cos_sim")))).as("e"))
        .select(col("e.vec_id"), col("e.nbr_id"), col("e.cos_sim"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("nbr_id"))
      sym.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    }
    time("knn_1window")(knn1w(pairs, 3).count())
    val deg = pairs.select(explode(array(col("id_a"), col("id_b"))).as("v"))
      .groupBy("v").count()
      .agg(max("count").as("max_deg"), avg("count").as("avg_deg"),
        count(lit(1)).as("n_vertices"))
    println("[knnprobe] degrees: " + deg.collect()(0))
    spark.stop()
  }
}
