package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ts.TimeSeriesOps

/** Randomized equivalence guards for the distributed rewrites: the
  * two-phase prefix sum (budget fill / sequence packing) and the bounded
  * per-window top-k replaced naive single-task windows for scale — the
  * oracle gate pins them on ONE dataset; these pin the algebra against
  * the naive reference on arbitrary skewed inputs (including the
  * one-giant-stratum shape the rewrites exist for).
  */
class RewriteEquivalenceSpec extends SparkSuite {
  import spark.implicits._

  private def randomDocs(seed: Long, n: Int, strata: Int) = {
    val rnd = new scala.util.Random(seed)
    // skew: stratum 0 gets ~half the docs — the single-reducer killer
    (1 to n).map { i =>
      val s = if (rnd.nextBoolean()) 0 else rnd.nextInt(strata)
      (i.toLong, s"src$s", (rnd.nextInt(50) + 1).toLong,
        f"${rnd.nextLong()}%016x")
    }.toDF("doc_id", "stratum", "n_tokens", "rank_key")
  }

  test("two-phase prefix sum equals the single-window reference") {
    for (seed <- Seq(1L, 42L, 2026L)) {
      val docs = randomDocs(seed, 500, 5)
      val w = Window.partitionBy(col("stratum"))
        .orderBy(col("rank_key"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val ref = docs.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .select("doc_id", "cum_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = graft.text.TextFunctions.stratumPrefixSum(docs)
        .select("doc_id", "cum_tokens")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref, s"seed $seed: ${got.size} rows vs ${ref.size}")
    }
  }

  test("bounded top-k per window equals the global rank reference") {
    for (seed <- Seq(7L, 99L)) {
      val rnd = new scala.util.Random(seed)
      // heavy collisions: many streams share counts so tie-breaks matter
      val pts = (1 to 4000).map { _ =>
        (s"s${rnd.nextInt(60)}", rnd.nextInt(10) * 10L + rnd.nextInt(10), 1.0)
      }.toDF("uuid", "t_us", "value")
      val counts = pts.filter($"t_us" >= 0 && $"t_us" < 100)
        .groupBy($"uuid", ($"t_us" - ($"t_us" % 10)).as("w_start"))
        .agg(count(lit(1)).as("n_points"))
      val rw = Window.partitionBy($"w_start")
        .orderBy($"n_points".desc, $"uuid".asc)
      val ref = counts.withColumn("rnk", row_number().over(rw).cast("long"))
        .filter($"rnk" <= 3)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val got = TimeSeriesOps.topKPerWindow(pts, Seq("uuid"), 0L, 100L, 10L, 3)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == ref, s"seed $seed: ${got.size} vs ${ref.size}")
    }
  }
}
