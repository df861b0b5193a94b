package graft
import org.apache.spark.sql.SparkSession

/** Shared session-conf plumbing for the runnable mains (Bench / Verify /
  * PairProbe / …): one place for the campaign-only knobs so an env
  * contract fixed in one main cannot silently desync in another.
  */
object GraftConf {
  /** Apply `SPARK_GRAFT_INITIAL_PARTITIONS` as AQE coalesce headroom —
    * the mass-scaled-shuffle knob scale campaigns export (2048+ at the
    * 100×/1000× decades, where a fixed small partition count spills).
    * CAMPAIGN-ONLY, never a session default: the r14 per-family A/B
    * measured even 256 as a 1.5–2.4× per-query tax on the two-phase
    * sliced-scan family at sf0.1 (many tiny exchanges, nothing to
    * spill). Unset or "0" leaves the conf alone — Spark's
    * `initialPartitionNum` is checkValue(_ > 0), so passing a literal 0
    * through would throw at session creation instead of reverting to
    * the shuffle-partitions default.
    */
  def withInitialPartitions(b: SparkSession.Builder): SparkSession.Builder = {
    val n = sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "0").toInt
    if (n > 0)
      b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n.toString)
    else b
  }
}
