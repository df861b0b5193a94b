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
  /** Session defaults every graft main shares, applied on top of the
    * main's own master/shuffle settings.
    *
    * codegen.cache.maxEntries (STATIC conf, so it must be set at session
    * creation): Spark's generated-class cache holds 100 entries by
    * default — a 229-query suite compiles several codegen units per query,
    * so consecutive queries evict each other and EVERY bench sample pays
    * full Janino recompilation of every fragment (measured: see
    * OPTIMIZATION_r16.md §1). 4096 entries holds the whole library's
    * fragments; the cost is bounded driver metaspace for class metadata.
    * This is not a local[32] tune: any long-lived session (a cluster
    * driver serving repeated queries) wants its working set of generated
    * classes resident. SPARK_GRAFT_CODEGEN_CACHE overrides.
    */
  def sessionDefaults(b: SparkSession.Builder): SparkSession.Builder =
    withInitialPartitions(b)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.get("SPARK_GRAFT_CODEGEN_CACHE").map(_.trim).filter(_.nonEmpty)
          .getOrElse("4096"))

  def withInitialPartitions(b: SparkSession.Builder): SparkSession.Builder = {
    // empty string (the `VAR= cmd` shell idiom) reads as unset, and a
    // non-numeric value fails naming the variable instead of with a bare
    // NumberFormatException at session startup
    val raw = sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS")
      .map(_.trim).filter(_.nonEmpty)
    val n = raw.map { v =>
      try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"SPARK_GRAFT_INITIAL_PARTITIONS must be an integer, got '$v'")
      }
    }.getOrElse(0)
    if (n > 0)
      b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n.toString)
    else b
  }
}
