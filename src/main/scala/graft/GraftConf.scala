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
  /** maxShuffledHashJoinLocalMapThreshold (AQE): lets AQE rewrite a
    * planned sort-merge join to a shuffled hash join at runtime when
    * every post-shuffle partition of the build side is under the
    * threshold — the shape of the pair-graph self-joins (band buckets,
    * LSH probes: two equal narrow sides, so the static planner's
    * `muchSmaller` test never picks SHJ, and at the decades the two
    * 10⁸-row sorts dominate, guide §3.1). CAMPAIGN-ONLY knob, default
    * OFF, exactly like SPARK_GRAFT_INITIAL_PARTITIONS: measured r17 A/B —
    * at 1000× SHJ collapses the minhash band join (F6 125→72 s,
    * F7 96→37 s, keepBest 62→39 s same-run) but at sf0.1 the conversions
    * it makes cost the emb pair family ~20% per query (reps-sampled
    * subset: 7.6→9.4 s over 8 queries — many tiny hash builds where the
    * sort was already in-memory), and for the hot-key pigeonhole join the
    * sorted merge's sequential cross-product beats per-probe hash-chain
    * walks at every scale (mm M3 25.4 s SMJ vs 30.7 s SHJ at 1000×).
    * Campaigns export SPARK_GRAFT_SHJ_THRESHOLD=64m (the AQE advisory
    * partition size) where the band-join family dominates.
    */
  def sessionDefaults(b: SparkSession.Builder): SparkSession.Builder =
    withInitialPartitions(b)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.get("SPARK_GRAFT_CODEGEN_CACHE").map(_.trim).filter(_.nonEmpty)
          .getOrElse("4096"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.get("SPARK_GRAFT_SHJ_THRESHOLD").map(_.trim).filter(_.nonEmpty)
          .getOrElse("0"))

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
