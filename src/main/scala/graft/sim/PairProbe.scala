package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe for the LSH pair-graph family's scaling (the
  * SpanProbe recipe on the embedding axis): times each stage of
  * cosinePairsLshAuto in isolation at a given SF dir — bucket pass,
  * candidate join, key-only distinct, vector join-back + exact verify —
  * and prices the realized bucket grid (per-table mass, occupancy,
  * max_load) at the fractional-bit config, so the r13 decade residual
  * (emb_dup_sweep 51×, emb_clusters 50× for 10× data — attributed to
  * "mass 16.9× × spill 2–3×" as an ESTIMATE) becomes a measured
  * decomposition: which stage owes the super-linear part, and whether
  * the fractional-bit budget (autoBitsFrac) + mass-scaled shuffle (AQE
  * initialPartitionNum headroom) actually collapsed it.
  * Usage: runMain graft.sim.PairProbe <sfDir> [tau=0.4]
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE, SPARK_GRAFT_INITIAL_PARTITIONS
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val tau = if (args.length > 1) args(1).toDouble else 0.4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // AQE headroom is the A/B knob this probe exists to measure — unset
    // or "0" leaves the conf alone (every exchange at `shuffle`, the
    // r13 behavior); campaigns export 2048+ (GraftConf has the contract)
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pairprobe] ${(System.nanoTime() - t0) / 1e9}%8.2f s  $label"); r
    }
    val n = emb.count()
    val (b0, nUp) = Vectors.autoBitsFrac(n)
    println(s"[pairprobe] n=$n config: b0=$b0 nUp=$nUp " +
      s"(${nUp}@${b0 + 1} + ${16 - nUp}@$b0 bits) shuffle=$shuffle " +
      s"initialPartitionNum=" + spark.conf.getOption(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
        .getOrElse("(unset)"))

    // stage 0: the priced grid — per-table exact-bucket mass at the
    // fractional config (what the candidate join below will pay)
    val load = time("lshLoad (priced grid)")(
      Vectors.lshLoad(emb).agg(
        sum("cand_pairs"), max("max_load"),
        sum("n_items") / sum("n_buckets")).head())
    println(s"[pairprobe]   exact-bucket mass=${load.getLong(0)} pairs " +
      s"max_load=${load.getLong(1)} realized_occ=${f"${load.getDouble(2)}%.2f"}")

    // stage 1: bucket pass alone (narrow codegen projection, no shuffle)
    // — the SAME lshHashed/lshProbeArr/sq8Payload/sq8Admit builders the
    // generator runs (private[sim] shared code), so this decomposition
    // can never silently desync from the pipeline the benchmarks measure
    val pay = Seq("codes", "mn", "st", "sumc", "nrm")
    val hashed = Vectors.lshHashed(
      Vectors.sq8Payload(Vectors.withNorm(emb), 64), 16, b0, nUp, 64, pay)
    time("bucket pass (hash + posexplode + sq8 payload, count only)")(hashed.count())

    // stage 2: candidate join, PRE-prescreen (the raw collision mass in
    // flight — payload-carrying rows)
    val probe = hashed.withColumn("bucket", explode(Vectors.lshProbeArr(16, b0, nUp)))
      .select(col("vec_id").as("id_p") +: col("tbl") +: col("bucket") +:
        pay.map(c => col(c).as(s"${c}_p")): _*)
    val base = hashed
      .select(col("vec_id").as("id_q") +: col("tbl") +: col("bucket") +:
        pay.map(c => col(c).as(s"${c}_q")): _*)
    // id_p < id_q mirrors cosinePairsLshBits (r17): the candidate relation
    // is symmetric, so each unordered pair is counted ONCE here (r16
    // records counted both directions — halve them to compare)
    val rawCand = probe.join(base, Seq("tbl", "bucket"))
      .filter(col("id_p") < col("id_q"))
    val nRaw = time("candidate join (pre-prescreen count)")(rawCand.count())

    // stage 3: + the SQ8 prescreen (map-side, inside the join output —
    // the r15 fix for the verify join-back that owned ~90% of generator
    // wall-clock in the r14 decomposition: background collisions die
    // here, before the distinct shuffle and the full-vector joins)
    val screened = rawCand.filter(Vectors.sq8Admit(tau, 64))
    val nScr = time("+ sq8 prescreen (survivors count)")(screened.count())

    // stage 4: + the key-only distinct (now over survivors only)
    val cand = screened.select(
      col("id_p").as("id_a"), col("id_q").as("id_b")).distinct()
    val nCand = time("+ key-only distinct")(cand.count())

    // stage 5: the full generator (adds the two full-vector join-backs +
    // the exact-cosine verify — now survivor-sized)
    val nPairs = time("FULL cosinePairsLshAuto (prescreen + verify)")(
      Vectors.cosinePairsLshAuto(emb, tau).count())
    println(s"[pairprobe] rows: raw_cand=$nRaw prescreen_surv=$nScr " +
      s"distinct_cand=$nCand pairs_tau=$nPairs " +
      s"cand_per_vec=${f"${nRaw.toDouble / n}%.1f"} " +
      s"prescreen_kill=${f"${100.0 * (nRaw - nScr) / math.max(1L, nRaw)}%.1f"}%")

    // stage 6: one representative consumer end-to-end (the tau sweep —
    // r13's worst decade ratio at 51×)
    time("emb_dup_sweep shape (sweep over one pair set)") {
      val pr = Vectors.cosinePairsLshAuto(emb, 0.8)
      pr.agg(count(lit(1)).as("n_80"),
        sum(when(col("cos_sim") >= 0.9, 1L).otherwise(0L)).as("n_90"),
        sum(when(col("cos_sim") >= 0.95, 1L).otherwise(0L)).as("n_95"),
        sum(when(col("cos_sim") >= 0.99, 1L).otherwise(0L)).as("n_99")).head()
    }
    spark.stop()
  }
}
