package graft

import org.apache.spark.sql.DataFrame

import graft.text.{Dedup, TextFunctions => TF}
import graft.sim.Vectors

/** Corpus — the LLM-training-data facade over a documents frame
  * (doc_id, text [, lang, source]), playing the role GraftDB plays for
  * streams: every operator of the text-analysis / dedup / sampling stack
  * one call away, each a lazy DataFrame that composes into larger jobs.
  * Thin by design — all semantics (and their scale notes) live on the
  * underlying operators.
  *
  * {{{
  * val c = Corpus(docsDf)
  * c.quality()                      // Gopher-style quality signals
  * c.dedupExact()                   // fingerprint dedup verdicts
  * c.clusters(c.minhashPairs())     // near-dup connected components
  * c.shard()                        // the end-to-end training shard
  * }}}
  */
class Corpus(val docs: DataFrame) {
  // ---- per-document signals ----
  def tokenStats(): DataFrame = TF.tokenStats(docs)
  def quality(): DataFrame = TF.quality(docs)
  def langId(): DataFrame = TF.langId(docs)
  def pii(): DataFrame = TF.piiScan(docs)
  def repetition(): DataFrame = TF.repetition(docs)
  def lexicalDiversity(): DataFrame = TF.lexicalDiversity(docs)
  def wordLengthStats(): DataFrame = TF.wordLengthStats(docs)
  def charEntropy(): DataFrame = TF.charEntropy(docs)
  def readability(): DataFrame = TF.readability(docs)
  def fingerprint(): DataFrame = TF.fingerprint(docs)

  // ---- corpus-level reports ----
  def stats(): DataFrame = TF.corpusStats(docs)
  def vocab(k: Int = 100): DataFrame = TF.vocab(docs, k)
  def dupNgrams(n: Int = 8, k: Int = 50): DataFrame = TF.dupNgrams(docs, n, k)
  /** Per-doc top-k keywords by tf·(N/df) — the exact-replay linear idf. */
  def keywords(k: Int = 5): DataFrame = TF.keywords(docs, k)
  def crossSourceOverlap(): DataFrame = TF.crossSourceOverlap(docs)
  def dupStats(): DataFrame = TF.dupStats(docs)

  // ---- dedup ----
  def dedupExact(): DataFrame = Dedup.exact(docs)
  def prefixGroups(k: Int = 10): DataFrame = Dedup.prefixGroups(docs, k)
  def minhashPairs(n: Int = 3, numHashes: Int = 64, bandRows: Int = 2,
                   tau: Double = 0.8): DataFrame =
    Dedup.minhashPairs(docs, n, numHashes, bandRows, tau)
  def simhashPairs(maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(docs, maxHamming)
  /** Bucket-load audit: the candidate mass simhashPairs would cost. */
  def simhashLoad(maxHamming: Int = 3): DataFrame =
    Dedup.simhashLoad(docs, maxHamming)
  def ngramJaccardPairs(n: Int, tau: Double): DataFrame =
    Dedup.ngramJaccardPairs(docs, n, tau)
  def sharedNgramPairs(n: Int = 20): DataFrame = Dedup.sharedNgramPairs(docs, n)
  def clusters(pairs: DataFrame): DataFrame = Dedup.clusters(docs, pairs)
  def contamination(bench: DataFrame, n: Int = 8): DataFrame =
    Dedup.contamination(docs, bench, n)
  def contaminationNear(bench: DataFrame, n: Int = 3, tau: Double = 0.3): DataFrame =
    Dedup.crossJaccardPairs(docs, bench, n, tau)

  // ---- selection / shipping ----
  def filter(minQuality: Double = 0.5): DataFrame = TF.corpusFilter(docs, minQuality)
  def sampleStratified(stratumCol: String, rate: Double): DataFrame =
    TF.sampleStratified(docs, stratumCol, rate)
  def sampleFixed(n: Int): DataFrame = TF.sampleFixed(docs, n)
  def sampleWeighted(rate: Double): DataFrame = TF.sampleWeighted(docs, rate)
  def tokenBudget(stratumCol: String, budgetPerStratum: Long): DataFrame =
    TF.tokenBudget(docs, stratumCol, budgetPerStratum)
  def shard(minQuality: Double = 0.5, budgetPerStratum: Long = 3000L): DataFrame =
    TF.corpusShard(docs, minQuality, budgetPerStratum)
  /** shard() with near-dup cluster gates (minhash-LSH representatives). */
  def shardNear(minQuality: Double = 0.5, budgetPerStratum: Long = 3000L,
                n: Int = 3, tau: Double = 0.8): DataFrame =
    TF.corpusShardNear(docs, Dedup.minhashPairs(docs, n, tau = tau),
      minQuality, budgetPerStratum)
  /** Sequence packing: each doc's (pack_id, pack_offset) per stratum. */
  def tokenPack(stratumCol: String, seqTokens: Long): DataFrame =
    TF.tokenPack(docs, stratumCol, seqTokens)
  /** Temperature-smoothed source mixture (p_i ∝ n_i^(1/2)). */
  def tokenMixture(stratumCol: String, totalBudget: Long): DataFrame =
    TF.tokenMixture(docs, stratumCol, totalBudget)
  /** Per-source epoch planning under the sqrt-weighted budget. */
  def tokenEpochs(stratumCol: String, totalBudget: Long): DataFrame =
    TF.tokenEpochs(docs, stratumCol, totalBudget)
  /** Mixture shares ∝ mass^τ for the quarter-power temperature grid. */
  def temperature(stratumCol: String, totalBudget: Long): DataFrame =
    TF.temperatureMixture(docs, stratumCol, totalBudget)

  // ---- splits / eval integrity ----
  def split(valFrac: Double, testFrac: Double): DataFrame =
    TF.sampleSplit(docs, valFrac, testFrac)
  /** Split drawn on near-dup clusters — co-splits duplicate groups. */
  def splitClustered(valFrac: Double, testFrac: Double): DataFrame =
    TF.sampleSplitClustered(docs, valFrac, testFrac)
  def splitLeakage(valFrac: Double, testFrac: Double): DataFrame =
    TF.splitLeakage(docs, valFrac, testFrac)
  def splitLeakageClustered(valFrac: Double, testFrac: Double): DataFrame =
    TF.splitLeakageClustered(docs, valFrac, testFrac)

  // ---- curation decisions ----
  /** Per-doc keep/drop verdict with one audited drop reason. */
  def verdict(minQuality: Double = 0.5): DataFrame =
    TF.corpusVerdict(docs, minQuality)
  /** Doc/token mass per curation stage — the "where did the corpus go" page. */
  def funnel(minQuality: Double = 0.5): DataFrame =
    TF.corpusFunnel(docs, minQuality)
  /** Per-cluster survivor selection over a near-dup pair graph. */
  def keepBest(pairs: DataFrame): DataFrame = Dedup.keepBest(docs, pairs)
  /** Exact-substring span removal (first copy survives, later spans excised). */
  def spanRemoval(n: Int = 8): DataFrame = Dedup.spanRemoval(docs, n)
  /** Cross-source near-dup matrix (where a source's copies came from). */
  def sourceOverlap(): DataFrame = Dedup.sourceOverlap(docs)
  /** Gopher-style per-width repetition profile (top/dup n-gram fractions). */
  def repProfile(): DataFrame = TF.repProfile(docs)
}

object Corpus {
  def apply(docs: DataFrame): Corpus = new Corpus(docs)
}

/** Embeddings — the similarity-search facade over an embeddings frame
  * (vec_id, embedding: array<float>), same role as Corpus.
  */
class Embeddings(val emb: DataFrame) {
  def norms(): DataFrame = Vectors.norms(emb)
  def dimStats(): DataFrame = Vectors.dimStats(emb)
  def centroidSim(): DataFrame = Vectors.centroidSim(emb)
  /** Centroid-cosine z-score outliers (corrupt/off-domain vectors). */
  def outliers(zThresh: Double = 2.0): DataFrame = Vectors.outliers(emb, zThresh)
  /** Dominant-direction anisotropy audit (power iteration, exact ints). */
  def pca(dim: Int, iters: Int = 5): DataFrame = Vectors.pcaPower(emb, dim, iters)
  def cosinePairs(tau: Double): DataFrame = Vectors.cosinePairs(emb, tau)
  /** Corpus-size-adaptive LSH pairs (occupancy-bounded bitsPerTable). */
  def cosinePairsAuto(tau: Double): DataFrame = Vectors.cosinePairsLshAuto(emb, tau)
  def knn(tau: Double, k: Int): DataFrame = Vectors.knnGraph(emb, tau, k)
  def annTopK(nQueries: Int, k: Int): DataFrame = Vectors.annTopK(emb, nQueries, k)
  def annLsh(nQueries: Int, k: Int): DataFrame = Vectors.annLsh(emb, nQueries, k)
  def annIvf(nQueries: Int, k: Int): DataFrame = Vectors.annIvf(emb, nQueries, k)
  /** Persist an IVF index of this corpus (build once, query many). */
  def buildIvf(dir: String, nCells: Int = 16): graft.sim.IvfIndex =
    graft.sim.IvfIndex.build(emb, dir, nCells)

  /** Semantic-dedup clusters over the cosine >= tau pair graph. */
  def clusters(tau: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    Dedup.clusters(
        emb.select(col("vec_id").as("doc_id")),
        Vectors.cosinePairs(emb, tau).select(col("id_a"), col("id_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
  }

  /** clusters() with pairs from the corpus-size-adaptive LSH generator —
    * the corpus-scale path (linear candidate work, LSH recall).
    */
  def clustersLsh(tau: Double): DataFrame = {
    import org.apache.spark.sql.functions.col
    Dedup.clusters(
        emb.select(col("vec_id").as("doc_id")),
        Vectors.cosinePairsLshAuto(emb, tau).select(col("id_a"), col("id_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
  }

  // ---- serving paths (compression family) ----
  def annPq(nQueries: Int, k: Int): DataFrame = Vectors.annPq(emb, nQueries, k)
  def annBitq(nQueries: Int, k: Int): DataFrame = Vectors.annBitq(emb, nQueries, k)
  /** The fused production config: cell pruning × ADC scan × exact re-rank. */
  def annIvfPq(nQueries: Int, k: Int): DataFrame = Vectors.annIvfPq(emb, nQueries, k)
  /** Metadata-filtered serving: same-label top-k, filter pre-applied to
    * the inverted lists (never post-filtered from a fixed-k probe).
    */
  def annFiltered(nQueries: Int, k: Int): DataFrame =
    Vectors.annIvfFiltered(emb, nQueries, k)
  /** The complete production composition: filter × cells × PQ codes ×
    * exact re-rank fused (faiss IVFPQ + IDSelector).
    */
  def annFilteredPq(nQueries: Int, k: Int): DataFrame =
    Vectors.annIvfPqFiltered(emb, nQueries, k)

  // ---- acceptance gates (recall@k vs exact, one per serving family) ----
  def recallLsh(nQueries: Int, k: Int): DataFrame = Vectors.annRecall(emb, nQueries, k)
  def recallIvf(nQueries: Int, k: Int): DataFrame = Vectors.annRecallIvf(emb, nQueries, k)
  def recallPq(nQueries: Int, k: Int): DataFrame = Vectors.annRecallPq(emb, nQueries, k)
  def recallBitq(nQueries: Int, k: Int): DataFrame = Vectors.annRecallBitq(emb, nQueries, k)
  def recallIvfPq(nQueries: Int, k: Int): DataFrame = Vectors.annRecallIvfPq(emb, nQueries, k)
  /** The filtered gate: selective labels thin the probed cells, so the
    * unfiltered gate's green does not transfer to a filtered serve.
    */
  def recallFiltered(nQueries: Int, k: Int): DataFrame =
    Vectors.annRecallIvfFiltered(emb, nQueries, k)
  /** The fused-filtered gate: cell, ADC, and filter misses interact, so
    * the shipped composition carries its own measured recall.
    */
  def recallFilteredPq(nQueries: Int, k: Int): DataFrame =
    Vectors.annRecallIvfPqFiltered(emb, nQueries, k)

  // ---- tuning curves / balance audits ----
  /** Recall at every probe depth from one candidate pass. */
  def probeCurve(nQueries: Int, k: Int): DataFrame = Vectors.ivfProbeCurve(emb, nQueries, k)
  /** Recall at every rerank depth from one ADC pass. */
  def rerankCurve(nQueries: Int, k: Int): DataFrame = Vectors.pqRerankCurve(emb, nQueries, k)
  def ivfBalance(nCells: Int = 16): DataFrame = Vectors.ivfBalance(emb, nCells)
  /** nQueries > 0 audits the corpus-side codebook the serving path uses. */
  def pqBalance(nQueries: Int = 0): DataFrame = Vectors.pqBalance(emb, nQueries)
  /** Truncation-energy fractions (the Matryoshka dim-vs-recall audit). */
  def mrl(): DataFrame = Vectors.mrlAudit(emb)
  /** Bucket-load audit: the candidate mass the LSH pair graph would cost. */
  def lshLoad(): DataFrame = Vectors.lshLoad(emb)

  // ---- label-quality probes (supervised-signal audits) ----
  def labelCohesion(): DataFrame = Vectors.labelCohesion(emb)
  /** Per-label fraction of kNN edges staying inside the label. */
  def knnPurity(tau: Double, k: Int): DataFrame = Vectors.knnPurity(emb, tau, k)
}

object Embeddings {
  def apply(emb: DataFrame): Embeddings = new Embeddings(emb)
}
