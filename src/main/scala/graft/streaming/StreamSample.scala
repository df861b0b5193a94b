package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An arriving document reference: stratum (e.g. source) + id. */
case class DocArrival(stratum: String, docId: Long)

/** A current sample member; `nSeen` is the stratum's arrival count at
  * emission (monotone — the latest sample is the one with max nSeen).
  */
case class SampledDoc(stratum: String, docId: Long, rankKey: String, nSeen: Long)

private[streaming] case class KeptDoc(rankKey: String, docId: Long)
private[streaming] case class SampleState(keep: Seq[KeptDoc], n: Long)

/** Continuous bounded uniform sampling — the streaming face of the
  * deterministic hash samples (sampleFixed / sampleBalanced): keep the
  * `n` smallest (md5(doc_id), doc_id) keys per stratum in keyed state.
  * Because the batch samples are DEFINED as a hash-order prefix, the
  * streaming sample is not merely statistically equivalent to the batch
  * cut — it is BIT-IDENTICAL to sampleBalanced over whatever arrived,
  * regardless of arrival order or chunking (a min-n set is an
  * order-free fold), and stays so forever as the stream grows. A
  * classical reservoir sample gives none of that: RNG-dependent,
  * order-dependent, and irreproducible across engines.
  *
  * State is exactly n keys per stratum — bounded for life. Emission:
  * every touched stratum re-emits its full current sample per
  * micro-batch (n rows, Update mode) — a downstream sink overwrites by
  * (stratum, max nSeen).
  */
object StreamSample {

  /** Lowercase-hex MD5 — bit-identical to Spark's `md5(cast(id AS
    * STRING))` and DuckDB's `md5(CAST(id AS VARCHAR))`.
    */
  private[streaming] def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def balancedSample(docs: Dataset[DocArrival], n: Int): Dataset[SampledDoc] = {
    require(n > 0, s"n must be positive, got $n")
    implicit val se = Encoders.product[SampledDoc]
    implicit val ke = Encoders.STRING
    docs
      .groupByKey(_.stratum)
      .flatMapGroupsWithState[SampleState, SampledDoc](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[DocArrival], state: GroupState[SampleState]) =>
          val prev = state.getOption.getOrElse(SampleState(Seq.empty, 0L))
          val arrivals = it.toIndexedSeq
          val merged = (prev.keep ++ arrivals.map(d =>
              KeptDoc(md5hex(d.docId.toString), d.docId)))
            .distinct
            .sortBy(k => (k.rankKey, k.docId))
            .take(n)
          val total = prev.n + arrivals.size
          state.update(SampleState(merged, total))
          merged.map(k => SampledDoc(g, k.docId, k.rankKey, total)).iterator
      }(Encoders.product[SampleState], se)
  }
}
