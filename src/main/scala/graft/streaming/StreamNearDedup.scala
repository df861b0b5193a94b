package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A document fanned out to one LSH band bucket, carrying its full
  * signature.
  */
case class BandDoc(band: Int, bv: Int, doc_id: Long, sig: Seq[Long])

/** One first-seen (unmatched-on-arrival) document in a bucket's index. */
case class IndexedSig(doc_id: Long, sig: Seq[Long])

/** A bucket's signature index, carried across micro-batches. */
case class BucketIndex(docs: Seq[IndexedSig])

/** A band-level near-dup hit: `doc_id` agreed >= minAgree with `match_id`
  * in this band's bucket.
  */
case class BandHit(doc_id: Long, band: Int, match_id: Long, agree: Double)

/** Streaming NEAR deduplication — the continuous form of
  * graft.text.Dedup.minhashPairs: as documents arrive, each is minhashed
  * once and fanned out to its LSH band buckets; every bucket keeps the
  * signatures of the documents it has indexed (keyed state, hash-
  * partitioned by (band, bucket) — each executor owns a key range, so the
  * index scales out with the cluster and an arriving document only ever
  * compares against its own buckets' residents, never the corpus).
  *
  * Per-bucket rule (applied in doc_id order within a batch, so the output
  * is deterministic and batch == streaming): an arrival whose full-
  * signature agreement with some indexed resident reaches `minAgree`
  * (agreement fraction estimates Jaccard, the MinHash property) emits a
  * BandHit against its best match and is NOT indexed in that bucket;
  * otherwise it joins the index. A document is a corpus-level near-dup
  * iff it hits in at least one band — bands are independent (no cross-
  * band coordination, the property that lets the index shard freely), so
  * the corpus verdict is a downstream per-doc aggregation of hits.
  *
  * State is O(first-seen docs × bands), each entry one 64-long signature
  * — the standard persistent LSH index, checkpoint-durable. On a
  * long-running stream that is unbounded, so two retention knobs cap it
  * (both default off, preserving exact semantics): `maxPerBucket` stops
  * indexing NEW residents once a bucket holds that many (arrivals beyond
  * the cap still match against residents, but can no longer catch their
  * OWN later near-dups — the recall trade), and `stateTtlMs` expires idle
  * buckets wholesale via a processing-time timeout (dups arriving after
  * the window re-index as first-seen). The same function runs unchanged
  * on a batch Dataset (empty initial state, timeouts never fire); the
  * spec pins streaming-over-chunks == one-shot batch == a sequential
  * reference fold.
  */
object StreamNearDedup {

  /** Fan a raw documents frame out to its LSH band buckets: one codegen'd
    * MinHashSig pass per document, then one row per band with the bucket
    * key — the same banding arithmetic (hash over the band's signature
    * slice) as the batch Dedup.minhashPairs.
    */
  def keyed(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
            bandRows: Int = 2): Dataset[BandDoc] = {
    val sigd = docs.select(col("doc_id").cast("long").as("doc_id"),
        graft.plans.TextHashes.minhashSig(
          graft.plans.TextHashes.normText(col("text")), n, numHashes)
          .as("sig"))
      .filter(col("sig").isNotNull)
    val bands = (0 until numHashes / bandRows).map { b =>
      val rows = (0 until bandRows).map(r => col("sig")(b * bandRows + r))
      struct(lit(b).as("band"), hash(rows: _*).as("bv"))
    }
    implicit val e = Encoders.product[BandDoc]
    sigd.select(col("doc_id"), col("sig"), explode(array(bands: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bv").as("bv"),
        col("doc_id"), col("sig"))
      .as[BandDoc]
  }

  /** `cappedCounter` (optional) makes the maxPerBucket recall trade
    * OBSERVABLE: it counts arrivals that were unique (no hit emitted) but
    * arrived at a full bucket and were NOT indexed — the docs whose later
    * near-dups this band can no longer catch. Without it an over-cap
    * unique arrival is indistinguishable from an indexed one at runtime.
    * Pass `spark.sparkContext.longAccumulator("...")` and read it per
    * batch (e.g. from a StreamingQueryListener) to monitor recall decay.
    */
  def bandHits(bandDocs: Dataset[BandDoc],
               minAgree: Double = 0.5,
               maxPerBucket: Int = Int.MaxValue,
               stateTtlMs: Option[Long] = None,
               cappedCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[BandHit] = {
    require(maxPerBucket > 0, s"maxPerBucket must be positive, got $maxPerBucket")
    implicit val ke = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    val timeout = if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    bandDocs
      .groupByKey(d => (d.band, d.bv))
      .flatMapGroupsWithState[BucketIndex, BandHit](
        OutputMode.Append, timeout) {
        (key: (Int, Int), it: Iterator[BandDoc], state: GroupState[BucketIndex]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arrivals = it.toIndexedSeq.sortBy(_.doc_id)
            var idx = state.getOption.map(_.docs.toVector).getOrElse(Vector.empty)
            val out = Vector.newBuilder[BandHit]
            arrivals.foreach { d =>
              var bestAgree = -1.0
              var bestId = Long.MaxValue
              idx.foreach { s =>
                var m = 0
                var i = 0
                val k = d.sig.length
                while (i < k) { if (d.sig(i) == s.sig(i)) m += 1; i += 1 }
                val a = m.toDouble / k
                if (a > bestAgree || (a == bestAgree && s.doc_id < bestId)) {
                  bestAgree = a; bestId = s.doc_id
                }
              }
              if (bestAgree >= minAgree) out += BandHit(d.doc_id, key._1, bestId, bestAgree)
              else if (idx.size < maxPerBucket) idx :+= IndexedSig(d.doc_id, d.sig)
              else cappedCounter.foreach(_.add(1L))
            }
            state.update(BucketIndex(idx))
            stateTtlMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }(Encoders.product[BucketIndex], Encoders.product[BandHit])
  }
}
