package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An arriving (group, item) observation, timestamped for deterministic
  * within-batch processing order.
  */
case class ItemEvent(group: String, time: Long, item: String)

/** A heavy-hitter summary row: `est` ≥ the item's true count,
  * `est − err` ≤ it (the Space-Saving bracket); `n_seen` is the group's
  * total arrival count at emission time (monotone — the latest summary
  * per group is the one with max n_seen).
  */
case class HeavyHitter(group: String, item: String, est: Long, err: Long, n_seen: Long)

private[streaming] case class TopKCtr(item: String, est: Long, err: Long)
private[streaming] case class TopKState(ctrs: Seq[TopKCtr], n: Long)

/** Continuous heavy hitters per group — Space-Saving (Metwally et al.
  * 2005, "Efficient computation of frequent and top-k elements in data
  * streams"): at most `capacity` counters per group held in keyed state;
  * a new item beyond capacity evicts the minimum counter and inherits
  * its count as its error bound. Guarantees (spec-pinned): every
  * estimate brackets the true count (true ≤ est, est − err ≤ true), and
  * any item with true frequency > n/capacity is guaranteed present — so
  * the summary never misses a true heavy hitter. With capacity ≥ the
  * group's distinct-item count the summary is EXACT (err ≡ 0) and equals
  * the batch groupBy count.
  *
  * This is the streaming face of the exact batch rankings
  * (ts_top_streams / ts_topk_windows / corpus_vocab): those shuffle and
  * TakeOrdered a bounded aggregate; a continuous dashboard cannot
  * re-aggregate history per batch, and a (group, item) keyed state would
  * grow with the item universe. Space-Saving caps state at
  * capacity × groups forever.
  *
  * Emission: after each micro-batch every touched group emits its
  * current top-`k` (est desc, item asc — deterministic), Update mode.
  * Within a batch arrivals process in (time, item) order (the
  * CounterRate determinism rule); eviction ties break to the smallest
  * item, so replays are bit-identical.
  */
object TopK {

  def heavyHitters(events: Dataset[ItemEvent], capacity: Int, k: Int): Dataset[HeavyHitter] = {
    require(capacity > 0 && k > 0 && capacity >= k,
      s"need capacity >= k > 0, got capacity=$capacity k=$k")
    implicit val he = Encoders.product[HeavyHitter]
    implicit val ke = Encoders.STRING
    events
      .groupByKey(_.group)
      .flatMapGroupsWithState[TopKState, HeavyHitter](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[ItemEvent], state: GroupState[TopKState]) =>
          var ctrs: Map[String, (Long, Long)] = state.getOption
            .map(_.ctrs.map(c => c.item -> (c.est, c.err)).toMap)
            .getOrElse(Map.empty)
          var n = state.getOption.map(_.n).getOrElse(0L)
          it.toIndexedSeq.sortBy(e => (e.time, e.item)).foreach { e =>
            n += 1
            ctrs.get(e.item) match {
              case Some((est, err)) => ctrs += e.item -> (est + 1, err)
              case None if ctrs.size < capacity => ctrs += e.item -> (1L, 0L)
              case None =>
                // evict the min-est counter (ties → smallest item); the
                // newcomer inherits its count as the error bound
                val (vItem, (vEst, _)) = ctrs.minBy { case (i, (est, _)) => (est, i) }
                ctrs = ctrs - vItem + (e.item -> (vEst + 1, vEst))
            }
          }
          state.update(TopKState(
            ctrs.toSeq.map { case (i, (est, err)) => TopKCtr(i, est, err) }
              .sortBy(_.item), n))
          ctrs.toSeq.sortBy { case (i, (est, _)) => (-est, i) }.take(k)
            .map { case (i, (est, err)) => HeavyHitter(g, i, est, err, n) }
            .iterator
      }(Encoders.product[TopKState], he)
  }
}
