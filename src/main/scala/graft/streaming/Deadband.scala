package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A raw ingest point (mirrors Store's point schema, pre-versioning). */
case class RawPoint(uuid: String, time: Long, value: Double)

/** Per-stream compression state: the last emitted point. */
case class DeadbandState(lastTime: Long, lastValue: Double)

/** Deadband compression on the ingest stream — the classic TSDB write-path
  * reducer: a point is emitted only when it moves at least `epsilon` away
  * from the LAST EMITTED value of its stream; everything in between is
  * dropped. The reference's tree stores every inserted point, but deadband
  * pre-filters are the standard front-end for high-rate telemetry sources
  * feeding stores like it.
  *
  * This is the `flatMapGroupsWithState` shape for custom streaming state:
  * keyed by uuid, state = last emitted point, carried across micro-batches
  * by the state store (checkpoint-durable, partitioned by key — each
  * executor owns its key range's state, nothing global). Within a
  * micro-batch the group iterator is unordered, so points are sorted by
  * time before the sequential scan — correctness needs in-order delivery
  * ACROSS batches, which a watermarked/ordered source (or per-batch file
  * atomicity, as in Ingest) provides.
  *
  * The same function runs unchanged on a batch Dataset (one group call per
  * key, empty initial state) — used by the spec to cross-check streaming
  * output against the batch result.
  */
object Deadband {

  def compress(points: Dataset[RawPoint], epsilon: Double): Dataset[RawPoint] = {
    implicit val pe = Encoders.product[RawPoint]
    implicit val ke = Encoders.STRING
    points
      .groupByKey(_.uuid)
      .flatMapGroupsWithState[DeadbandState, RawPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[RawPoint], state: GroupState[DeadbandState]) =>
          val sorted = it.toIndexedSeq.sortBy(p => (p.time, p.value))
          var st = state.getOption
          val out = Vector.newBuilder[RawPoint]
          sorted.foreach { p =>
            if (st.forall(s => math.abs(p.value - s.lastValue) >= epsilon)) {
              out += p
              st = Some(DeadbandState(p.time, p.value))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }(Encoders.product[DeadbandState], Encoders.product[RawPoint])
  }
}
