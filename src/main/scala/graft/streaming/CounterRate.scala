package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A counter sample's reset-aware increase since the previous sample. */
case class Increase(uuid: String, time: Long, value: Double, inc: Double)

/** Per-stream continuation state: the last counter sample seen. */
case class CounterState(lastTime: Long, lastValue: Double)

/** Streaming counter-increase extraction — the PromQL increase()/rate()
  * front half, continuous: per stream, each arriving sample's positive
  * delta against the PREVIOUS sample (a drop means the counter reset, and
  * the new absolute value IS the increase), with the previous sample
  * carried across micro-batches in keyed state. The first sample of a
  * stream has no predecessor → inc = NULL-like NaN is avoided by emitting
  * nothing for it (matching the batch operator, which lags a null).
  *
  * Downstream, the increases aggregate into windows with an ordinary
  * watermarked groupBy (Ingest.statStream shape) — increases are
  * order-independent micro-unit sums, which is exactly why the batch
  * operator (TimeSeriesOps.counterRate) sums them per window too.
  *
  * Same flatMapGroupsWithState shape as Deadband: within a batch the
  * group iterator is unordered → sort by (time, value); across batches
  * correctness needs in-order delivery, which the ingest path's per-batch
  * file atomicity provides.
  */
object CounterRate {

  def increases(points: Dataset[RawPoint]): Dataset[Increase] = {
    implicit val ie = Encoders.product[Increase]
    implicit val ke = Encoders.STRING
    points
      .groupByKey(_.uuid)
      .flatMapGroupsWithState[CounterState, Increase](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[RawPoint], state: GroupState[CounterState]) =>
          val sorted = it.toIndexedSeq.sortBy(p => (p.time, p.value))
          var st = state.getOption
          val out = Vector.newBuilder[Increase]
          sorted.foreach { p =>
            st match {
              case Some(s) =>
                val inc = if (p.value >= s.lastValue) p.value - s.lastValue else p.value
                out += Increase(p.uuid, p.time, p.value, inc)
              case None => () // first sample: no predecessor, nothing emitted
            }
            st = Some(CounterState(p.time, p.value))
          }
          st.foreach(state.update)
          out.result().iterator
      }(Encoders.product[CounterState], Encoders.product[Increase])
  }
}
